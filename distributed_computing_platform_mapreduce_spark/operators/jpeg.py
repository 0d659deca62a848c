"""Pure-numpy baseline JPEG (JFIF) codec.

Closes the last common-format gate in the multimodal path
(``multimodal.decode_image`` routed ``\\xff\\xd8`` payloads to an
honest ``NotImplementedError`` until r6): real image corpora are
overwhelmingly JPEG, and a pipeline that can decode PNG/PPM/WAV/Y4M
but not JPEG forces every user to pre-transcode.

Scope (same honest-gate pattern as the PNG codec):

- **Decode**: baseline sequential DCT (SOF0/SOF1) AND — late-r6 —
  progressive DCT (SOF2: spectral selection, successive approximation,
  interleaved DC scans, non-interleaved AC scans, EOB runs, per-scan
  DHT redefinition; T.81 G.1.2 control flow), 8-bit samples, grayscale
  or YCbCr, any sampling factors in {1, 2} (4:4:4, 4:2:2, 4:2:0,
  4:4:0), restart markers (DRI/RSTn), baseline multi-scan
  (non-interleaved) streams, Huffman tables read from the stream's own
  DHT segments. Arithmetic coding (SOF9+), hierarchical, 12-bit and >2
  sampling factors raise ``NotImplementedError``; malformed streams
  raise ``ValueError`` so the feature extractors' schema-stable
  byte-stats fallback engages.
- **Encode**: baseline 8-bit JFIF with the Annex-K quantization
  tables (libjpeg quality scaling) and Annex-K Huffman tables,
  grayscale or RGB, optional 4:2:0 chroma subsampling — exists so
  tests can round-trip the decoder on every MCU geometry without
  binary fixtures in the container. Correctness does not depend on
  the Annex-K Huffman recall being byte-exact: the encoder embeds its
  tables in DHT and the decoder reads whatever DHT says (validity is
  asserted at import). ``encode_jpeg_progressive`` emits a
  libjpeg-style progressive scan script (DC Al=1 + refinement, banded
  AC first passes at Al=2 with two refinement sweeps) so every
  progressive scan kind round-trips in tests; its pixel output must
  equal the baseline encoding of the same image.

Entropy coding is per-block Python (bounded by test/feature image
sizes — the distributed axis is rows-of-payloads via mapInPandas, not
pixels-per-payload); the DCT/IDCT, color transforms and up/down
sampling are vectorized numpy over all blocks at once.

No reference-repo parity to cite: the reference has no image path at
all — this module belongs to the training-data-pipeline extension
surface (SURVEY §6), beside the PNG/WAV/Y4M codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constant tables --------------------------------------------------------

#: Annex K.1 luminance quantization table (row-major).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

#: Annex K.2 chrominance quantization table.
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag_pairs() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        rng = list(range(max(0, s - 7), min(s, 7) + 1))
        rows = rng if s % 2 == 1 else list(reversed(rng))
        for r in rows:
            out.append((r, s - r))
    return out


_ZZ = _zigzag_pairs()
#: flat index into a row-major 8x8 block for each zigzag position
ZIGZAG = np.array([r * 8 + c for r, c in _ZZ], dtype=np.int64)
#: inverse: zigzag position for each flat index
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 "typical" Huffman tables: (bits[1..16], values). The decoder
# never assumes these — it builds tables from the stream's DHT — but the
# encoder writes them, so validity (prefix-free canonical code with
# len(values) == sum(bits)) is asserted at import below.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

for _bits, _vals in (
    (DC_LUMA_BITS, DC_LUMA_VALS),
    (DC_CHROMA_BITS, DC_CHROMA_VALS),
    (AC_LUMA_BITS, AC_LUMA_VALS),
    (AC_CHROMA_BITS, AC_CHROMA_VALS),
):
    assert sum(_bits) == len(_vals), "Annex-K Huffman table shape mismatch"

# orthonormal 8-point DCT-II matrix: forward = M @ B @ M.T, inverse = M.T @ C @ M
_k = np.arange(8).reshape(-1, 1)
_n = np.arange(8).reshape(1, -1)
_DCT_M = np.cos((2 * _n + 1) * _k * np.pi / 16) * np.where(_k == 0, np.sqrt(1 / 8), 0.5)
del _k, _n


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical JPEG Huffman table."""
    codes: dict[int, tuple[int, int]] = {}
    code, vi = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol — the decoder-side view of the same table."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K tables (quality 1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# --- bit I/O ----------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RST markers surface via ``at_marker``/``skip_marker``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("entropy data exhausted at marker")
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:
                # a real marker: record it and stop producing bits
                self.marker = nxt
                raise ValueError("entropy data exhausted at marker")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, idx: int) -> None:
        """Byte-align and consume the next RSTn marker (n == idx mod 8)."""
        self.nbits = 0
        self.acc = 0
        if self.marker is None:
            # marker not yet seen: scan forward for it
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
            else:
                raise ValueError("missing restart marker")
        else:
            self.pos += 1  # consume the marker byte after the 0xFF
        if self.marker != 0xD0 + (idx % 8):
            raise ValueError(
                f"bad restart marker: expected RST{idx % 8}, got {self.marker:#x}"
            )
        self.marker = None


def _extend(value: int, size: int) -> int:
    """JPEG EXTEND: map a `size`-bit magnitude code to its signed value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _category(value: int) -> int:
    """Bit-size category of a signed coefficient (0 for 0)."""
    return int(abs(value)).bit_length()


# --- encoder ----------------------------------------------------------------


def _plane_to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (n_blocks, 8, 8) row-major."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad to (ph, pw) — the spec-recommended fill that
    avoids ringing against a hard border."""
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _encode_block(
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    bw: _BitWriter,
) -> int:
    """Huffman-encode one zigzagged quantized block; returns its DC."""
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            bw.write(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    return dc


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _prepare_jpeg(pixels: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: color transform, optional 4:2:0
    pooling, MCU padding, DCT + quantization. Returns
    ``(comp_zz, samp, qtabs, h, w, gray, mcus_x, mcus_y)`` with
    ``comp_zz[ci]`` the (blocks_y, blocks_x, 64) zigzagged quantized
    coefficients on the padded MCU grid."""
    pixels = np.asarray(pixels)
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects (h, w[, 3]) uint8")
    if pixels.ndim == 3 and pixels.shape[2] != 3:
        raise ValueError("encode_jpeg expects 3 channels for color input")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql, qc = _quality_tables(quality)
    gray = pixels.ndim == 2

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        qtabs = [ql]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 2x2 mean-pool chroma; pad odd dims by edge replication first
            ph, pw = h + (h % 2), w + (w % 2)
            cb2 = _pad_to(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr2 = _pad_to(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes = [y, cb2, cr2]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qtabs = [ql, qc, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component: pad plane to the MCU grid, DCT+quantize all blocks
    comp_zz: list[np.ndarray] = []  # (blocks_y, blocks_x, 64) zigzagged
    for plane, (sh, sv), qt in zip(planes, samp, qtabs):
        bx, by = mcus_x * sh, mcus_y * sv
        padded = _pad_to(plane, by * 8, bx * 8) - 128.0
        blocks = _plane_to_blocks(padded)
        coef = np.einsum("ij,njk,lk->nil", _DCT_M, blocks, _DCT_M)
        qz = np.round(coef / qt).astype(np.int64)
        zz = qz.reshape(-1, 64)[:, ZIGZAG]
        comp_zz.append(zz.reshape(by, bx, 64))
    return comp_zz, samp, qtabs, h, w, gray, mcus_x, mcus_y


def _jpeg_headers(h, w, gray, samp, ql, qc, sof_marker: int) -> bytearray:
    """SOI + JFIF + DQT + SOF segments shared by both encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tq, qt in enumerate([ql] if gray else [ql, qc]):
        body = bytes([tq]) + bytes(int(x) for x in qt.reshape(-1)[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", len(sof) + 2) + sof
    return out


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG. ``subsample=True`` emits 4:2:0 chroma (2x2 mean
    pooling) — the geometry virtually all camera/web JPEGs use — so the
    decoder's multi-block-MCU path is testable without fixtures.
    ``restart_interval`` (MCUs per restart) emits DRI + RSTn markers,
    exercising the decoder's resync path the same way."""
    comp_zz, samp, qtabs, h, w, gray, mcus_x, mcus_y = _prepare_jpeg(
        pixels, quality, subsample
    )
    ql, qc = _quality_tables(quality)

    # entropy-code in MCU-interleaved order
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    huff = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(comp_zz) - 1)
    chunks: list[bytes] = []
    bw = _BitWriter()
    preds = [0] * len(comp_zz)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                chunks.append(bw.flush())
                chunks.append(bytes([0xFF, 0xD0 + rst_idx]))
                rst_idx = (rst_idx + 1) % 8
                bw = _BitWriter()
                preds = [0] * len(comp_zz)
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_zz[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            zz, preds[ci], huff[ci][0], huff[ci][1], bw
                        )
            mcu_count += 1
    chunks.append(bw.flush())
    scan = b"".join(chunks)

    # assemble segments
    ncomp = len(comp_zz)
    out = _jpeg_headers(h, w, gray, samp, ql, qc, 0xC0)
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        td_ta = 0 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "plane", "pred")

    def __init__(self, cid: int, h: int, v: int, tq: int) -> None:
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.td = self.ta = 0
        self.plane: np.ndarray | None = None
        self.pred = 0


def _read_symbol(br: _BitReader, tab: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read_bit()
        ln += 1
        sym = tab.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _read_dc_diff(br: _BitReader, dc_tab: dict[tuple[int, int], int]) -> int:
    size = _read_symbol(br, dc_tab)
    if size > 15:
        # DHT value bytes are attacker/corruption-controlled; the spec
        # caps DC categories at 11 for 8-bit baseline. Oversized symbols
        # would shift past int64 (OverflowError — escapes the fallback
        # contract) and let a hostile stream demand huge bit reads.
        raise ValueError(f"invalid DC category {size} in JPEG stream")
    return _extend(br.read_bits(size), size) if size else 0


def _decode_block(
    br: _BitReader,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    pred: int,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    dc = pred + _read_dc_diff(br, dc_tab)
    zz[0] = dc
    i = 1
    while i < 64:
        sym = _read_symbol(br, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        i += run
        if i >= 64 or size == 0:
            raise ValueError("AC coefficient index out of range")
        zz[i] = _extend(br.read_bits(size), size)
        i += 1
    return zz, dc


def _decode_ac_first(
    br: _BitReader,
    ac_tab: dict[tuple[int, int], int],
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """Progressive AC first pass (Ah=0) for one block; returns the
    updated end-of-band run count (blocks remaining in the run)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_symbol(br, ac_tab)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1  # current block ends the run too
                if r:
                    eobrun += br.read_bits(r)
                break
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("AC coefficient index out of range")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _decode_ac_refine(
    br: _BitReader,
    ac_tab: dict[tuple[int, int], int],
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """Progressive AC refinement pass (Ah=Al+1): append one magnitude
    bit to already-significant coefficients (correction bits read at
    every nonzero-history position walked) and insert newly-significant
    ±2^Al values. Mirrors the ITU T.81 G.1.2.3 control flow."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k: int) -> None:
        if br.read_bit() and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(br, ac_tab)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r  # consumed below for this block
                    if r:
                        eobrun += br.read_bits(r)
                    break
                val = 0
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude in JPEG stream")
                val = p1 if br.read_bit() else m1
            # advance over r zero-history coefficients, correcting
            # nonzero-history ones along the way
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker_pos(data: bytes, p: int) -> int:
    """Index of the next segment marker's 0xFF at or after ``p``,
    treating stuffed 0xFF00, RSTn, and 0xFF fill bytes as entropy."""
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF:
            b = data[p + 1]
            if b == 0x00 or 0xD0 <= b <= 0xD7:
                p += 2
                continue
            if b == 0xFF:
                p += 1
                continue
            return p
        p += 1
    raise ValueError("truncated JPEG: no marker after scan data")


def _run_scan(
    payload: bytes,
    start: int,
    scan_comps: list[_Component],
    coef: dict[int, np.ndarray],
    dc_tabs: dict[int, dict[tuple[int, int], int]],
    ac_tabs: dict[int, dict[tuple[int, int], int]],
    restart_interval: int,
    progressive: bool,
    ss: int,
    se: int,
    ah: int,
    al: int,
    mcus_x: int,
    mcus_y: int,
    hmax: int,
    vmax: int,
    width: int,
    height: int,
) -> int:
    """Entropy-decode one scan (baseline full-spectrum or progressive
    DC/AC first/refine) into the coefficient buffers; returns the
    payload position of the next segment marker.

    Multi-component scans run MCU-interleaved on the padded MCU grid;
    single-component scans are non-interleaved per T.81 (the block grid
    of the COMPONENT's own sample dimensions, restarts counted per
    block)."""
    for c in scan_comps:
        needs_dc = (not progressive) or (ss == 0 and ah == 0)
        needs_ac = (not progressive) or ss > 0
        if (needs_dc and c.td not in dc_tabs) or (needs_ac and c.ta not in ac_tabs):
            raise ValueError("missing Huffman table")
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")

    def units():
        if len(scan_comps) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    unit = []
                    for c in scan_comps:
                        for byy in range(c.v):
                            for bxx in range(c.h):
                                unit.append((c, my * c.v + byy, mx * c.h + bxx))
                    yield unit
        else:
            c = scan_comps[0]
            cw = -(-(width * c.h) // hmax)  # component sample dims
            chh = -(-(height * c.v) // vmax)
            bw_, bh_ = -(-cw // 8), -(-chh // 8)
            for by in range(bh_):
                for bx in range(bw_):
                    yield [(c, by, bx)]

    br = _BitReader(payload, start)
    preds = {c.cid: 0 for c in scan_comps}
    eobrun = 0
    rst_idx = 0
    count = 0
    for unit in units():
        if restart_interval and count and count % restart_interval == 0:
            br.align_and_expect_rst(rst_idx)
            rst_idx = (rst_idx + 1) % 8
            preds = {c.cid: 0 for c in scan_comps}
            eobrun = 0
        for c, by, bx in unit:
            zz = coef[c.cid][by, bx]
            if not progressive:
                out, preds[c.cid] = _decode_block(
                    br, dc_tabs[c.td], ac_tabs[c.ta], preds[c.cid]
                )
                zz[:] = out
            elif ss == 0:
                if ah == 0:
                    preds[c.cid] += _read_dc_diff(br, dc_tabs[c.td])
                    zz[0] = preds[c.cid] << al
                elif br.read_bit():
                    zz[0] = int(zz[0]) | (1 << al)
            elif ah == 0:
                eobrun = _decode_ac_first(br, ac_tabs[c.ta], zz, ss, se, al, eobrun)
            else:
                eobrun = _decode_ac_refine(br, ac_tabs[c.ta], zz, ss, se, al, eobrun)
        count += 1
    return _next_marker_pos(payload, max(start, br.pos - 2))


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG to an (h, w) grayscale or
    (h, w, 3) RGB uint8 array. See module docstring for the envelope.

    Malformed streams raise ``ValueError`` (never struct/IndexError),
    so the feature extractors' schema-stable byte-stats fallback always
    engages — same contract as ``decode_png``."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt JPEG stream: {exc}") from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    comps: list[_Component] = []
    height = width = 0
    restart_interval = 0
    progressive = False
    coef: dict[int, np.ndarray] | None = None
    hmax = vmax = mcus_x = mcus_y = 0
    n_scans = 0

    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment body")
        nxt = pos + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qtables[tq] = tab.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            # allocation guard: a corrupt/hostile SOF claiming huge dims
            # would otherwise demand a multi-GB coefficient buffer and
            # kill the executor instead of falling back (the decoder
            # buffers whole planes; 64 MP covers any sane payload in a
            # mapInPandas batch — raise the bound when streaming decode
            # lands, don't remove it)
            if height * width > 64_000_000:
                raise ValueError(
                    f"JPEG dimensions {width}x{height} exceed the 64 MP "
                    "whole-plane decode bound"
                )
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise NotImplementedError(f"sampling factors {ch}x{cv}")
                comps.append(_Component(cid, ch, cv, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG coding process")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                if len(vals) != nvals:
                    raise ValueError("truncated DHT")
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — decode the scan's entropy data inline
            if not comps or height == 0 or width == 0:
                raise ValueError("JPEG missing SOF/SOS")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS header")
            by_id = {c.cid: c for c in comps}
            scan_comps: list[_Component] = []
            for si in range(ns):
                cid, tdta = body[1 + 2 * si : 3 + 2 * si]
                if cid not in by_id:
                    raise ValueError("SOS references unknown component")
                c = by_id[cid]
                c.td, c.ta = tdta >> 4, tdta & 0x0F
                scan_comps.append(c)
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0  # baseline scans are full-band
            if coef is None:
                hmax = max(c.h for c in comps)
                vmax = max(c.v for c in comps)
                mcus_x = -(-width // (8 * hmax))
                mcus_y = -(-height // (8 * vmax))
                # quantized zigzag coefficients per component, accumulated
                # across scans; IDCT vectorized once at the end
                coef = {
                    c.cid: np.zeros((mcus_y * c.v, mcus_x * c.h, 64), dtype=np.int64)
                    for c in comps
                }
            pos = _run_scan(
                payload, nxt, scan_comps, coef, dc_tabs, ac_tabs,
                restart_interval, progressive, ss, se, ah, al,
                mcus_x, mcus_y, hmax, vmax, width, height,
            )
            n_scans += 1
            continue
        # APPn / COM / others: skip
        pos = nxt

    if not comps or height == 0 or width == 0:
        raise ValueError("JPEG missing SOF/SOS")
    if coef is None or n_scans == 0:
        raise ValueError("no scan data in JPEG")
    for c in comps:
        if c.tq not in qtables:
            raise ValueError("missing quantization table")

    planes = []
    for c in comps:
        zz = coef[c.cid]
        blocks_y, blocks_x = zz.shape[:2]
        qz = zz[..., UNZIGZAG].reshape(-1, 8, 8) * qtables[c.tq]
        pix = np.einsum("ji,njk,kl->nil", _DCT_M, qz.astype(np.float64), _DCT_M) + 128.0
        plane = (
            pix.reshape(blocks_y, blocks_x, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(blocks_y * 8, blocks_x * 8)
        )
        # upsample to full resolution (sample replication), crop to image
        plane = np.repeat(np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- progressive encoder ----------------------------------------------------


def _fixed_ac_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Fixed-length canonical Huffman table over the symbol set one
    progressive scan actually uses (EOBn symbols aren't in the Annex-K
    tables, so per-scan DHT emission is the simplest valid encoding;
    2^L ≥ n+1 keeps the all-ones code unused per the spec's
    padding-alias recommendation)."""
    syms = sorted(set(symbols)) or [0x00]
    L = 1
    while (1 << L) < len(syms) + 1:
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms


def _emit_ops(ops: list[tuple], codes: dict[int, tuple[int, int]]) -> bytes:
    bw = _BitWriter()
    for op in ops:
        if op[0] == "sym":
            code, ln = codes[op[1]]
            bw.write(code, ln)
        else:
            bw.write(op[1], op[2])
    return bw.flush()


def _ops_ac_first(blocks: list[np.ndarray], ss: int, se: int, al: int) -> list[tuple]:
    """Spectral-selection first pass (Ah=0): baseline-style run/size
    coding of the point-transformed band, plus EOBn run batching."""
    ops: list[tuple] = []
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            ops.append(("sym", nb << 4))
            if nb:
                ops.append(("bits", eobrun - (1 << nb), nb))
            eobrun = 0

    for zz in blocks:
        vals = []
        for k in range(ss, se + 1):
            v = int(zz[k])
            m = abs(v) >> al
            vals.append(-m if v < 0 else m)
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 32767:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i, v in enumerate(vals):
            if i > nz[-1]:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                ops.append(("sym", 0xF0))
                run -= 16
            s = abs(v).bit_length()
            ops.append(("sym", (run << 4) | s))
            ops.append(("bits", v if v > 0 else v + (1 << s) - 1, s))
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 32767:
                flush_eob()
    flush_eob()
    return ops


def _ops_ac_refine(blocks: list[np.ndarray], ss: int, se: int, al: int) -> list[tuple]:
    """Successive-approximation refinement (Ah=Al+1 → Al): correction
    bits for already-significant coefficients, run/1 symbols + sign for
    newly-significant ones, EOBn batching with deferred correction bits
    — T.81 G.1.2.3 / the libjpeg encode_ac_refine control flow."""
    ops: list[tuple] = []
    eobrun = 0
    eob_bits: list[int] = []

    def flush_eob() -> None:
        nonlocal eobrun, eob_bits
        if eobrun:
            nb = eobrun.bit_length() - 1
            ops.append(("sym", nb << 4))
            if nb:
                ops.append(("bits", eobrun - (1 << nb), nb))
            for b in eob_bits:
                ops.append(("bits", b, 1))
            eob_bits = []
            eobrun = 0

    for zz in blocks:
        absv = []
        eob = -1
        for idx, k in enumerate(range(ss, se + 1)):
            t = abs(int(zz[k])) >> al
            absv.append(t)
            if t == 1:
                eob = idx
        run = 0
        br_bits: list[int] = []
        for idx, k in enumerate(range(ss, se + 1)):
            t = absv[idx]
            if t == 0:
                run += 1
                continue
            while run > 15 and idx <= eob:
                flush_eob()
                ops.append(("sym", 0xF0))
                run -= 16
                for b in br_bits:
                    ops.append(("bits", b, 1))
                br_bits = []
            if t > 1:
                br_bits.append(t & 1)
                continue
            flush_eob()
            ops.append(("sym", (run << 4) | 1))
            ops.append(("bits", 1 if int(zz[k]) > 0 else 0, 1))
            for b in br_bits:
                ops.append(("bits", b, 1))
            br_bits = []
            run = 0
        if run > 0 or br_bits:
            eobrun += 1
            eob_bits.extend(br_bits)
            if eobrun == 32767:
                flush_eob()
    flush_eob()
    return ops


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """Encode as a progressive (SOF2) JFIF JPEG with a libjpeg-style
    scan script: interleaved DC first pass at Al=1, per-component
    spectral-selection AC bands (1–5, 6–63) at Al=2, two successive-
    approximation refinement sweeps per band (2→1, 1→0), and a final
    DC refinement. Exists so tests can round-trip the progressive
    decoder on every scan kind without binary fixtures — the pixel
    output must equal the baseline encoding of the same image (both
    encode identical quantized coefficients)."""
    comp_zz, samp, qtabs, h, w, gray, mcus_x, mcus_y = _prepare_jpeg(
        pixels, quality, subsample
    )
    ql, qc = _quality_tables(quality)
    ncomp = len(comp_zz)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    out = _jpeg_headers(h, w, gray, samp, ql, qc, 0xC2)
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)

    def sos(comp_specs: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    def mcu_blocks(ci: int) -> list[np.ndarray]:
        sh, sv = samp[ci]
        blocks = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(sv):
                    for bx in range(sh):
                        blocks.append(comp_zz[ci][my * sv + by, mx * sh + bx])
        return blocks

    def comp_blocks(ci: int) -> list[np.ndarray]:
        # the non-interleaved grid of the component's own sample dims —
        # smaller than the padded MCU grid when sampling pads blocks;
        # must match the decoder's single-component-scan iteration
        sh, sv = samp[ci]
        cw, chh = -(-(w * sh) // hmax), -(-(h * sv) // vmax)
        bw_, bh_ = -(-cw // 8), -(-chh // 8)
        return [comp_zz[ci][by, bx] for by in range(bh_) for bx in range(bw_)]

    # 1) DC first pass, Al=1: interleaved over all components when
    # ncomp>1 (single-component images are non-interleaved by spec,
    # which coincides with the 1x1 MCU grid)
    dc_codes = [
        _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        if ci == 0
        else _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        for ci in range(ncomp)
    ]
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(comp_zz[ci][my * sv + by, mx * sh + bx][0]) >> 1
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        s = _category(diff)
                        code, ln = dc_codes[ci][s]
                        bw.write(code, ln)
                        if s:
                            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += sos([(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)], 0, 0, 0, 1)
    out += bw.flush()

    # 2) AC scans: per component, two spectral bands; first pass at
    # Al=2 then refinements 2→1 and 1→0 (each scan ships its own DHT)
    bands = [(1, 5), (6, 63)]
    for kind, ah, al in (("first", 0, 2), ("refine", 2, 1), ("refine", 1, 0)):
        for ci in range(ncomp):
            for ss, se in bands:
                blocks = comp_blocks(ci)
                ops = (
                    _ops_ac_first(blocks, ss, se, al)
                    if kind == "first"
                    else _ops_ac_refine(blocks, ss, se, al)
                )
                bits, vals = _fixed_ac_table([op[1] for op in ops if op[0] == "sym"])
                out += _dht_segment(1, 0, bits, vals)
                out += sos([(ci + 1, 0, 0)], ss, se, ah, al)
                out += _emit_ops(ops, _canonical_codes(bits, vals))

    # 3) DC refinement, Ah=1 → Al=0: one raw bit per block, no Huffman
    bw = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bw.write(int(comp_zz[ci][my * sv + by, mx * sh + bx][0]) & 1, 1)
    out += sos([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0)
    out += bw.flush()

    out += b"\xff\xd9"  # EOI
    return bytes(out)
