"""Shared fixtures for the ext_* plan modules (r12 split)."""

from __future__ import annotations


def _pinned_cluster_codebook(n_clusters: int = 16, dim: int = 64):
    """Deterministic unit-row codebook for the driver's cluster-sample
    leg: integer lattice ``((c·73 + d·37) mod 19) − 9`` then L2-row-
    normalize. Pinned (not Lloyd-trained) so the cell ASSIGNMENT is a
    pure arithmetic function DuckDB can replay; measured top1−top2
    cosine margins on the driver corpora are ≥ 1.7e-6 (sf0.1) — nine
    orders above cross-engine float64 summation jitter, so the argmax
    is engine-independent."""
    import numpy as np

    c = np.arange(n_clusters)[:, None] * 73
    d = np.arange(dim)[None, :] * 37
    mat = ((c + d) % 19 - 9).astype(np.float64)
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)
