"""The reference's console command surface, Spark-side.

MapleJuice users drive the platform by typing commands at the
master/worker monitor (``/root/reference/src/MapReduceMaster.java:656-900``):
``put``/``get``/``get-dir``/``ls``/``store``/``delete`` move files in
and out of SDFS, ``maple``/``juice`` run the two job phases. This
module accepts the same command strings against a *workspace*
directory (the SDFS stand-in — replication/quorum are the storage
layer's job here, see SURVEY.md S1/S9) and executes the job phases
through the subprocess-exe compat layer, so a reference user's muscle
memory — ``put`` the exe, ``put`` the data, ``maple``, ``juice``,
``get`` the result — works unchanged:

    put wc-maple.py wc-maple.py
    put corpus.txt input/corpus.txt
    maple wc-maple.py 4 wc_int input
    juice wc-juice.py 4 wc_int wc_out delete_input=1
    get wc_out ./wc_out.tsv

Command grammar follows ``/root/reference/README.md:55-66`` and the
monitor parsers (``src/MapReduceMaster.java:812-850`` for maple/juice
argument order, ``delete_input={0,1}``). Intermediates are parquet
keyed datasets under ``_intermediate/<prefix>`` instead of the
reference's per-key ``prefix+K`` text files — same contract (a keyed
(key, value) dataset addressed by prefix), columnar so the juice scan
prunes and the shuffle is by key, not by filename. The maple→juice
barrier (README.md:12) is the persisted intermediate itself.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from glob import glob

from pyspark.sql import SparkSession

from distributed_computing_platform_mapreduce_spark.compat.maplejuice import (
    maple_exe,
    juice_exe,
    write_sorted_tsv,
)

_INTERMEDIATE = "_intermediate"


class CommandError(ValueError):
    """Bad command string — message mirrors the monitor's usage hints."""


def _usage(cmd: str) -> str:
    return {
        "put": "put <localfilename> <sdfsfilename>",
        "get": "get <sdfsfilename> <localfilename>",
        "get-dir": "get-dir <sdfsdirectory> <localdirectory>",
        "delete": "delete <sdfsfilename>",
        "ls": "ls <sdfsfilename>",
        "store": "store",
        "maple": "maple <maple_exe> <num_maples> <prefix> <src_directory>",
        "juice": "juice <juice_exe> <num_juices> <prefix> <dest> [delete_input={0,1}]",
        "upload-data": "upload-data [local_input_dir]",
        "demo-wc": "demo-wc [local_input_dir]",
        "word-count-1m": "word-count-1m",
        "word-count-2m": "word-count-2m",
    }[cmd]


# The reference's demo fixtures are its wc-maple.py / wc-juice.py
# applications (uploaded as maple.exe / juice.exe by `demo-wc`,
# src/MapReduceMaster.java:866-883). Same contract re-expressed: lines
# arrive as argv (10-line batches), key,value pairs leave on stdout;
# juice gets the key as argv[1] and the values on stdin.
_DEMO_MAPLE_EXE = (
    "#!/usr/bin/env python3\n"
    "import sys\n"
    "for line in sys.argv[1:]:\n"
    "    for w in line.split():\n"
    "        print(f'{w},1')\n"
)
_DEMO_JUICE_EXE = (
    "#!/usr/bin/env python3\n"
    "import sys\n"
    "vals = [int(v) for v in sys.stdin.read().split()]\n"
    "print(f'{sys.argv[1]},{sum(vals)}')\n"
)


class Workspace:
    """One SDFS-equivalent namespace rooted at a local/DFS directory."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        input_fn=None,
        clock=None,
    ):
        self.spark = spark
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        # rapid-re-update guard state (reference parity, r13):
        # SDFSServer.java:410-434 asks [Yes/No] before committing a put
        # whose target was already put within the last 60 s. `input_fn`
        # injects the reply source (tests); `clock` injects time
        # (monotonic by default — wall-clock jumps must not fake a minute).
        self._last_put: dict[str, float] = {}
        self._input_fn = input_fn
        self._clock = clock or time.monotonic

    def _p(self, name: str) -> str:
        path = os.path.abspath(os.path.join(self.root, name))
        if not path.startswith(self.root + os.sep) and path != self.root:
            raise CommandError(f"path escapes workspace: {name}")
        return path

    # --- file commands (S1-S8; storage semantics delegated) -----------------

    def _confirm_reupdate(self) -> bool:
        """The reference's Yes/No loop for a put within 60 s of the last
        one (``src/SDFSServer.java:410-434``): "No"/"no" cancels,
        "Yes"/"yes" proceeds, anything else reprompts. Non-interactive
        sessions (no injected input_fn, stdin not a terminal — scripts,
        pipes, the one-shot command form) auto-confirm: there is nobody
        to ask, and hanging a batch job on a prompt would be worse than
        the reference's interactive-console behavior."""
        fn = self._input_fn
        if fn is None:
            if not sys.stdin.isatty():
                return True
            fn = input
        while True:
            print(
                "This file has been updated within 1 minute. "
                "Are you sure that you want to update again?\n"
            )
            print("[Yes/No]:\n")
            try:
                reply = fn()
            except EOFError:
                # interactive EOF (ctrl-D) = nobody will ever answer:
                # cancel, exactly like an explicit "No" (r13 ADVICE)
                return False
            if reply in ("No", "no"):
                return False
            if reply in ("Yes", "yes"):
                return True
            print("Wrong Command!\n")

    def put(self, local: str, name: str) -> str:
        dest = self._p(name)
        last = self._last_put.get(name)
        if last is not None and self._clock() - last <= 60.0:
            if not self._confirm_reupdate():
                return f"put {name}: cancelled"
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copyfile(local, dest)
        self._last_put[name] = self._clock()
        return f"put {name}"

    def get(self, name: str, local: str) -> str:
        src = self._p(name)
        if os.path.isdir(src):
            # a juice dest written as a spark dir: hand back ONE file (E11)
            parts = sorted(glob(os.path.join(src, "part-*")))
            if not parts:
                raise CommandError(f"no output parts under {name}")
            with open(local, "wb") as out:
                for p in parts:
                    with open(p, "rb") as f:
                        shutil.copyfileobj(f, out)
        else:
            shutil.copyfile(src, local)
        return f"get {name}"

    def get_dir(self, name: str, local_dir: str) -> str:
        src = self._p(name)
        shutil.copytree(src, local_dir, dirs_exist_ok=True)
        n = sum(len(fs) for _, _, fs in os.walk(src))
        return f"get-dir {name}: {n} files"

    def delete(self, name: str) -> str:
        p = self._p(name)
        if os.path.isdir(p):
            shutil.rmtree(p)
        else:
            os.remove(p)
        # the file is gone, so its put timestamp is too: put→delete→put
        # within 60 s must NOT prompt about "updating" a file that no
        # longer exists (r13 ADVICE; the reference's metadata dies with
        # the file)
        self._last_put.pop(name, None)
        return f"delete {name}"

    def ls(self, name: str) -> str:
        # reference lists replica machines (src/SDFSServer.java:639-654);
        # placement is the storage layer's here, so report the file itself.
        p = self._p(name)
        if not os.path.exists(p):
            return f"{name}: not found"
        size = sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(p)
            for f in fs
        ) if os.path.isdir(p) else os.path.getsize(p)
        return f"{name}\t{size} bytes"

    def store(self) -> str:
        names = sorted(
            os.path.relpath(os.path.join(d, f), self.root)
            for d, _, fs in os.walk(self.root)
            for f in fs
        )
        return "\n".join(names) if names else "(empty)"

    # --- job commands (E1/E7; §3.1-3.2 lifecycle) ---------------------------

    def _resolve_exe(self, exe: str) -> list[str]:
        """An exe ``put`` into the workspace wins (the reference requires
        that); a plain local path is accepted as a convenience.

        The reference worker always spawns exes THROUGH the Python
        interpreter — ``src/MapReduceWorker.java:114-115`` hardcodes
        ``{"python", exe, chunk}`` — so interpreter launch is the
        compatible default here too. As an intentional superset, a file
        with the execute bit AND a ``#!`` shebang runs directly (native
        binaries and shell scripts work, which the reference can't run at
        all); anything else — ``.py`` or not, executable or not — goes
        through ``sys.executable`` so shebang-less Python scripts don't
        die with ENOEXEC.
        """
        ws = os.path.join(self.root, exe)
        path = ws if os.path.exists(ws) else exe
        if not os.path.exists(path):
            raise CommandError(f"exe not found: {exe}")
        if not path.endswith(".py") and os.access(path, os.X_OK):
            with open(path, "rb") as fh:
                if fh.read(2) == b"#!":
                    return [path]
        return [sys.executable, path]

    def maple(self, exe: str, num_maples: int, prefix: str, src_dir: str) -> str:
        kv = maple_exe(self.spark, self._resolve_exe(exe), self._p(src_dir))
        if num_maples > 0:
            # the reference's ⌊n/m⌋ chunking caps parallelism at num_maples;
            # honor it as a write fan-in bound (scan parallelism stays free)
            kv = kv.coalesce(num_maples)
        dest = self._p(os.path.join(_INTERMEDIATE, prefix))
        kv.write.mode("overwrite").parquet(dest)
        return "Maple job is finished."

    def juice(
        self, exe: str, num_juices: int, prefix: str, dest: str, delete_input: bool = False
    ) -> str:
        inter = self._p(os.path.join(_INTERMEDIATE, prefix))
        kv = self.spark.read.parquet(inter)
        if num_juices > 0:
            kv = kv.repartition(num_juices, "key")
        out = juice_exe(kv, self._resolve_exe(exe))
        write_sorted_tsv(out, self._p(dest))
        if delete_input:
            shutil.rmtree(inter)
        return "Juice job is finished."


    # --- demo commands (src/MapReduceMaster.java:866-889) --------------------

    def upload_data(self, local_input_dir: str | None = None) -> str:
        """``upload-data``: stage maple.exe/juice.exe and nine input
        files under ``mjwc/`` — the reference's demo staging step
        (``src/MapReduceMaster.java:878-889``), which hardcodes its
        fixture paths; here the exes are the built-in word-count pair
        and the inputs come from ``local_input_dir`` (first nine files,
        sorted) or are synthesized deterministically."""
        for name, body in (("maple.exe", _DEMO_MAPLE_EXE), ("juice.exe", _DEMO_JUICE_EXE)):
            dest = self._p(name)
            with open(dest, "w") as f:
                f.write(body)
        if local_input_dir is not None:
            files = sorted(
                f for f in glob(os.path.join(local_input_dir, "*")) if os.path.isfile(f)
            )[:9]
            if not files:
                raise CommandError(f"no input files under {local_input_dir}")
            for i, f in enumerate(files, start=1):
                self.put(f, f"mjwc/input{i}")
        else:
            for i in range(1, 10):
                dest = self._p(f"mjwc/input{i}")
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                with open(dest, "w") as f:
                    for ln in range(40):
                        f.write(" ".join(f"w{(i * 31 + ln * 7 + j) % 23}" for j in range(8)) + "\n")
        return "Input files are uploaded to mjwc directory in the SDFS."

    def experiment_upload(self, n_files: int, file_mb: int) -> str:
        """``word-count-1m`` / ``word-count-2m``: the reference's
        experiment staging commands upload 26×1 MB / 13×2 MB corpus
        files to ``mj~wc~1m`` / ``mj~wc~2m``
        (``src/MapReduceWorker.java:636-649`` — its fixture files are
        pre-generated on disk; here they're synthesized
        deterministically at the same sizes). Staging only, like the
        reference: run ``maple``/``juice`` against the directory
        afterwards."""
        tag = f"mj~wc~{file_mb}m"
        line = None
        for i in range(n_files):
            dest = self._p(f"{tag}/input{i}")
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with open(dest, "w") as f:
                written = 0
                target = file_mb * 1_000_000
                ln = 0
                while written < target:
                    line = " ".join(
                        f"w{(i * 131 + ln * 17 + j * 7) % 97}" for j in range(20)
                    ) + "\n"
                    f.write(line)
                    written += len(line)
                    ln += 1
        return (
            f"Experiment - Word Count with {n_files} {file_mb}M input data files "
            f"uploaded to {tag}."
        )

    def demo_wc(self, local_input_dir: str | None = None) -> str:
        """``demo-wc``: the reference's one-command demo — stage the
        exes + data, run maple then juice, leaving ``output.txt`` in
        the workspace (``src/MapReduceMaster.java:866-877`` enqueues
        Job(maple.exe, 9, prefix, mjwc) then Job(juice.exe, 9, prefix,
        output.txt)). ``get output.txt <local>`` fetches the TSV."""
        staged = self.upload_data(local_input_dir)
        m = self.maple("maple.exe", 9, "prefix", "mjwc")
        j = self.juice("juice.exe", 9, "prefix", "output.txt")
        return f"{staged}\n{m}\n{j}"


def run_command(ws: Workspace, command: str) -> str:
    """Execute one monitor command string; returns the console reply."""
    parts = command.split()
    if not parts:
        raise CommandError("empty command")
    cmd, args = parts[0], parts[1:]
    try:
        if cmd == "put" and len(args) == 2:
            return ws.put(args[0], args[1])
        if cmd == "get" and len(args) == 2:
            return ws.get(args[0], args[1])
        if cmd == "get-dir" and len(args) == 2:
            return ws.get_dir(args[0], args[1])
        if cmd == "delete" and len(args) == 1:
            return ws.delete(args[0])
        if cmd == "ls" and len(args) == 1:
            return ws.ls(args[0])
        if cmd == "store" and not args:
            return ws.store()
        if cmd == "maple" and len(args) == 4:
            return ws.maple(args[0], int(args[1]), args[2], args[3])
        if cmd == "juice" and len(args) in (4, 5):
            delete_input = False
            if len(args) == 5:
                flag = args[4]
                if flag not in ("delete_input=0", "delete_input=1"):
                    raise CommandError(_usage("juice"))
                delete_input = flag.endswith("1")
            return ws.juice(args[0], int(args[1]), args[2], args[3], delete_input)
        if cmd == "upload-data" and len(args) <= 1:
            return ws.upload_data(args[0] if args else None)
        if cmd == "demo-wc" and len(args) <= 1:
            return ws.demo_wc(args[0] if args else None)
        if cmd == "word-count-1m" and not args:
            return ws.experiment_upload(26, 1)
        if cmd == "word-count-2m" and not args:
            return ws.experiment_upload(13, 2)
    except (OSError, ValueError) as ex:
        if isinstance(ex, CommandError):
            raise
        raise CommandError(f"{cmd}: {ex}") from ex
    if cmd in ("put", "get", "get-dir", "delete", "ls", "store", "maple", "juice",
               "upload-data", "demo-wc", "word-count-1m", "word-count-2m"):
        raise CommandError(_usage(cmd))
    raise CommandError(f"unknown command: {cmd}")


def main(argv: list[str] | None = None) -> int:
    """``python -m distributed_computing_platform_mapreduce_spark <workspace> [command...]``

    With a command: run it and exit. Without: a REPL over stdin, like
    the reference's monitor console.
    """
    from distributed_computing_platform_mapreduce_spark import get_spark

    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: <workspace_dir> [command args...]", file=sys.stderr)
        return 2
    ws = Workspace(get_spark("maplejuice-cli"), argv[0])
    if len(argv) > 1:
        print(run_command(ws, " ".join(argv[1:])))
        return 0
    for line in sys.stdin:
        line = line.strip()
        if not line or line == "exit":
            break
        try:
            print(run_command(ws, line))
        except CommandError as ex:
            print(f"error: {ex}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
