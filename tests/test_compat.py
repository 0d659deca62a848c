"""End-to-end tests for the MapleJuice compat layer — SURVEY.md §7.1
step 4: the reference's user contract (maple exe → juice exe → sorted
TSV) must reproduce the declarative engine results exactly.
"""

from __future__ import annotations

import glob
import os
import stat

import pytest
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.compat.maplejuice import (
    juice,
    juice_exe,
    maple,
    maple_exe,
    rwlg_juice,
    rwlg_maple,
    wc_juice,
    wc_maple,
    write_sorted_tsv,
)
from distributed_computing_platform_mapreduce_spark.plans import QUERIES
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table


def _wc_compat(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kv = maple(spark, wc_maple, docs.select(F.col("text").alias("value")))
    return juice(kv, wc_juice, sort=True)


def test_compat_wordcount_equals_declarative(spark, sf_dir):
    compat = {(r["key"], int(r["value"])) for r in _wc_compat(spark, sf_dir).collect()}
    declarative = {(r["word"], r["cnt"]) for r in QUERIES["wordcount"](spark, sf_dir).collect()}
    assert compat == declarative


def test_compat_rwlg_equals_declarative(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    lines = events.select(
        F.concat_ws(
            ",", F.col("event_id").cast("string"), F.col("user_id").cast("string")
        ).alias("value")
    )
    kv = maple(spark, rwlg_maple, lines)
    compat = {(r["key"], r["value"]) for r in juice(kv, rwlg_juice).collect()}
    declarative = {
        (r["dst"], r["sources"]) for r in QUERIES["rwlg"](spark, sf_dir).collect()
    }
    assert compat == declarative


def test_juice_last_write_wins_optin(spark):
    kv = spark.createDataFrame(
        [("a", "1"), ("a", "2"), ("b", "9")], ["key", "value"]
    )

    def multi(key, values):
        for v in values:
            yield key, v

    deduped = juice(kv, multi, dedup="last").collect()
    assert {(r["key"], r["value"]) for r in deduped} == {("a", "2"), ("b", "9")}
    # default keeps every pair the reducer yields
    kept = juice(kv, multi).collect()
    assert len(kept) == 3


def test_write_sorted_tsv_single_sorted_file(spark, sf_dir, tmp_path):
    kv = _wc_compat(spark, sf_dir)
    dest = str(tmp_path / "wc_out")
    write_sorted_tsv(kv, dest)
    files = glob.glob(os.path.join(dest, "part-*"))
    assert len(files) == 1, "E11 contract: exactly one output file"
    with open(files[0]) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    keys = [ln.split("\t")[0] for ln in lines]
    assert keys == sorted(keys), "E10 contract: key-sorted"
    assert all("\t" in ln for ln in lines), "tab-separated key\\tvalue"
    expected = {(r["key"], r["value"]) for r in kv.collect()}
    got = {tuple(ln.split("\t", 1)) for ln in lines}
    assert got == expected


def test_rdd_compat_equals_declarative(spark, sf_dir):
    """The RDD-level maple/juice twin reproduces the declarative
    wordcount exactly (E1+E7+E10 as flatMap/groupByKey/sortByKey)."""
    from distributed_computing_platform_mapreduce_spark.compat.rdd import juice_rdd, maple_rdd
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select("text").rdd.map(lambda r: r["text"])
    kv = maple_rdd(spark, wc_maple, lines)
    out = juice_rdd(kv, wc_juice).collect()
    got = {(k, int(v)) for k, v in out}
    declarative = {(r["word"], r["cnt"]) for r in QUERIES["wordcount"](spark, sf_dir).collect()}
    assert got == declarative
    keys = [k for k, _ in out]
    assert keys == sorted(keys)


def _write_exe(path, body: str) -> str:
    with open(path, "w") as f:
        f.write(body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return str(path)


def test_subprocess_exe_contract(spark, sf_dir, tmp_path):
    """E1/E7 as real forked executables: argv-lines → key,value stdout
    (maple); key argv + values on stdin (juice) — the reference's
    MapReduceWorker contract, chunked at 10 lines like the engine."""
    mexe = _write_exe(
        tmp_path / "wc-maple.py",
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "for line in sys.argv[1:]:\n"
        "    for w in line.split():\n"
        "        print(f'{w},1')\n",
    )
    jexe = _write_exe(
        tmp_path / "wc-juice.py",
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "vals = [int(v) for v in sys.stdin.read().split()]\n"
        "print(f'{sys.argv[1]},{sum(vals)}')\n",
    )
    docs = load_table(spark, sf_dir, "documents")
    kv = maple_exe(
        spark, ["python3", mexe], docs.select(F.col("text").alias("value")), lines_per_batch=10
    )
    out = juice_exe(kv, ["python3", jexe])
    got = {(r["key"], int(r["value"])) for r in out.collect()}
    declarative = {(r["word"], r["cnt"]) for r in QUERIES["wordcount"](spark, sf_dir).collect()}
    assert got == declarative


def test_cli_console_session_end_to_end(spark, sf_dir, tmp_path):
    """A reference user's full console session — put the exes and data,
    maple, juice (delete_input=1), get the single TSV result, plus the
    file commands (store/ls/delete) — against a workspace, producing
    exactly the declarative wordcount's answer in the reference's
    ``key\\tvalue`` sorted single-file format."""
    from distributed_computing_platform_mapreduce_spark.cli import CommandError, Workspace, run_command

    mexe = _write_exe(
        tmp_path / "wc-maple.py",
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "for line in sys.argv[1:]:\n"
        "    for w in line.split():\n"
        "        print(f'{w},1')\n",
    )
    jexe = _write_exe(
        tmp_path / "wc-juice.py",
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "vals = [int(v) for v in sys.stdin.read().split()]\n"
        "print(f'{sys.argv[1]},{sum(vals)}')\n",
    )
    corpus = tmp_path / "corpus.txt"
    docs = load_table(spark, sf_dir, "documents")
    corpus.write_text("\n".join(r["text"] for r in docs.select("text").collect()) + "\n")

    ws = Workspace(spark, str(tmp_path / "sdfs"))
    run_command(ws, f"put {mexe} wc-maple.py")
    run_command(ws, f"put {jexe} wc-juice.py")
    run_command(ws, f"put {corpus} input/corpus.txt")
    assert "input/corpus.txt" in run_command(ws, "store")
    assert "bytes" in run_command(ws, "ls input/corpus.txt")

    assert run_command(ws, "maple wc-maple.py 4 wc_int input") == "Maple job is finished."
    assert (
        run_command(ws, "juice wc-juice.py 4 wc_int wc_out delete_input=1")
        == "Juice job is finished."
    )
    # delete_input=1 removed the intermediate prefix
    assert "_intermediate/wc_int" not in run_command(ws, "store")

    result = tmp_path / "wc_out.tsv"
    run_command(ws, f"get wc_out {result}")
    got = {}
    for ln in result.read_text().splitlines():
        k, _, v = ln.partition("\t")
        got[k] = int(v)
    keys = [ln.partition("\t")[0] for ln in result.read_text().splitlines()]
    assert keys == sorted(keys)  # E10: key-sorted single file
    declarative = {r["word"]: r["cnt"] for r in QUERIES["wordcount"](spark, sf_dir).collect()}
    assert got == declarative

    run_command(ws, "delete wc_out")
    assert "not found" in run_command(ws, "ls wc_out")
    with pytest.raises(CommandError):
        run_command(ws, "maple onlythreeargs 4 pfx")
    with pytest.raises(CommandError):
        run_command(ws, "put ../escape /etc/hosts")


def test_cli_put_reupdate_confirm(spark, tmp_path, capsys):
    """r13 (reference parity, ``src/SDFSServer.java:410-434``): a put
    whose target was already put within the last 60 s asks [Yes/No] —
    "No" cancels and leaves the old content, a wrong reply reprompts,
    "Yes" commits; past 60 s no prompt; non-interactive sessions (no
    input_fn, stdin a pipe) auto-confirm rather than hang."""
    from distributed_computing_platform_mapreduce_spark.cli import Workspace, run_command

    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("first\n")
    b.write_text("second\n")

    # scripted console: a fake clock the test advances, replies queued
    now = [1000.0]
    replies: list[str] = []
    ws = Workspace(
        spark,
        str(tmp_path / "sdfs"),
        input_fn=lambda: replies.pop(0),
        clock=lambda: now[0],
    )
    stored = tmp_path / "sdfs" / "f.txt"

    assert run_command(ws, f"put {a} f.txt") == "put f.txt"  # first: no prompt
    now[0] += 10.0
    replies[:] = ["No"]
    assert run_command(ws, f"put {b} f.txt") == "put f.txt: cancelled"
    assert stored.read_text() == "first\n"  # cancel left the old content

    replies[:] = ["maybe", "yes"]  # wrong reply reprompts, then commits
    assert run_command(ws, f"put {b} f.txt") == "put f.txt"
    assert stored.read_text() == "second\n"
    out = capsys.readouterr().out
    assert "updated within 1 minute" in out and "Wrong Command!" in out

    now[0] += 61.0  # past the window: no prompt, no replies consumed
    assert run_command(ws, f"put {a} f.txt") == "put f.txt"
    assert stored.read_text() == "first\n"

    # non-interactive (pytest's stdin is not a tty): auto-confirm
    ws2 = Workspace(spark, str(tmp_path / "sdfs2"))
    run_command(ws2, f"put {a} g.txt")
    assert run_command(ws2, f"put {b} g.txt") == "put g.txt"
    assert (tmp_path / "sdfs2" / "g.txt").read_text() == "second\n"

    # r14 (ADVICE): put → delete → put within 60 s is a FRESH file, not
    # an update — no prompt, no replies consumed
    now[0] += 100.0
    run_command(ws, f"put {a} h.txt")
    now[0] += 5.0
    run_command(ws, "delete h.txt")
    replies[:] = []  # a prompt here would IndexError on the empty queue
    assert run_command(ws, f"put {b} h.txt") == "put h.txt"
    assert (tmp_path / "sdfs" / "h.txt").read_text() == "second\n"

    # r14 (ADVICE): interactive EOF (ctrl-D) cancels instead of crashing
    def _eof():
        raise EOFError

    ws3 = Workspace(spark, str(tmp_path / "sdfs3"), input_fn=_eof, clock=lambda: now[0])
    run_command(ws3, f"put {a} e.txt")
    now[0] += 1.0
    assert run_command(ws3, f"put {b} e.txt") == "put e.txt: cancelled"
    assert (tmp_path / "sdfs3" / "e.txt").read_text() == "first\n"


def test_maple_udtf_sql_forms_equal_declarative(spark, sf_dir):
    """The SQL-facing Maple (Python UDTF) in both the LATERAL per-row
    form and the TABLE(...) whole-relation form reproduces the
    declarative wordcount after a SQL group-sum (the declarative
    Juice)."""
    from distributed_computing_platform_mapreduce_spark.compat.udtf import register_maple

    register_maple(spark, "maple_wc", wc_maple)
    docs = load_table(spark, sf_dir, "documents")
    docs.select(F.col("text").alias("value")).createOrReplaceTempView("lines")
    declarative = {(r["word"], r["cnt"]) for r in QUERIES["wordcount"](spark, sf_dir).collect()}

    lateral = spark.sql(
        "SELECT f.key AS word, CAST(SUM(CAST(f.value AS BIGINT)) AS BIGINT) AS cnt "
        "FROM lines, LATERAL maple_wc(value) f GROUP BY f.key"
    )
    assert {(r["word"], r["cnt"]) for r in lateral.collect()} == declarative

    table_form = spark.sql(
        "SELECT key AS word, CAST(SUM(CAST(value AS BIGINT)) AS BIGINT) AS cnt "
        "FROM maple_wc(TABLE(lines)) GROUP BY key"
    )
    assert {(r["word"], r["cnt"]) for r in table_form.collect()} == declarative


def test_resolve_exe_shebang_sniff(spark, tmp_path):
    """Interpreter launch is the reference-compatible default
    (MapReduceWorker.java:114-115 hardcodes {"python", exe, chunk});
    direct exec is the documented superset ONLY for exec-bit files with a
    shebang — a shebang-less executable Python script must still go
    through sys.executable, not die with ENOEXEC."""
    import sys as _sys

    from distributed_computing_platform_mapreduce_spark.cli import Workspace

    ws = Workspace(spark, str(tmp_path))
    shebanged = _write_exe(tmp_path / "tool", "#!/bin/sh\necho hi\n")
    assert ws._resolve_exe(shebanged) == [shebanged]
    bare = _write_exe(tmp_path / "barescript", "print('hi')\n")  # exec bit, no shebang
    assert ws._resolve_exe(bare) == [_sys.executable, bare]
    dotpy = _write_exe(tmp_path / "script.py", "#!/usr/bin/env python3\nprint('hi')\n")
    assert ws._resolve_exe(dotpy) == [_sys.executable, dotpy]


def test_cli_demo_wc_command(spark, tmp_path):
    """`demo-wc` — the reference's one-command demo
    (src/MapReduceMaster.java:866-877): stages maple.exe/juice.exe and
    nine mjwc/ input files, runs both phases, and leaves output.txt in
    the workspace; `upload-data` stages without running. The fetched
    TSV must equal a host-side recount of the synthesized inputs."""
    from collections import Counter

    from distributed_computing_platform_mapreduce_spark.cli import Workspace, run_command

    ws = Workspace(spark, str(tmp_path / "sdfs"))
    reply = run_command(ws, "demo-wc")
    assert "Juice job is finished." in reply

    store = run_command(ws, "store")
    assert "maple.exe" in store and "mjwc/input9" in store and "output.txt" in store

    result = tmp_path / "demo_out.tsv"
    run_command(ws, f"get output.txt {result}")
    got = {}
    for line in result.read_text().splitlines():
        k, v = line.split("\t")
        got[k] = int(v)

    want = Counter()
    for i in range(1, 10):
        text = (tmp_path / "sdfs" / "mjwc" / f"input{i}").read_text()
        want.update(text.split())
    assert got == dict(want)
    # E10: single sorted file
    assert list(got) == sorted(got)

    # upload-data alone stages but runs nothing
    ws2 = Workspace(spark, str(tmp_path / "sdfs2"))
    assert "uploaded" in run_command(ws2, "upload-data")
    store2 = run_command(ws2, "store")
    assert "mjwc/input1" in store2 and "output.txt" not in store2


def test_cli_experiment_upload_commands(spark, tmp_path):
    """`word-count-1m` / `word-count-2m` — the reference's experiment
    staging commands (src/MapReduceWorker.java:636-649): 26x1MB /
    13x2MB deterministic corpus files land under mj~wc~1m / mj~wc~2m;
    a maple+juice run over the staged directory then produces a
    wordcount equal to a host-side recount of one file (spot check)."""
    from distributed_computing_platform_mapreduce_spark.cli import Workspace, run_command

    ws = Workspace(spark, str(tmp_path / "sdfs"))
    reply = run_command(ws, "word-count-1m")
    assert "26 1M" in reply
    root = tmp_path / "sdfs" / "mj~wc~1m"
    files = sorted(root.iterdir())
    assert len(files) == 26
    sizes = [f.stat().st_size for f in files]
    assert all(1_000_000 <= s <= 1_001_000 for s in sizes)

    reply2 = run_command(ws, "word-count-2m")
    files2 = sorted((tmp_path / "sdfs" / "mj~wc~2m").iterdir())
    assert "13 2M" in reply2 and len(files2) == 13
    assert all(2_000_000 <= f.stat().st_size <= 2_001_000 for f in files2)

    # content is deterministic word lines the wc pipeline can consume
    first_line = files[0].read_text().splitlines()[0]
    assert len(first_line.split()) == 20 and first_line.startswith("w")
