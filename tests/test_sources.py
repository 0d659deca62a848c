"""Source coverage: the reference's text-directory input mode feeding a
full maple→juice pipeline, plus the CSV/JSON structured scans.
"""

from __future__ import annotations

import collections
import json

from distributed_computing_platform_mapreduce_spark.compat.maplejuice import juice, maple, wc_juice, wc_maple
from distributed_computing_platform_mapreduce_spark.sources.catalog import (
    load_csv,
    load_json,
    load_text_dir,
)


def test_maple_over_text_directory(spark, tmp_path):
    """E1+S2: maple consumes a directory of line-text files — the
    reference's sdfs_src_directory contract — and wordcount through the
    compat pipeline matches a host-side count."""
    lines0 = ["the quick brown fox", "jumps over the lazy dog"]
    lines1 = ["the dog sleeps", "", "quick quick"]
    (tmp_path / "part0.txt").write_text("\n".join(lines0) + "\n")
    (tmp_path / "part1.txt").write_text("\n".join(lines1) + "\n")

    expected = collections.Counter(
        w for ln in lines0 + lines1 for w in ln.split()
    )
    kv = maple(spark, wc_maple, str(tmp_path))
    out = juice(kv, wc_juice, sort=True).collect()
    got = {r["key"]: int(r["value"]) for r in out}
    assert got == dict(expected)
    keys = [r["key"] for r in out]
    assert keys == sorted(keys)  # E10 key sort

    df = load_text_dir(spark, str(tmp_path), line_col="line")
    assert df.columns == ["line"]
    assert df.count() == 5  # empty line included; text source keeps it


def test_csv_and_json_scans(spark, tmp_path):
    csv_path = tmp_path / "t.csv"
    csv_path.write_text("id,name,score\n1,a,1.5\n2,b,2.5\n")
    df = load_csv(spark, str(csv_path))
    assert df.columns == ["id", "name", "score"]
    assert {(r["id"], r["name"], r["score"]) for r in df.collect()} == {
        (1, "a", 1.5),
        (2, "b", 2.5),
    }

    json_path = tmp_path / "t.jsonl"
    json_path.write_text(
        "\n".join(json.dumps(x) for x in [{"id": 1, "tags": ["x"]}, {"id": 2, "tags": []}])
    )
    dj = load_json(spark, str(json_path))
    rows = {r["id"]: list(r["tags"]) for r in dj.collect()}
    assert rows == {1: ["x"], 2: []}
