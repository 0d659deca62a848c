"""Differential tests: the engine vs straight-line Python on generated
inputs (hypothesis supplies the corpora; one Spark round-trip per
example keeps runtime sane — examples are small and few, the point is
the generator's edge cases: empty lines, repeated tokens, unicode,
single-token docs).
"""

from __future__ import annotations

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.compat.maplejuice import juice, maple, wc_juice, wc_maple
from distributed_computing_platform_mapreduce_spark.operators import dedup

# Words over a small alphabet (plus a unicode letter) force collisions
# and repeated keys; lines of 0..6 words include empties.
_word = st.text(alphabet="abcé", min_size=1, max_size=3)
_line = st.lists(_word, min_size=0, max_size=6).map(" ".join)
_corpus = st.lists(_line, min_size=1, max_size=8)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_corpus)
def test_compat_wordcount_matches_python(spark, corpus):
    expected = collections.Counter(w for line in corpus for w in line.split())
    lines = spark.createDataFrame([(ln,) for ln in corpus], ["value"])
    kv = maple(spark, wc_maple, lines)
    out = juice(kv, wc_juice, sort=True).collect()
    got = {r["key"]: int(r["value"]) for r in out}
    assert got == dict(expected)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_corpus)
def test_word_shingles_match_python(spark, corpus):
    def py_shingles(text: str, n: int = 3) -> list[str]:
        toks = [t for t in text.split() if t]
        seen: dict[str, None] = {}
        for i in range(max(len(toks) - n + 1, 0)):
            seen.setdefault(" ".join(toks[i : i + n]), None)
        return list(seen)

    df = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    rows = df.select(
        "doc_id", dedup.word_shingles(F.col("text"), 3).alias("sh")
    ).collect()
    got = {r["doc_id"]: list(r["sh"]) for r in rows}
    want = {i: py_shingles(t) for i, t in enumerate(corpus)}
    assert got == want
