"""Data-quality validation: declarative checks, shuffle-minimal plans.

Every serious 100 TB pipeline gates ingestion on expectations (null
rates, key uniqueness, value domains, referential integrity). The
naive implementation scans once PER CHECK; at corpus scale that turns
a 10-expectation suite into 10 full passes. Here every ROW-LEVEL check
(not-null, range, accepted-values, regex, custom predicate) compiles to
one conditional-count aggregate and ALL of them run in a SINGLE
``agg()`` over one scan — partial aggregation makes the shuffle one row
per partition. Uniqueness costs its own groupBy (irreducibly keyed),
and referential integrity one left-anti join (broadcast when the
parent's key side is small) — each still a single pass over the child.

The report is a plain list of dicts (check name, violation count,
pass flag) — bounded, driver-side, loggable; ``expect`` raises on any
failure for gate-style use.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    """One named expectation: ``violation`` is a boolean Column that is
    True for BAD rows. Row-level checks only — see ``unique`` /
    ``foreign_key`` for the relational ones."""

    name: str
    violation: Column


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo=None, hi=None) -> Check:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    # NULL comparisons are NULL → not counted here; pair with not_null
    return Check(f"in_range({col},{lo},{hi})", F.coalesce(cond, F.lit(False)))


def accepted_values(col: str, values: list) -> Check:
    return Check(
        f"accepted_values({col})",
        F.coalesce(~F.col(col).isin(*values), F.lit(False)),
    )


def matches(col: str, pattern: str) -> Check:
    return Check(
        f"matches({col})",
        F.coalesce(~F.col(col).rlike(pattern), F.lit(False)),
    )


def satisfies(name: str, predicate: Column) -> Check:
    """Custom expectation: ``predicate`` is True for GOOD rows."""
    return Check(name, F.coalesce(~predicate, F.lit(False)))


@dataclass
class Report:
    results: list[dict] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(r["ok"] for r in self.results)

    def failed(self) -> list[dict]:
        return [r for r in self.results if not r["ok"]]


def validate(
    df: DataFrame,
    checks: list[Check] | None = None,
    unique: list[list[str]] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> Report:
    """Run every expectation; returns a :class:`Report` of
    ``{"check", "violations", "ok"}`` rows.

    Plan shape: all row-level ``checks`` fuse into ONE
    ``agg(sum(violation), …)`` over one scan; each ``unique`` key list
    costs one groupBy (count of keys seen more than once); each
    ``foreign_keys`` entry ``(child_col, parent_df, parent_col)`` one
    left-anti join against the DISTINCT parent keys (planner broadcasts
    small parents). Nothing collects more than one row per job."""
    report = Report()
    if checks:
        aggs = [
            F.sum(c.violation.cast("long")).alias(f"__v{i}")
            for i, c in enumerate(checks)
        ]
        row = df.agg(*aggs).collect()[0]
        for i, c in enumerate(checks):
            v = int(row[f"__v{i}"] or 0)
            report.results.append({"check": c.name, "violations": v, "ok": v == 0})
    for cols in unique or []:
        dups = (
            df.groupBy(*cols)
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > 1)
            .count()
        )
        report.results.append(
            {"check": f"unique({','.join(cols)})", "violations": int(dups), "ok": dups == 0}
        )
    for child_col, parent, parent_col in foreign_keys or []:
        orphans = (
            df.select(F.col(child_col).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .join(
                parent.select(F.col(parent_col).alias("__k")).distinct(),
                "__k",
                "left_anti",
            )
            .count()
        )
        report.results.append(
            {
                "check": f"foreign_key({child_col}->{parent_col})",
                "violations": int(orphans),
                "ok": orphans == 0,
            }
        )
    return report


def expect(df: DataFrame, **kwargs) -> Report:
    """:func:`validate`, raising ``ValueError`` listing every failed
    expectation — the ingestion-gate form."""
    report = validate(df, **kwargs)
    if not report.ok:
        lines = "; ".join(
            f"{r['check']}: {r['violations']} violations" for r in report.failed()
        )
        raise ValueError(f"data validation failed — {lines}")
    return report
