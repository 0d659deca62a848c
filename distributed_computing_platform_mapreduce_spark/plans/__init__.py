"""Query plan registry — the public index of every implemented operator.

Importing this package registers all plan modules; ``QUERIES`` /
``ORACLES`` are what ``__spark_entry__.py`` exposes to the driver.
"""

from distributed_computing_platform_mapreduce_spark.plans.registry import ORACLES, QUERIES, query

# Import order = SURVEY.md §7.1 build order; each module self-registers.
from distributed_computing_platform_mapreduce_spark.plans import maplejuice  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import relational  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import tpch  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import timeseries  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import windows  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import scalar_fns  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import extensions  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import streaming_batch  # noqa: E402,F401

# The driver verifies the first 50 registered queries in order, so the
# registry is capped at 50 and oracle-backed queries come first (the
# rows-only probabilistic ops go last — they'd survive any truncation
# with the weaker check they already have).
_MAX_REGISTERED = 50
_ordered = [k for k in QUERIES if k in ORACLES] + [k for k in QUERIES if k not in ORACLES]
if len(_ordered) > _MAX_REGISTERED:
    raise RuntimeError(
        f"{len(_ordered)} queries registered — fold or drop down to {_MAX_REGISTERED} "
        "so every query keeps a driver CORRECTNESS row"
    )
_reordered = {k: QUERIES[k] for k in _ordered}
QUERIES.clear()
QUERIES.update(_reordered)

__all__ = ["QUERIES", "ORACLES", "query"]
