"""Query plan registry — the public index of every implemented operator.

Importing this package registers all plan modules; ``QUERIES`` /
``ORACLES`` are what ``__spark_entry__.py`` exposes to the driver.
"""

from distributed_computing_platform_mapreduce_spark.plans.registry import ORACLES, QUERIES, query

# Import order = SURVEY.md §7.1 build order; each module self-registers.
from distributed_computing_platform_mapreduce_spark.plans import maplejuice  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import relational  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import tpch  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import windows  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import scalar_fns  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import extensions  # noqa: E402,F401
from distributed_computing_platform_mapreduce_spark.plans import streaming_batch  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
