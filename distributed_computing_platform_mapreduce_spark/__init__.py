"""distributed_computing_platform_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query & data-processing capabilities of the
MapleJuice MapReduce platform (reference: James-QiuHaoran/
distributed-computing-platform-mapreduce), re-expressed Spark-first:

- declarative DataFrame/SQL plans optimized by Catalyst (the reference
  hand-schedules tasks over UDP; we declare and let Spark plan),
- the reference's map/group/reduce dataflow (Maple/Juice) as a thin
  compatibility layer over ``mapInPandas`` / ``applyInPandas``,
- native relational operators the reference leaves to user executables
  (joins, windows, set ops, grouping sets — SURVEY.md §2.6),
- large-scale training-data-pipeline extensions: dedup (exact/MinHash-LSH/
  SimHash/n-gram-Jaccard/embedding), similarity search, text analysis,
  multimodal column plumbing.

Designed for 1000-executor / 100 TB scale: broadcast small dims, AQE on,
no driver-side collects in any operator, partial aggregation everywhere.
"""

from distributed_computing_platform_mapreduce_spark.session import get_spark
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]

__version__ = "0.1.0"
