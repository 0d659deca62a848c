"""Ship this package's source to executors.

Plans built from pure DataFrame expressions run entirely in the JVM,
but ``mapInPandas`` / ``applyInPandas`` closures reference functions in
this package — Python workers must be able to import it regardless of
the driver's cwd/sys.path (e.g. an external harness importing us from
an arbitrary directory). ``ensure_shipped`` zips the package once per
session and registers it with ``addPyFile`` (works for local workers
and real clusters alike).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_dcpmr_spark_pyfiles_shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"dcpmr_spark_pkg_{os.path.basename(pkg_dir)}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(dirpath, fname)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    setattr(sc, _SHIPPED_ATTR, True)
