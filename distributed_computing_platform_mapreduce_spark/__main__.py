"""``python -m distributed_computing_platform_mapreduce_spark`` → the MapleJuice console (cli.py)."""

import sys

from distributed_computing_platform_mapreduce_spark.cli import main

sys.exit(main())
