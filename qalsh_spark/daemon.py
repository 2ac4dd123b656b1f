"""Custom pyspark worker daemon that preloads the heavy imports ONCE.

pyspark's default daemon forks a fresh worker per executor slot, and each
worker pays the numpy/pandas/pyarrow import tax (~1-2 s) on its first task —
across 32 slots and several distinct Python stages that is minutes of
aggregate "time to initialize Python workers" (observed: 534 task-seconds on
a 45 s job).  Importing the libraries in the daemon BEFORE it forks lets
every worker inherit them via copy-on-write for free.

Enabled via spark.python.daemon.module=qalsh_spark.daemon (session.py);
requires the repo root on PYTHONPATH (session.py exports it).
"""

import numpy  # noqa: F401  (preload: inherited by forked workers)
import pandas  # noqa: F401
import pyarrow  # noqa: F401

import qalsh_spark.kernels  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
