"""Driver contract for the spark-graft builder (PySpark target).

entry()       — flagship dedup pipeline on sf0.001 (clusters DataFrame)
queries()     — one entry per implemented operator family (SURVEY.md §2)
oracle_sql()  — DuckDB-runnable ANSI-SQL twin for each SQL-expressible query
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full MinHash+SimHash+suffix
    near-duplicate detection + clustering over the documents table."""
    from qalsh_spark.queries import QUERIES

    return QUERIES["minhash_dedup_clusters"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from qalsh_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from qalsh_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
