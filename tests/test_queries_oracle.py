"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet
tables, compare row-count + schema-names + order-insensitive values
(sorted columns, rounded floats)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("QALSH_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).df()


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
                    v = 0.0 if v == 0 else v
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


SQL_QUERIES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    duck_pdf = _duck(entry_mod.oracle_sql()[name])

    assert sorted(c.lower() for c in spark_pdf.columns) == sorted(
        c.lower() for c in duck_pdf.columns
    ), f"{name}: column mismatch {list(spark_pdf.columns)} vs {list(duck_pdf.columns)}"
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rowcount {len(spark_pdf)} vs {len(duck_pdf)}"
    )

    # align column order by name, canonicalize values
    s_cols = sorted(spark_pdf.columns, key=str.lower)
    d_cols = sorted(duck_pdf.columns, key=str.lower)
    s = _canon(spark_pdf[s_cols].itertuples(index=False), s_cols)
    d = _canon(duck_pdf[d_cols].itertuples(index=False), d_cols)
    mism = [(a, b) for a, b in zip(s, d) if a != b][:5]
    assert s == d, f"{name}: value mismatch, first diffs {mism}"


def test_rows_only_queries_run(spark):
    """Non-SQL queries must at least run and return a stable schema."""
    qs = entry_mod.queries()
    for name in qs:
        if name in entry_mod.oracle_sql():
            continue
        if name == "minhash_dedup_clusters":
            continue  # covered by test_entry (expensive)
        df = qs[name](spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0 and "cluster_id" in df.columns
