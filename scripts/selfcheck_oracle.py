"""Driver-style correctness self-check: every `queries()` entry vs its DuckDB oracle.

Mirrors the round driver's CORRECTNESS gate: for each key in
`__spark_entry__.queries()`, run the Spark query and the `oracle_sql()` SQL on
the same parquet tables at sf0.01, sort columns by name and rows by value,
round floats, and compare row count + schema width + a value hash.  Run before
the end-of-round snapshot to catch regressions the pytest suite misses.

Usage:  python scripts/selfcheck_oracle.py [sf_dir] [--only k1,k2]
"""
from __future__ import annotations

import datetime
import hashlib
import importlib.util
import math
import sys
import time

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(val):
    if val is None:
        return "\x00"
    # Spark's date_trunc returns a midnight timestamp where DuckDB returns a
    # date — same value, different Python type; the driver's compare treats
    # them as equal, so normalize here too.
    if isinstance(val, datetime.datetime) and val.time() == datetime.time(0):
        return val.date().isoformat()
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.6g}"
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in val) + "]"
    if isinstance(val, dict):
        return "{" + ",".join(f"{k}:{_canon(v)}" for k, v in sorted(val.items())) + "}"
    return str(val)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogateescape"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    queries, oracles = entry.queries(), entry.oracle_sql()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("selfcheck")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_weak = 0
    for key, fn in queries.items():
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            shash = _hash_rows(scols, [tuple(r) for r in srows])
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {key}: spark failed: {exc}")
            n_fail += 1
            continue
        sql = oracles.get(key)
        if sql is None:
            print(f"weak {key}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ohash = _hash_rows(ocols, orows)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {key}: duckdb failed: {exc}")
            n_fail += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = shash == ohash
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS {key}: rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(
                f"FAIL {key}: rows {len(srows)}/{len(orows)} cols_ok={ok_cols} "
                f"hash_ok={ok_hash} spark_cols={sorted(scols)} oracle_cols={sorted(ocols)}"
            )
            n_fail += 1
    print(f"\n{n_pass} pass, {n_weak} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
