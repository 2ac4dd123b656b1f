#!/usr/bin/env python
"""Per-stage wall + GC diagnosis for the scaling gate.

Materializes each pipeline stage sequentially (noop write) and reports its
wall at the given core count, plus cumulative JVM GC time (local mode: the
driver JVM *is* the executor, so GC MXBeans see executor GC).  Comparing the
per-stage walls between local[N] and local[4N] pinpoints which stage carries
the non-scaling term.

Usage: python scripts/stage_times.py --input .cache/corpusp_n4000000_s42 --cpus 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gc_ms(spark) -> int:
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from qalsh_spark.config import DedupConfig
    from qalsh_spark.plans.pipeline import DedupPipeline, _prepare
    from qalsh_spark.session import get_spark
    from qalsh_spark.sources.catalog import read_documents

    spark = get_spark(
        app_name="qalsh-stage-times",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.shuffle_partitions or max(4 * args.cpus, 16),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = read_documents(spark, args.input)
    n_docs = docs.count()
    pipe = DedupPipeline(DedupConfig())

    walls: dict[str, float] = {}
    gcs: dict[str, int] = {}

    def mat(name: str, df, cache=True):
        t0, g0 = time.time(), gc_ms(spark)
        out = df.persist() if cache else df
        out.write.format("noop").mode("overwrite").save()
        walls[name] = round(time.time() - t0, 1)
        gcs[name] = gc_ms(spark) - g0
        return out

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    prepared = mat("prepared", _prepare(docs))
    # mirror run()'s exact-group pre-pass: sign one representative per
    # distinct text
    w = Window.partitionBy("text_len", "text_hash").orderBy("doc_id")
    reps = (
        prepared.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", "warc_ts", "lang", "text")
    )
    signatures = mat("sign", pipe.sign(reps))
    pairs, _stats = pipe.candidate_pairs(signatures)
    pairs = mat("pairs", pairs)
    edges = mat("edges", pipe.verify(pairs, signatures, prepared))
    clusters = mat(
        "cluster", pipe.cluster(edges, prepared.select("doc_id", "url", "warc_ts")),
        cache=False,
    )
    total = round(sum(walls.values()), 1)
    print(json.dumps({
        "n_docs": n_docs,
        "cpus": args.cpus,
        "walls": walls,
        "gc_ms": gcs,
        "gc_total_ms": sum(gcs.values()),
        "total": total,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
