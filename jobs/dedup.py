#!/usr/bin/env python
"""spark-submit entry point for the full dedup pipeline (north-rule packaging:
`spark-submit --py-files dist/qalsh_spark.zip jobs/dedup.py ...`).

Runs ingest -> sign -> bucket -> pairs -> verify -> cluster over an
input_hint-shaped documents table and writes clusters (+ per-stage
checkpoints / pipeline_runs lineage when --checkpoint is given — the resume
contract, SURVEY.md §3.4/§7.5).

Examples:
  spark-submit --py-files dist/qalsh_spark.zip jobs/dedup.py \
      --input /data/corpus --output /data/out/clusters --checkpoint /data/ckpt
  python jobs/dedup.py --input .cache/corpus_n20000_s42 --cpus 8 --json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _estimated_rows(path: str) -> int:
    """Parquet metadata row count (no Spark needed) for the --aqe auto rule."""
    try:
        import pyarrow.parquet as pq

        p = path if path.endswith(".parquet") else os.path.join(path, "documents.parquet")
        if os.path.isdir(p):
            return sum(
                pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
        return pq.ParquetFile(p).metadata.num_rows
    except Exception:
        return 0


def main() -> None:
    ap = argparse.ArgumentParser(description="qalsh_spark dedup job")
    ap.add_argument("--input", required=True, help="dir containing documents.parquet (or a .parquet path)")
    ap.add_argument("--output", default=None, help="output dir for clusters parquet")
    ap.add_argument("--checkpoint", default=None, help="stage-checkpoint root (enables resume)")
    ap.add_argument("--cpus", default=None, help="local[N] cores (default: cluster master / local[*])")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--no-suffix", action="store_true", help="disable the substring lane")
    ap.add_argument("--no-simhash", action="store_true", help="disable the simhash lane")
    ap.add_argument(
        "--escalate", action="store_true",
        help="second coarser-band pass over unmatched docs (virtual-rehashing"
        " analog) — recovers S-curve discovery misses near the threshold",
    )
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument(
        "--aqe",
        choices=["auto", "on", "off"],
        default="auto",
        help="adaptive query execution: 'auto' enables it above %(default)s"
        " ~10M input docs — AQE's runtime re-planning adds ~200ms latency per"
        " exchange (tens of seconds across this pipeline's ~100 stages),"
        " which dwarfs its benefit until per-stage data is large enough for"
        " skew-splitting and runtime coalescing to matter",
    )
    ap.add_argument("--json", action="store_true", help="print one JSON metrics line")
    args = ap.parse_args()

    from qalsh_spark.config import DedupConfig
    from qalsh_spark.plans.pipeline import run_dedup
    from qalsh_spark.session import get_spark
    from qalsh_spark.sources.catalog import read_documents

    master = f"local[{args.cpus}]" if args.cpus else None
    n_cores = int(args.cpus) if args.cpus else (os.cpu_count() or 8)

    # AQE auto rule: probe input size cheaply (parquet row count via metadata)
    aqe_on = args.aqe == "on"
    if args.aqe == "auto":
        aqe_on = _estimated_rows(args.input) >= 10_000_000

    spark = get_spark(
        app_name="qalsh-dedup",
        master=master,
        # 4 waves per core-count: stage wall = slowest task, so finer
        # partitions smooth skew; fewer than 16 loses pair-gen parallelism
        shuffle_partitions=args.shuffle_partitions or max(4 * n_cores, 16),
        extra_conf={"spark.sql.adaptive.enabled": str(aqe_on).lower()},
    )
    # warm JVM + Python worker pool so the measured wall is the job, not spin-up
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as _pd  # noqa: F401  (pre-import heavy deps on the driver)

    docs = read_documents(spark, args.input)
    n_docs = docs.count()

    cfg = DedupConfig(jaccard_threshold=args.jaccard)
    t0 = time.time()
    res = run_dedup(
        spark,
        docs,
        cfg,
        checkpoint_root=args.checkpoint,
        enable_suffix=not args.no_suffix,
        enable_simhash=not args.no_simhash,
        escalate=args.escalate,
        # already counted above; bounds the signing stage's per-partition
        # row budget so per-task memory doesn't grow as 1/cores
        rows_hint=n_docs,
    )
    # serialized level per the engine-wide rule (components._CKPT_LEVEL):
    # at leg scale this caches millions of cluster rows, and the
    # deserialized JVM default re-inflates spilled blocks on read.  Both
    # branches persist-then-count so n_clusters never costs a second full
    # pass over the written output.
    from qalsh_spark.operators.components import _CKPT_LEVEL

    clusters = res.clusters.persist(_CKPT_LEVEL)
    if args.output:
        clusters.write.mode("overwrite").parquet(args.output)
    else:
        clusters.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    n_clusters = clusters.select("cluster_id").distinct().count()
    clusters.unpersist()
    res.release()

    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    gc_ms = sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    metrics = {
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "wall_sec": round(wall, 3),
        "gc_sec": round(gc_ms / 1000.0, 1),
        "docs_per_hour": round(n_docs / wall * 3600.0, 1),
        "cores": n_cores,
        "master": spark.sparkContext.master,
        "aqe": aqe_on,
        "config_hash": cfg.config_hash(),
    }
    if args.json:
        print(json.dumps(metrics))
    else:
        for k, v in metrics.items():
            print(f"{k}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
