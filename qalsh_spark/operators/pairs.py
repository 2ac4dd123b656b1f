"""Skew-safe candidate-pair generation from equality buckets.

The reference turns bucket collisions into candidates via a per-id collision
counter `++freq[id]` with threshold `l` (/root/reference/methods/qalsh.h:442-447).
Here a pair is a candidate when it shares >= 1 band bucket (b x r tuned instead
of l/m — SURVEY.md §2.2 P2); dedup across the bands that both docs share is a
`dropDuplicates`, the distributed `checked[id]` (methods/qalsh.h:443).

Skew design (SURVEY.md §4 "skew handling", north-rule mandate):
  - bucket sizes are computed FIRST with a map-side-combinable groupBy count;
  - buckets with size <= bucket_cap emit all C(size,2) pairs via a bounded
    applyInPandas (group height capped, so no task can blow up);
  - hot buckets (boilerplate pages: size up to millions) switch to STAR
    pairing — every member pairs with the bucket's min doc_id, computed with
    an aggregate + re-join (both shuffle on the bucket key and are AQE
    skew-splittable; no giant collect_list, no single-task sort anywhere).
    Star keeps the bucket connected for clustering with graph diameter 2,
    which is exactly what connected components needs, at n-1 edges instead of
    O(n^2).  Dropped all-pairs edges in hot buckets are recovered
    transitively through verification + clustering (hot buckets are
    boilerplate near-identical docs by construction).
  - per-bucket pair counts are logged to the lineage table, so "silently
    dropped" never happens (no-silent-caps rule).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("lane", T.StringType()),
    ]
)


def _allpairs_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    """All C(n,2) pairs within one (lane, band_id, band_key) bucket, n <= cap.
    NumPy triangular indices — no Python pair loop."""
    ids = np.sort(pdf["doc_id"].to_numpy(np.int64))
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"a": [], "b": [], "lane": []}).astype(
            {"a": "int64", "b": "int64", "lane": "object"}
        )
    iu, ju = np.triu_indices(n, k=1)
    return pd.DataFrame(
        {"a": ids[iu], "b": ids[ju], "lane": pdf["lane"].iat[0]}
    )


def candidate_pairs_from_buckets(
    buckets: DataFrame, bucket_cap: int = 64, materialize: bool = True
) -> tuple[DataFrame, DataFrame]:
    """buckets(doc_id, lane, band_id, band_key) -> (pairs(a,b,lane) deduped,
    bucket_stats for lineage).  a < b always.

    `materialize` localCheckpoints the sized-bucket join once so the
    small/big branches don't recompute it (self-union branches miss Spark's
    cache/exchange reuse).  In the catalog-backed pipeline the bucket stage is
    parquet-checkpointed anyway, which serves the same purpose durably.
    """
    keys = ["lane", "band_id", "band_key"]

    # Partial-agg (map-side combine) makes the count skew-tolerant; the join
    # back is an equi-join on the bucket key that AQE skew-splits.  No window
    # over the bucket is used anywhere: a window would force each hot bucket
    # into a single task's sort.
    sizes = buckets.groupBy(*keys).agg(
        F.count("*").alias("bucket_size"), F.min("doc_id").alias("hub")
    )
    with_size = buckets.join(sizes.filter(F.col("bucket_size") >= 2), on=keys)
    if materialize:
        with_size = with_size.localCheckpoint()

    small = with_size.filter(F.col("bucket_size") <= bucket_cap)
    small_pairs = (
        small.select(*keys, "doc_id")
        .groupBy(*keys)
        .applyInPandas(_allpairs_fn, schema=_PAIR_SCHEMA)
    )

    big = with_size.filter(F.col("bucket_size") > bucket_cap)
    big_pairs = big.filter(F.col("doc_id") != F.col("hub")).select(
        F.least("hub", "doc_id").alias("a"),
        F.greatest("hub", "doc_id").alias("b"),
        "lane",
    )

    pairs = small_pairs.unionByName(big_pairs).dropDuplicates(["a", "b", "lane"])

    stats = sizes.groupBy("lane").agg(
        F.count("*").alias("n_buckets"),
        F.max("bucket_size").alias("max_bucket"),
        F.sum(F.when(F.col("bucket_size") > bucket_cap, 1).otherwise(0)).alias(
            "n_hot_buckets"
        ),
        F.sum(
            F.when(
                F.col("bucket_size") > bucket_cap,
                (F.col("bucket_size") * (F.col("bucket_size") - 1)) / 2
                - (F.col("bucket_size") - 1),
            ).otherwise(0)
        )
        .cast("long")
        .alias("pairs_elided_by_star"),
    )
    return pairs, stats


def _allpairs_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield _allpairs_fn(pdf)
