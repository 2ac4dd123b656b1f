"""Skew-safe candidate-pair generation from equality buckets — pure JVM.

The reference turns bucket collisions into candidates via a per-id collision
counter `++freq[id]` with threshold `l` (/root/reference/methods/qalsh.h:442-447).
Here a pair is a candidate when it shares >= 1 band bucket (b x r tuned instead
of l/m — SURVEY.md §2.2 P2); dedup across the bands that both docs share is a
`dropDuplicates`, the distributed `checked[id]` (methods/qalsh.h:443).

Skew design (SURVEY.md §4 "skew handling", north-rule mandate):
  - ONE exchange of the high-volume bucket stream: bucket size and hub are
    window aggregates over `partitionBy(band_key)` (count/min, no ordering),
    so the annotated stream comes out of a single hash exchange + in-partition
    sort instead of the groupBy-count + join-back double shuffle.  The
    annotated stream is persisted once and every consumer (small-bucket pair
    explosion, hot-bucket star projection, bucket stats) reads the cache with
    partitioning preserved — no further full-stream exchanges;
  - buckets with size <= bucket_cap emit all C(size,2) pairs via
    collect_list (array bounded by the cap) + a nested `transform` +
    `explode` — whole-stage-codegen JVM, no Python, no per-group pandas
    overhead;
  - hot buckets (boilerplate pages: size up to millions) switch to STAR
    pairing — every member pairs with the bucket's min doc_id, a projection
    over the cached stream (no giant collect_list, no single-task sort).
    Star keeps the bucket connected for clustering with graph diameter 2 at
    n-1 edges instead of O(n^2); dropped all-pairs edges are recovered
    transitively through verification + clustering (hot buckets are
    near-identical docs by construction);
  - elided pair counts are reported in bucket_stats (no-silent-caps rule).

Bucket rows are slim (doc_id, lane_id byte, band_key) and grouping is on
`band_key` ALONE: every key construction mixes its own domain (minhash band
position, simhash combination id, suffix content hash), so cross-lane or
cross-band key collisions are 2^-64 events — a separate (lane, band_id)
grouping key would only fatten the engine's highest-volume shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from qalsh_spark.operators.banding import LANE_NAMES, lane_name_col


def _pair_structs(ids_col):
    """All (i < j) pairs from a sorted array<long> of doc ids via nested
    transform — JVM-side combinatorics."""

    def inner(x, i):
        rest = F.slice(ids_col, i + F.lit(2), F.size(ids_col))
        return F.transform(rest, lambda y: F.struct(x.alias("a"), y.alias("b")))

    return F.flatten(F.transform(ids_col, inner))


def _cap_expr(bucket_cap) -> F.Column:
    """Per-lane cap expression.  A lane present in the bucket stream but
    absent from a dict cap falls back to the max configured cap (a NULL here
    would make BOTH the small- and hot-bucket filters false and silently
    drop every bucket of that lane)."""
    if isinstance(bucket_cap, dict):
        name_to_id = {v: k for k, v in LANE_NAMES.items()}
        expr = None
        for lane, c in bucket_cap.items():
            lid = name_to_id[lane] if isinstance(lane, str) else lane
            w = F.when(F.col("lane_id") == F.lit(lid), F.lit(c))
            expr = w if expr is None else F.coalesce(expr, w)
        default = max(bucket_cap.values())
        return F.coalesce(expr, F.lit(default))
    return F.lit(bucket_cap)


def candidate_pairs_from_buckets(
    buckets: DataFrame,
    bucket_cap: int | dict[str, int] = 64,
    dedup: bool = True,
    persists: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """buckets(doc_id, lane_id, band_key) ->
    (pairs(a, b, lane_id) deduped, bucket_stats).
    a < b always; doc order inside a bucket is ascending doc_id, so the
    pair set is deterministic (oracle parity).

    `bucket_cap` may be a per-lane dict (e.g. {"minhash": 64, "suffix": 32})
    so heterogeneous lanes share ONE pair-generation pass — fewer stages,
    one shuffle schedule, one skew story.

    `persists`: optional list collecting the cached DataFrames this operator
    creates, so the caller can unpersist them once pairs/stats are consumed
    (DedupResult.release()); without it the cache lives until session end.
    """
    # ONE hash aggregate: bucket -> sorted member array.  The former design
    # computed size/hub as window aggregates, and WindowExec requires a full
    # SORT of the bucket stream by band_key (~120 rows/doc — at 4M docs a
    # 480M-row sort) on top of the same exchange; a groupBy collect_list
    # needs only the hash exchange + hash agg, and the per-row
    # (bucket_size, hub) columns the window duplicated onto every member row
    # become one array per bucket.  Memory per group is unchanged: WindowExec
    # buffered each unbounded-frame group wholesale too; a billion-member
    # boilerplate group is exactly why the star rule exists.
    grouped = (
        buckets.groupBy("band_key", "lane_id")
        .agg(F.array_sort(F.collect_list(F.col("doc_id"))).alias("members"))
        .withColumn("bucket_size", F.size("members"))
        .persist()
    )
    if persists is not None:
        persists.append(grouped)
    cap = _cap_expr(bucket_cap)
    sz = F.col("bucket_size")

    # small buckets (2 <= size <= cap): JVM all-pairs from the member array;
    # hot buckets: star to the hub = members[0] (the min doc_id — members is
    # sorted ascending, so pair order a < b and the emitted edge set are
    # bit-identical to the former per-row formulation).  One CASE expression
    # keeps both shapes in a single scan of the cached aggregate.
    pair_arr = F.when(sz <= cap, _pair_structs(F.col("members"))).otherwise(
        F.transform(
            F.slice(F.col("members"), 2, sz - 1),
            lambda y: F.struct(
                F.element_at(F.col("members"), 1).alias("a"), y.alias("b")
            ),
        )
    )
    pairs = (
        grouped.filter(sz >= 2)
        .select("lane_id", F.explode(pair_arr).alias("pair"))
        .select("pair.a", "pair.b", "lane_id")
    )
    if dedup:
        pairs = pairs.dropDuplicates(["a", "b", "lane_id"])

    # stats: one row per bucket already — partial agg collapses to the 3
    # lanes map-side, so the stats shuffle is a handful of rows
    per_bucket = grouped.withColumn("cap", cap)
    stats = (
        per_bucket.groupBy("lane_id")
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("bucket_size").alias("max_bucket"),
            F.sum(
                F.when(F.col("bucket_size") > F.col("cap"), 1).otherwise(0)
            ).alias("n_hot_buckets"),
            F.sum(
                F.when(
                    F.col("bucket_size") > F.col("cap"),
                    (
                        F.col("bucket_size").cast("long")
                        * (F.col("bucket_size") - 1)
                    )
                    / 2
                    - (F.col("bucket_size") - 1),
                ).otherwise(0)
            )
            .cast("long")
            .alias("pairs_elided_by_star"),
        )
        .select(
            lane_name_col(F.col("lane_id")).alias("lane"),
            "n_buckets",
            "max_bucket",
            "n_hot_buckets",
            "pairs_elided_by_star",
        )
    )
    return pairs, stats
