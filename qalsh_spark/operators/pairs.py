"""Skew-safe candidate-pair generation from equality buckets — pure JVM.

The reference turns bucket collisions into candidates via a per-id collision
counter `++freq[id]` with threshold `l` (/root/reference/methods/qalsh.h:442-447).
Here a pair is a candidate when it shares >= 1 band bucket (b x r tuned instead
of l/m — SURVEY.md §2.2 P2); dedup across the bands that both docs share is a
`dropDuplicates`, the distributed `checked[id]` (methods/qalsh.h:443).

Skew design (SURVEY.md §4 "skew handling", north-rule mandate) — two-pass,
bounded memory at EVERY operator:
  - pass 1 aggregates a slim (bucket_size, hub=min doc_id) row per bucket:
    fixed-width aggregation state, map-side partial combine, safe for any
    bucket size.  Hot keys (size > cap) are the rare over-cap tail of the
    size distribution and broadcast to every task;
  - pass 2a (small buckets): members of hot buckets are removed by a
    MAP-SIDE broadcast anti-join BEFORE the collect_list exchange, so the
    shuffle never carries a hot bucket's members and every collected array
    is provably <= cap elements.  All C(size,2) pairs then explode from the
    sorted array via nested `transform` — whole-stage-codegen JVM, no
    Python.  (The former single-pass design collect_listed EVERY bucket; a
    degenerate boilerplate bucket — millions of byte-similar pages sharing
    one band key, the exact case the star rule exists for — materialized as
    one unspillable aggregation buffer / 2GB-limit array row.);
  - pass 2b (hot buckets): STAR pairing — every member pairs with the hub
    via the broadcast table, a purely map-side join + projection with NO
    exchange of the big side.  Star keeps the bucket connected for
    clustering with graph diameter 2 at n-1 edges instead of O(n^2);
    dropped all-pairs edges are recovered transitively through
    verification + clustering (hot buckets are near-identical docs by
    construction);
  - cost of the safety: the bucket stream is exchanged twice (partial-agg
    size rows + anti-joined collect buffers) instead of once, both slim,
    both skew-free; the hot lane that used to ride the same shuffle now
    rides none.  tests/test_pairs.py pins the plan shape;
  - hot-bucket cardinality and elided pair counts are reported in
    bucket_stats (no-silent-caps rule).

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
    cache_buckets: bool = True,
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
    cap = _cap_expr(bucket_cap)
    sz = F.col("bucket_size")

    # The slim bucket stream feeds three consumers (sizes aggregate, small-
    # bucket collect, hot-bucket star join).  Standalone lanes (bare
    # signing -> buckets) persist it so the Python signing stage never
    # re-executes per consumer; the PIPELINE passes cache_buckets=False
    # because its signatures stage is already checkpointed/cached — there
    # the recompute is a cheap cache-scan + explode, and skipping this
    # cache keeps leg-scale memory at the round-2 envelope (measured at a
    # 4M-doc corpus: cache spill lands on the tmpfs scratch dir, i.e. RAM —
    # an extra ~25 GB here pushed total scratch to 99 GB and the kernel
    # OOM-killed the JVM).
    if cache_buckets:
        buckets = buckets.persist()
        if persists is not None:
            persists.append(buckets)

    # Pass 1 — slim (size, hub) row per bucket.  Fixed-width aggregation
    # state (two scalars), map-side partial combine: safe for ANY bucket
    # size, and its exchange carries (key, count, min) partial rows — the
    # price of knowing which buckets are hot BEFORE anything buffers them.
    sizes = buckets.groupBy("band_key", "lane_id").agg(
        F.count("*").alias("bucket_size"),
        F.min("doc_id").alias("hub"),
    )
    # Hot buckets = the over-cap tail of the size distribution — rare by
    # construction (cardinality surfaced in bucket_stats.n_hot_buckets), so
    # the tiny key table broadcasts.  localCheckpoint is EAGER and is the
    # ONLY pass-1 materialization: the hot table feeds TWO broadcast joins
    # below, and Spark launches each broadcast build as its own concurrent
    # future — left lazy, both futures would race to materialize the same
    # upstream, running signing/explode twice CONCURRENTLY and doubling
    # peak memory (measured: the duplicated materialization at 4M docs
    # pushed the JVM to 71 GB anon-rss on a 24 GB heap; kernel OOM-kill).
    # Nothing multi-GB is cached: the size aggregate itself stays a lazy
    # plan (its shuffle files are transient) and only the few hot rows
    # materialize.
    hot = F.broadcast(
        sizes.filter(sz > cap).select("band_key", "lane_id", "hub").localCheckpoint()
    )

    # Pass 2a — small buckets (2 <= size <= cap): members of hot buckets are
    # removed by a MAP-SIDE broadcast anti-join BEFORE the collect_list's
    # exchange, so (a) the shuffle never carries a hot bucket's members and
    # (b) every collected array is provably <= cap elements — a degenerate
    # boilerplate bucket can no longer materialize as one unspillable
    # aggregation buffer (ADVICE r2).  Then JVM all-pairs from the sorted
    # array (pair order a < b, bit-identical to the per-row formulation).
    small_grouped = (
        buckets.join(hot, on=["band_key", "lane_id"], how="left_anti")
        .groupBy("band_key", "lane_id")
        .agg(F.array_sort(F.collect_list(F.col("doc_id"))).alias("members"))
    )
    pairs_small = (
        small_grouped.filter(F.size("members") >= 2)
        .select("lane_id", F.explode(_pair_structs(F.col("members"))).alias("pair"))
        .select("pair.a", "pair.b", "lane_id")
    )
    # Pass 2b — hot buckets: star to the hub via the broadcast table — a
    # purely map-side join + projection, NO exchange of the big side at all.
    # Row-wise and spillable; a < b holds because hub is the bucket min.
    pairs_star = (
        buckets.join(hot, on=["band_key", "lane_id"])
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("a"), F.col("doc_id").alias("b"), "lane_id")
    )
    pairs = pairs_small.unionByName(pairs_star)
    if dedup:
        pairs = pairs.dropDuplicates(["a", "b", "lane_id"])

    # stats: one slim row per bucket — partial agg collapses to the 3
    # lanes map-side, so the stats shuffle is a handful of rows.  The sizes
    # plan is NOT cached (see above), so consuming stats re-runs its
    # exchange — stats is a diagnostic read at most once per run.
    per_bucket = sizes.withColumn("cap", cap)
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
