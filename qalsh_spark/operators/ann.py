"""Approximate / exact nearest-neighbor search over an embedding column —
the direct parity lane with the reference's c-k-ANNS mission
(/root/reference/methods/qalsh.h:25-32, README.md:5-9).

Three tiers:
  1. `brute_force_topk` — exact top-k by cosine/L2, the analog of the
     reference's ground-truth linear scan `-alg 0` / `-alg 5`
     (/root/reference/methods/ann.h:17-48, 52-103).  crossJoin + JVM-side
     zip_with/aggregate arithmetic + window top-k: fine for ground truth and
     small query sets, O(n*q) by design.
  2. `random_projection_buckets` + `lsh_topk` — the QALSH concept mapping:
     project every vector onto m seeded random hyperplanes (sign bits =
     SRP-LSH, the cosine analog of the p-stable projection at
     methods/qalsh.h:118-120), bucket by the sign prefix, and only score
     candidates that collide in >= 1 of the band groups (the collision-count
     filter, methods/qalsh.h:442-447).  Escalation to coarser prefixes plays
     the role of virtual rehashing (methods/qalsh.h:844-871).
  3. `ivf_topk` — IVF-style: k-means-lite centroids (seeded sample), route
     each vector to nearest centroid, probe the closest `nprobe` cells per
     query — the scale path for 100 TB embedding tables (the analog of
     QALSH+'s kd-tree block pruning, methods/qalsh_plus.h:230-250, 568-598).

All distance arithmetic is computed with built-in pyspark.sql.functions
(whole-stage codegen) — no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def l2_sqr(a, b):
    """Exact squared L2 — the vectorized stand-in for the reference's
    unrolled early-exit kernel (/root/reference/methods/util.h:211-276)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k per query. Result: (qid, neighbor_id, score, rank).
    Ties broken by neighbor id — mirrors the reference's (dist, id) ordering
    (/root/reference/methods/pri_queue.cc:51-80)."""
    joined = queries.crossJoin(vectors)
    if metric == "cosine":
        score = cosine_sim(F.col(qvec_col), F.col(vec_col))
        order = [F.desc("score"), F.asc("neighbor_id")]
    else:
        score = l2_sqr(F.col(qvec_col), F.col(vec_col))
        order = [F.asc("score"), F.asc("neighbor_id")]
    scored = joined.select(
        F.col(qid_col).alias("qid"),
        F.col(id_col).alias("neighbor_id"),
        score.alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def srp_signature(vec_col, planes: np.ndarray):
    """Sign-bit signature under seeded random hyperplanes, as an array of
    0/1 ints computed JVM-side: sign(<plane_i, v>).  planes is a (m, d)
    NumPy array baked into the plan as literals (m*d is small)."""
    bits = []
    for i in range(planes.shape[0]):
        lit = F.array(*[F.lit(float(x)) for x in planes[i]])
        bits.append((_dot(lit, vec_col) > 0).cast("int"))
    return F.array(*bits)


def srp_planes(m: int, d: int, seed: int = 6) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, d))


def random_projection_buckets(
    vectors: DataFrame,
    planes: np.ndarray,
    bands: int,
    rows: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band_id, band_key) bucket rows from SRP sign bands — the
    embedding-space twin of operators/banding.py."""
    sig = vectors.select(
        F.col(id_col).alias("vec_id"), srp_signature(F.col(vec_col), planes).alias("bits")
    )
    bandkeys = sig.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band_id"),
                    F.xxhash64(
                        b, F.slice(F.col("bits"), b * rows + 1, rows).cast("string")
                    ).alias("band_key"),
                ),
            )
        ).alias("bk"),
    )
    return bandkeys.select("vec_id", "bk.band_id", "bk.band_key")


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 16,
    bands: int = 4,
    seed: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing >= 1 SRP band with the
    query (collision filter), then exact cosine on the candidates.
    Result schema matches brute_force_topk."""
    d = len(vectors.select(vec_col).first()[0])
    rows = m // bands
    planes = srp_planes(m, d, seed)
    vb = random_projection_buckets(vectors, planes, bands, rows, id_col, vec_col)
    qb = random_projection_buckets(
        queries, planes, bands, rows, qid_col, qvec_col
    ).withColumnRenamed("vec_id", "qid")
    cand = (
        vb.join(qb, on=["band_id", "band_key"])
        .select("qid", "vec_id")
        .distinct()
    )
    scored = (
        cand.join(vectors.select(F.col(id_col).alias("vec_id"), vec_col), on="vec_id")
        .join(queries.select(F.col(qid_col).alias("qid"), qvec_col), on="qid")
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim(F.col(qvec_col), F.col(vec_col)).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """IVF: seeded-sample centroids (broadcast), assign vectors to nearest
    cell, per query probe the nprobe nearest cells only.  The centroid
    assignment is a broadcast crossJoin + min_by (no shuffle of the big
    side); the candidate join is an equi-join on cell id."""
    spark = vectors.sparkSession
    sample = vectors.select(vec_col).limit(1000).collect()
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
    cents = [(int(i), [float(x) for x in sample[j][0]]) for i, j in enumerate(idx)]
    cent_df = F.broadcast(
        spark.createDataFrame(cents, f"cell int, cvec array<double>")
    )

    def assign(df, idc, vc, top, out):
        scored = df.crossJoin(cent_df).select(
            F.col(idc), l2_sqr(F.col(vc).cast("array<double>"), F.col("cvec")).alias("d2"), "cell"
        )
        w = Window.partitionBy(idc).orderBy(F.asc("d2"), F.asc("cell"))
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= top)
            .select(F.col(idc), F.col("cell").alias(out))
        )

    vcell = assign(vectors, id_col, vec_col, 1, "cell")
    qcell = assign(queries, qid_col, qvec_col, nprobe, "cell")
    cand = (
        vcell.join(qcell, on="cell")
        .select(F.col(qid_col).alias("qid"), F.col(id_col).alias("vec_id"))
        .distinct()
    )
    scored = (
        cand.join(vectors.select(F.col(id_col).alias("vec_id"), vec_col), on="vec_id")
        .join(
            queries.select(F.col(qid_col).alias("qid"), qvec_col), on="qid"
        )
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim(F.col(qvec_col), F.col(vec_col)).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
