"""Candidate verification — the analog of QALSH reading the raw point and
computing the exact l_p distance once a candidate's collision count passes
the threshold (/root/reference/methods/qalsh.h:444-446, exact kernels at
methods/util.h:211-464).

Here the "raw point fetch" (1 page I/O in the reference, methods/util.h:171-193)
is a columnar self-join of the candidate edge list against the signatures
table on doc_id — sort-merge/shuffle-hash at scale, broadcast when small;
and the "exact distance" is exact Jaccard over shingle sets (vectorized
pandas UDF) plus Hamming over simhash, which is pure JVM SQL:
`bit_count(a ^ b)` — no Python at all for the simhash lane.

A JVM-side prefilter runs before the Python jaccard: positionwise minhash
agreement (zip_with + aggregate, whole-stage codegen) estimates Jaccard and
discards pairs that cannot plausibly reach the threshold — the moral analog
of the reference's early-exit distance accumulation (methods/util.h:261-262),
done batch-wise instead of element-wise.
"""

from __future__ import annotations

import pandas as pd
import numpy as np
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from qalsh_spark import kernels as K
from qalsh_spark.config import DedupConfig


@F.pandas_udf(T.DoubleType())
def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        out[i] = K.jaccard_sorted(
            np.asarray(a.iat[i], dtype=np.int64), np.asarray(b.iat[i], dtype=np.int64)
        )
    return pd.Series(out)


def minhash_agreement(col_a: str, col_b: str):
    """Fraction of positions where two minhash arrays agree — an unbiased
    Jaccard estimator, computed entirely JVM-side."""
    return F.aggregate(
        F.zip_with(F.col(col_a), F.col(col_b), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size(F.col(col_a))


def verify_pairs(
    pairs: DataFrame,
    signatures: DataFrame,
    cfg: DedupConfig,
    prefilter_margin: float = 0.2,
) -> DataFrame:
    """pairs(a,b,lane) x signatures -> edges(a, b, lane, jaccard, hamming)
    for pairs passing their lane's threshold.

    Per-lane acceptance (the oracle mirrors these rules exactly):
      minhash: exact Jaccard >= cfg.jaccard_threshold
      simhash: bit_count(xor) <= cfg.hamming_max (catches localized edits
               that shingle Jaccard under-scores)
      suffix:  pre-verified upstream by the LCP check — always kept
    """
    sig = signatures.select("doc_id", "shingles", "minhash", "simhash")
    j = (
        pairs.join(sig.withColumnRenamed("doc_id", "a"), on="a")
        .withColumnsRenamed(
            {"shingles": "sh_a", "minhash": "mh_a", "simhash": "fp_a"}
        )
        .join(sig.withColumnRenamed("doc_id", "b"), on="b")
        .withColumnsRenamed(
            {"shingles": "sh_b", "minhash": "mh_b", "simhash": "fp_b"}
        )
    )
    j = j.withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
    j = j.withColumn("mh_est", minhash_agreement("mh_a", "mh_b"))

    # JVM prefilter: only minhash-lane pairs whose estimated Jaccard could
    # plausibly reach the gate pay the Python exact-Jaccard cost.
    est_ok = F.col("mh_est") >= F.lit(cfg.jaccard_threshold - prefilter_margin)
    is_minhash = F.col("lane") == F.lit("minhash")
    is_simhash = F.col("lane") == F.lit("simhash")
    is_suffix = F.col("lane") == F.lit("suffix")
    passes_simhash = F.col("hamming") <= F.lit(cfg.hamming_max)
    j = j.filter((is_minhash & est_ok) | is_simhash | is_suffix)

    j = j.withColumn(
        "jaccard",
        F.when(est_ok, jaccard_udf(F.col("sh_a"), F.col("sh_b"))).otherwise(
            F.lit(0.0)
        ),
    )

    passes_jaccard = F.col("jaccard") >= F.lit(cfg.jaccard_threshold)
    edges = j.filter(
        (is_minhash & passes_jaccard) | (is_simhash & passes_simhash) | is_suffix
    ).select("a", "b", "lane", "jaccard", "hamming")
    # One edge per (a,b): keep the strongest evidence, fold lanes.
    return (
        edges.groupBy("a", "b")
        .agg(
            F.max("jaccard").alias("jaccard"),
            F.min("hamming").alias("hamming"),
            F.array_sort(F.collect_set("lane")).alias("lanes"),
        )
    )
