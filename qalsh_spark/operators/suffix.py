"""Exact-substring duplicate lane ("distributed suffix-array pass").

A true suffix array is a single giant sorted structure — the reference's
closest relative is the bulkload-sorted projection table + sibling-linked
leaf sweep (/root/reference/methods/qalsh.h:285-307, 622-828: sort once, then
walk neighbors in order).  The scalable Spark reimagination:

  1. per document, sample suffix start positions at CONTENT-DEFINED anchors
     (rolling hash of the preceding 16 bytes ≡ 0 mod gap — winnowing-style).
     Content-defined means two documents sharing a >=run_min verbatim run
     place anchors at the same content offsets inside the run, so they emit
     comparable suffixes without any global alignment;
  2. bucket suffixes by their first `suffix_prefix` chars — any two suffixes
     with LCP >= lcp_min (> suffix_prefix) are necessarily in the same
     bucket, so equality bucketing replaces the global sort + neighbor sweep
     and REUSES the generic skew-safe pair operator (operators/pairs.py:
     bounded JVM all-pairs for small buckets, star-to-hub for hot boilerplate
     prefixes) with the suffix string as the pair payload;
  3. verify LCP >= lcp_min on each (suffix_a, suffix_b) pair — a vectorized
     Arrow batch UDF over pair rows (not per-group pandas) — and emit the
     (doc_a, doc_b) edge, lane='suffix'.

No global orderBy, no single-partition window, no unbounded collect —
the whole lane is groupBy-shaped and AQE/skew-safe.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from qalsh_spark import kernels as K
from qalsh_spark.config import DedupConfig
from qalsh_spark.operators.pairs import candidate_pairs_from_buckets

_SUFFIX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("suffix", T.StringType()),
    ]
)

SUFFIX_BUCKET_CAP = 32


def _emit_suffixes(cfg: DedupConfig):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            sufs: list[str] = []
            for doc_id, text in zip(pdf["doc_id"].to_numpy(), pdf["text"].to_numpy()):
                for s in K.suffixes_for_text(
                    text or "",
                    cfg.suffix_window,
                    cfg.suffix_gap,
                    cfg.suffix_len,
                    cfg.lcp_min,
                ):
                    ids.append(int(doc_id))
                    sufs.append(s)
            yield pd.DataFrame({"doc_id": ids, "suffix": sufs}).astype(
                {"doc_id": "int64"}
            )

    return fn


@F.pandas_udf(T.IntegerType())
def lcp_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    out = np.empty(len(a), dtype=np.int32)
    for i in range(len(a)):
        out[i] = K.lcp(a.iat[i] or "", b.iat[i] or "")
    return pd.Series(out)


def substring_candidate_pairs(
    documents_with_id: DataFrame,
    cfg: DedupConfig,
    bucket_cap: int = SUFFIX_BUCKET_CAP,
) -> DataFrame:
    """documents(doc_id, text) -> suffix-lane pairs(a, b, lane='suffix'),
    LCP-verified."""
    suffixes = documents_with_id.select("doc_id", "text").mapInPandas(
        _emit_suffixes(cfg), schema=_SUFFIX_SCHEMA
    )
    # deterministic representative per (doc, bucket): the MIN suffix — the
    # oracle replicates this rule (arbitrary dropDuplicates would break
    # cross-engine parity)
    buckets = (
        suffixes.withColumn(
            "band_key", F.xxhash64(F.substring("suffix", 1, cfg.suffix_prefix))
        )
        .groupBy("doc_id", "band_key")
        .agg(F.min("suffix").alias("suffix"))
        .select(
            "doc_id",
            F.lit("suffix").alias("lane"),
            F.lit(0).alias("band_id"),
            "band_key",
            "suffix",
        )
    )
    pairs, _stats = candidate_pairs_from_buckets(
        buckets, bucket_cap=bucket_cap, payload_col="suffix", dedup=False
    )
    verified = pairs.withColumn(
        "lcp", lcp_udf(F.col("payload_a"), F.col("payload_b"))
    ).filter(F.col("lcp") >= cfg.lcp_min)
    return verified.select("a", "b", "lane").dropDuplicates(["a", "b"])
