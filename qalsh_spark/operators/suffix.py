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
     with LCP >= lcp_min (> suffix_prefix) are necessarily in the same bucket,
     so equality bucketing replaces the global sort + neighbor sweep (and
     reuses the exact skew machinery of operators/pairs.py);
  3. within a bucket, verify LCP >= lcp_min on the (suffix_a, suffix_b) pair
     and emit the (doc_a, doc_b) edge, lane='suffix'.

No global orderBy, no single-partition window — the whole lane is
groupBy-shaped and AQE/skew-safe.
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

_SUFFIX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("suffix", T.StringType()),
    ]
)

_SUFFIX_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("lcp", T.IntegerType()),
    ]
)


def _emit_suffixes(cfg: DedupConfig):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            sufs: list[str] = []
            for doc_id, text in zip(
                pdf["doc_id"].to_numpy(), pdf["text"].to_numpy()
            ):
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


def _bucket_pairs(cfg: DedupConfig):
    """Within one prefix bucket: pair suffixes from DISTINCT docs, verify LCP.
    Buckets are pre-capped upstream (same star/cap discipline as pairs.py is
    unnecessary here because we first dropDuplicates per (doc, bucket) and cap
    group size via sampling in SQL before this runs)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # one suffix per doc per bucket (they share the bucket prefix anyway)
        pdf = pdf.sort_values(["doc_id", "suffix"]).drop_duplicates("doc_id")
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"a": [], "b": [], "lcp": []}).astype(
                {"a": "int64", "b": "int64", "lcp": "int32"}
            )
        ids = pdf["doc_id"].to_numpy(np.int64)
        sufs = pdf["suffix"].to_numpy()
        order = np.argsort(ids)
        ids, sufs = ids[order], sufs[order]
        iu, ju = np.triu_indices(n, k=1)
        lcps = np.fromiter(
            (K.lcp(sufs[i], sufs[j]) for i, j in zip(iu, ju)),
            dtype=np.int32,
            count=len(iu),
        )
        keep = lcps >= cfg.lcp_min
        return pd.DataFrame({"a": ids[iu][keep], "b": ids[ju][keep], "lcp": lcps[keep]})

    return fn


def substring_candidate_pairs(
    documents_with_id: DataFrame, cfg: DedupConfig, bucket_cap: int = 32
) -> DataFrame:
    """documents(doc_id, text) -> suffix-lane pairs(a, b, lane='suffix').

    Hot prefix buckets (shared boilerplate openings) are capped: we keep the
    `bucket_cap` lexicographically-smallest (doc_id-smallest) members per
    bucket via a window rank — boilerplate runs recur across thousands of
    docs and are exact dups that the minhash/exact lanes already link;
    the elided count is observable in lineage via the rank column.
    """
    suffixes = documents_with_id.select("doc_id", "text").mapInPandas(
        _emit_suffixes(cfg), schema=_SUFFIX_SCHEMA
    )
    # deterministic representative per (doc, bucket): the MIN suffix — the
    # oracle replicates this rule exactly (arbitrary dropDuplicates would
    # break cross-engine parity).
    bucketed = (
        suffixes.withColumn(
            "bucket", F.xxhash64(F.substring("suffix", 1, cfg.suffix_prefix))
        )
        .groupBy("doc_id", "bucket")
        .agg(F.min("suffix").alias("suffix"))
    )

    from pyspark.sql import Window

    w = Window.partitionBy("bucket").orderBy("doc_id", "suffix")
    capped = (
        bucketed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= bucket_cap)
        .drop("rk")
    )
    pairs = (
        capped.groupBy("bucket")
        .applyInPandas(_bucket_pairs(cfg), schema=_SUFFIX_PAIR_SCHEMA)
        .dropDuplicates(["a", "b"])
        .select("a", "b", F.lit("suffix").alias("lane"))
    )
    return pairs
