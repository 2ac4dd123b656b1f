"""Band explosion: signatures -> (doc_id, lane, band_id, band_key) bucket rows.

This is the distributed reimagination of the reference's m sorted projection
tables (/root/reference/methods/qalsh.h:285-307): instead of m B+-trees probed
per query, all m=bands bucket memberships are materialized at once and
Catalyst's shuffle groups colliding documents — "all points whose projection
falls in the same query-anchored bucket" (methods/qalsh.h:435-468) becomes
"all docs whose band key is equal".

posexplode is JVM-side (whole-stage codegen) — no Python here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def explode_minhash_bands(signatures: DataFrame) -> DataFrame:
    return signatures.select(
        "doc_id",
        F.lit("minhash").alias("lane"),
        F.posexplode("band_keys").alias("band_id", "band_key"),
    )


def explode_simhash_bands(signatures: DataFrame) -> DataFrame:
    """SimHash pigeonhole bands: docs at Hamming distance <= (n_bands-1) share
    at least one band chunk, so equality bucketing finds them."""
    return signatures.select(
        "doc_id",
        F.lit("simhash").alias("lane"),
        F.posexplode("simhash_keys").alias("band_id", "band_key"),
    )


def explode_all_bands(
    signatures: DataFrame,
    include_simhash: bool = True,
    include_suffix: bool = False,
) -> DataFrame:
    """All lanes in ONE scan of the signatures table.

    A self-union of the per-lane selects would defeat Spark's
    cache/exchange reuse (plan canonicalization misses across union branches —
    measured ~50x recompute cost), so the lanes are concatenated per-row into
    one array<struct> and exploded JVM-side."""

    def lane(col: str, name: str) -> "F.Column":
        return F.transform(
            col,
            lambda k, i: F.struct(
                F.lit(name).alias("lane"),
                (i if name != "suffix" else F.lit(0)).cast("int").alias("band_id"),
                k.alias("band_key"),
            ),
        )

    parts = [lane("band_keys", "minhash")]
    if include_simhash:
        parts.append(lane("simhash_keys", "simhash"))
    if include_suffix:
        parts.append(lane("suffix_keys", "suffix"))
    combined = F.concat(*parts) if len(parts) > 1 else parts[0]
    return signatures.select(
        "doc_id", F.explode(combined).alias("band")
    ).select("doc_id", "band.lane", "band.band_id", "band.band_key")
