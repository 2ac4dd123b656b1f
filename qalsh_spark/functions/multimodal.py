"""Multimodal (binary) column operators for training-data pipelines.

The reference engine has no binary/media handling (its only payload is a
dense numeric matrix, /root/reference/methods/main.cc:92-93); these are the
additive operators a web-scale corpus pipeline needs for image/audio/video
columns stored as opaque `binary` with typed metadata.

Design per the 100 TB posture:
  - media rows never leave the JVM unless a Python kernel is genuinely
    needed; type sniffing and frame slicing are pure Spark SQL expressions
    (whole-stage codegen over the binary column);
  - Python work (byte statistics, decode) is Arrow-batched `mapInPandas`
    with NumPy vectorization inside the batch — same discipline as the
    signing stage;
  - actual image/audio DECODE requires codec libraries not present in this
    environment, so `decode_image_meta` is STUBBED: with `fake=True`
    (default) it returns a deterministic pseudo-decode derived from the
    content hash (stable across runs, good enough to exercise schema,
    partitioning and batch shape); with `fake=False` it attempts a real
    Pillow decode and raises NotImplementedError when Pillow is absent.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame

# --- JVM-side (no Python) ----------------------------------------------------

_MAGIC = [
    ("FFD8FF", "image/jpeg"),
    ("89504E47", "image/png"),
    ("47494638", "image/gif"),
    ("52494646", "audio/riff"),      # RIFF container (wav/avi)
    ("494433", "audio/mpeg"),        # ID3-tagged mp3
    ("1A45DFA3", "video/webm"),      # EBML (webm/mkv)
    ("3C68746D6C", "text/html"),
    ("3C21444F43", "text/html"),     # <!DOC...
]


def sniff_media_type(content: Column) -> Column:
    """Magic-byte media-type sniffing — pure JVM (hex prefix match), no UDF."""
    h = F.hex(F.substring(content, 1, 8))
    expr = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        expr = F.when(h.startswith(magic.upper()), F.lit(mime)).otherwise(expr)
    return F.when(content.isNull(), F.lit(None).cast("string")).otherwise(expr)


def frame_sample(content: Column, frame_size: int, stride: int, max_frames: int = 16) -> Column:
    """Deterministic fixed-stride chunk sampling from a binary column (the
    video frame-sampling plumbing: real frame extraction would replace the
    substring with a codec UDF, the partitioning/shape is identical).
    Returns array<binary> of up to max_frames chunks — computed JVM-side."""
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest(
            F.lit(0),
            (
                F.floor((F.octet_length(content) - F.lit(frame_size)) / F.lit(stride))
                + 1
            ).cast("int"),
        ),
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substring(content, i * stride + 1, frame_size),
    )
    # sequence(0, -1) DESCENDS in Spark — guard the empty case explicitly
    return F.when(n_frames > 0, frames).otherwise(
        F.array().cast("array<binary>")
    )


# --- Arrow-batched Python kernels -------------------------------------------

_BYTE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("ascii_ratio", T.DoubleType()),
    ]
)


def byte_stats(media: DataFrame, id_col: str = "doc_id", content_col: str = "html") -> DataFrame:
    """Vectorized per-blob byte statistics (size, Shannon entropy over byte
    histogram, mean byte value, printable-ASCII ratio) — the cheap
    feature-extraction pass that needs no codec.  mapInPandas; inside each
    batch the per-blob math is NumPy (bincount over a frombuffer view)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "doc_id": pdf[id_col].to_numpy(),
                "n_bytes": np.zeros(n, np.int32),
                "byte_entropy": np.zeros(n, np.float64),
                "mean_byte": np.zeros(n, np.float64),
                "ascii_ratio": np.zeros(n, np.float64),
            }
            for i, blob in enumerate(pdf[content_col].to_numpy()):
                if blob is None or len(blob) == 0:
                    continue
                a = np.frombuffer(blob, dtype=np.uint8)
                counts = np.bincount(a, minlength=256)
                p = counts[counts > 0] / len(a)
                out["n_bytes"][i] = len(a)
                out["byte_entropy"][i] = float(-(p * np.log2(p)).sum())
                out["mean_byte"][i] = float(a.mean())
                out["ascii_ratio"][i] = float(
                    ((a >= 32) & (a < 127)).sum() / len(a)
                )
            yield pd.DataFrame(out)

    narrow = media.select(F.col(id_col).alias("doc_id"), F.col(content_col))
    if not narrow.isStreaming:
        target = narrow.sparkSession.sparkContext.defaultParallelism
        if len(narrow.inputFiles()) < target:
            narrow = narrow.repartition(target)
    return narrow.mapInPandas(fn, schema=_BYTE_STATS_SCHEMA)


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def decode_image_meta(
    media: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    fake: bool = True,
) -> DataFrame:
    """Image decode -> (width, height, channels).

    STUB NOTE: this container has no image codecs.  fake=True (default)
    derives deterministic pseudo-dimensions from md5(content) — stable
    across runs/partitionings, so schema/batching/partitioning behavior is
    fully exercised and testable.  fake=False attempts a real Pillow decode
    and raises NotImplementedError if Pillow is unavailable; swapping the
    fake for the real decoder changes NOTHING outside the inner function.
    """
    if not fake:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "real image decode needs Pillow, which is not installed; "
                "use fake=True for the deterministic stub"
            ) from e

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            n = len(pdf)
            out = {
                "doc_id": pdf[id_col].to_numpy(),
                "width": np.zeros(n, np.int32),
                "height": np.zeros(n, np.int32),
                "channels": np.zeros(n, np.int32),
                "decode_ok": np.zeros(n, bool),
            }
            for i, blob in enumerate(pdf[content_col].to_numpy()):
                if blob is None or len(blob) == 0:
                    continue
                if fake:
                    d = hashlib.md5(bytes(blob)).digest()
                    out["width"][i] = 64 + d[0] * 8
                    out["height"][i] = 64 + d[1] * 8
                    out["channels"][i] = 1 + (d[2] % 4)
                    out["decode_ok"][i] = True
                else:  # pragma: no cover (no codec in-container)
                    import PIL.Image

                    try:
                        img = PIL.Image.open(io.BytesIO(blob))
                        out["width"][i] = img.width
                        out["height"][i] = img.height
                        out["channels"][i] = len(img.getbands())
                        out["decode_ok"][i] = True
                    except Exception:
                        out["decode_ok"][i] = False
            yield pd.DataFrame(out)

    narrow = media.select(F.col(id_col).alias("doc_id"), F.col(content_col))
    return narrow.mapInPandas(fn, schema=_DECODE_SCHEMA)
