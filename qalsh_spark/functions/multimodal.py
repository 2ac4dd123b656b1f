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
  - image DECODE is real: `decode_image_meta` parses PNG / BMP / GIF / JPEG
    headers with a dependency-free pure-Python parser (public file formats:
    PNG IHDR, BMP BITMAPINFOHEADER, GIF logical screen descriptor, JPEG SOF
    markers) and upgrades to Pillow automatically when it is installed
    (mode="auto").  `synth_png` / `synth_bmp` build fully valid minimal
    image files (stdlib zlib/struct only) so the decode path is exercised
    end-to-end against real bytes even in this codec-free container.  The
    former hash-derived stub survives as mode="fake" for pure
    schema/batching tests.
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


# --- minimal REAL image encoders (stdlib only) -------------------------------

def synth_png(width: int, height: int, rgb: tuple[int, int, int] = (40, 90, 200)) -> bytes:
    """Fully valid minimal 8-bit RGB PNG (correct CRCs, zlib IDAT) — real
    bytes for the decode path without any codec dependency."""
    import binascii
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # RGB, 8-bit
    row = b"\x00" + bytes(rgb) * width  # filter 0 per scanline
    idat = zlib.compress(row * height)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def synth_bmp(width: int, height: int, bgr: tuple[int, int, int] = (200, 90, 40)) -> bytes:
    """Fully valid minimal 24-bit BMP (BITMAPINFOHEADER, 4-byte row pad)."""
    import struct

    pad = (4 - (3 * width) % 4) % 4
    row = bytes(bgr) * width + b"\x00" * pad
    pix = row * height
    file_header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return file_header + info_header + pix


def parse_image_header(blob: bytes) -> tuple[int, int, int] | None:
    """Dependency-free (width, height, channels) from PNG / BMP / GIF / JPEG
    headers; None when the bytes are not a recognized image.  These are
    public, fixed-layout formats: PNG IHDR (big-endian dims at offset 16,
    channels from color type), BMP BITMAPINFOHEADER (little-endian at 18),
    GIF logical screen descriptor (little-endian uint16 at 6), JPEG SOFn
    marker scan (big-endian dims + component count)."""
    import struct

    b = bytes(blob)
    if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        color_type = b[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            return None
        return int(w), int(h), channels
    if len(b) >= 30 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        return int(w), abs(int(h)), max(1, bpp // 8)
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return int(w), int(h), 3
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        # walk JPEG segments to the first SOF0/1/2 frame header
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return int(w), int(h), b[i + 9]
            i += 2 + seg_len
    return None


def decode_image_meta(
    media: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    mode: str = "auto",
    fake: bool | None = None,
) -> DataFrame:
    """Image decode -> (width, height, channels, decode_ok).

    mode="auto" (default): use Pillow when installed, else the built-in
    pure-Python header parser (parse_image_header) — a REAL decode of real
    bytes either way; unrecognized blobs get decode_ok=False.
    mode="pillow": require Pillow (NotImplementedError when absent).
    mode="header": force the dependency-free parser.
    mode="fake": the legacy deterministic hash-derived stub (kept for pure
    schema/batch-shape tests).  `fake=True` is a back-compat alias."""
    if fake is not None:  # legacy kw
        mode = "fake" if fake else "auto"
    use_pillow = False
    if mode in ("auto", "pillow"):
        try:
            import PIL.Image  # noqa: F401

            use_pillow = True
        except ImportError as e:
            if mode == "pillow":
                raise NotImplementedError(
                    "mode='pillow' needs Pillow, which is not installed; "
                    "mode='auto' falls back to the built-in header parser"
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
                if mode == "fake":
                    d = hashlib.md5(bytes(blob)).digest()
                    out["width"][i] = 64 + d[0] * 8
                    out["height"][i] = 64 + d[1] * 8
                    out["channels"][i] = 1 + (d[2] % 4)
                    out["decode_ok"][i] = True
                elif use_pillow:  # pragma: no cover (no codec in-container)
                    import PIL.Image

                    try:
                        img = PIL.Image.open(io.BytesIO(blob))
                        out["width"][i] = img.width
                        out["height"][i] = img.height
                        out["channels"][i] = len(img.getbands())
                        out["decode_ok"][i] = True
                    except Exception:
                        out["decode_ok"][i] = False
                else:
                    meta = parse_image_header(bytes(blob))
                    if meta is not None:
                        out["width"][i], out["height"][i], out["channels"][i] = meta
                        out["decode_ok"][i] = True
            yield pd.DataFrame(out)

    narrow = media.select(F.col(id_col).alias("doc_id"), F.col(content_col))
    return narrow.mapInPandas(fn, schema=_DECODE_SCHEMA)
