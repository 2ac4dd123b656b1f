"""Multimodal (binary column) operator tests: sniffing, frame sampling,
byte stats vs a direct NumPy computation, deterministic fake decode."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from qalsh_spark.functions.multimodal import (
    byte_stats,
    decode_image_meta,
    frame_sample,
    sniff_media_type,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\xff\xd8\xff\xe0" + b"jfif" * 50),
        (2, b"\x89PNG\r\n\x1a\n" + bytes(range(200))),
        (3, b"GIF89a" + b"\x00" * 100),
        (4, b"RIFF\x24\x08\x00\x00WAVE" + b"\x01" * 64),
        (5, b"ID3\x04\x00" + b"\x02" * 64),
        (6, b"\x1a\x45\xdf\xa3" + b"\x03" * 64),
        (7, b"<html><body>hi</body></html>"),
        (8, b"<!DOCTYPE html><p>x</p>"),
        (9, b"just some plain bytes here"),
        (10, None),
        (11, b""),
    ]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_sniff_media_type(media):
    got = {
        r["doc_id"]: r["mt"]
        for r in media.select(
            "doc_id", sniff_media_type(F.col("content")).alias("mt")
        ).collect()
    }
    assert got[1] == "image/jpeg"
    assert got[2] == "image/png"
    assert got[3] == "image/gif"
    assert got[4] == "audio/riff"
    assert got[5] == "audio/mpeg"
    assert got[6] == "video/webm"
    assert got[7] == "text/html"
    assert got[8] == "text/html"
    assert got[9] == "application/octet-stream"
    assert got[10] is None
    assert got[11] == "application/octet-stream"


def test_frame_sample_counts(media):
    out = media.select(
        "doc_id",
        F.size(frame_sample(F.col("content"), 16, 8, max_frames=5)).alias("n"),
    ).collect()
    got = {r["doc_id"]: r["n"] for r in out}
    # doc 1: 204 bytes -> (204-16)/8+1 = 24 -> capped at 5
    assert got[1] == 5
    # doc 7: 28 bytes -> floor((28-16)/8)+1 = 2
    assert got[7] == 2
    # doc 11 (empty): 0 frames
    assert got[11] == 0


def test_frame_contents_are_strided(spark):
    blob = bytes(range(64))
    df = spark.createDataFrame([(1, blob)], "doc_id long, content binary")
    frames = df.select(
        frame_sample(F.col("content"), 16, 8, max_frames=3).alias("f")
    ).first()["f"]
    assert len(frames) == 3
    assert bytes(frames[0]) == blob[0:16]
    assert bytes(frames[1]) == blob[8:24]
    assert bytes(frames[2]) == blob[16:32]


def test_byte_stats_match_numpy(media):
    out = {
        r["doc_id"]: r
        for r in byte_stats(media, content_col="content").collect()
    }
    blob = b"\xff\xd8\xff\xe0" + b"jfif" * 50
    a = np.frombuffer(blob, dtype=np.uint8)
    counts = np.bincount(a, minlength=256)
    p = counts[counts > 0] / len(a)
    want_entropy = float(-(p * np.log2(p)).sum())
    r = out[1]
    assert r["n_bytes"] == len(blob)
    assert math.isclose(r["byte_entropy"], want_entropy, rel_tol=1e-9)
    assert math.isclose(r["mean_byte"], float(a.mean()), rel_tol=1e-9)
    # null/empty rows produce zeros, not crashes
    assert out[10]["n_bytes"] == 0
    assert out[11]["n_bytes"] == 0


def test_fake_decode_deterministic(media):
    a = {r["doc_id"]: (r["width"], r["height"], r["channels"])
         for r in decode_image_meta(media, content_col="content", mode="fake").collect()}
    b = {r["doc_id"]: (r["width"], r["height"], r["channels"])
         for r in decode_image_meta(
             media.repartition(4), content_col="content", mode="fake"
         ).collect()}
    assert a == b  # stable across partitionings
    assert all(64 <= w <= 64 + 255 * 8 for (w, _, _) in
               [v for k, v in a.items() if k not in (10, 11)])


def test_pillow_mode_raises_without_pillow(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; stub gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image_meta(media, content_col="content", mode="pillow")


def test_header_parser_real_formats():
    """The dependency-free parser must read back the exact dimensions of
    fully valid synthesized PNG/BMP files, GIF and JPEG headers, and reject
    junk."""
    import struct

    from qalsh_spark.functions.multimodal import (
        parse_image_header,
        synth_bmp,
        synth_png,
    )

    assert parse_image_header(synth_png(33, 21)) == (33, 21, 3)
    assert parse_image_header(synth_bmp(47, 17)) == (47, 17, 3)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_image_header(gif) == (320, 200, 3)
    # minimal JPEG: SOI + APP0 segment + SOF0 frame header
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", 99, 123
    ) + b"\x03"
    assert parse_image_header(b"\xff\xd8" + app0 + sof0) == (123, 99, 3)
    assert parse_image_header(b"not an image at all") is None
    assert parse_image_header(b"") is None


def test_real_decode_end_to_end(spark):
    """Spark-side decode of REAL (fully valid) image bytes: synthesized
    PNG/BMP blobs come back with their true dimensions; junk rows get
    decode_ok=False."""
    from qalsh_spark.functions.multimodal import synth_bmp, synth_png

    rows = [
        (0, bytearray(synth_png(20, 10))),
        (1, bytearray(synth_bmp(31, 7))),
        (2, bytearray(b"\x89PNG truncated")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["channels"], r["decode_ok"])
        for r in decode_image_meta(df, content_col="content").collect()
    }
    assert got[0] == (20, 10, 3, True)
    assert got[1] == (31, 7, 3, True)
    assert got[2][3] is False and got[3][3] is False


def test_pillow_parity_when_available():
    """When Pillow IS installed the auto path must agree with the header
    parser on the synthesized files (skip-marked otherwise)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    from qalsh_spark.functions.multimodal import parse_image_header, synth_bmp, synth_png

    for blob in (synth_png(24, 12), synth_bmp(13, 9)):
        img = PIL.open(io.BytesIO(blob))
        assert parse_image_header(blob) == (img.width, img.height, len(img.getbands()))
