"""AVIF decode via the system libavif (skip-gated).

The engine binds libavif through ctypes (operators/avifcodec.py) —
the documented production pattern for codec-sized formats.  These
tests encode REAL AVIF payloads with the system encoder and drive
them through the engine's decode + probe surfaces.
"""

import numpy as np
import pytest

from legend_community_delta_spark.operators import multimodal as MM
from legend_community_delta_spark.operators.avifcodec import (
    decode_avif_bytes, encode_avif_rgb, libavif_available)

pytestmark = pytest.mark.skipif(
    not libavif_available(), reason="system libavif not available")


def _img(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 9) % 256, (yy * 13) % 256,
                     (xx + yy) % 256], -1).astype(np.uint8)


def test_avif_round_trip_close_and_right_shape():
    img = _img(24, 32)
    blob = encode_avif_rgb(img)
    assert blob[4:8] == b"ftyp" and blob[8:12] == b"avif"
    out = decode_avif_bytes(blob)
    assert out.shape == (24, 32, 3)
    # AV1 is lossy, but smooth gradients survive almost exactly
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_avif_through_decode_image_bytes_and_probe():
    img = _img(16, 16)
    blob = encode_avif_rgb(img)
    out = MM.decode_image_bytes(blob)
    assert out.shape[:2] == (16, 16)
    got = MM.probe_media_bytes(blob)
    assert got["format"] == "avif" and got["codec"] == "av01"
    assert (got["width"], got["height"]) == (16, 16)
    assert got["kind"] == "image"


def test_avif_alpha_channel_survives():
    h, w = 20, 28
    rgba = np.dstack([_img(h, w),
                      ((np.arange(h * w) * 7) % 256)
                      .reshape(h, w).astype(np.uint8)])
    blob = encode_avif_rgb(rgba)
    out = decode_avif_bytes(blob)
    assert out.shape == (h, w, 4)
    # alpha rides the lossless-ish aux plane: close to the input
    assert np.abs(out[..., 3].astype(int)
                  - rgba[..., 3].astype(int)).max() <= 8


def test_avif_malformed_payload_raises_not_crashes():
    bad = b"\x00\x00\x00\x20ftypavif" + b"\x00" * 64
    with pytest.raises(ValueError, match="AVIF"):
        decode_avif_bytes(bad)


def test_avif_in_decode_images_operator(spark):
    img = _img(12, 16)
    blob = encode_avif_rgb(img)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"\x00\x00\x00\x20ftypavif"
                                             + b"\x00" * 32))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r
            for r in MM.decode_images(df).collect()}
    assert rows[1]["decode_error"] is None
    assert (rows[1]["width"], rows[1]["height"]) == (16, 12)
    assert rows[2]["decode_error"] is not None   # error row, no crash
