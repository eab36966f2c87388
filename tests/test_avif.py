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


def _avif_item_parts(blob):
    """(av1C payload, item OBU bytes) from a single-item AVIF file."""
    import struct
    i = blob.find(b"av1C")
    sz, = struct.unpack_from(">I", blob, i - 4)
    av1c = blob[i + 4:i - 4 + sz]
    m = blob.find(b"mdat")
    return av1c, blob[m + 4:]


def test_av1_obus_reboxed_as_avif_decode():
    from legend_community_delta_spark.operators.avifcodec import (
        decode_av1_obus)
    img = _img(12, 16)
    av1c, obus = _avif_item_parts(encode_avif_rgb(img))
    out = decode_av1_obus(obus, av1c, 16, 12)
    assert out.shape[:2] == (12, 16)
    assert np.abs(out[..., :3].astype(int) - img.astype(int)).max() <= 8


def test_av01_mp4_frame_sampling(spark):
    """av01 SYNC samples in an MP4 track decode through the
    OBU->AVIF re-boxing; non-sync samples are skipped honestly."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_multimodal_decode import make_mjpeg_mp4, _mbox
    from legend_community_delta_spark.operators.multimodal import (
        sample_video_frames, decode_image_bytes, probe_media_bytes)
    import struct as st

    frames = [_img(12, 16), (_img(12, 16) + 64).astype(np.uint8),
              (_img(12, 16) + 128).astype(np.uint8)]
    samples, av1c = [], None
    for f in frames:
        c, obus = _avif_item_parts(encode_avif_rgb(f))
        av1c = c
        samples.append(obus)
    blob = make_mjpeg_mp4(
        samples, fps=10, w=16, h=12, codec=b"av01",
        entry_children=st.pack(">I", 8 + len(av1c)) + b"av1C" + av1c,
        sync_samples=[0, 1, 2])
    got = probe_media_bytes(blob)
    assert got["video_codec" if "video_codec" in got else "codec"] \
        == "av01"
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(media_id=1, payload=bytes(blob))])
    rows = sorted((r["frame_idx"], r) for r in
                  sample_video_frames(df, every_ms=100).collect())
    assert [i for i, _ in rows] == [0, 1, 2]
    for (idx, r) in rows:
        assert r["decode_error"] is None
        luma = decode_image_bytes(bytes(r["frame_payload"]))[..., 0]
        want = (0.299 * frames[idx][..., 0] + 0.587 * frames[idx][..., 1]
                + 0.114 * frames[idx][..., 2])
        assert np.abs(luma.astype(float) - want).max() <= 12  # AV1 lossy


def test_av01_mp4_non_sync_samples_skipped(spark):
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_multimodal_decode import make_mjpeg_mp4
    from legend_community_delta_spark.operators.multimodal import (
        _mp4_luma_frames)
    import struct as st
    img = _img(12, 16)
    av1c, obus = _avif_item_parts(encode_avif_rgb(img))
    garbage = b"\x00" * 40                      # stand-in inter frame
    blob = make_mjpeg_mp4(
        [obus, garbage, obus], fps=10, w=16, h=12, codec=b"av01",
        entry_children=st.pack(">I", 8 + len(av1c)) + b"av1C" + av1c,
        sync_samples=[0, 2])
    idxs = [i for i, _ts, _p in _mp4_luma_frames(blob, 1)]
    assert idxs == [0, 2]                       # sample 1 never decoded
