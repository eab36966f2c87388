"""HEVC decode/encode via the system libde265 / libx265 (skip-gated).

The engine binds libde265 (decode) and libx265 (encode) through
ctypes (operators/hevccodec.py).  LOSSLESS x265 encoding makes the
round-trip a bit-exact oracle — the strongest possible differential
check, same pattern as the libwebp/imageio interop suites: every
pixel the decoder produces is pinned against what a real production
encoder put in.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from legend_community_delta_spark.operators.hevccodec import (
    annexb_to_length_prefixed, build_hvcc, decode_hevc_nals,
    decode_hevc_sample, decode_hevc_track, hevc_available, parse_hvcc,
    split_length_prefixed, encode_hevc_yuv, x265_available)

pytestmark = pytest.mark.skipif(
    not (hevc_available() and x265_available()),
    reason="system libde265/libx265 not available")


def _yuv(seed: int, h: int = 24, w: int = 32):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, (h, w), dtype=np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8))


def test_lossless_intra_round_trip_bit_exact():
    y, u, v = _yuv(7)
    headers, payloads = encode_hevc_yuv([(y, u, v)])
    assert len(payloads) == 1
    from legend_community_delta_spark.operators.hevccodec import (
        split_annexb)
    got = decode_hevc_nals(headers + split_annexb(payloads[0]))
    from legend_community_delta_spark.operators.vp8 import _yuv_to_rgb
    want = _yuv_to_rgb(y, u, v, 24, 32)
    assert got.shape == (24, 32, 3)
    # lossless: decoded YUV is exact, so the (shared, deterministic)
    # color convert lands on identical RGB
    assert np.array_equal(got, want)


def test_inter_frames_decode_through_track_pass():
    # keyint large + lossless: frame 0 is IDR, the rest are P frames
    # that NEED reference state — the per-sample contract of av01/VP8
    # cannot decode them, the streaming track pass must (bit-exact)
    frames = [_yuv(i) for i in range(4)]
    headers, payloads = encode_hevc_yuv(frames, all_intra=False)
    hvcc = build_hvcc(headers)
    samples = [(annexb_to_length_prefixed(p), i)
               for i, p in enumerate(payloads)]
    # inter payloads are materially smaller than the IDR: real P frames
    assert min(len(p) for p, _ in samples[1:]) < len(samples[0][0])
    from legend_community_delta_spark.operators.vp8 import _yuv_to_rgb
    got = dict(decode_hevc_track(iter(samples), hvcc))
    assert sorted(got) == [0, 1, 2, 3]
    for i, (y, u, v) in enumerate(frames):
        assert np.array_equal(got[i], _yuv_to_rgb(y, u, v, 24, 32)), i


def test_hvcc_build_parse_round_trip_and_sample_decode():
    y, u, v = _yuv(11)
    headers, payloads = encode_hevc_yuv([(y, u, v)])
    hvcc = build_hvcc(headers)
    length_size, nals = parse_hvcc(hvcc)
    assert length_size == 4
    assert sorted((n[0] >> 1) & 0x3F for n in nals) == [32, 33, 34]
    assert [bytes(n) for n in nals] == [bytes(h) for h in sorted(
        headers, key=lambda n: (n[0] >> 1) & 0x3F)]
    sample = annexb_to_length_prefixed(payloads[0])
    assert split_length_prefixed(sample, 4)  # well-formed prefixing
    got = decode_hevc_sample(sample, hvcc)
    from legend_community_delta_spark.operators.vp8 import _yuv_to_rgb
    assert np.array_equal(got, _yuv_to_rgb(y, u, v, 24, 32))


def test_malformed_payload_raises_not_crashes():
    y, u, v = _yuv(3)
    headers, _ = encode_hevc_yuv([(y, u, v)])
    with pytest.raises(ValueError, match="no picture|rejected"):
        decode_hevc_nals(headers + [b"\x28\x01" + b"\x5a" * 40])
    with pytest.raises(ValueError, match="truncated"):
        parse_hvcc(b"\x01\x02")
    with pytest.raises(ValueError, match="overruns"):
        split_length_prefixed(b"\x00\x00\x00\x09abc", 4)


def _hevc_mp4(frames, fps=10, w=32, h=24, codec=b"hev1",
              all_intra=True, sync=None):
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_multimodal_decode import make_mjpeg_mp4
    headers, payloads = encode_hevc_yuv(frames, fps=fps,
                                        all_intra=all_intra)
    hvcc = build_hvcc(headers)
    samples = [annexb_to_length_prefixed(p) for p in payloads]
    return make_mjpeg_mp4(
        samples, fps=fps, w=w, h=h, codec=codec,
        entry_children=struct.pack(">I", 8 + len(hvcc)) + b"hvcC"
        + hvcc,
        sync_samples=sync)


def test_hevc_mp4_frame_sampling_all_frames(spark):
    """hev1 MP4 tracks decode FULLY — a non-intra track (P frames)
    sampled at every frame comes back bit-exact, through the same
    Arrow-batched operator every other codec uses."""
    from legend_community_delta_spark.operators.multimodal import (
        decode_image_bytes, probe_media_bytes, sample_video_frames)
    frames = [_yuv(i) for i in range(3)]
    blob = _hevc_mp4(frames, all_intra=False)
    got = probe_media_bytes(blob)
    assert got.get("video_codec", got.get("codec")) == "hev1"
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(media_id=1, payload=bytes(blob))])
    rows = sorted((r["frame_idx"], r) for r in
                  sample_video_frames(df, every_ms=100).collect())
    assert [i for i, _ in rows] == [0, 1, 2]
    from legend_community_delta_spark.operators.vp8 import _yuv_to_rgb
    for idx, r in rows:
        assert r["decode_error"] is None
        luma = decode_image_bytes(bytes(r["frame_payload"]))[..., 0]
        y, u, v = frames[idx]
        want_rgb = _yuv_to_rgb(y, u, v, 24, 32).astype(np.float64)
        want = np.clip(np.round(0.299 * want_rgb[..., 0]
                                + 0.587 * want_rgb[..., 1]
                                + 0.114 * want_rgb[..., 2]),
                       0, 255).astype(np.uint8)
        assert np.array_equal(luma, want), idx


def test_hevc_mp4_sampling_cadence(spark):
    from legend_community_delta_spark.operators.multimodal import (
        sample_video_frames)
    frames = [_yuv(i) for i in range(6)]
    blob = _hevc_mp4(frames, fps=10)          # one frame every 100 ms
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(media_id=1, payload=bytes(blob))])
    rows = sample_video_frames(df, every_ms=300).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 3]


def test_hvc1_fourcc_and_missing_decoder_message():
    from legend_community_delta_spark.operators import multimodal as MM
    frames = [_yuv(1)]
    blob = _hevc_mp4(frames, codec=b"hvc1")
    out = list(MM._mp4_luma_frames(blob, every_ms=100))
    assert len(out) == 1 and out[0][0] == 0


def test_mediagen_hevc_mp4_muxer_and_pixel_stats(spark):
    """The package-side muxer (mediagen.mux_mp4_video / encode_hevc_mp4)
    round-trips through the multimodal sample-table reader, and
    image_pixel_stats' integer sums equal the first-principles formula
    the contract oracle uses."""
    import numpy as np
    from legend_community_delta_spark.operators.mediagen import (
        encode_hevc_mp4, synth_hevc_luma, synth_hevc_video_table)
    from legend_community_delta_spark.operators.multimodal import (
        image_pixel_stats, probe_media_bytes, sample_video_frames)
    lumas = [synth_hevc_luma(2, f) for f in range(3)]
    blob = encode_hevc_mp4(lumas)
    got = probe_media_bytes(blob)
    assert (got["codec"], got["width"], got["height"],
            got["n_frames"]) == ("hev1", 32, 24, 3)

    media = synth_hevc_video_table(spark, n_media=2, n_frames=2)
    frames = sample_video_frames(media, every_ms=100)
    fid = frames.selectExpr("media_id * 100 + frame_idx AS media_id",
                            "frame_payload AS payload")
    rows = {r["media_id"]: r for r in image_pixel_stats(fid).collect()}
    assert sorted(rows) == [0, 1, 100, 101]
    for key, r in rows.items():
        m, f = divmod(key, 100)
        y = synth_hevc_luma(m, f).astype(np.int32)
        want = np.clip((298 * (y - 16) + 128) >> 8, 0, 255)
        assert r["decode_error"] is None
        assert (r["width"], r["height"], r["channels"]) == (32, 24, 1)
        assert r["px_sum"] == int(want.sum())
        assert r["px_min"] == int(want.min())
        assert r["px_max"] == int(want.max())


def test_image_pixel_stats_error_row(spark):
    from pyspark.sql import Row
    from legend_community_delta_spark.operators.multimodal import (
        image_pixel_stats)
    df = spark.createDataFrame(
        [Row(media_id=1, payload=b"not an image")])
    rows = image_pixel_stats(df).collect()
    assert len(rows) == 1 and rows[0]["decode_error"] is not None
    assert rows[0]["px_sum"] is None
