"""Deterministic synthetic media: encoders round-trip exactly through
the real decoders, and the contract entry's aggregates match an
independent numpy recompute from the pixel formula alone."""

from __future__ import annotations

import numpy as np
import pytest

from legend_community_delta_spark.operators import mediagen as mg
from legend_community_delta_spark.operators.multimodal import (
    decode_image_bytes,
    decode_wav_bytes,
    probe_media_bytes,
)


def _independent_pixels(seed: int, w: int, h: int) -> np.ndarray:
    # recomputed WITHOUT mediagen's vectorized formula: plain loops
    out = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            for c in range(3):
                out[y, x, c] = (seed * 31 + y * 7 + x * 3 + c * 11) % 256
    return out


@pytest.mark.parametrize("seed", [0, 1, 17, 255])
def test_image_encoders_round_trip_exactly(seed):
    px = mg.synth_pixels(seed, 16, 12)
    assert np.array_equal(px, _independent_pixels(seed, 16, 12))
    for enc in (mg.encode_bmp, mg.encode_png, mg.encode_ppm,
                mg.encode_webp_lossless):
        assert np.array_equal(decode_image_bytes(enc(px)), px)
    q = (px & 0xE0) | 0x10
    assert np.array_equal(decode_image_bytes(mg.encode_gif(q)), q)


def test_webp_lossless_encoder_accepted_by_libwebp():
    """The product VP8L encoder's bitstreams must be spec-valid for an
    INDEPENDENT decoder, not just the in-repo one."""
    import importlib.util
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    try:
        import libwebp_ref as W
    except OSError:
        pytest.skip("system libwebp not available")
    px = mg.synth_pixels(7, 16, 12)
    ref = W.decode_rgba(mg.encode_webp_lossless(px))
    assert np.array_equal(ref[..., :3], px)
    assert bool((ref[..., 3] == 255).all())
    rgba = np.dstack([px, ((np.arange(192) * 7) % 256)
                      .reshape(12, 16).astype(np.uint8)])
    ref4 = W.decode_rgba(mg.encode_webp_lossless(rgba))
    assert np.array_equal(ref4, rgba)


def test_wav_encoder_round_trips_exactly():
    s = mg.synth_samples(9, 4000)
    nch, rate, nf, rms = decode_wav_bytes(mg.encode_wav(s))
    assert (nch, rate, nf) == (1, 8000, 4000)
    want_rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))
    assert rms == pytest.approx(want_rms, rel=1e-9)


def test_probe_identifies_every_synthetic_format():
    rows = mg.synth_media_rows(per_format=1)
    got = {fmt: probe_media_bytes(bytes(p)) for _mid, fmt, p in rows}
    assert got["bmp"]["format"] == "bmp" and got["bmp"]["kind"] == "image"
    assert got["png"]["format"] == "png"
    assert got["ppm"]["format"] in ("pnm", "ppm")
    assert got["gif"]["format"] == "gif"
    assert got["wav"]["kind"] == "audio"
    assert got["webp"]["format"] == "webp" and got["webp"]["codec"] == "vp8l"
    assert all(m["width"] == 16 and m["height"] == 12
               for f, m in got.items() if f != "wav")


def test_gif_rejects_too_many_colors():
    rng_free = np.arange(17 * 16 * 3, dtype=np.int64) % 251
    px = rng_free.astype(np.uint8).reshape(17, 16, 3)
    if len(np.unique(px.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError, match="<= 256 colors"):
            mg.encode_gif(px)


def test_media_decode_stats_matches_independent_recompute(spark):
    from legend_community_delta_spark import demo
    got = {r["fmt"]: r for r in
           demo.QUERIES["media_decode_stats"](spark, "unused").collect()}
    assert sorted(got) == ["bmp", "gif", "png", "ppm", "wav", "webp"]

    # independent expectations straight from the integer formulas
    for fmt in ("bmp", "png", "ppm", "gif", "webp"):
        r = got[fmt]
        assert (r["n"], r["n_probe_err"], r["n_decode_err"]) == (8, 0, 0)
        assert (r["width"], r["height"]) == (16, 12)
        assert r["probe_kind"] == "image"
        assert r["n_probe_formats"] == 1
    # media_ids per format block: bmp 0-7, png 8-15, ppm 16-23,
    # gif 24-31 (wav 32-39), webp 40-47 — lossless, so unquantized
    blocks = {"bmp": range(0, 8), "png": range(8, 16),
              "ppm": range(16, 24), "gif": range(24, 32),
              "webp": range(40, 48)}
    for fmt, seeds in blocks.items():
        levels = []
        for s in seeds:
            px = _independent_pixels(s, 16, 12).astype(np.float64)
            if fmt == "gif":
                px = (px.astype(np.uint8) & 0xE0) | 0x10
                px = px.astype(np.float64)
            levels.append(round(float(px.mean(axis=(0, 1)).mean()), 3))
        want = round(float(np.mean(levels)), 3)
        assert got[fmt]["avg_level"] == pytest.approx(want, abs=2e-3)

    r = got["wav"]
    assert (r["n"], r["n_probe_err"], r["n_decode_err"]) == (8, 0, 0)
    assert r["probe_kind"] == "audio"
    assert r["width"] is None and r["height"] is None
    rms = [round(float(np.sqrt(np.mean(
        mg.synth_samples(s, 4000).astype(np.float64) ** 2))), 3)
        for s in range(32, 40)]
    assert r["avg_level"] == pytest.approx(round(float(np.mean(rms)), 3),
                                           abs=2e-3)


def test_media_decode_stats_is_deterministic_across_runs(spark):
    from legend_community_delta_spark import demo
    a = demo.QUERIES["media_decode_stats"](spark, "x").collect()
    b = demo.QUERIES["media_decode_stats"](spark, "y").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---------------------------------------------------------------------------
# animated payloads + the media_frames_stats contract entry
# ---------------------------------------------------------------------------

def test_gif_animation_round_trips_every_frame():
    from legend_community_delta_spark.operators.multimodal import (
        _gif_frames)
    seeds = [7, 300, 9001]
    frames = [(mg.synth_pixels(s, 16, 12) & 0xE0) | 0x10 for s in seeds]
    blob = mg.encode_gif_animation(frames, [10, 20, 30])
    got = list(_gif_frames(blob))
    assert [d for _, d in got] == [100, 200, 300]
    for (canvas, _), want in zip(got, frames):
        assert np.array_equal(canvas, want)


def test_y4m_lumas_round_trip_exactly():
    from legend_community_delta_spark.operators.multimodal import (
        _parse_y4m)
    lumas = [mg.synth_pixels(s, 16, 12)[:, :, 0] for s in (1, 2)]
    blob = mg.encode_y4m(lumas, fps=25)
    w, h, fps, fbytes, pos = _parse_y4m(blob)
    assert (w, h, fps) == (16, 12, 25.0)
    got = np.frombuffer(blob[pos + 6:pos + 6 + 16 * 12], np.uint8
                        ).reshape(12, 16)
    assert np.array_equal(got, lumas[0])


def test_media_frames_stats_matches_independent_expectations(spark):
    from legend_community_delta_spark import demo
    got = {r["fmt"]: r for r in
           demo.QUERIES["media_frames_stats"](spark, "unused").collect()}
    assert sorted(got) == ["gif_anim", "webp_anim", "y4m"]
    for fmt in ("gif_anim", "webp_anim"):
        g = got[fmt]
        # 4 media x 3 frames at 0/100/200 ms, every_ms=100 samples all 3
        assert (g["n_media"], g["n_sampled_frames"],
                g["n_err"]) == (4, 12, 0), fmt
        assert g["max_ts_ms"] == 200.0
        assert (g["probe_frames"], g["probe_ms"]) == (3, 300.0)
        assert g["n_distinct_frames"] == 12  # all seeds distinct mod 256
    y = got["y4m"]
    # 25 fps, every_ms=100 -> step 2: frames 0 and 2 per media
    assert (y["n_media"], y["n_sampled_frames"], y["n_err"]) == (4, 8, 0)
    assert y["max_ts_ms"] == 80.0
    assert (y["probe_frames"], y["probe_ms"]) == (3, 120.0)
    assert y["n_distinct_frames"] == 8


def test_sampled_y4m_frame_payload_is_exact_luma(spark):
    from pyspark.sql import Row
    from legend_community_delta_spark.operators.mediagen import (
        encode_y4m, synth_pixels)
    from legend_community_delta_spark.operators.multimodal import (
        decode_image_bytes, sample_video_frames)
    lumas = [synth_pixels(s, 16, 12)[:, :, 0] for s in (5, 6, 7)]
    df = spark.createDataFrame(
        [Row(media_id=1, payload=bytes(encode_y4m(lumas, fps=10)))])
    rows = {r["frame_idx"]: r
            for r in sample_video_frames(df, every_ms=100).collect()}
    for idx, r in rows.items():
        got = decode_image_bytes(bytes(r["frame_payload"]))
        assert np.array_equal(got[:, :, 0], lumas[idx])
