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
    for enc in (mg.encode_bmp, mg.encode_png, mg.encode_ppm):
        assert np.array_equal(decode_image_bytes(enc(px)), px)
    q = (px & 0xE0) | 0x10
    assert np.array_equal(decode_image_bytes(mg.encode_gif(q)), q)


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
    assert sorted(got) == ["bmp", "gif", "png", "ppm", "wav"]

    # independent expectations straight from the integer formulas
    for fmt in ("bmp", "png", "ppm", "gif"):
        r = got[fmt]
        assert (r["n"], r["n_probe_err"], r["n_decode_err"]) == (8, 0, 0)
        assert (r["width"], r["height"]) == (16, 12)
        assert r["probe_kind"] == "image"
        assert r["n_probe_formats"] == 1
    # media_ids per format block: bmp 0-7, png 8-15, ppm 16-23, gif 24-31
    blocks = {"bmp": range(0, 8), "png": range(8, 16),
              "ppm": range(16, 24), "gif": range(24, 32)}
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
