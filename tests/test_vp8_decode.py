"""VP8 keyframe decoder: machinery pins (bool codec round-trip,
transforms vs independent math, predictors vs scalar references) and
end-to-end bitstream fixtures assembled by the test-side encoder."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from legend_community_delta_spark.operators import vp8 as V
from legend_community_delta_spark.operators.multimodal import (
    decode_image_bytes,
    probe_media_bytes,
)
from vp8_fixture import BoolEncoder, make_keyframe, wrap_webp


# ---------------------------------------------------------------------------
# boolean codec
# ---------------------------------------------------------------------------

def test_bool_codec_random_round_trip():
    rng = random.Random(7)
    for _ in range(200):
        n = rng.randrange(1, 400)
        bits = [rng.randrange(2) for _ in range(n)]
        probs = [rng.randrange(1, 255) for _ in range(n)]
        e = BoolEncoder()
        for b, p in zip(bits, probs):
            e.bit(b, p)
        d = V.BoolDecoder(e.stop())
        assert [d.read_bool(p) for p in probs] == bits


def test_bool_codec_literals_and_trees():
    e = BoolEncoder()
    e.literal(0x5A, 8)
    e.tree(V.KF_YMODE_TREE, V.KF_YMODE_PROB, V.TM_PRED)
    e.tree(V.COEF_TREE, V.DEFAULT_COEF_PROBS[1][0][0], V.CAT2)
    e.tree(V.COEF_TREE, V.DEFAULT_COEF_PROBS[1][1][2], V.ZERO_TOKEN,
           start=2)
    d = V.BoolDecoder(e.stop())
    assert d.read_literal(8) == 0x5A
    assert d.read_tree(V.KF_YMODE_TREE, V.KF_YMODE_PROB) == V.TM_PRED
    assert d.read_tree(V.COEF_TREE,
                       V.DEFAULT_COEF_PROBS[1][0][0]) == V.CAT2
    assert d.read_tree(V.COEF_TREE, V.DEFAULT_COEF_PROBS[1][1][2],
                       start=2) == V.ZERO_TOKEN


# ---------------------------------------------------------------------------
# transforms: pinned against independent float DCT / exact WHT math
# ---------------------------------------------------------------------------

def _float_idct4(coeffs16):
    """Reference inverse of VP8's scaled 4x4 DCT: DCT-III basis
    cos((2j+1)i*pi/8) with per-frequency scales (1, s2, s2, s2),
    s2 = sqrt(2), and a final /8 — the integer transform approximates
    sqrt2*cos(pi/8)-1 and sqrt2*sin(pi/8) by Q16 constants
    20091/35468 (their names in the RFC), so integer output
    must sit within +-2 of this float version for moderate inputs."""
    c = np.asarray(coeffs16, float).reshape(4, 4)
    i = np.arange(4)
    basis = np.cos((2 * i[None, :] + 1) * i[:, None] * np.pi / 8)
    scale = np.array([1.0, np.sqrt(2), np.sqrt(2), np.sqrt(2)])
    m = basis * scale[:, None]          # diag(S) @ B^T
    return (m.T @ c @ m) / 8.0


def test_idct_matches_float_reference():
    rng = random.Random(3)
    for _ in range(50):
        co = np.zeros(16, np.int32)
        for _ in range(rng.randrange(1, 8)):
            co[rng.randrange(16)] = rng.randrange(-800, 800)
        got = V.idct4x4(co)
        want = _float_idct4(co)
        assert np.abs(got - want).max() <= 2.0


def test_idct_dc_only_exact():
    for dc in (-100, -8, 0, 8, 33, 500):
        co = np.zeros(16, np.int32)
        co[0] = dc
        assert np.all(V.idct4x4(co) == (dc + 4) >> 3)


def test_iwht_inverts_forward_wht():
    # forward WHT per RFC §14.3 (encoder side), scaled by 2; the
    # inverse must recover the inputs exactly for multiples it encodes
    rng = random.Random(5)
    for _ in range(50):
        x = np.array([[rng.randrange(-500, 500) for _ in range(4)]
                      for _ in range(4)], np.int64)
        # forward: rows then columns of (a+d, b+c, b-c, a-d) pattern
        t = np.zeros((4, 4), np.int64)
        for r in range(4):
            a1 = (x[r, 0] + x[r, 2]) * 4
            d1 = (x[r, 1] + x[r, 3]) * 4
            c1 = (x[r, 1] - x[r, 3]) * 4
            b1 = (x[r, 0] - x[r, 2]) * 4
            t[r] = [a1 + d1 + (1 if a1 else 0), b1 + c1, b1 - c1,
                    a1 - d1]
        out = np.zeros((4, 4), np.int64)
        for c in range(4):
            a1 = t[0, c] + t[2, c]
            d1 = t[1, c] + t[3, c]
            c1 = t[1, c] - t[3, c]
            b1 = t[0, c] - t[2, c]
            a2, b2 = a1 + d1, b1 + c1
            c2, d2 = b1 - c1, a1 - d1
            out[:, c] = [(a2 + 3) >> 3 if a2 > 0 else (a2 + 3) >> 3,
                         (b2 + 3) >> 3, (c2 + 3) >> 3, (d2 + 3) >> 3]
        got = V.iwht4x4(out.reshape(16))
        # round-trip within the forward transform's truncation
        assert np.abs(got - x).max() <= 1


def test_iwht_dc_only_spreads_evenly():
    co = np.zeros(16, np.int32)
    co[0] = 320
    assert np.all(V.iwht4x4(co) == 40)


# ---------------------------------------------------------------------------
# predictors vs scalar references
# ---------------------------------------------------------------------------

def _plane_with_borders(above, left, al):
    p = np.zeros((6, 10), np.uint8)
    p[0, 0] = al
    p[0, 1:1 + len(above)] = above
    p[1:1 + len(left), 0] = left
    return p


@pytest.mark.parametrize("mode", range(10))
def test_subblock_predictors_scalar_reference(mode):
    rng = random.Random(40 + mode)
    for _ in range(20):
        a = [rng.randrange(256) for _ in range(4)]
        ar = [rng.randrange(256) for _ in range(4)]
        left = [rng.randrange(256) for _ in range(4)]
        al = rng.randrange(256)
        plane = _plane_with_borders(a + ar, left, al)
        got = V._pred_subblock(plane, 1, 1, mode,
                               np.array(ar, np.uint8))
        want = _scalar_bpred(mode, a, ar, left, al)
        assert np.array_equal(got, want), mode


def _scalar_bpred(mode, a, ar, left, al):
    p = [[0] * 4 for _ in range(4)]
    avg3 = lambda x, y, z: (x + 2 * y + z + 2) >> 2
    avg2 = lambda x, y: (x + y + 1) >> 1
    clamp = lambda v: max(0, min(255, v))
    if mode == V.B_DC_PRED:
        dc = (sum(a) + sum(left) + 4) >> 3
        p = [[dc] * 4 for _ in range(4)]
    elif mode == V.B_TM_PRED:
        for r in range(4):
            for c in range(4):
                p[r][c] = clamp(left[r] + a[c] - al)
    elif mode == V.B_VE_PRED:
        e = [al] + a + [ar[0]]
        row = [avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        p = [row[:] for _ in range(4)]
    elif mode == V.B_HE_PRED:
        e = [al] + left + [left[3]]
        col = [avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        p = [[col[r]] * 4 for r in range(4)]
    elif mode == V.B_LD_PRED:
        aa = a + ar
        for r in range(4):
            for c in range(4):
                i = r + c
                p[r][c] = (avg3(aa[i], aa[i + 1], aa[i + 2]) if i < 6
                           else (aa[6] + 3 * aa[7] + 2) >> 2)
    elif mode == V.B_RD_PRED:
        e = [left[3], left[2], left[1], left[0], al] + a
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                p[r][c] = avg3(e[i], e[i + 1], e[i + 2])
    elif mode == V.B_VR_PRED:
        e = [left[3], left[2], left[1], left[0], al] + a
        for c in range(4):
            p[0][c] = avg2(e[4 + c], e[5 + c])
            p[1][c] = avg3(e[3 + c], e[4 + c], e[5 + c])
        p[2][0] = avg3(e[2], e[3], e[4])
        p[3][0] = avg3(e[1], e[2], e[3])
        for c in range(1, 4):
            p[2][c] = p[0][c - 1]
            p[3][c] = p[1][c - 1]
    elif mode == V.B_VL_PRED:
        aa = a + ar
        for c in range(4):
            p[0][c] = avg2(aa[c], aa[c + 1])
            p[1][c] = avg3(aa[c], aa[c + 1], aa[c + 2])
        for c in range(3):
            p[2][c] = p[0][c + 1]
            p[3][c] = p[1][c + 1]
        p[2][3] = avg3(aa[4], aa[5], aa[6])
        p[3][3] = avg3(aa[5], aa[6], aa[7])
    elif mode == V.B_HD_PRED:
        e = [left[3], left[2], left[1], left[0], al, a[0], a[1], a[2]]
        for r in range(4):
            p[r][0] = avg2(e[3 - r], e[4 - r])
            p[r][1] = avg3(e[3 - r], e[4 - r], e[5 - r])
        p[0][2] = avg3(e[4], e[5], e[6])
        p[0][3] = avg3(e[5], e[6], e[7])
        for r in range(1, 4):
            p[r][2] = p[r - 1][0]
            p[r][3] = p[r - 1][1]
    elif mode == V.B_HU_PRED:
        lf = left
        p[0] = [avg2(lf[0], lf[1]), avg3(lf[0], lf[1], lf[2]),
                avg2(lf[1], lf[2]), avg3(lf[1], lf[2], lf[3])]
        p[1] = [p[0][2], p[0][3], avg2(lf[2], lf[3]),
                avg3(lf[2], lf[3], lf[3])]
        p[2] = [p[1][2], p[1][3], lf[3], lf[3]]
        p[3] = [lf[3]] * 4
    return np.array(p, np.uint8)


def test_mb_dc_prediction_divisors():
    plane = np.zeros((20, 30), np.uint8)
    plane[0, :] = 100
    plane[:, 0] = 60
    both = V._pred_mb(plane, 1, 1, 16, V.DC_PRED, True, True)
    assert np.all(both == (100 * 16 + 60 * 16 + 16) >> 5)
    above = V._pred_mb(plane, 1, 1, 16, V.DC_PRED, True, False)
    assert np.all(above == (100 * 16 + 8) >> 4)
    neither = V._pred_mb(plane, 1, 1, 16, V.DC_PRED, False, False)
    assert np.all(neither == 128)
    chroma = V._pred_mb(plane, 1, 1, 8, V.DC_PRED, True, True)
    assert np.all(chroma == (100 * 8 + 60 * 8 + 8) >> 4)


# ---------------------------------------------------------------------------
# end-to-end bitstream fixtures
# ---------------------------------------------------------------------------

def test_keyframe_all_dc_no_coeffs_uniform():
    data = make_keyframe(32, 16, [[V.DC_PRED, V.DC_PRED]],
                         [[V.DC_PRED, V.DC_PRED]])
    y, u, v = V.decode_vp8_keyframe(data, yuv=True)
    assert y.shape == (16, 32) and u.shape == (8, 16)
    assert np.all(y == 128) and np.all(u == 128) and np.all(v == 128)
    rgb = V.decode_vp8_keyframe(data)
    # BT.601 limited range: (298*(128-16)+128)>>8 = 130
    assert np.unique(rgb.reshape(-1, 3), axis=0).tolist() == [[130] * 3]


def _scalar_idct(levels_scan, dq, first=0, dc_override=None):
    co = np.zeros(16, np.int64)
    for i in range(first, 16):
        if levels_scan[i]:
            co[V.ZIGZAG[i]] = levels_scan[i] * (dq[0] if i == 0
                                                else dq[1])
    if dc_override is not None:
        co[0] = dc_override
    return V.idct4x4(co)      # idct itself pinned independently above


def test_keyframe_y2_and_ac_coefficients_exact():
    def levels(my, mx):
        y2 = [0] * 16
        y2[0] = 3
        y = [[0] * 16 for _ in range(16)]
        y[2][1] = -2
        uv = [[0] * 16 for _ in range(8)]
        uv[0][0] = 5
        return (y2, y, uv)

    data = make_keyframe(16, 16, [[V.DC_PRED]], [[V.DC_PRED]],
                         levels_fn=levels)
    y, u, v = V.decode_vp8_keyframe(data, yuv=True)
    # independent expectation: qi=0 -> y1=(4,4), y2=(8,8), uv=(4,4)
    wht = np.zeros(16, np.int64)
    wht[0] = 3 * 8
    y2g = V.iwht4x4(wht)
    assert np.all(y2g == 3)
    exp = np.full((16, 16), 128, np.int64)
    for sb in range(16):
        r, c = divmod(sb, 4)
        lv = [0] * 16
        if sb == 2:
            lv[1] = -2
        exp[4 * r:4 * r + 4, 4 * c:4 * c + 4] += _scalar_idct(
            lv, (4, 4), first=1, dc_override=int(y2g[r, c]))
    assert np.array_equal(y, np.clip(exp, 0, 255))
    expu = np.full((8, 8), 128, np.int64)
    expu[:4, :4] += _scalar_idct([5] + [0] * 15, (4, 4))
    assert np.array_equal(u, np.clip(expu, 0, 255))
    assert np.all(v == 128)


def test_keyframe_directional_modes_use_neighbors():
    data = make_keyframe(
        32, 32, [[V.DC_PRED, V.V_PRED], [V.H_PRED, V.TM_PRED]],
        [[V.DC_PRED] * 2] * 2)
    y, _, _ = V.decode_vp8_keyframe(data, yuv=True)
    assert np.all(y[:16, :16] == 128)       # DC from borders
    assert np.all(y[:16, 16:] == 127)       # V copies the 127 top border
    assert np.all(y[16:, :16] == 129)       # H copies the 129 left border
    # TM: clamp(left(129-col MB: 128) + above(128) - al(128)) = 128
    assert np.all(y[16:, 16:] == 128)


def test_keyframe_bpred_all_modes_decodes():
    bm = {(0, 0): list(range(10)) + [V.B_DC_PRED] * 6}
    data = make_keyframe(16, 16, [[V.B_PRED]], [[V.TM_PRED]], bmodes=bm)
    y, u, v = V.decode_vp8_keyframe(data, yuv=True)
    assert y.shape == (16, 16)
    # borders 127/129 + all-128 reconstructions keep values near gray
    assert int(y.min()) >= 120 and int(y.max()) <= 136


def test_keyframe_skip_flags_and_contexts():
    def levels(my, mx):
        y2 = [0] * 16
        y2[0] = 8
        return (y2, [[0] * 16] * 16, [[0] * 16] * 8)

    data = make_keyframe(48, 16, [[V.DC_PRED] * 3], [[V.DC_PRED] * 3],
                         levels_fn=levels, skips=[[0, 1, 0]])
    y, _, _ = V.decode_vp8_keyframe(data, yuv=True)
    # MB0: DC pred 128 + residual (8*8 -> iwht 8 -> idct (8+4)>>3) = +1
    assert np.all(y[:, :16] == 129)
    # MB1 skipped: pure prediction — top-row DC uses LEFT ONLY
    # ((129*16 + 8) >> 4 = 129), no residual despite levels_fn
    assert np.all(y[:, 16:32] == 129)
    # MB2: entropy contexts reset across the skipped MB, so its stream
    # decodes like MB0's (+1 residual on its own 129 left-DC pred)
    assert np.all(y[:, 32:] == 130)


def test_loop_filter_smooths_mb_edge_only():
    def levels(my, mx):
        if mx == 0:
            return None
        y2 = [0] * 16
        y2[0] = 40
        return (y2, [[0] * 16] * 16, [[0] * 16] * 8)

    args = ([[V.DC_PRED, V.DC_PRED]], [[V.DC_PRED, V.DC_PRED]])
    raw = make_keyframe(32, 16, *args, levels_fn=levels, filter_level=0)
    flt = make_keyframe(32, 16, *args, levels_fn=levels,
                        filter_level=30)
    y0, _, _ = V.decode_vp8_keyframe(raw, yuv=True)
    y1, _, _ = V.decode_vp8_keyframe(flt, yuv=True)
    jump0 = int(y0[0, 16]) - int(y0[0, 15])
    jump1 = int(y1[0, 16]) - int(y1[0, 15])
    assert jump0 > jump1                        # edge smoothed
    assert np.array_equal(y0[:, :12], y1[:, :12])   # interior untouched
    simple = make_keyframe(32, 16, *args, levels_fn=levels,
                           filter_level=30, filter_type=1)
    y2_, _, _ = V.decode_vp8_keyframe(simple, yuv=True)
    assert int(y2_[0, 16]) - int(y2_[0, 15]) < jump0


def test_normal_filter_scalar_reference_one_column():
    # one vertical edge, constant rows: p3..p0 = 100, q0..q3 = 140;
    # level/limits chosen so the mask passes and hev is false
    plane = np.full((4, 8), 100, np.uint8)
    plane[:, 4:] = 140
    E, I, hev_t = 255, 63, 50
    V._normal_filter(plane, 0, 4, 4, False, E, I, hev_t, True)
    # scalar recompute of the wide mb filter (hev false):
    ps1 = ps0 = 100 - 128
    qs0 = qs1 = 140 - 128
    w = max(-128, min(127, max(-128, min(127, ps1 - qs1))
                      + 3 * (qs0 - ps0)))
    a0 = (27 * w + 63) >> 7
    a1 = (18 * w + 63) >> 7
    a2 = (9 * w + 63) >> 7
    assert np.all(plane[:, 4] == np.clip(qs0 - a0 + 128, 0, 255))
    assert np.all(plane[:, 3] == np.clip(ps0 + a0 + 128, 0, 255))
    assert np.all(plane[:, 5] == np.clip(qs1 - a1 + 128, 0, 255))
    assert np.all(plane[:, 2] == np.clip(ps1 + a1 + 128, 0, 255))
    assert np.all(plane[:, 6] == np.clip((140 - 128) - a2 + 128, 0, 255))
    assert np.all(plane[:, 1] == np.clip((100 - 128) + a2 + 128, 0, 255))


def test_inter_frame_and_corrupt_headers_raise():
    good = make_keyframe(16, 16, [[V.DC_PRED]], [[V.DC_PRED]])
    with pytest.raises(ValueError, match="inter"):
        V.decode_vp8_keyframe(bytes([good[0] | 1]) + good[1:])
    with pytest.raises(ValueError, match="start code"):
        V.decode_vp8_keyframe(good[:3] + b"xxx" + good[6:])
    with pytest.raises(ValueError, match="shorter"):
        V.decode_vp8_keyframe(good[:8])
    with pytest.raises(ValueError, match="overruns"):
        V.decode_vp8_keyframe(good[:12])


def test_webp_container_dispatch_and_probe_agree():
    data = make_keyframe(24, 18, [[V.DC_PRED, V.DC_PRED]] * 2,
                         [[V.DC_PRED, V.DC_PRED]] * 2)
    blob = wrap_webp(data)
    px = decode_image_bytes(blob)
    assert px.shape == (18, 24, 3)
    meta = probe_media_bytes(blob)
    assert meta["codec"] == "vp8"
    assert (meta["width"], meta["height"]) == (24, 18)


def test_odd_dimensions_crop():
    data = make_keyframe(17, 13, [[V.DC_PRED, V.DC_PRED]],
                         [[V.DC_PRED, V.DC_PRED]])
    rgb = V.decode_vp8_keyframe(data)
    assert rgb.shape == (13, 17, 3)


def test_quantizer_index_scales_residuals():
    # qi=60: y2dc = DC_QLOOKUP[60]*2 = 118, vs qi=0 -> 8; the same
    # level decodes to proportionally larger pixels
    def levels(my, mx):
        y2 = [0] * 16
        y2[0] = 2
        return (y2, [[0] * 16] * 16, [[0] * 16] * 8)

    lo = make_keyframe(16, 16, [[V.DC_PRED]], [[V.DC_PRED]],
                       levels_fn=levels, y_ac_qi=0)
    hi = make_keyframe(16, 16, [[V.DC_PRED]], [[V.DC_PRED]],
                       levels_fn=levels, y_ac_qi=60)
    ylo, _, _ = V.decode_vp8_keyframe(lo, yuv=True)
    yhi, _, _ = V.decode_vp8_keyframe(hi, yuv=True)
    # independent recompute: coeff = level * y2dc; DC-only WHT spreads
    # (coeff+3)>>3 to every subblock DC; DC-only iDCT adds (v+4)>>3
    assert np.all(ylo == 128)       # qi=0: rounds away to zero
    y2dc = V.DC_QLOOKUP[60] * 2
    v = (2 * y2dc + 3) >> 3
    assert np.all(yhi == 128 + ((v + 4) >> 3))


def test_multiple_token_partitions_round_robin():
    def levels(my, mx):
        y2 = [0] * 16
        y2[0] = 8 * (my + 1)      # row-dependent residual
        return (y2, [[0] * 16] * 16, [[0] * 16] * 8)

    one = make_keyframe(16, 64, [[V.DC_PRED]] * 4, [[V.DC_PRED]] * 4,
                        levels_fn=levels, n_partitions=1)
    four = make_keyframe(16, 64, [[V.DC_PRED]] * 4, [[V.DC_PRED]] * 4,
                         levels_fn=levels, n_partitions=4)
    y1, _, _ = V.decode_vp8_keyframe(one, yuv=True)
    y4, _, _ = V.decode_vp8_keyframe(four, yuv=True)
    assert np.array_equal(y1, y4)      # partitioning never changes pixels
    assert len(np.unique(y1)) > 1      # rows actually differ


def test_segmentation_per_segment_quantizers():
    # two MBs, segment 0 (qi=0) vs segment 1 (qi=100): same level,
    # different dequant -> visibly different DC offsets
    def levels(my, mx):
        y2 = [0] * 16
        y2[0] = 2
        return (y2, [[0] * 16] * 16, [[0] * 16] * 8)

    data = make_keyframe(32, 16, [[V.DC_PRED, V.DC_PRED]],
                         [[V.DC_PRED, V.DC_PRED]], levels_fn=levels,
                         segments=[[0, 1]],
                         segment_quant=[0, 100, 0, 0])
    y, _, _ = V.decode_vp8_keyframe(data, yuv=True)
    # seg0: iwht(2*8)=2 -> (2+4)>>3 = 0; seg1: y2dc=DC_QLOOKUP[100]*2
    assert np.all(y[:, :16] == 128)
    want = 128 + ((((2 * V.DC_QLOOKUP[100] * 2 + 3) >> 3) + 4) >> 3)
    assert np.all(y[:, 16:] == want)


def test_coef_prob_updates_apply():
    # override a handful of token probabilities; encoder and decoder
    # must agree (the header-update path actually replaces them)
    updates = {(1, 0, 0, 0): 7, (0, 1, 1, 2): 200, (2, 0, 2, 1): 1}

    def levels(my, mx):
        y2 = [0] * 16
        y2[0] = 3
        y = [[0] * 16 for _ in range(16)]
        y[5][2] = 1
        uv = [[0] * 16 for _ in range(8)]
        uv[1][0] = -4
        return (y2, y, uv)

    plain = make_keyframe(16, 16, [[V.DC_PRED]], [[V.DC_PRED]],
                          levels_fn=levels)
    upd = make_keyframe(16, 16, [[V.DC_PRED]], [[V.DC_PRED]],
                        levels_fn=levels, coef_updates=updates)
    ya, ua, va = V.decode_vp8_keyframe(plain, yuv=True)
    yb, ub, vb = V.decode_vp8_keyframe(upd, yuv=True)
    # identical pixels through different probability tables
    assert np.array_equal(ya, yb)
    assert np.array_equal(ua, ub) and np.array_equal(va, vb)
    assert upd != plain                # bitstreams genuinely differ


def test_fuzz_garbage_never_hangs(subtests=None):
    # valid 10-byte header + arbitrary bytes: decode must terminate
    # with either ValueError or a well-formed frame — never hang
    rng = random.Random(99)
    header = bytes([(40 << 5) & 0xFF, (40 << 5) >> 8, (40 >> 3) & 0xFF])
    for trial in range(30):
        fps = rng.randrange(1, 60)
        tag = (0 << 0) | (1 << 4) | (fps << 5)
        hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        hdr += b"\x9d\x01\x2a" + struct.pack("<HH", 32, 32)
        body = bytes(rng.randrange(256)
                     for _ in range(fps + rng.randrange(0, 40)))
        try:
            out = V.decode_vp8_keyframe(hdr + body)
            assert out.shape == (32, 32, 3)
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# animated WebP (ANMF) integration
# ---------------------------------------------------------------------------

def _uniform_rgb(y2_level):
    # Y = 128 + ((((level*8)+3)>>3 + 4) >> 3), U = V = 128
    y = 128 + ((((y2_level * 8 + 3) >> 3) + 4) >> 3)
    c = 298 * (y - 16)
    return np.clip((c + 128) >> 8, 0, 255)


def test_animated_webp_frames_composite_and_time():
    from legend_community_delta_spark.operators.multimodal import (
        _webp_frames)
    from vp8_fixture import make_animated_webp, uniform_vp8
    f1 = uniform_vp8(16, 16, 0)        # Y=128
    f2 = uniform_vp8(16, 16, 40)       # Y=133
    blob = make_animated_webp(
        [(b"VP8 ", f1, (16, 16)), (b"VP8 ", f2, (16, 16))],
        durations_ms=[120, 80])
    got = list(_webp_frames(blob))
    assert len(got) == 2
    (c1, d1), (c2, d2) = got
    assert (d1, d2) == (120.0, 80.0)
    assert np.all(c1 == _uniform_rgb(0))
    assert np.all(c2 == _uniform_rgb(40))


def test_animated_webp_offset_and_dispose_to_background():
    from legend_community_delta_spark.operators.multimodal import (
        _webp_frames)
    from vp8_fixture import make_animated_webp, uniform_vp8
    patch = uniform_vp8(16, 16, 40)
    blob = make_animated_webp(
        [(b"VP8 ", patch, (16, 16)), (b"VP8 ", patch, (16, 16))],
        durations_ms=[50, 50],
        offsets=[(16, 0), (0, 16)],
        flags=[1, 0],                   # frame 1 disposes to background
        canvas_wh=(32, 32),
        bg_bgra=bytes([0, 0, 0, 255]))  # black background
    frames = list(_webp_frames(blob))
    (c1, _), (c2, _) = frames
    v = _uniform_rgb(40)
    assert np.all(c1[0:16, 16:32] == v)     # patch at (x=16, y=0)
    assert np.all(c1[0:16, 0:16] == 0)      # background elsewhere
    # after dispose, frame 1's rect returns to background; frame 2's
    # patch sits at (x=0, y=16)
    assert np.all(c2[0:16, 16:32] == 0)
    assert np.all(c2[16:32, 0:16] == v)


def test_animated_webp_first_frame_still_decode_and_probe():
    from vp8_fixture import make_animated_webp, uniform_vp8
    blob = make_animated_webp(
        [(b"VP8 ", uniform_vp8(16, 16, 0), (16, 16)),
         (b"VP8 ", uniform_vp8(16, 16, 40), (16, 16))],
        durations_ms=[100, 100])
    px = decode_image_bytes(blob)       # GIF convention: first frame
    assert px.shape == (16, 16, 3)
    assert np.all(px == _uniform_rgb(0))
    meta = probe_media_bytes(blob)
    assert meta["kind"] == "video" and meta["n_frames"] == 2
    assert meta["duration_ms"] == 200.0


def test_animated_webp_sample_video_frames_pipeline(spark):
    from pyspark.sql import Row
    from legend_community_delta_spark.operators.multimodal import (
        sample_video_frames)
    from vp8_fixture import make_animated_webp, uniform_vp8
    blob = make_animated_webp(
        [(b"VP8 ", uniform_vp8(16, 16, 0), (16, 16)),
         (b"VP8 ", uniform_vp8(16, 16, 40), (16, 16)),
         (b"VP8 ", uniform_vp8(16, 16, 80), (16, 16))],
        durations_ms=[100, 100, 100])
    df = spark.createDataFrame([Row(media_id=1, payload=bytes(blob))])
    rows = sample_video_frames(df, every_ms=200).collect()
    assert all(r["decode_error"] is None for r in rows)
    idx = sorted(r["frame_idx"] for r in rows)
    assert idx == [0, 2]                # 0 ms and 200 ms sampled
