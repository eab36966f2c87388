"""Fixture builder for the VP8 keyframe decoder tests: a boolean
ENCODER (RFC 6386 §8, the exact mirror of the decoder's §7) plus a
keyframe bitstream assembler.  Lives in tests/ on purpose — the
package ships only the decoder; fixtures share its constant tables so
the machinery is exercised end to end in both directions."""

from __future__ import annotations

import struct

import numpy as np

from legend_community_delta_spark.operators import vp8 as V


class BoolEncoder:
    """The VP8 boolean encoder (libvpx boolhuff layout: 24-bit low
    register, carry propagation into already-emitted bytes)."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.count = -24
        self.buf = bytearray()

    def bit(self, b, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if b:
            self.low = (self.low + split) & 0xFFFFFFFF
            self.range -= split
        else:
            self.range = split
        shift = 8 - self.range.bit_length()
        self.range <<= shift
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if ((self.low << (offset - 1)) & 0x80000000):
                i = len(self.buf) - 1
                while i >= 0 and self.buf[i] == 0xFF:
                    self.buf[i] = 0
                    i -= 1
                if i >= 0:
                    self.buf[i] += 1
            self.buf.append((self.low >> (24 - offset)) & 0xFF)
            self.low = (self.low << offset) & 0xFFFFFF
            shift = self.count
            self.count -= 8
        self.low = (self.low << shift) & 0xFFFFFFFF
        return self

    def literal(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1, 128)

    def tree(self, tree, probs, symbol, start=0):
        for idx, b in _tree_path(tree, symbol, start):
            self.bit(b, probs[idx >> 1])

    def stop(self):
        for _ in range(32):
            self.bit(0, 128)
        return bytes(self.buf)


def _tree_path(tree, symbol, start=0):
    out = []

    def dfs(i, path):
        for b in (0, 1):
            t = tree[i + b]
            if t == -symbol:
                out.append(path + [(i, b)])
            elif t > 0:
                dfs(t, path + [(i, b)])
    dfs(start, [])
    if not out:
        raise ValueError(f"symbol {symbol} not reachable from {start}")
    return out[0]


def _value_token(av):
    if av == 1:
        return V.ONE_TOKEN
    if av <= 4:
        return av                      # TWO..FOUR equal their value
    for tok in (V.CAT1, V.CAT2, V.CAT3, V.CAT4, V.CAT5, V.CAT6):
        base, bits = V.CAT_EXTRA[tok]
        if av < base + (1 << len(bits)):
            return tok
    raise ValueError(f"coefficient {av} too large")


def encode_block(t, probs_block, first, ctx, levels):
    """Token-encode one 4x4 block; *levels* are 16 pre-dequant ints in
    SCAN order.  Mirrors the decoder's context/skip-EOB rules."""
    last = -1
    for i in range(first, 16):
        if levels[i]:
            last = i
    i, skip_eob = first, False
    while i < 16:
        p = probs_block[V.COEF_BANDS[i]][ctx]
        start = 2 if skip_eob else 0
        if i > last:
            assert not skip_eob          # streams never end in a zero
            t.tree(V.COEF_TREE, p, V.EOB_TOKEN, start)
            break
        v = levels[i]
        if v == 0:
            t.tree(V.COEF_TREE, p, V.ZERO_TOKEN, start)
            ctx, skip_eob = 0, True
            i += 1
            continue
        skip_eob = False
        av = abs(v)
        tok = _value_token(av)
        t.tree(V.COEF_TREE, p, tok, start)
        if tok in V.CAT_EXTRA:
            base, bit_probs = V.CAT_EXTRA[tok]
            extra = av - base
            for j, bp in enumerate(bit_probs):
                t.bit((extra >> (len(bit_probs) - 1 - j)) & 1, bp)
        t.bit(1 if v < 0 else 0, 128)
        ctx = 1 if av == 1 else 2
        i += 1
    return int(last >= first)


def make_keyframe(width, height, ymodes, uvmodes, bmodes=None,
                  y_ac_qi=0, filter_level=0, sharpness=0,
                  levels_fn=None, skips=None, prob_skip=200,
                  filter_type=0, n_partitions=1, segments=None,
                  segment_quant=None, coef_updates=None):
    """Assemble a complete VP8 keyframe bitstream (see the decoder's
    `_parse_header` for the field order this mirrors).

    Optional coverage knobs: *n_partitions* token partitions (row %
    n); *segments* = per-MB segment-id grid with *segment_quant* = 4
    ABSOLUTE per-segment quantizer indices; *coef_updates* =
    {(i,j,k,m): prob} token-probability overrides, signalled in the
    header and used for token encoding."""
    mb_rows = (height + 15) // 16
    mb_cols = (width + 15) // 16
    bmodes = bmodes or {}
    skips = skips if skips is not None else \
        [[0] * mb_cols for _ in range(mb_rows)]
    coef_updates = coef_updates or {}
    e = BoolEncoder()
    e.bit(0, 128)                        # color_space
    e.bit(0, 128)                        # clamping
    if segments is None:
        e.bit(0, 128)                    # segmentation off
    else:
        e.bit(1, 128)                    # segmentation on
        e.bit(1, 128)                    # update mb segmentation map
        e.bit(1, 128)                    # update segment feature data
        e.bit(1, 128)                    # ABSOLUTE deltas
        for q in segment_quant:          # 4 quantizer values
            e.bit(1, 128)
            e.literal(abs(q), 7)
            e.bit(1 if q < 0 else 0, 128)
        for _ in range(4):               # no per-segment lf values
            e.bit(0, 128)
        for _ in range(3):               # tree probs stay 255
            e.bit(0, 128)
    e.bit(filter_type, 128)
    e.literal(filter_level, 6)
    e.literal(sharpness, 3)
    e.bit(0, 128)                        # lf deltas off
    import math
    e.literal(int(math.log2(n_partitions)), 2)
    e.literal(y_ac_qi, 7)
    for _ in range(5):
        e.bit(0, 128)                    # no quant deltas
    e.bit(1, 128)                        # refresh entropy
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    if (i, j, k, m) in coef_updates:
                        e.bit(1, V.COEF_UPDATE_PROBS[i][j][k][m])
                        e.literal(coef_updates[(i, j, k, m)], 8)
                    else:
                        e.bit(0, V.COEF_UPDATE_PROBS[i][j][k][m])
    any_skip = any(any(row) for row in skips)
    e.bit(1 if any_skip else 0, 128)
    if any_skip:
        e.literal(prob_skip, 8)
    bctx = np.full((4 * mb_rows, 4 * mb_cols), V.B_DC_PRED, np.int32)
    for my in range(mb_rows):
        for mx in range(mb_cols):
            if segments is not None:
                e.tree(V.MB_SEGMENT_TREE, (255, 255, 255),
                       segments[my][mx])
            if any_skip:
                e.bit(skips[my][mx], prob_skip)
            ym = ymodes[my][mx]
            e.tree(V.KF_YMODE_TREE, V.KF_YMODE_PROB, ym)
            if ym == V.B_PRED:
                modes = bmodes[(my, mx)]
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    gy, gx = 4 * my + r, 4 * mx + c
                    above = bctx[gy - 1, gx] if gy > 0 else V.B_DC_PRED
                    left = bctx[gy, gx - 1] if gx > 0 else V.B_DC_PRED
                    e.tree(V.BMODE_TREE, V.KF_BMODE_PROB[above][left],
                           modes[sb])
                    bctx[gy, gx] = modes[sb]
            else:
                bctx[4 * my:4 * my + 4, 4 * mx:4 * mx + 4] = \
                    V.MODE_TO_BMODE[ym]
            e.tree(V.UV_MODE_TREE, V.KF_UV_MODE_PROB, uvmodes[my][mx])
    part1 = e.stop()
    encoders = [BoolEncoder() for _ in range(n_partitions)]
    ay = [[0] * 4 for _ in range(mb_cols)]
    au = [[0] * 2 for _ in range(mb_cols)]
    av_ = [[0] * 2 for _ in range(mb_cols)]
    ay2 = [0] * mb_cols
    probs = [[[list(c) for c in b] for b in blk]
             for blk in V.DEFAULT_COEF_PROBS]
    for (i, j, k, m), pv in coef_updates.items():
        probs[i][j][k][m] = pv
    for my in range(mb_rows):
        t = encoders[my % n_partitions]
        ly, lu, lv, ly2 = [0] * 4, [0] * 2, [0] * 2, [0]
        for mx in range(mb_cols):
            ym = ymodes[my][mx]
            has_y2 = ym != V.B_PRED
            if skips[my][mx]:
                for c in range(4):
                    ay[mx][c] = 0
                for c in range(2):
                    au[mx][c] = av_[mx][c] = 0
                ly[:], lu[:], lv[:] = [0] * 4, [0] * 2, [0] * 2
                if has_y2:
                    ay2[mx] = ly2[0] = 0
                continue
            lv_fn = levels_fn(my, mx) if levels_fn else None
            y2_l, y_l, uv_l = lv_fn if lv_fn else (
                None, [[0] * 16] * 16, [[0] * 16] * 8)
            if has_y2:
                ctx = ay2[mx] + ly2[0]
                z = encode_block(t, probs[1], 0, ctx, y2_l or [0] * 16)
                ay2[mx] = ly2[0] = z
            ptype = 0 if has_y2 else 3
            first = 1 if has_y2 else 0
            for sb in range(16):
                r, c = divmod(sb, 4)
                ctx = ay[mx][c] + ly[r]
                z = encode_block(t, probs[ptype], first, ctx, y_l[sb])
                ay[mx][c] = ly[r] = z
            for pi, (ab, le) in ((0, (au, lu)), (1, (av_, lv))):
                for sb in range(4):
                    r, c = divmod(sb, 2)
                    ctx = ab[mx][c] + le[r]
                    z = encode_block(t, probs[2], 0, ctx,
                                     uv_l[4 * pi + sb])
                    ab[mx][c] = le[r] = z
    parts = [t.stop() for t in encoders]
    tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    hdr += b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
    size_table = b"".join(
        len(p_).to_bytes(3, "little") for p_ in parts[:-1])
    return hdr + part1 + size_table + b"".join(parts)


def wrap_webp(vp8_payload: bytes) -> bytes:
    """RIFF/WEBP container around a VP8 chunk."""
    chunk = b"VP8 " + struct.pack("<I", len(vp8_payload)) + vp8_payload
    if len(vp8_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _riff_chunk(fcc: bytes, data: bytes) -> bytes:
    out = fcc + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        out += b"\x00"
    return out


def make_animated_webp(frames, durations_ms, offsets=None, flags=None,
                       canvas_wh=None,
                       bg_bgra=bytes([255, 255, 255, 255])) -> bytes:
    """Animated WebP container: VP8X + ANIM + one ANMF per frame.

    *frames*: list of (fourcc, payload, (w, h)) — fourcc b"VP8 " or
    b"VP8L".  *flags* per frame: bit 0 = dispose-to-background,
    bit 1 = no-blend (overwrite).  *bg_bgra* is the ANIM background.
    """
    n = len(frames)
    offsets = offsets or [(0, 0)] * n
    flags = flags or [0] * n
    if canvas_wh is None:
        cw = max(o[0] + wh[0] for (_, _, wh), o in zip(frames, offsets))
        ch = max(o[1] + wh[1] for (_, _, wh), o in zip(frames, offsets))
    else:
        cw, ch = canvas_wh
    body = _riff_chunk(
        b"VP8X", bytes([0x02, 0, 0, 0])
        + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little"))
    body += _riff_chunk(b"ANIM", bg_bgra + (0).to_bytes(2, "little"))
    for (fcc, payload, (w, h)), (x, y), dur, fl in zip(
            frames, offsets, durations_ms, flags):
        anmf = ((x // 2).to_bytes(3, "little")
                + (y // 2).to_bytes(3, "little")
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little")
                + int(dur).to_bytes(3, "little") + bytes([fl])
                + _riff_chunk(fcc, payload))
        body += _riff_chunk(b"ANMF", anmf)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def uniform_vp8(width, height, y2_level) -> bytes:
    """A keyframe whose Y plane is uniformly 128 + f(y2_level)."""
    mb_rows = (height + 15) // 16
    mb_cols = (width + 15) // 16

    def levels(my, mx):
        y2 = [0] * 16
        y2[0] = y2_level
        return (y2, [[0] * 16] * 16, [[0] * 16] * 8)

    return make_keyframe(width, height,
                         [[V.DC_PRED] * mb_cols] * mb_rows,
                         [[V.DC_PRED] * mb_cols] * mb_rows,
                         levels_fn=levels)
