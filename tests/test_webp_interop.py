"""WebP lossless (VP8L) + alpha (ALPH) interop vs the system libwebp.

Complements ``test_vp8_interop.py`` (lossy VP8 keyframes): here the
REAL encoder produces VP8L and lossy-with-alpha containers, and the
pure-Python decoders must reproduce libwebp's own decode BIT-EXACTLY.

* VP8L is lossless, so ``decode_image_bytes`` must equal
  ``WebPDecodeRGBA`` byte-for-byte (note: libwebp's DEFAULT lossless
  encode is not ``exact`` — RGB under fully transparent pixels may be
  rewritten — so the reference is libwebp's decode, not the input).
  These streams exercise paths the in-repo fixture encoder never
  emits: 0-bit code-length codes ("repeat-prev only" alphabets),
  meta-Huffman entropy images, the full LZ77 distance map, palettes,
  and real predictor/color-transform tile grids.
* ALPH covers the lossy-with-alpha container: the alpha plane decodes
  through the signature-less VP8L stream (or raw bytes) + the row
  filters, and must match the alpha channel of ``WebPDecodeRGBA``
  exactly; the color part is compared in YUV space (bit-exact
  reconstruction) against ``WebPDecodeYUV``.

All tests skip when libwebp is unavailable.
"""

import numpy as np
import pytest

from legend_community_delta_spark.operators import multimodal as MM
from legend_community_delta_spark.operators.vp8 import decode_vp8_keyframe

try:
    import libwebp_ref as W
    HAVE_LIBWEBP = True
except OSError:                                     # pragma: no cover
    HAVE_LIBWEBP = False

pytestmark = pytest.mark.skipif(
    not HAVE_LIBWEBP, reason="system libwebp not available")


def _rgba(h, w, seed, structured):
    rng = np.random.default_rng(seed)
    if structured:
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack([(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256,
                         ((xx * 7 + yy * 3) % 3 * 120) % 256],
                        -1).astype(np.uint8)
    img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    img[..., 3] = np.where(rng.random((h, w)) < 0.3, 255, img[..., 3])
    return img


class TestVP8LLossless:
    @pytest.mark.parametrize("w,h", [(16, 16), (33, 7), (64, 48),
                                     (128, 90), (5, 200), (201, 3),
                                     (300, 200)])
    @pytest.mark.parametrize("structured", [False, True])
    def test_bit_exact_vs_libwebp(self, w, h, structured):
        img = _rgba(h, w, seed=w * h, structured=structured)
        blob = W.encode_lossless_rgba(img)
        ref = W.decode_rgba(blob)
        out = MM.decode_image_bytes(blob)
        if out.shape[-1] == 3:
            out = np.dstack([out,
                             np.full(out.shape[:2], 255, np.uint8)])
        assert np.array_equal(out, ref)


class TestVP8LPredictorEdges:
    @pytest.mark.parametrize("w,h", [(32, 32), (47, 65), (120, 8)])
    def test_top_right_wraps_to_current_row(self, w, h):
        """Round-11 regression: predictors using TR at the right edge
        must read the CURRENT row's first pixel (the contiguous-buffer
        rule), not clamp to T — this image family makes the encoder
        pick TR-using predictors on right-edge tiles."""
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(xx * 3) % 256, (yy * 5) % 256, (xx * yy) % 256,
                        np.where((xx + yy) % 3 == 0, 255,
                                 (xx * 13) % 256)], -1).astype(np.uint8)
        blob = W.encode_lossless_rgba(img)
        ref = W.decode_rgba(blob)
        out = MM.decode_image_bytes(blob)
        if out.shape[-1] == 3:
            out = np.dstack([out,
                             np.full(out.shape[:2], 255, np.uint8)])
        assert np.array_equal(out, ref)


class TestALPH:
    @pytest.mark.parametrize("w,h,q", [(16, 16, 75.0), (48, 32, 50.0),
                                       (17, 23, 90.0), (96, 64, 30.0)])
    def test_lossy_with_alpha(self, w, h, q):
        img = _rgba(h, w, seed=7 * w + h, structured=False)
        yy, xx = np.mgrid[0:h, 0:w]
        img[..., 3] = ((xx * 5 + yy * 9) % 256).astype(np.uint8)
        blob = W.encode_rgba(img, q)
        ref = W.decode_rgba(blob)
        out = MM.decode_image_bytes(blob)
        assert out.shape[-1] == 4, "ALPH chunk must yield a 4th channel"
        assert np.array_equal(out[..., 3], ref[..., 3])
        # color part: compare at the bit-exact reconstruction level
        payload = W.vp8_chunk(blob)
        Yr, Ur, Vr = W.decode_yuv(blob)
        Y, U, Vp = decode_vp8_keyframe(payload, yuv=True)
        assert np.array_equal(Y, Yr)
        assert np.array_equal(U, Ur)
        assert np.array_equal(Vp, Vr)

    def test_smooth_alpha_uses_vp8l_compression(self):
        # a smooth gradient makes the encoder pick the compressed
        # (VP8L) alpha path + a row filter; checker alpha tends to
        # pick raw.  Both must match libwebp exactly either way.
        h, w = 40, 56
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.dstack([
            ((xx * 9) % 256).astype(np.uint8),
            ((yy * 7) % 256).astype(np.uint8),
            ((xx + 2 * yy) % 256).astype(np.uint8),
            np.minimum(255, xx * 4 + yy).astype(np.uint8)])
        blob = W.encode_rgba(img, 80.0)
        ref = W.decode_rgba(blob)
        out = MM.decode_image_bytes(blob)
        assert out.shape[-1] == 4
        assert np.array_equal(out[..., 3], ref[..., 3])
