"""VP8 intra-frame (keyframe) decoder — RFC 6386, pure python + numpy.

Closes the last multimodal gap flagged in round 9: lossy WebP (``VP8 ``
chunks) previously raised pointedly; keyframes now decode natively.
Inter (P-)frames still raise — they need reference-frame buffers and
motion compensation, which a still-image pipeline never sees (a WebP
file's single frame is always a keyframe).

Scope and verification honesty:

* The decoder machinery — boolean arithmetic decoder, tree decoding,
  header/mode parsing, token decoding with band/context selection,
  dequantization, 4x4 iDCT + Walsh-Hadamard, all 4x4/16x16/chroma
  intra predictors, and the normal + simple loop filters — follows
  RFC 6386 (sections 7-15) and is pinned by round-trip fixtures: the
  test suite assembles real bitstreams with its own boolean ENCODER
  and checks reconstruction against independently-computed pixels.
* The large probability CONSTANT tables (default token probabilities
  §13.5, token-probability update probabilities §13.4, keyframe
  B-mode probabilities §11.4) are the complete spec constants,
  EXTRACTED from the system reference codec's read-only data
  (``libwebp.so.7``'s ``CoeffsProba0`` / ``CoeffsUpdateProba`` /
  ``kBModesProba``, which compile the RFC tables verbatim) and
  re-verified against that binary by ``tests/test_vp8_interop.py``
  whenever the library is present.  The same test suite also checks
  END-TO-END interop: real lossy WebP bitstreams produced by
  ``WebPEncodeRGB`` are decoded by THIS decoder and compared
  bit-exactly against ``WebPDecodeYUV``.  The smaller mode/tree/
  dequant tables are pinned by the same interop pass.

Reference parity note: finos/legend-community-delta has no media path
at all; this belongs to the training-data-pipeline extension surface
(multimodal decode via ``operators/multimodal.py``).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_vp8_keyframe"]


# ---------------------------------------------------------------------------
# Constant tables (RFC 6386)
# ---------------------------------------------------------------------------

# token alphabet (§13.2)
ZERO_TOKEN, ONE_TOKEN, TWO_TOKEN, THREE_TOKEN, FOUR_TOKEN = 0, 1, 2, 3, 4
CAT1, CAT2, CAT3, CAT4, CAT5, CAT6, EOB_TOKEN = 5, 6, 7, 8, 9, 10, 11

COEF_TREE = (
    -EOB_TOKEN, 2,
    -ZERO_TOKEN, 4,
    -ONE_TOKEN, 6,
    8, 12,
    -TWO_TOKEN, 10,
    -THREE_TOKEN, -FOUR_TOKEN,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6,
)

# extra-bit categories: (base value, per-bit probabilities)  (§13.2)
CAT_EXTRA = {
    CAT1: (5, (159,)),
    CAT2: (7, (165, 145)),
    CAT3: (11, (173, 148, 140)),
    CAT4: (19, (176, 155, 140, 135)),
    CAT5: (35, (180, 157, 141, 134, 130)),
    CAT6: (67, (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)),
}

COEF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# dequantization lookups (§14.1), indexed by clamped q index 0..127
DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
)
AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)

# macroblock / subblock intra modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED, B_RD_PRED,
 B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)

UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183)

BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)

MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# 16x16-mode -> implied subblock mode, for B-mode contexts (§11.3)
MODE_TO_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                 H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}


# Keyframe subblock-mode probabilities kf_bmode_prob[above][left][9]
# (RFC 6386 §11.4 / libvpx entropymode).  Extracted from libwebp's
# kBModesProba and re-indexed into RFC mode numbering: libwebp's
# internal B-mode enum orders the diagonal modes (RD, VR, LD) and this
# module follows the RFC/libvpx order (LD, RD, VR), so rows/columns
# are permuted by rfc->libwebp index map (0,1,2,3,6,4,5,7,8,9).
# Verified end-to-end against real libwebp-encoded bitstreams
# (tests/test_vp8_interop.py).
KF_BMODE_PROB = (
    ((231, 120, 48, 89, 115, 113, 120, 152, 112),
     (152, 179, 64, 126, 170, 118, 46, 70, 95),
     (175, 69, 143, 80, 85, 82, 72, 155, 103),
     (56, 58, 10, 171, 218, 189, 17, 13, 152),
     (144, 71, 10, 38, 171, 213, 144, 34, 26),
     (114, 26, 17, 163, 44, 195, 21, 10, 173),
     (121, 24, 80, 195, 26, 62, 44, 64, 85),
     (170, 46, 55, 19, 136, 160, 33, 206, 71),
     (63, 20, 8, 114, 114, 208, 12, 9, 226),
     (81, 40, 11, 96, 182, 84, 29, 16, 36)),
    ((134, 183, 89, 137, 98, 101, 106, 165, 148),
     (72, 187, 100, 130, 157, 111, 32, 75, 80),
     (66, 102, 167, 99, 74, 62, 40, 234, 128),
     (41, 53, 9, 178, 241, 141, 26, 8, 107),
     (104, 79, 12, 27, 217, 255, 87, 17, 7),
     (74, 43, 26, 146, 73, 166, 49, 23, 157),
     (65, 38, 105, 160, 51, 52, 31, 115, 128),
     (87, 68, 71, 44, 114, 51, 15, 186, 23),
     (47, 41, 14, 110, 182, 183, 21, 17, 194),
     (66, 45, 25, 102, 197, 189, 23, 18, 22)),
    ((88, 88, 147, 150, 42, 46, 45, 196, 205),
     (43, 97, 183, 117, 85, 38, 35, 179, 61),
     (39, 53, 200, 87, 26, 21, 43, 232, 171),
     (56, 34, 51, 104, 114, 102, 29, 93, 77),
     (107, 54, 32, 26, 51, 1, 81, 43, 31),
     (39, 28, 85, 171, 58, 165, 90, 98, 64),
     (34, 22, 116, 206, 23, 34, 43, 166, 73),
     (68, 25, 106, 22, 64, 171, 36, 225, 114),
     (34, 19, 21, 102, 132, 188, 16, 76, 124),
     (62, 18, 78, 95, 85, 57, 50, 48, 51)),
    ((193, 101, 35, 159, 215, 111, 89, 46, 111),
     (60, 148, 31, 172, 219, 228, 21, 18, 111),
     (112, 113, 77, 85, 179, 255, 38, 120, 114),
     (40, 42, 1, 196, 245, 209, 10, 25, 109),
     (100, 80, 8, 43, 154, 1, 51, 26, 71),
     (88, 43, 29, 140, 166, 213, 37, 43, 154),
     (61, 63, 30, 155, 67, 45, 68, 1, 209),
     (142, 78, 78, 16, 255, 128, 34, 197, 171),
     (41, 40, 5, 102, 211, 183, 4, 1, 221),
     (51, 50, 17, 168, 209, 192, 23, 25, 82)),
    ((125, 98, 42, 88, 104, 85, 117, 175, 82),
     (95, 84, 53, 89, 128, 100, 113, 101, 45),
     (75, 79, 123, 47, 51, 128, 81, 171, 1),
     (57, 17, 5, 71, 102, 57, 53, 41, 49),
     (115, 21, 2, 10, 102, 255, 166, 23, 6),
     (38, 33, 13, 121, 57, 73, 26, 1, 85),
     (41, 10, 67, 138, 77, 110, 90, 47, 114),
     (101, 29, 16, 10, 85, 128, 101, 196, 26),
     (57, 18, 10, 102, 102, 213, 34, 20, 43),
     (117, 20, 15, 36, 163, 128, 68, 1, 26)),
    ((138, 31, 36, 171, 27, 166, 38, 44, 229),
     (67, 87, 58, 169, 82, 115, 26, 59, 179),
     (63, 59, 90, 180, 59, 166, 93, 73, 154),
     (40, 40, 21, 116, 143, 209, 34, 39, 175),
     (57, 46, 22, 24, 128, 1, 54, 17, 37),
     (47, 15, 16, 183, 34, 223, 49, 45, 183),
     (46, 17, 33, 183, 6, 98, 15, 32, 183),
     (65, 32, 73, 115, 28, 128, 23, 128, 205),
     (40, 3, 9, 115, 51, 192, 18, 6, 223),
     (87, 37, 9, 115, 59, 77, 64, 21, 47)),
    ((104, 55, 44, 218, 9, 54, 53, 130, 226),
     (64, 90, 70, 205, 40, 41, 23, 26, 57),
     (54, 57, 112, 184, 5, 41, 38, 166, 213),
     (30, 34, 26, 133, 152, 116, 10, 32, 134),
     (75, 32, 12, 51, 192, 255, 160, 43, 51),
     (39, 19, 53, 221, 26, 114, 32, 73, 255),
     (31, 9, 65, 234, 2, 15, 1, 118, 73),
     (88, 31, 35, 67, 102, 85, 55, 186, 85),
     (56, 21, 23, 111, 59, 205, 45, 37, 192),
     (55, 38, 70, 124, 73, 102, 1, 34, 98)),
    ((102, 61, 71, 37, 34, 53, 31, 243, 192),
     (69, 60, 71, 38, 73, 119, 28, 222, 37),
     (68, 45, 128, 34, 1, 47, 11, 245, 171),
     (62, 17, 19, 70, 146, 85, 55, 62, 70),
     (75, 15, 9, 9, 64, 255, 184, 119, 16),
     (37, 43, 37, 154, 100, 163, 85, 160, 1),
     (63, 9, 92, 136, 28, 64, 32, 201, 85),
     (86, 6, 28, 5, 64, 255, 25, 248, 1),
     (56, 8, 17, 132, 137, 255, 55, 116, 128),
     (58, 15, 20, 82, 135, 57, 26, 121, 40)),
    ((164, 50, 31, 137, 154, 133, 25, 35, 218),
     (51, 103, 44, 131, 131, 123, 31, 6, 158),
     (86, 40, 64, 135, 148, 224, 45, 183, 128),
     (22, 26, 17, 131, 240, 154, 14, 1, 209),
     (83, 12, 13, 54, 192, 255, 68, 47, 28),
     (45, 16, 21, 91, 64, 222, 7, 1, 197),
     (56, 21, 39, 155, 60, 138, 23, 102, 213),
     (85, 26, 85, 85, 128, 128, 32, 146, 171),
     (18, 11, 7, 63, 144, 171, 4, 4, 246),
     (35, 27, 10, 146, 174, 171, 12, 26, 128)),
    ((190, 80, 35, 99, 180, 80, 126, 54, 45),
     (85, 126, 47, 87, 176, 51, 41, 20, 32),
     (101, 75, 128, 139, 118, 146, 116, 128, 85),
     (56, 41, 15, 176, 236, 85, 37, 9, 62),
     (146, 36, 19, 30, 171, 255, 97, 27, 20),
     (71, 30, 17, 119, 118, 255, 17, 18, 138),
     (101, 38, 60, 138, 55, 70, 43, 26, 142),
     (138, 45, 61, 62, 219, 1, 81, 188, 64),
     (32, 41, 20, 117, 151, 142, 20, 21, 163),
     (112, 19, 12, 61, 195, 128, 48, 4, 24)),
)


# Default token probabilities default_coef_probs[block_type][band][ctx][11]
# (RFC 6386 §13.5 / libwebp CoeffsProba0).  Block types: 0 = Y after
# Y2, 1 = Y2, 2 = chroma, 3 = Y without Y2.  Complete table; see
# module docstring for provenance.
DEFAULT_COEF_PROBS = (
    (  # block type 0
        ((128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
         (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
         (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128)),
        ((253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128),
         (189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128),
         (106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128)),
        ((1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128),
         (181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128),
         (78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128)),
        ((1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128),
         (184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128),
         (77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128)),
        ((1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128),
         (170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128),
         (37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128)),
        ((1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128),
         (207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128),
         (102, 103, 231, 255, 211, 171, 128, 128, 128, 128, 128)),
        ((1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128),
         (177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128),
         (80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128)),
        ((1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
         (246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
         (255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128)),
    ),
    (  # block type 1
        ((198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62),
         (131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1),
         (68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128)),
        ((1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128),
         (184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128),
         (81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128)),
        ((1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128),
         (99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128),
         (23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128)),
        ((1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128),
         (109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128),
         (44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128)),
        ((1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128),
         (94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128),
         (22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128)),
        ((1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128),
         (124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128),
         (35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128)),
        ((1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128),
         (121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128),
         (45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128)),
        ((1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128),
         (203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128),
         (137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128)),
    ),
    (  # block type 2
        ((253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128),
         (175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128),
         (73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128)),
        ((1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128),
         (239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128),
         (155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128)),
        ((1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128),
         (201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128),
         (69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128)),
        ((1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128),
         (223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128),
         (141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128)),
        ((1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128),
         (190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128),
         (149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
        ((1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128),
         (247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128),
         (240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
        ((1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128),
         (213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128),
         (55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
        ((128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
         (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
         (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128)),
    ),
    (  # block type 3
        ((202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255),
         (126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128),
         (61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128)),
        ((1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128),
         (166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128),
         (39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128)),
        ((1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128),
         (124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128),
         (24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128)),
        ((1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128),
         (149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128),
         (28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128)),
        ((1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128),
         (123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128),
         (20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128)),
        ((1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128),
         (168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128),
         (47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128)),
        ((1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128),
         (141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128),
         (42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128)),
        ((1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
         (244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
         (238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
    ),
)


# Token-probability-update probabilities coef_update_probs[block][band]
# [ctx][11] (RFC 6386 §13.4).  Every entry is read as the Bool-decoder
# probability of the per-position "update" flag, so in arithmetic coding
# EVERY value shifts the range split on EVERY frame-header read — the
# table must match the spec constant bit-for-bit even when no update is
# signalled.  Complete table; see module docstring for provenance.
COEF_UPDATE_PROBS = (
    (  # block type 0
        ((255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255),
         (249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255),
         (234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255),
         (250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255),
         (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
    ),
    (  # block type 1
        ((217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255),
         (234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255)),
        ((255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (252, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255),
         (250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
    ),
    (  # block type 2
        ((186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255),
         (234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255),
         (251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255)),
        ((255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255)),
        ((255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
    ),
    (  # block type 3
        ((248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255),
         (248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255),
         (246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255),
         (252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255)),
        ((255, 254, 252, 255, 255, 255, 255, 255, 255, 255, 255),
         (248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255),
         (253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (245, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255),
         (252, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (249, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255),
         (250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
        ((255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
         (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
    ),
)


# ---------------------------------------------------------------------------
# Boolean (arithmetic) decoder — RFC 6386 §7
# ---------------------------------------------------------------------------

class BoolDecoder:
    """The VP8 boolean decoder: a 16-bit sliding window (``value``)
    against an 8-bit ``range`` renormalized to [128, 255]."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = ((data[0] << 8) | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0)
        if len(data) < 2:
            self.pos = len(data)
        self.range = 255
        self.bit_count = 0

    def read_bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return ret

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read_literal(n)
        return -v if self.read_bool(128) else v

    def read_tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read_bool(probs[i >> 1])]
            if i <= 0:
                return -i


def _flagged_delta(bd: BoolDecoder, bits: int) -> int:
    """RFC's ``F? L(bits) sign`` pattern for quantizer/filter deltas."""
    return bd.read_signed(bits) if bd.read_bool(128) else 0


# ---------------------------------------------------------------------------
# Frame header — RFC 6386 §9
# ---------------------------------------------------------------------------

class _FrameHeader:
    pass


def _parse_header(data: bytes) -> tuple:
    """Uncompressed + compressed keyframe header.  Returns
    (header, first-partition BoolDecoder, token-partition decoders)."""
    if len(data) < 10:
        raise ValueError("VP8 payload shorter than the keyframe header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError(
            "VP8 inter (P-)frame: decoding needs reference-frame "
            "buffers and motion compensation; only keyframes (every "
            "still WebP) decode natively")
    h = _FrameHeader()
    h.version = (tag >> 1) & 7
    h.show_frame = (tag >> 4) & 1
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w_raw, h_raw = struct.unpack_from("<HH", data, 6)
    h.width, h.xscale = w_raw & 0x3FFF, w_raw >> 14
    h.height, h.yscale = h_raw & 0x3FFF, h_raw >> 14
    if h.width == 0 or h.height == 0:
        raise ValueError("VP8 frame with zero dimension")
    if 10 + first_part_size > len(data):
        raise ValueError("VP8 first partition overruns the payload")
    bd = BoolDecoder(data[10:10 + first_part_size])

    h.color_space = bd.read_bool(128)
    h.clamping_type = bd.read_bool(128)

    # segmentation (§9.3)
    h.segmentation_enabled = bd.read_bool(128)
    h.update_mb_segmentation_map = 0
    h.segment_abs_deltas = 0
    h.segment_quant = [0, 0, 0, 0]
    h.segment_lf = [0, 0, 0, 0]
    h.segment_tree_probs = [255, 255, 255]
    if h.segmentation_enabled:
        h.update_mb_segmentation_map = bd.read_bool(128)
        update_data = bd.read_bool(128)
        if update_data:
            h.segment_abs_deltas = bd.read_bool(128)
            for i in range(4):
                h.segment_quant[i] = _flagged_delta(bd, 7)
            for i in range(4):
                h.segment_lf[i] = _flagged_delta(bd, 6)
        if h.update_mb_segmentation_map:
            for i in range(3):
                if bd.read_bool(128):
                    h.segment_tree_probs[i] = bd.read_literal(8)

    # loop filter (§9.4)
    h.filter_type = bd.read_bool(128)          # 1 = simple
    h.filter_level = bd.read_literal(6)
    h.sharpness = bd.read_literal(3)
    h.lf_delta_enabled = bd.read_bool(128)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta_enabled and bd.read_bool(128):
        for i in range(4):
            if bd.read_bool(128):
                h.ref_lf_deltas[i] = bd.read_signed(6)
        for i in range(4):
            if bd.read_bool(128):
                h.mode_lf_deltas[i] = bd.read_signed(6)

    # token partitions (§9.5)
    n_parts = 1 << bd.read_literal(2)
    part_start = 10 + first_part_size
    sizes_end = part_start + 3 * (n_parts - 1)
    if sizes_end > len(data):
        raise ValueError("VP8 token-partition size table overruns")
    parts = []
    pos = sizes_end
    for i in range(n_parts):
        if i < n_parts - 1:
            size = (data[part_start + 3 * i]
                    | (data[part_start + 3 * i + 1] << 8)
                    | (data[part_start + 3 * i + 2] << 16))
        else:
            size = len(data) - pos
        if pos + size > len(data) or size < 0:
            raise ValueError("VP8 token partition overruns the payload")
        parts.append(BoolDecoder(data[pos:pos + size]))
        pos += size

    # quantizers (§9.6)
    h.y_ac_qi = bd.read_literal(7)
    h.y_dc_delta = _flagged_delta(bd, 4)
    h.y2_dc_delta = _flagged_delta(bd, 4)
    h.y2_ac_delta = _flagged_delta(bd, 4)
    h.uv_dc_delta = _flagged_delta(bd, 4)
    h.uv_ac_delta = _flagged_delta(bd, 4)

    # refresh entropy (keyframe: read and ignore, §9.7)
    h.refresh_entropy = bd.read_bool(128)

    # token probability updates (§13.4)
    probs = [[[list(c) for c in b] for b in blk]
             for blk in DEFAULT_COEF_PROBS]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    if bd.read_bool(COEF_UPDATE_PROBS[i][j][k][m]):
                        probs[i][j][k][m] = bd.read_literal(8)
    h.coef_probs = probs

    h.mb_no_skip_coeff = bd.read_bool(128)
    h.prob_skip_false = bd.read_literal(8) if h.mb_no_skip_coeff else 0
    return h, bd, parts


# ---------------------------------------------------------------------------
# Dequantization (§9.6, §14.1) and inverse transforms (§14.3, §14.4)
# ---------------------------------------------------------------------------

def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _dequant_factors(h, segment: int) -> dict:
    """Per-segment (y1dc, y1ac, y2dc, y2ac, uvdc, uvac) multipliers."""
    if h.segmentation_enabled:
        base = (h.segment_quant[segment] if h.segment_abs_deltas
                else h.y_ac_qi + h.segment_quant[segment])
    else:
        base = h.y_ac_qi
    q = _clamp_q(base)
    y1dc = DC_QLOOKUP[_clamp_q(q + h.y_dc_delta)]
    y1ac = AC_QLOOKUP[q]
    y2dc = DC_QLOOKUP[_clamp_q(q + h.y2_dc_delta)] * 2
    y2ac = AC_QLOOKUP[_clamp_q(q + h.y2_ac_delta)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[_clamp_q(q + h.uv_dc_delta)]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[_clamp_q(q + h.uv_ac_delta)]
    return {"y1": (y1dc, y1ac), "y2": (y2dc, y2ac), "uv": (uvdc, uvac)}


_COS_K = 20091   # cospi8sqrt2 - 1, Q16
_SIN_K = 35468   # sinpi8sqrt2, Q16


def idct4x4(block: np.ndarray) -> np.ndarray:
    """Integer inverse 4x4 DCT (RFC 6386 §14.4); int16 in, int out
    (residual to add to prediction, before clamping)."""
    ip = block.astype(np.int64).reshape(4, 4)
    tmp = np.zeros((4, 4), np.int64)
    for i in range(4):        # columns
        a1 = ip[0, i] + ip[2, i]
        b1 = ip[0, i] - ip[2, i]
        t1 = (ip[1, i] * _SIN_K) >> 16
        t2 = ip[3, i] + ((ip[3, i] * _COS_K) >> 16)
        c1 = t1 - t2
        t1 = ip[1, i] + ((ip[1, i] * _COS_K) >> 16)
        t2 = (ip[3, i] * _SIN_K) >> 16
        d1 = t1 + t2
        tmp[0, i] = a1 + d1
        tmp[3, i] = a1 - d1
        tmp[1, i] = b1 + c1
        tmp[2, i] = b1 - c1
    out = np.zeros((4, 4), np.int64)
    for i in range(4):        # rows
        a1 = tmp[i, 0] + tmp[i, 2]
        b1 = tmp[i, 0] - tmp[i, 2]
        t1 = (tmp[i, 1] * _SIN_K) >> 16
        t2 = tmp[i, 3] + ((tmp[i, 3] * _COS_K) >> 16)
        c1 = t1 - t2
        t1 = tmp[i, 1] + ((tmp[i, 1] * _COS_K) >> 16)
        t2 = (tmp[i, 3] * _SIN_K) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(block: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block (§14.3): returns the 16
    DC values to seed the 16 Y subblock transforms."""
    ip = block.astype(np.int64).reshape(4, 4)
    tmp = np.zeros((4, 4), np.int64)
    for i in range(4):        # columns
        a1 = ip[0, i] + ip[3, i]
        b1 = ip[1, i] + ip[2, i]
        c1 = ip[1, i] - ip[2, i]
        d1 = ip[0, i] - ip[3, i]
        tmp[0, i] = a1 + b1
        tmp[1, i] = c1 + d1
        tmp[2, i] = a1 - b1
        tmp[3, i] = d1 - c1
    out = np.zeros((4, 4), np.int64)
    for i in range(4):        # rows
        a1 = tmp[i, 0] + tmp[i, 3]
        b1 = tmp[i, 1] + tmp[i, 2]
        c1 = tmp[i, 1] - tmp[i, 2]
        d1 = tmp[i, 0] - tmp[i, 3]
        out[i, 0] = (a1 + b1 + 3) >> 3
        out[i, 1] = (c1 + d1 + 3) >> 3
        out[i, 2] = (a1 - b1 + 3) >> 3
        out[i, 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# Token (residual) decoding — RFC 6386 §13
# ---------------------------------------------------------------------------

def _decode_coeffs(bd: BoolDecoder, probs_block, first: int, ctx: int,
                   dqf: tuple) -> tuple:
    """Decode one 4x4 block's tokens.  Returns (dequantized natural-order
    int32[16], had_nonzero).  *ctx* in {0,1,2} from left+above; *dqf* is
    (dc, ac) dequant multipliers applied by SCAN position."""
    coeffs = np.zeros(16, np.int32)
    i = first
    skip_eob = False
    nonzero = False
    while i < 16:
        band = COEF_BANDS[i]
        p = probs_block[band][ctx]
        token = bd.read_tree(COEF_TREE, p, start=2 if skip_eob else 0)
        if token == EOB_TOKEN:
            break
        if token == ZERO_TOKEN:
            ctx = 0
            skip_eob = True     # EOB cannot follow a zero token
            i += 1
            continue
        skip_eob = False
        if token == ONE_TOKEN:
            value = 1
            ctx = 1
        else:
            if token <= FOUR_TOKEN:
                value = token    # TWO..FOUR are literal values 2..4
            else:
                base, bit_probs = CAT_EXTRA[token]
                extra = 0
                for bp in bit_probs:
                    extra = (extra << 1) | bd.read_bool(bp)
                value = base + extra
            ctx = 2
        if bd.read_bool(128):
            value = -value
        q = dqf[0] if i == 0 else dqf[1]
        coeffs[ZIGZAG[i]] = value * q
        nonzero = True
        i += 1
    return coeffs, nonzero


# ---------------------------------------------------------------------------
# Intra prediction — RFC 6386 §12 (formulations follow the RFC's
# reference decoder)
# ---------------------------------------------------------------------------

def _clamp255(a):
    return np.clip(a, 0, 255)


def _pred_mb(plane: np.ndarray, oy: int, ox: int, size: int, mode: int,
             have_above: bool, have_left: bool) -> np.ndarray:
    """Whole-MB prediction (16x16 Y or 8x8 chroma) from the padded
    plane; (oy, ox) are PAD coordinates of the MB's top-left pixel."""
    above = plane[oy - 1, ox:ox + size].astype(np.int32)
    left = plane[oy:oy + size, ox - 1].astype(np.int32)
    al = int(plane[oy - 1, ox - 1])
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                1 + size.bit_length() - 1)    # (sum + n) >> log2(2n)
        elif have_above:
            dc = (int(above.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        elif have_left:
            dc = (int(left.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        else:
            dc = 128
        return np.full((size, size), dc, np.uint8)
    if mode == V_PRED:
        return np.tile(above.astype(np.uint8), (size, 1))
    if mode == H_PRED:
        return np.tile(left.astype(np.uint8)[:, None], (1, size))
    # TM_PRED
    return _clamp255(left[:, None] + above[None, :] - al).astype(np.uint8)


def _pred_subblock(plane: np.ndarray, py: int, px: int, mode: int,
                   above_right: np.ndarray) -> np.ndarray:
    """4x4 subblock prediction at pad coords (py, px).  *above_right*
    is the 4-pixel row to the upper right (already resolved by the
    caller per the VP8 right-edge rule)."""
    a = plane[py - 1, px:px + 4].astype(np.int32)
    left = plane[py:py + 4, px - 1].astype(np.int32)
    al = int(plane[py - 1, px - 1])
    ar = above_right.astype(np.int32)
    p = np.zeros((4, 4), np.int32)
    if mode == B_DC_PRED:
        p[:] = (int(a.sum()) + int(left.sum()) + 4) >> 3
    elif mode == B_TM_PRED:
        p = _clamp255(left[:, None] + a[None, :] - al)
    elif mode == B_VE_PRED:
        e = np.concatenate(([al], a, [ar[0]]))
        avg = (e[:-2] + 2 * e[1:-1] + e[2:] + 2) >> 2
        p[:] = avg[None, :]
    elif mode == B_HE_PRED:
        lx = np.concatenate(([al], left, [left[3]]))
        avg = (lx[:-2] + 2 * lx[1:-1] + lx[2:] + 2) >> 2
        p[:] = avg[:, None]
    elif mode == B_LD_PRED:
        aa = np.concatenate((a, ar))
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    p[r, c] = (aa[i] + 2 * aa[i + 1] + aa[i + 2] + 2) >> 2
                else:
                    p[r, c] = (aa[6] + 3 * aa[7] + 2) >> 2
    elif mode == B_RD_PRED:
        e = np.array([left[3], left[2], left[1], left[0], al,
                      a[0], a[1], a[2], a[3]], np.int32)
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                p[r, c] = (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
    elif mode == B_VR_PRED:
        e = np.array([left[3], left[2], left[1], left[0], al,
                      a[0], a[1], a[2], a[3]], np.int32)
        for c in range(4):
            p[0, c] = (e[4 + c] + e[5 + c] + 1) >> 1
            p[1, c] = (e[3 + c] + 2 * e[4 + c] + e[5 + c] + 2) >> 2
        p[2, 0] = (e[2] + 2 * e[3] + e[4] + 2) >> 2
        p[3, 0] = (e[1] + 2 * e[2] + e[3] + 2) >> 2
        p[2, 1:] = p[0, :3]
        p[3, 1:] = p[1, :3]
    elif mode == B_VL_PRED:
        aa = np.concatenate((a, ar))
        for c in range(4):
            p[0, c] = (aa[c] + aa[c + 1] + 1) >> 1
            p[1, c] = (aa[c] + 2 * aa[c + 1] + aa[c + 2] + 2) >> 2
        p[2, :3] = p[0, 1:]
        p[3, :3] = p[1, 1:]
        p[2, 3] = (aa[4] + 2 * aa[5] + aa[6] + 2) >> 2
        p[3, 3] = (aa[5] + 2 * aa[6] + aa[7] + 2) >> 2
    elif mode == B_HD_PRED:
        e = np.array([left[3], left[2], left[1], left[0], al,
                      a[0], a[1], a[2]], np.int32)
        for r in range(4):
            p[r, 0] = (e[3 - r] + e[4 - r] + 1) >> 1
            p[r, 1] = (e[3 - r] + 2 * e[4 - r] + e[5 - r] + 2) >> 2
        p[1, 2:] = p[0, :2]
        p[2, 2:] = p[1, :2]
        p[3, 2:] = p[2, :2]
        p[0, 2] = (e[4] + 2 * e[5] + e[6] + 2) >> 2
        p[0, 3] = (e[5] + 2 * e[6] + e[7] + 2) >> 2
    elif mode == B_HU_PRED:
        lf = left
        p[0, 0] = (lf[0] + lf[1] + 1) >> 1
        p[0, 1] = (lf[0] + 2 * lf[1] + lf[2] + 2) >> 2
        p[0, 2] = (lf[1] + lf[2] + 1) >> 1
        p[0, 3] = (lf[1] + 2 * lf[2] + lf[3] + 2) >> 2
        p[1, 0] = p[0, 2]
        p[1, 1] = p[0, 3]
        p[1, 2] = (lf[2] + lf[3] + 1) >> 1
        p[1, 3] = (lf[2] + 2 * lf[3] + lf[3] + 2) >> 2
        p[2, 0] = p[1, 2]
        p[2, 1] = p[1, 3]
        p[2, 2] = p[2, 3] = lf[3]
        p[3, :] = lf[3]
    else:
        raise ValueError(f"unknown subblock mode {mode}")
    return p.astype(np.uint8)


# ---------------------------------------------------------------------------
# Frame reconstruction
# ---------------------------------------------------------------------------

def _init_plane(rows: int, cols: int) -> np.ndarray:
    """Padded plane: 1 top border row (127), 1 left border col (129),
    8 right extension cols (filled by edge replication as rows land)."""
    p = np.empty((1 + rows, 1 + cols + 8), np.uint8)
    p[0, :] = 127
    p[1:, 0] = 129
    return p


def _parse_modes(h, bd: BoolDecoder, mb_rows: int, mb_cols: int) -> tuple:
    """First-partition per-MB records: segment, skip, y/uv modes and the
    per-subblock B modes (implied ones for non-B_PRED, for context)."""
    ymodes = np.zeros((mb_rows, mb_cols), np.int32)
    uvmodes = np.zeros((mb_rows, mb_cols), np.int32)
    segments = np.zeros((mb_rows, mb_cols), np.int32)
    skips = np.zeros((mb_rows, mb_cols), bool)
    bmodes = np.full((4 * mb_rows, 4 * mb_cols), B_DC_PRED, np.int32)
    for my in range(mb_rows):
        for mx in range(mb_cols):
            if h.segmentation_enabled and h.update_mb_segmentation_map:
                segments[my, mx] = bd.read_tree(MB_SEGMENT_TREE,
                                                h.segment_tree_probs)
            if h.mb_no_skip_coeff:
                skips[my, mx] = bool(bd.read_bool(h.prob_skip_false))
            ym = bd.read_tree(KF_YMODE_TREE, KF_YMODE_PROB)
            ymodes[my, mx] = ym
            if ym == B_PRED:
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    gy, gx = 4 * my + r, 4 * mx + c
                    above = (bmodes[gy - 1, gx] if gy > 0 else B_DC_PRED)
                    left = (bmodes[gy, gx - 1] if gx > 0 else B_DC_PRED)
                    bmodes[gy, gx] = bd.read_tree(
                        BMODE_TREE, KF_BMODE_PROB[above][left])
            else:
                bmodes[4 * my:4 * my + 4, 4 * mx:4 * mx + 4] = \
                    MODE_TO_BMODE[ym]
            uvmodes[my, mx] = bd.read_tree(UV_MODE_TREE, KF_UV_MODE_PROB)
    return ymodes, uvmodes, segments, skips, bmodes


def _decode_residuals(h, part: BoolDecoder, mx: int, has_y2: bool,
                      dq: dict, nz) -> tuple:
    """Token-decode one MB: returns (y2_dc_grid | None, y_coeffs[16][16],
    uv_coeffs[8][16], had_any_nonzero)."""
    probs = h.coef_probs
    above_y, left_y, above_u, left_u, above_v, left_v, above_y2, \
        left_y2 = nz
    any_nz = False
    y2_grid = None
    if has_y2:
        ctx = above_y2[mx] + left_y2[0]
        coeffs, z = _decode_coeffs(part, probs[1], 0, ctx, dq["y2"])
        above_y2[mx] = left_y2[0] = int(z)
        any_nz |= z
        y2_grid = iwht4x4(coeffs)
    ptype = 0 if has_y2 else 3
    first = 1 if has_y2 else 0
    y_coeffs = np.zeros((16, 16), np.int32)
    for sb in range(16):
        r, c = divmod(sb, 4)
        ctx = above_y[mx][c] + left_y[r]
        coeffs, z = _decode_coeffs(part, probs[ptype], first, ctx,
                                   dq["y1"])
        above_y[mx][c] = left_y[r] = int(z)
        any_nz |= z
        y_coeffs[sb] = coeffs
    uv_coeffs = np.zeros((8, 16), np.int32)
    for plane_i, (ab, le) in ((0, (above_u, left_u)),
                              (1, (above_v, left_v))):
        for sb in range(4):
            r, c = divmod(sb, 2)
            ctx = ab[mx][c] + le[r]
            coeffs, z = _decode_coeffs(part, probs[2], 0, ctx, dq["uv"])
            ab[mx][c] = le[r] = int(z)
            any_nz |= z
            uv_coeffs[4 * plane_i + sb] = coeffs
    return y2_grid, y_coeffs, uv_coeffs, any_nz


def _above_right(yplane: np.ndarray, oy: int, ox: int, r: int,
                 c: int) -> np.ndarray:
    """The 4 above-right pixels of subblock (r, c) in the MB at pad
    origin (oy, ox).  Interior columns read the reconstructed
    upper-right neighbor; the right column always reads the row ABOVE
    the MB (never the undecoded right neighbor), per the VP8 rule."""
    if c < 3:
        return yplane[oy + 4 * r - 1, ox + 4 * c + 4:ox + 4 * c + 8]
    return yplane[oy - 1, ox + 16:ox + 20]


def _reconstruct_mb(yp, up, vp, my, mx, ymode, uvmode, bmodes, y2_grid,
                    y_coeffs, uv_coeffs):
    oy, ox = 1 + 16 * my, 1 + 16 * mx
    if ymode == B_PRED:
        for sb in range(16):
            r, c = divmod(sb, 4)
            py, px = oy + 4 * r, ox + 4 * c
            ar = _above_right(yp, oy, ox, r, c)
            pred = _pred_subblock(yp, py, px,
                                  int(bmodes[4 * my + r, 4 * mx + c]), ar)
            coeffs = y_coeffs[sb]
            if coeffs.any():
                pix = _clamp255(pred.astype(np.int32) + idct4x4(coeffs))
            else:
                pix = pred
            yp[py:py + 4, px:px + 4] = pix
    else:
        pred = _pred_mb(yp, oy, ox, 16, ymode, my > 0, mx > 0)
        out = pred.astype(np.int32)
        for sb in range(16):
            r, c = divmod(sb, 4)
            coeffs = y_coeffs[sb].copy()
            if y2_grid is not None:
                coeffs[0] = y2_grid[r, c]
            if coeffs.any():
                out[4 * r:4 * r + 4, 4 * c:4 * c + 4] += idct4x4(coeffs)
        yp[oy:oy + 16, ox:ox + 16] = _clamp255(out)
    co, cx = 1 + 8 * my, 1 + 8 * mx
    for plane_i, plane in ((0, up), (1, vp)):
        pred = _pred_mb(plane, co, cx, 8, uvmode, my > 0, mx > 0)
        out = pred.astype(np.int32)
        for sb in range(4):
            r, c = divmod(sb, 2)
            coeffs = uv_coeffs[4 * plane_i + sb]
            if coeffs.any():
                out[4 * r:4 * r + 4, 4 * c:4 * c + 4] += idct4x4(coeffs)
        plane[co:co + 8, cx:cx + 8] = _clamp255(out)


# ---------------------------------------------------------------------------
# Loop filter — RFC 6386 §15
# ---------------------------------------------------------------------------

def _c8(v):
    return np.clip(v, -128, 127)


def _gather_edge(plane, y0, x0, n, horizontal):
    """int32 views of p3..p0, q0..q3 across an n-pixel edge.  For a
    horizontal edge the filtered pixels vary by row (q0 at row y0);
    vertical edges vary by column (q0 at col x0)."""
    if horizontal:
        rows = [plane[y0 + d, x0:x0 + n].astype(np.int32)
                for d in (-4, -3, -2, -1, 0, 1, 2, 3)]
    else:
        rows = [plane[y0:y0 + n, x0 + d].astype(np.int32)
                for d in (-4, -3, -2, -1, 0, 1, 2, 3)]
    return rows      # p3 p2 p1 p0 q0 q1 q2 q3


def _scatter_edge(plane, y0, x0, n, horizontal, vals):
    for d, v in zip((-4, -3, -2, -1, 0, 1, 2, 3), vals):
        u = np.clip(v, 0, 255).astype(np.uint8)
        if horizontal:
            plane[y0 + d, x0:x0 + n] = u
        else:
            plane[y0:y0 + n, x0 + d] = u


def _filter_common(ps1, ps0, qs0, qs1, use_outer):
    a = _c8(np.where(use_outer, _c8(ps1 - qs1), 0) + 3 * (qs0 - ps0))
    f1 = _c8(a + 4) >> 3
    f2 = _c8(a + 3) >> 3
    return _c8(qs0 - f1), _c8(ps0 + f2), f1


def _normal_filter(plane, y0, x0, n, horizontal, E, I, hev_t, mb_edge):
    px = _gather_edge(plane, y0, x0, n, horizontal)
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    mask = ((np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= E)
            & (np.abs(p3 - p2) <= I) & (np.abs(p2 - p1) <= I)
            & (np.abs(p1 - p0) <= I) & (np.abs(q1 - q0) <= I)
            & (np.abs(q2 - q1) <= I) & (np.abs(q3 - q2) <= I))
    if not mask.any():
        return
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    s = [v - 128 for v in (p1, p0, q0, q1, p2, q2)]
    ps1, ps0, qs0, qs1, ps2, qs2 = s
    if not mb_edge:
        nq0, np0, f1 = _filter_common(ps1, ps0, qs0, qs1, hev)
        a = (f1 + 1) >> 1
        nq1 = np.where(~hev, _c8(qs1 - a), qs1)
        np1 = np.where(~hev, _c8(ps1 + a), ps1)
        out = [p3, p2,
               np.where(mask, np1 + 128, p1),
               np.where(mask, np0 + 128, p0),
               np.where(mask, nq0 + 128, q0),
               np.where(mask, nq1 + 128, q1),
               q2, q3]
    else:
        # high-variance pixels get the sharp 2-tap adjust, the rest the
        # wide 3-tap smoothing (RFC §15.3)
        hq0, hp0, _ = _filter_common(ps1, ps0, qs0, qs1, True)
        w = _c8(_c8(ps1 - qs1) + 3 * (qs0 - ps0))
        a0 = (27 * w + 63) >> 7
        a1 = (18 * w + 63) >> 7
        a2 = (9 * w + 63) >> 7
        wq0, wp0 = _c8(qs0 - a0), _c8(ps0 + a0)
        wq1, wp1 = _c8(qs1 - a1), _c8(ps1 + a1)
        wq2, wp2 = _c8(qs2 - a2), _c8(ps2 + a2)
        nq0 = np.where(hev, hq0, wq0)
        np0 = np.where(hev, hp0, wp0)
        nq1 = np.where(hev, qs1, wq1)
        np1 = np.where(hev, ps1, wp1)
        nq2 = np.where(hev, qs2, wq2)
        np2 = np.where(hev, ps2, wp2)
        out = [p3,
               np.where(mask, np2 + 128, p2),
               np.where(mask, np1 + 128, p1),
               np.where(mask, np0 + 128, p0),
               np.where(mask, nq0 + 128, q0),
               np.where(mask, nq1 + 128, q1),
               np.where(mask, nq2 + 128, q2),
               q3]
    _scatter_edge(plane, y0, x0, n, horizontal, out)


def _simple_filter(plane, y0, x0, n, horizontal, E):
    px = _gather_edge(plane, y0, x0, n, horizontal)
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    mask = np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= E
    if not mask.any():
        return
    ps1, ps0, qs0, qs1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    nq0, np0, _ = _filter_common(ps1, ps0, qs0, qs1, True)
    out = [p3, p2, p1,
           np.where(mask, np0 + 128, p0),
           np.where(mask, nq0 + 128, q0),
           q1, q2, q3]
    _scatter_edge(plane, y0, x0, n, horizontal, out)


def _loop_filter(h, yp, up, vp, mb_rows, mb_cols, ymodes, segments,
                 has_coeffs):
    for my in range(mb_rows):
        for mx in range(mb_cols):
            if h.segmentation_enabled:
                lvl = (h.segment_lf[segments[my, mx]]
                       if h.segment_abs_deltas
                       else h.filter_level
                       + h.segment_lf[segments[my, mx]])
            else:
                lvl = h.filter_level
            if h.lf_delta_enabled:
                lvl += h.ref_lf_deltas[0]           # keyframe: intra
                if ymodes[my, mx] == B_PRED:
                    lvl += h.mode_lf_deltas[0]
            lvl = max(0, min(63, lvl))
            if lvl == 0:
                continue
            il = lvl
            if h.sharpness:
                il >>= 2 if h.sharpness > 4 else 1
                il = min(il, 9 - h.sharpness)
            il = max(il, 1)
            mb_e = (lvl + 2) * 2 + il
            sb_e = lvl * 2 + il
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            interior = bool(has_coeffs[my, mx]) or \
                ymodes[my, mx] == B_PRED
            oy, ox = 1 + 16 * my, 1 + 16 * mx
            co, cx = 1 + 8 * my, 1 + 8 * mx
            if h.filter_type:                        # simple: Y only
                if mx > 0:
                    _simple_filter(yp, oy, ox, 16, False, mb_e)
                if interior:
                    for dx in (4, 8, 12):
                        _simple_filter(yp, oy, ox + dx, 16, False, sb_e)
                if my > 0:
                    _simple_filter(yp, oy, ox, 16, True, mb_e)
                if interior:
                    for dy in (4, 8, 12):
                        _simple_filter(yp, oy + dy, ox, 16, True, sb_e)
                continue
            if mx > 0:
                _normal_filter(yp, oy, ox, 16, False, mb_e, il, hev_t,
                               True)
                _normal_filter(up, co, cx, 8, False, mb_e, il, hev_t,
                               True)
                _normal_filter(vp, co, cx, 8, False, mb_e, il, hev_t,
                               True)
            if interior:
                for dx in (4, 8, 12):
                    _normal_filter(yp, oy, ox + dx, 16, False, sb_e, il,
                                   hev_t, False)
                _normal_filter(up, co, cx + 4, 8, False, sb_e, il,
                               hev_t, False)
                _normal_filter(vp, co, cx + 4, 8, False, sb_e, il,
                               hev_t, False)
            if my > 0:
                _normal_filter(yp, oy, ox, 16, True, mb_e, il, hev_t,
                               True)
                _normal_filter(up, co, cx, 8, True, mb_e, il, hev_t,
                               True)
                _normal_filter(vp, co, cx, 8, True, mb_e, il, hev_t,
                               True)
            if interior:
                for dy in (4, 8, 12):
                    _normal_filter(yp, oy + dy, ox, 16, True, sb_e, il,
                                   hev_t, False)
                _normal_filter(up, co + 4, cx, 8, True, sb_e, il,
                               hev_t, False)
                _normal_filter(vp, co + 4, cx, 8, True, sb_e, il,
                               hev_t, False)


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                height: int, width: int) -> np.ndarray:
    """BT.601 limited-range YUV420 -> RGB, nearest-neighbor chroma
    upsampling (libwebp defaults to fancy upsampling; nearest keeps the
    math exact and is documented here as the deliberate choice)."""
    yy = y[:height, :width].astype(np.int32)
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1)[:height, :width] \
        .astype(np.int32)
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1)[:height, :width] \
        .astype(np.int32)
    c = yy - 16
    d = uu - 128
    e = vv - 128
    r = np.clip((298 * c + 409 * e + 128) >> 8, 0, 255)
    g = np.clip((298 * c - 100 * d - 208 * e + 128) >> 8, 0, 255)
    b = np.clip((298 * c + 516 * d + 128) >> 8, 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def decode_vp8_keyframe(data: bytes, yuv: bool = False):
    """Decode a VP8 keyframe bitstream (the payload of a WebP ``VP8 ``
    chunk) to an (h, w, 3) uint8 RGB array — or the raw
    ``(y, u, v)`` planes when *yuv* is true (exact-reconstruction
    tests compare in YUV space, before the lossy color convert)."""
    h, bd, parts = _parse_header(data)
    mb_rows = (h.height + 15) // 16
    mb_cols = (h.width + 15) // 16
    yp = _init_plane(16 * mb_rows, 16 * mb_cols)
    up = _init_plane(8 * mb_rows, 8 * mb_cols)
    vp = _init_plane(8 * mb_rows, 8 * mb_cols)

    ymodes, uvmodes, segments, skips, bmodes = _parse_modes(
        h, bd, mb_rows, mb_cols)

    # entropy (nonzero) contexts
    above_y = [[0] * 4 for _ in range(mb_cols)]
    above_u = [[0] * 2 for _ in range(mb_cols)]
    above_v = [[0] * 2 for _ in range(mb_cols)]
    above_y2 = [0] * mb_cols
    has_coeffs = np.zeros((mb_rows, mb_cols), bool)
    seg_dq = [_dequant_factors(h, s) for s in range(4)]

    for my in range(mb_rows):
        part = parts[my % len(parts)]
        left_y, left_u, left_v, left_y2 = [0] * 4, [0] * 2, [0] * 2, [0]
        for mx in range(mb_cols):
            ymode = int(ymodes[my, mx])
            has_y2 = ymode != B_PRED
            dq = seg_dq[int(segments[my, mx])]
            if skips[my, mx]:
                y2_grid, y_coeffs, uv_coeffs = None, \
                    np.zeros((16, 16), np.int32), \
                    np.zeros((8, 16), np.int32)
                for c in range(4):
                    above_y[mx][c] = 0
                for c in range(2):
                    above_u[mx][c] = above_v[mx][c] = 0
                left_y[:] = [0] * 4
                left_u[:] = [0] * 2
                left_v[:] = [0] * 2
                if has_y2:
                    above_y2[mx] = left_y2[0] = 0
                if has_y2:
                    y2_grid = np.zeros((4, 4), np.int64)
            else:
                nz = (above_y, left_y, above_u, left_u, above_v,
                      left_v, above_y2, left_y2)
                y2_grid, y_coeffs, uv_coeffs, any_nz = \
                    _decode_residuals(h, part, mx, has_y2, dq, nz)
                has_coeffs[my, mx] = any_nz
            _reconstruct_mb(yp, up, vp, my, mx, ymode,
                            int(uvmodes[my, mx]), bmodes, y2_grid,
                            y_coeffs, uv_coeffs)
        # right-edge replication so the next row's above-right reads
        # (and the rightmost MB's c==3 rule) see extended pixels
        yw, cw = 16 * mb_cols, 8 * mb_cols
        band = slice(1 + 16 * my, 1 + 16 * my + 16)
        yp[band, 1 + yw:] = yp[band, yw][:, None]
        cband = slice(1 + 8 * my, 1 + 8 * my + 8)
        up[cband, 1 + cw:] = up[cband, cw][:, None]
        vp[cband, 1 + cw:] = vp[cband, cw][:, None]

    if h.filter_level:
        _loop_filter(h, yp, up, vp, mb_rows, mb_cols, ymodes, segments,
                     has_coeffs)

    y = yp[1:, 1:1 + 16 * mb_cols]
    u = up[1:, 1:1 + 8 * mb_cols]
    v = vp[1:, 1:1 + 8 * mb_cols]
    if yuv:
        return (y[:h.height, :h.width],
                u[:(h.height + 1) // 2, :(h.width + 1) // 2],
                v[:(h.height + 1) // 2, :(h.width + 1) // 2])
    return _yuv_to_rgb(y, u, v, h.height, h.width)
