"""ctypes harness over the system libwebp — the REFERENCE WebP codec.

Gives the test suite a real, independently-implemented encoder AND
decoder to validate the pure-Python VP8/VP8L/WebP paths against:

* ``encode_rgb`` / ``encode_rgba`` / ``encode_lossless_rgba`` produce
  REAL encoder bitstreams (the interop fixtures the in-repo boolean
  encoder cannot provide, since it shares tables with the decoder);
* ``decode_yuv(bypass_filtering=...)`` exposes the reconstruction
  BEFORE the loop filter, so filter and reconstruction defects are
  attributable separately;
* ``decode_rgba`` covers alpha and lossless round-trips.

Import is guarded by the test module (skip when libwebp is absent);
struct layouts follow the public decode.h of libwebp 1.2.x
(WEBP_DECODER_ABI_VERSION 0x0209).
"""
import ctypes
import struct

import numpy as np

lib = ctypes.CDLL("libwebp.so.7")

class WebPBitstreamFeatures(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("has_alpha", ctypes.c_int), ("has_animation", ctypes.c_int),
                ("format", ctypes.c_int), ("pad", ctypes.c_uint32 * 5)]

class WebPRGBABuffer(ctypes.Structure):
    _fields_ = [("rgba", ctypes.POINTER(ctypes.c_uint8)),
                ("stride", ctypes.c_int), ("size", ctypes.c_size_t)]

class WebPYUVABuffer(ctypes.Structure):
    _fields_ = [("y", ctypes.POINTER(ctypes.c_uint8)),
                ("u", ctypes.POINTER(ctypes.c_uint8)),
                ("v", ctypes.POINTER(ctypes.c_uint8)),
                ("a", ctypes.POINTER(ctypes.c_uint8)),
                ("y_stride", ctypes.c_int),
                ("u_stride", ctypes.c_int), ("v_stride", ctypes.c_int),
                ("a_stride", ctypes.c_int),
                ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
                ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t)]

class _BufUnion(ctypes.Union):
    _fields_ = [("RGBA", WebPRGBABuffer), ("YUVA", WebPYUVABuffer)]

class WebPDecBuffer(ctypes.Structure):
    _fields_ = [("colorspace", ctypes.c_int), ("width", ctypes.c_int),
                ("height", ctypes.c_int), ("is_external_memory", ctypes.c_int),
                ("u", _BufUnion), ("pad", ctypes.c_uint32 * 4),
                ("private_memory", ctypes.POINTER(ctypes.c_uint8))]

class WebPDecoderOptions(ctypes.Structure):
    _fields_ = [("bypass_filtering", ctypes.c_int),
                ("no_fancy_upsampling", ctypes.c_int),
                ("use_cropping", ctypes.c_int),
                ("crop_left", ctypes.c_int), ("crop_top", ctypes.c_int),
                ("crop_width", ctypes.c_int), ("crop_height", ctypes.c_int),
                ("use_scaling", ctypes.c_int),
                ("scaled_width", ctypes.c_int), ("scaled_height", ctypes.c_int),
                ("use_threads", ctypes.c_int),
                ("dithering_strength", ctypes.c_int),
                ("flip", ctypes.c_int),
                ("alpha_dithering_strength", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]

class WebPDecoderConfig(ctypes.Structure):
    _fields_ = [("input", WebPBitstreamFeatures),
                ("output", WebPDecBuffer),
                ("options", WebPDecoderOptions)]

ABI = 0x0209
lib.WebPInitDecoderConfigInternal.restype = ctypes.c_int
lib.WebPInitDecoderConfigInternal.argtypes = [ctypes.POINTER(WebPDecoderConfig), ctypes.c_int]
lib.WebPDecode.restype = ctypes.c_int
lib.WebPDecode.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(WebPDecoderConfig)]
lib.WebPFreeDecBuffer.argtypes = [ctypes.POINTER(WebPDecBuffer)]
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPFree.argtypes = [ctypes.c_void_p]
MODE_YUV = 11
MODE_RGBA = 1

def encode_rgb(arr, q=75.0):
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(arr.tobytes(), w, h, w * 3, float(q), ctypes.byref(out))
    assert n > 0
    buf = ctypes.string_at(out, n); lib.WebPFree(out); return buf

def encode_rgba(arr, q=75.0):
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(arr.tobytes(), w, h, w * 4, float(q), ctypes.byref(out))
    assert n > 0
    buf = ctypes.string_at(out, n); lib.WebPFree(out); return buf

def encode_lossless_rgba(arr):
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(arr.tobytes(), w, h, w * 4, ctypes.byref(out))
    assert n > 0
    buf = ctypes.string_at(out, n); lib.WebPFree(out); return buf

def decode_yuv(data, bypass_filtering=False):
    cfg = WebPDecoderConfig()
    assert lib.WebPInitDecoderConfigInternal(ctypes.byref(cfg), ABI)
    cfg.options.bypass_filtering = 1 if bypass_filtering else 0
    cfg.output.colorspace = MODE_YUV
    rc = lib.WebPDecode(data, len(data), ctypes.byref(cfg))
    assert rc == 0, f"WebPDecode status {rc}"
    w, h = cfg.output.width, cfg.output.height
    cw, ch = (w + 1) // 2, (h + 1) // 2
    yb = cfg.output.u.YUVA
    Y = np.ctypeslib.as_array(yb.y, shape=(h, yb.y_stride))[:, :w].copy()
    U = np.ctypeslib.as_array(yb.u, shape=(ch, yb.u_stride))[:, :cw].copy()
    V = np.ctypeslib.as_array(yb.v, shape=(ch, yb.v_stride))[:, :cw].copy()
    lib.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return Y, U, V

def decode_rgba(data, bypass_filtering=False, fancy=True):
    cfg = WebPDecoderConfig()
    assert lib.WebPInitDecoderConfigInternal(ctypes.byref(cfg), ABI)
    cfg.options.bypass_filtering = 1 if bypass_filtering else 0
    cfg.options.no_fancy_upsampling = 0 if fancy else 1
    cfg.output.colorspace = MODE_RGBA
    rc = lib.WebPDecode(data, len(data), ctypes.byref(cfg))
    assert rc == 0, f"WebPDecode status {rc}"
    w, h = cfg.output.width, cfg.output.height
    rb = cfg.output.u.RGBA
    A = np.ctypeslib.as_array(rb.rgba, shape=(h, rb.stride))[:, :w * 4].reshape(h, w, 4).copy()
    lib.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return A

def vp8_chunk(webp):
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos:pos+4]; size = struct.unpack("<I", webp[pos+4:pos+8])[0]
        if tag == b"VP8 ": return webp[pos+8:pos+8+size]
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")
