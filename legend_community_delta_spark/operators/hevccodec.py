"""HEVC (H.265) video decode/encode by delegating to the system
libde265 / libx265 shared libraries.

HEVC decoding is codec-sized (CABAC entropy coding, intra prediction
over a recursive CTU quadtree, in-loop filters), so like AV1
(:mod:`.avifcodec`) this module does NOT reimplement the format: it
binds the system libraries through ctypes when present and raises the
usual pointed ``ValueError`` when not.  This is the same production
pattern the multimodal module documents:

* the Spark plumbing stays identical — MP4 payload bytes arrive
  through the same Arrow-batched ``mapInPandas`` operators and each
  EXECUTOR resolves the ``.so`` locally (plain ``CDLL``, no Python
  package needed);
* both libraries expose pure return-code APIs (``de265_error`` /
  x265 int returns, no setjmp/longjmp), so a malformed payload can
  never take down the executor — errors surface as the operators'
  ``decode_error`` rows;
* libde265 is a FULL decoder with its own reference-frame state, so
  unlike the per-image AV1/VP8 paths (sync-samples only) an entire
  hev1/hvc1 track decodes in one streaming pass — NALs are pushed in
  decode order with their sample timestamps and pictures drain in
  display order (``de265_get_image_PTS`` carries the timestamp
  through), one picture in flight at a time;
* the one ABI-sensitive piece on the encode side is the
  ``x265_picture`` struct; its leading layout (pts/dts/userData/
  planes[3]/stride[3]/bitDepth/sliceType/poc/colorSpace) has been
  stable across x265 releases and is VERIFIED at load time by
  probing ``x265_picture_init`` defaults (bitDepth==8 at +60,
  colorSpace==I420 at +72) — a layout mismatch disables the encoder
  with a pointed error instead of corrupting memory.

The encoder exists for two jobs: synthesizing REAL encoder streams
for the interop test suite (lossless mode → the decode round-trip is
bit-exact, the strongest possible oracle, same pattern as the
libwebp/imageio differential suites), and letting pipelines emit
hev1 MP4 fixtures.  H.264 (avc1) remains pointedly unsupported: this
container ships NO H.264 decoder (probed: no libopenh264, no
libavcodec, no libx264 — recorded in COVERAGE.md).

Reference parity note: finos/legend-community-delta has no media
path; this belongs to the training-data-pipeline extension surface.
"""

from __future__ import annotations

import ctypes
import functools
from typing import Iterable, Iterator

import numpy as np

__all__ = ["hevc_available", "x265_available", "decode_hevc_nals",
           "decode_hevc_sample", "decode_hevc_track", "parse_hvcc",
           "split_length_prefixed", "encode_hevc_yuv", "build_hvcc"]

_DE265_SONAMES = ("libde265.so.0", "libde265.so", "libde265.dylib")
_X265_SONAMES = ("libx265.so.199", "libx265.so", "libx265.dylib")

# de265_chroma enum
_DE265_CHROMA_MONO = 0
_DE265_CHROMA_420 = 1

# HEVC NAL unit types (nal_unit_type in the 2-byte NAL header)
_NAL_VPS, _NAL_SPS, _NAL_PPS = 32, 33, 34


@functools.lru_cache(maxsize=1)
def _load_de265():
    """The bound libde265, or None when not loadable."""
    lib = None
    for name in _DE265_SONAMES:
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        return None
    lib.de265_new_decoder.restype = ctypes.c_void_p
    lib.de265_free_decoder.argtypes = [ctypes.c_void_p]
    lib.de265_push_NAL.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_int, ctypes.c_longlong,
                                   ctypes.c_void_p]
    lib.de265_flush_data.argtypes = [ctypes.c_void_p]
    lib.de265_decode.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int)]
    lib.de265_get_next_picture.restype = ctypes.c_void_p
    lib.de265_get_next_picture.argtypes = [ctypes.c_void_p]
    lib.de265_release_next_picture.argtypes = [ctypes.c_void_p]
    lib.de265_get_image_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.de265_get_image_height.argtypes = [ctypes.c_void_p,
                                           ctypes.c_int]
    lib.de265_get_chroma_format.argtypes = [ctypes.c_void_p]
    lib.de265_get_image_PTS.restype = ctypes.c_longlong
    lib.de265_get_image_PTS.argtypes = [ctypes.c_void_p]
    lib.de265_get_image_plane.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.de265_get_image_plane.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.POINTER(ctypes.c_int)]
    lib.de265_get_error_text.restype = ctypes.c_char_p
    lib.de265_get_error_text.argtypes = [ctypes.c_int]
    return lib


class _X265Nal(ctypes.Structure):
    _fields_ = [("type", ctypes.c_uint32),
                ("sizeBytes", ctypes.c_uint32),
                ("payload", ctypes.POINTER(ctypes.c_uint8))]


# x265_picture leading-field offsets (64-bit): pts@0 dts@8 userData@16
# planes[3]@24 stride[3]@48 bitDepth@60 sliceType@64 poc@68
# colorSpace@72 — verified by the picture_init probe in _load_x265.
_PIC_PLANES_OFF = 24
_PIC_STRIDE_OFF = 48
_PIC_BITDEPTH_OFF = 60
_PIC_COLORSPACE_OFF = 72
_PIC_BUF_BYTES = 65536   # generous cover for the full (large) struct
_X265_CSP_I420 = 1


@functools.lru_cache(maxsize=1)
def _load_x265():
    """(lib, encoder_open_fn) for the bound libx265, or None —
    including when the x265_picture layout probe fails."""
    lib = None
    for name in _X265_SONAMES:
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        return None
    lib.x265_param_alloc.restype = ctypes.c_void_p
    lib.x265_param_free.argtypes = [ctypes.c_void_p]
    lib.x265_param_default_preset.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.x265_param_parse.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_char_p]
    lib.x265_picture_init.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.x265_encoder_headers.restype = ctypes.c_int
    lib.x265_encoder_headers.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(_X265Nal)),
        ctypes.POINTER(ctypes.c_uint32)]
    lib.x265_encoder_encode.restype = ctypes.c_int
    lib.x265_encoder_encode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(_X265Nal)),
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_void_p,
        ctypes.c_void_p]
    lib.x265_encoder_close.argtypes = [ctypes.c_void_p]
    # x265_encoder_open is an ABI-versioned symbol (x265.h macro maps
    # it to x265_encoder_open_<X265_BUILD>)
    open_fn = None
    for build in range(220, 140, -1):
        try:
            open_fn = getattr(lib, f"x265_encoder_open_{build}")
            break
        except AttributeError:
            continue
    if open_fn is None:
        return None
    open_fn.restype = ctypes.c_void_p
    open_fn.argtypes = [ctypes.c_void_p]
    # layout probe: picture_init must land bitDepth=8 / colorSpace=I420
    # exactly where the declared offsets say
    param = lib.x265_param_alloc()
    try:
        lib.x265_param_default_preset(param, b"ultrafast",
                                      b"zerolatency")
        buf = (ctypes.c_uint8 * _PIC_BUF_BYTES)()
        lib.x265_picture_init(param, buf)
        base = ctypes.addressof(buf)
        bd = ctypes.c_int32.from_address(base + _PIC_BITDEPTH_OFF).value
        csp = ctypes.c_int32.from_address(
            base + _PIC_COLORSPACE_OFF).value
        if bd != 8 or csp != _X265_CSP_I420:
            return None
    finally:
        lib.x265_param_free(param)
    return lib, open_fn


def hevc_available() -> bool:
    """True when the system libde265 decoder is loadable."""
    return _load_de265() is not None


def x265_available() -> bool:
    """True when the system libx265 encoder is loadable AND its
    x265_picture layout matches the probed offsets."""
    return _load_x265() is not None


# ---------------------------------------------------------------------------
# NAL / hvcC plumbing (ISO/IEC 14496-15 HEVCDecoderConfigurationRecord)
# ---------------------------------------------------------------------------

def split_annexb(buf: bytes) -> list[bytes]:
    """Annex-B byte stream -> raw NAL units (start codes stripped)."""
    out, i = [], 0
    while i < len(buf):
        j = buf.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        start = j + 3
        k = buf.find(b"\x00\x00\x01", start)
        if k < 0:
            out.append(buf[start:])
            break
        end = k - 1 if buf[k - 1] == 0 else k
        out.append(buf[start:end])
        i = k
    return out


def split_length_prefixed(sample: bytes, length_size: int) -> list[bytes]:
    """MP4 sample payload (length-prefixed NALs) -> raw NAL units."""
    out, pos = [], 0
    while pos + length_size <= len(sample):
        ln = int.from_bytes(sample[pos:pos + length_size], "big")
        pos += length_size
        if pos + ln > len(sample):
            raise ValueError("HEVC sample NAL overruns payload")
        out.append(sample[pos:pos + ln])
        pos += ln
    return out


def parse_hvcc(hvcc: bytes) -> tuple[int, list[bytes]]:
    """HEVCDecoderConfigurationRecord -> (NAL length-prefix size,
    parameter-set NAL units in declared order: VPS/SPS/PPS)."""
    if len(hvcc) < 23:
        raise ValueError("hvcC record truncated")
    length_size = (hvcc[21] & 0x03) + 1
    n_arrays = hvcc[22]
    nals, pos = [], 23
    for _ in range(n_arrays):
        if pos + 3 > len(hvcc):
            raise ValueError("hvcC NAL array truncated")
        pos += 1                                # completeness + type
        n_nalus = int.from_bytes(hvcc[pos:pos + 2], "big")
        pos += 2
        for _ in range(n_nalus):
            ln = int.from_bytes(hvcc[pos:pos + 2], "big")
            pos += 2
            if pos + ln > len(hvcc):
                raise ValueError("hvcC NAL unit overruns record")
            nals.append(hvcc[pos:pos + ln])
            pos += ln
    return length_size, nals


def build_hvcc(param_nals: Iterable[bytes], length_size: int = 4) -> bytes:
    """Parameter-set NALs (VPS/SPS/PPS, raw) -> an hvcC record.  The
    22 fixed profile/tier/level bytes are filled with plausible Main-
    profile constants; the fields this repo's reader consumes are the
    length-prefix size and the NAL arrays themselves."""
    arrays: dict[int, list[bytes]] = {}
    for nal in param_nals:
        typ = (nal[0] >> 1) & 0x3F
        arrays.setdefault(typ, []).append(nal)
    head = bytearray()
    head.append(1)                               # configurationVersion
    head.append(0x01)                            # space/tier/profile_idc=1
    head += (0x60000000).to_bytes(4, "big")      # profile compatibility
    head += (0x900000000000).to_bytes(6, "big")  # constraint flags
    head.append(93)                              # level 3.1
    head += (0xF000).to_bytes(2, "big")          # min_spatial_seg
    head.append(0xFC)                            # parallelismType
    head.append(0xFC | 1)                        # chromaFormat 4:2:0
    head.append(0xF8)                            # bitDepthLuma-8
    head.append(0xF8)                            # bitDepthChroma-8
    head += (0).to_bytes(2, "big")               # avgFrameRate
    head.append(((length_size - 1) & 0x03) | 0x0C)  # lengthSizeMinusOne
    head.append(len(arrays))
    for typ in sorted(arrays):
        head.append(typ & 0x3F)                  # not array_complete
        head += len(arrays[typ]).to_bytes(2, "big")
        for nal in arrays[typ]:
            head += len(nal).to_bytes(2, "big")
            head += nal
    return bytes(head)


# ---------------------------------------------------------------------------
# decode (libde265)
# ---------------------------------------------------------------------------

def _require_de265():
    lib = _load_de265()
    if lib is None:
        raise ValueError(
            "HEVC decode needs the system libde265 shared library; "
            "none is loadable here")
    return lib


def _extract_picture(lib, img) -> np.ndarray:
    """One de265 picture -> (h, w, 3) uint8 RGB (BT.601 limited-range,
    nearest-neighbor chroma upsampling — the repo's deliberate
    deterministic convert, see vp8._yuv_to_rgb) or (h, w, 1) for
    monochrome."""
    w = lib.de265_get_image_width(img, 0)
    h = lib.de265_get_image_height(img, 0)
    stride = ctypes.c_int(0)

    def plane(ch: int, ph: int, pw: int) -> np.ndarray:
        ptr = lib.de265_get_image_plane(img, ch, ctypes.byref(stride))
        if not ptr:
            raise ValueError("HEVC picture plane unavailable")
        return np.ctypeslib.as_array(
            ptr, shape=(ph, stride.value))[:, :pw].copy()

    chroma = lib.de265_get_chroma_format(img)
    y = plane(0, h, w)
    if chroma == _DE265_CHROMA_MONO:
        return y.reshape(h, w, 1)
    if chroma != _DE265_CHROMA_420:
        raise ValueError(
            f"HEVC chroma format {chroma} unsupported (4:2:0 and "
            "monochrome decode; 4:2:2/4:4:4 streams are rare in "
            "distribution video)")
    cw = lib.de265_get_image_width(img, 1)
    ch_ = lib.de265_get_image_height(img, 1)
    u = plane(1, ch_, cw)
    v = plane(2, ch_, cw)
    from .vp8 import _yuv_to_rgb
    return _yuv_to_rgb(y, u, v, h, w)


def decode_hevc_track(samples: Iterable[tuple[bytes, int]],
                      hvcc: bytes) -> Iterator[tuple[int, np.ndarray]]:
    """Decode an MP4 hev1/hvc1 track in ONE streaming pass: *samples*
    yields ``(sample_payload, timestamp)`` in decode order; pictures
    come back as ``(timestamp, pixels)`` in display order (libde265
    carries each sample's timestamp through ``de265_get_image_PTS``).
    Inter frames decode correctly — the decoder holds the reference
    state — and pictures are drained as they appear, so memory stays
    one picture deep regardless of track length."""
    lib = _require_de265()
    length_size, param_nals = parse_hvcc(hvcc)
    ctx = lib.de265_new_decoder()
    if not ctx:
        raise ValueError("libde265 failed to allocate a decoder")
    try:
        for nal in param_nals:
            err = lib.de265_push_NAL(ctx, nal, len(nal), 0, None)
            if err != 0:
                raise ValueError(
                    "HEVC parameter set rejected: "
                    + lib.de265_get_error_text(err).decode())
        for payload, ts in samples:
            for nal in split_length_prefixed(payload, length_size):
                err = lib.de265_push_NAL(ctx, nal, len(nal),
                                         int(ts), None)
                if err != 0:
                    raise ValueError(
                        "HEVC NAL rejected: "
                        + lib.de265_get_error_text(err).decode())
        lib.de265_flush_data(ctx)
        for _ in range(1_000_000):          # progress-bounded drain
            more = ctypes.c_int(0)
            lib.de265_decode(ctx, ctypes.byref(more))
            img = lib.de265_get_next_picture(ctx)
            while img:
                ts = lib.de265_get_image_PTS(img)
                yield ts, _extract_picture(lib, img)
                lib.de265_release_next_picture(ctx)
                img = lib.de265_get_next_picture(ctx)
            if not more.value:
                break
    finally:
        lib.de265_free_decoder(ctx)


def decode_hevc_nals(nals: Iterable[bytes]) -> np.ndarray:
    """Raw NAL units (parameter sets + one coded picture) -> pixels of
    the first decoded picture.  The single-image entry point (an IDR
    sample with its VPS/SPS/PPS)."""
    lib = _require_de265()
    ctx = lib.de265_new_decoder()
    if not ctx:
        raise ValueError("libde265 failed to allocate a decoder")
    try:
        for nal in nals:
            err = lib.de265_push_NAL(ctx, nal, len(nal), 0, None)
            if err != 0:
                raise ValueError(
                    "HEVC NAL rejected: "
                    + lib.de265_get_error_text(err).decode())
        lib.de265_flush_data(ctx)
        for _ in range(1_000_000):
            more = ctypes.c_int(0)
            lib.de265_decode(ctx, ctypes.byref(more))
            img = lib.de265_get_next_picture(ctx)
            if img:
                try:
                    return _extract_picture(lib, img)
                finally:
                    lib.de265_release_next_picture(ctx)
            if not more.value:
                break
        raise ValueError("HEVC stream decoded no picture")
    finally:
        lib.de265_free_decoder(ctx)


def decode_hevc_sample(sample: bytes, hvcc: bytes) -> np.ndarray:
    """One MP4 SYNC sample (length-prefixed NALs) + its hvcC record ->
    pixels."""
    length_size, param_nals = parse_hvcc(hvcc)
    return decode_hevc_nals(
        param_nals + split_length_prefixed(sample, length_size))


# ---------------------------------------------------------------------------
# encode (libx265) — real encoder streams for fixtures and tests
# ---------------------------------------------------------------------------

def encode_hevc_yuv(frames: list[tuple[np.ndarray, np.ndarray,
                                       np.ndarray]],
                    fps: int = 10, lossless: bool = True,
                    all_intra: bool = True
                    ) -> tuple[list[bytes], list[bytes]]:
    """Encode YUV420 frames (``(y, u, v)`` uint8 planes) with the
    system libx265 -> ``(parameter_set_nals, frame_payloads)`` where
    each frame payload is an Annex-B byte string.  *lossless* makes
    the decode round-trip BIT-EXACT (the test oracle); *all_intra*
    (keyint=1) makes every frame a sync sample.  Raises pointedly
    when no (layout-verified) libx265 is loadable."""
    loaded = _load_x265()
    if loaded is None:
        raise ValueError(
            "HEVC encode needs the system libx265 shared library "
            "(with the probed x265_picture layout); none is loadable "
            "here")
    lib, open_fn = loaded
    if not frames:
        raise ValueError("no frames to encode")
    h, w = frames[0][0].shape
    if h % 2 or w % 2:
        raise ValueError("HEVC 4:2:0 needs even dimensions")
    param = lib.x265_param_alloc()
    enc = None
    try:
        lib.x265_param_default_preset(param, b"ultrafast",
                                      b"zerolatency")
        settings = [(b"input-res", f"{w}x{h}".encode()),
                    (b"fps", str(int(fps)).encode()),
                    (b"input-csp", b"i420"),
                    (b"ctu", b"16"),           # allow small frames
                    (b"log-level", b"none"),
                    (b"repeat-headers", b"0"),
                    (b"bframes", b"0"),
                    (b"frame-threads", b"1")]  # deterministic output
        if lossless:
            settings.append((b"lossless", b"1"))
        if all_intra:
            settings.append((b"keyint", b"1"))
        for k, v in settings:
            if lib.x265_param_parse(param, k, v) != 0:
                raise ValueError(f"x265 rejected parameter {k!r}")
        enc = open_fn(param)
        if not enc:
            raise ValueError("x265 encoder failed to open "
                             "(frame smaller than one CTU?)")
        nals = ctypes.POINTER(_X265Nal)()
        n = ctypes.c_uint32()
        if lib.x265_encoder_headers(enc, ctypes.byref(nals),
                                    ctypes.byref(n)) < 0:
            raise ValueError("x265 failed to emit headers")
        headers: list[bytes] = []
        for i in range(n.value):
            headers += split_annexb(
                ctypes.string_at(nals[i].payload, nals[i].sizeBytes))
        # keep only VPS/SPS/PPS (drop SEI) for the hvcC record
        headers = [nal for nal in headers
                   if (nal[0] >> 1) & 0x3F in
                   (_NAL_VPS, _NAL_SPS, _NAL_PPS)]
        pic = (ctypes.c_uint8 * _PIC_BUF_BYTES)()
        base = ctypes.addressof(pic)
        planes = (ctypes.c_void_p * 3).from_address(
            base + _PIC_PLANES_OFF)
        stride = (ctypes.c_int32 * 3).from_address(
            base + _PIC_STRIDE_OFF)
        payloads: list[bytes] = []

        def drain(r: int) -> None:
            if r > 0:
                payloads.append(b"".join(
                    ctypes.string_at(nals[i].payload, nals[i].sizeBytes)
                    for i in range(n.value)))

        for idx, (y, u, v) in enumerate(frames):
            if y.shape != (h, w) or u.shape != (h // 2, w // 2) \
                    or v.shape != (h // 2, w // 2):
                raise ValueError(
                    f"frame {idx}: planes must be ({h},{w}) luma with "
                    "half-size chroma")
            yb = np.ascontiguousarray(y, dtype=np.uint8)
            ub = np.ascontiguousarray(u, dtype=np.uint8)
            vb = np.ascontiguousarray(v, dtype=np.uint8)
            lib.x265_picture_init(param, pic)
            ctypes.c_int64.from_address(base).value = idx      # pts
            planes[0] = yb.ctypes.data
            planes[1] = ub.ctypes.data
            planes[2] = vb.ctypes.data
            stride[0], stride[1], stride[2] = w, w // 2, w // 2
            drain(lib.x265_encoder_encode(enc, ctypes.byref(nals),
                                          ctypes.byref(n), pic, None))
        while True:
            r = lib.x265_encoder_encode(enc, ctypes.byref(nals),
                                        ctypes.byref(n), None, None)
            if r <= 0:
                break
            drain(r)
        if len(payloads) != len(frames):
            raise ValueError(
                f"x265 returned {len(payloads)} access units for "
                f"{len(frames)} frames")
        return headers, payloads
    finally:
        if enc:
            lib.x265_encoder_close(enc)
        lib.x265_param_free(param)


def annexb_to_length_prefixed(payload: bytes,
                              length_size: int = 4) -> bytes:
    """One Annex-B access unit -> MP4 length-prefixed sample payload,
    with in-band parameter sets dropped (they live in hvcC)."""
    out = bytearray()
    for nal in split_annexb(payload):
        if (nal[0] >> 1) & 0x3F in (_NAL_VPS, _NAL_SPS, _NAL_PPS):
            continue
        out += len(nal).to_bytes(length_size, "big")
        out += nal
    return bytes(out)
