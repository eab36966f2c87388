"""Deterministic synthetic media generation: seed -> pixels/samples ->
encoded BMP / PNG / PPM / GIF (still + animated) / WAV / Y4M payloads,
entirely stdlib + numpy.

Why this exists: the engine's multimodal decode path
(:mod:`.multimodal` — BMP/PNM/PNG/JPEG/GIF/WebP/WAV/Y4M/MP4) is pinned
by a large unit suite, but the driver's contract tables carry no media
column, so without a generator the decode subsystem would have no
contract surface at all.  These encoders produce SMALL, fully
deterministic payloads from an integer seed — the round-trip
(synth pixels -> encode -> distributed decode -> aggregate) then
becomes a contract query whose expected values an independent test can
recompute from the pixel formula alone.

The generators are also the honest stand-in the multimodal docs promise
for environments without image/audio libraries: a "deterministic fake"
payload factory with real Spark-side plumbing (schema, partitioning,
Arrow batch shape).

Reference parity: the reference repo has no media path at all
(finos/legend-community-delta is a metadata compiler); this module is
part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..functions import local_df

__all__ = [
    "synth_pixels",
    "synth_samples",
    "encode_bmp",
    "encode_png",
    "encode_ppm",
    "encode_gif",
    "encode_wav",
    "encode_webp_lossless",
    "encode_webp_animation",
    "synth_media_rows",
    "synth_media_table",
    "encode_gif_animation",
    "encode_y4m",
    "synth_video_rows",
    "synth_video_table",
    "mux_mp4_video",
    "encode_hevc_mp4",
    "synth_hevc_luma",
    "synth_hevc_video_table",
]


def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixels (h, w, 3) uint8: a pure integer formula
    over (seed, y, x, channel) — no RNG state, so ANY independent
    implementation (tests, oracles) reproduces it exactly."""
    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((seed * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)


def synth_samples(seed: int, n: int) -> np.ndarray:
    """Deterministic int16 PCM samples: same integer-formula idea
    (values in [-2048, 2047] so 16-bit round-trips are exact)."""
    i = np.arange(n, dtype=np.int64)
    return (((seed * 131 + i * 17) % 4096) - 2048).astype(np.int16)


def encode_bmp(px: np.ndarray) -> bytes:
    """24-bit uncompressed BI_RGB (bottom-up, BGR, 4-byte row pad)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in px[::-1]:
        line = row[:, ::-1].tobytes()            # RGB -> BGR
        body += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + bytes(body)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def encode_png(px: np.ndarray) -> bytes:
    """8-bit RGB PNG, filter 0 on every scanline."""
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def encode_ppm(px: np.ndarray) -> bytes:
    """Binary P6 PPM."""
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


class _LSBWriter:
    """LSB-first bit packer for GIF's LZW sub-block stream."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, code: int, width: int) -> None:
        for i in range(width):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def encode_gif(px: np.ndarray) -> bytes:
    """Single-frame GIF89a with a global palette built from the image's
    distinct colors (so inputs must stay <= 256 colors — the synthetic
    generator quantizes first).  LZW stream is the always-valid minimal
    form: a CLEAR code before the decoder's table would grow past the
    initial width, literals otherwise."""
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs <= 256 colors, got {len(colors)}")
    bits = max(2, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[:len(colors)] = colors
    mcs = bits
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    room = (1 << (mcs + 1)) - (clear + 2)   # codes before width would bump
    wtr = _LSBWriter()
    wtr.write(clear, mcs + 1)
    since = 0
    for v in inverse:
        if since == room:
            wtr.write(clear, mcs + 1)
            since = 0
        wtr.write(int(v), mcs + 1)
        since += 1
    wtr.write(eoi, mcs + 1)
    data = wtr.tobytes()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0]) + pal.tobytes()
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
    out += bytes([mcs])                          # LZW minimum code size
    pos = 0
    while pos < len(data):
        chunk = data[pos:pos + 255]
        out += bytes([len(chunk)]) + chunk
        pos += 255
    out += bytes([0, 0x3B])
    return bytes(out)


def encode_webp_lossless(px: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> RIFF/WEBP with a literal-only VP8L stream.

    Deliberately the simplest spec-valid lossless encoding: no
    transforms, no LZ77, no color cache, and FIXED 8-bit prefix codes
    for all four channels.  A complete 256-symbol 8-bit code is
    serialized with two spec features working together: a
    single-symbol code-length code (a 0-bit code per the spec's
    BuildHuffmanTable special case) that repeats "length 8", bounded
    by the max_symbol field at exactly 256 — 12 header bits per tree,
    then every literal is its own byte value written MSB-first.
    ~4 bytes/pixel; the synthetic contract payloads are 16x12, so
    compactness is irrelevant and decode equivalence is everything
    (cross-checked against the system libwebp in tests).
    """
    body = _vp8l_body(px)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _vp8l_body(px: np.ndarray) -> bytes:
    """The raw VP8L chunk payload for :func:`encode_webp_lossless`
    (also embedded inside ANMF frames by :func:`encode_webp_animation`).
    """
    h, w, c = px.shape
    if c not in (3, 4):
        raise ValueError(f"WebP-lossless encode needs 3/4 channels, got {c}")
    wtr = _LSBWriter()
    wtr.write(0x2F, 8)                           # VP8L signature
    wtr.write(w - 1, 14)
    wtr.write(h - 1, 14)
    wtr.write(1 if c == 4 else 0, 1)             # alpha hint
    wtr.write(0, 3)                              # version
    wtr.write(0, 1)                              # no transforms
    wtr.write(0, 1)                              # no color cache
    wtr.write(0, 1)                              # no meta huffman

    def fixed_8bit_tree() -> None:
        wtr.write(0, 1)                          # normal (not simple)
        wtr.write(12 - 4, 4)                     # 12 code-length lengths
        for i in range(12):                      # CL order: symbol 8 is
            wtr.write(1 if i == 11 else 0, 3)    # at order index 11
        wtr.write(1, 1)                          # bounded symbol count
        wtr.write(3, 3)                          # length_nbits = 8
        wtr.write(254, 8)                        # max_symbol = 256

    def simple_zero_tree() -> None:
        wtr.write(1, 1)                          # simple code
        wtr.write(0, 1)                          # one symbol
        wtr.write(0, 1)                          # 1-bit symbol
        wtr.write(0, 1)                          # symbol 0

    fixed_8bit_tree()                            # green (+len codes unused)
    fixed_8bit_tree()                            # red
    fixed_8bit_tree()                            # blue
    fixed_8bit_tree()                            # alpha
    simple_zero_tree()                           # distances (unused)

    alpha = px[..., 3] if c == 4 else None
    for y in range(h):
        for x in range(w):
            r, g, b = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
            av = int(alpha[y, x]) if alpha is not None else 255
            for v in (g, r, b, av):              # stream order g,r,b,a
                for k in range(7, -1, -1):       # prefix codes: MSB first
                    wtr.write((v >> k) & 1, 1)
    return wtr.tobytes()


def encode_webp_animation(frames: list[np.ndarray],
                          durations_ms: list[int]) -> bytes:
    """Animated WebP (VP8X + ANIM + ANMF) from full-canvas lossless
    frames: every ANMF wraps one :func:`_vp8l_body` stream at offset
    (0, 0) with blend OFF (bit 1: overwrite the rect) so each sampled
    frame equals its input exactly."""
    h, w = frames[0].shape[:2]

    def chunk(cc: bytes, payload: bytes) -> bytes:
        return cc + struct.pack("<I", len(payload)) + payload \
            + (b"\x00" if len(payload) & 1 else b"")

    vp8x = bytes([0x02]) + b"\x00" * 3 \
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    out = chunk(b"VP8X", vp8x)
    out += chunk(b"ANIM", b"\xff\xff\xff\xff" + b"\x00\x00")
    for px, dur in zip(frames, durations_ms):
        body = _vp8l_body(px)
        sub = chunk(b"VP8L", body)
        anmf = (b"\x00" * 6                      # frame x, y (/2)
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little")
                + int(dur).to_bytes(3, "little")
                + bytes([0x02])                  # do not blend
                + sub)
        out += chunk(b"ANMF", anmf)
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WEBP" + out


def encode_wav(samples: np.ndarray, rate: int = 8000,
               nch: int = 1) -> bytes:
    """16-bit PCM RIFF/WAVE (interleaved when *nch* > 1; *samples* is
    already interleaved frame-major)."""
    raw = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)


def synth_media_rows(per_format: int = 8, width: int = 16,
                     height: int = 12,
                     wav_frames: int = 4000) -> list[tuple]:
    """Deterministic (media_id, fmt, payload) tuples: *per_format*
    payloads each of bmp/png/ppm/gif/wav/webp (webp appended LAST so
    earlier formats keep their historical media_id = seed blocks).
    media_id doubles as the pixel/sample seed; GIF pixels are
    quantized to 3 bits/channel so the palette stays within 256
    colors; webp is the lossless VP8L path (exact pixels).
    Metadata-sized by design — the contract entry builds ~48 payloads
    of a few hundred bytes."""
    rows: list[tuple] = []
    mid = 0
    for fmt in ("bmp", "png", "ppm", "gif", "wav", "webp"):
        for _ in range(per_format):
            if fmt == "wav":
                payload = encode_wav(synth_samples(mid, wav_frames))
            else:
                px = synth_pixels(mid, width, height)
                if fmt == "gif":
                    px = (px & 0xE0) | 0x10      # 3 bits/chan, mid-bias
                payload = {"bmp": encode_bmp, "png": encode_png,
                           "ppm": encode_ppm, "gif": encode_gif,
                           "webp": encode_webp_lossless}[fmt](px)
            rows.append((mid, fmt, bytearray(payload)))
            mid += 1
    return rows


def synth_media_table(spark: SparkSession, per_format: int = 8,
                      width: int = 16, height: int = 12,
                      wav_frames: int = 4000) -> DataFrame:
    """The synthetic media table as a DataFrame
    ``(media_id long, fmt string, payload binary)``, repartitioned so
    the decode UDFs exercise real multi-partition Arrow batching."""
    rows = synth_media_rows(per_format, width, height, wav_frames)
    df = local_df(spark, rows, "media_id long, fmt string, payload binary")
    return df.repartition(4, "media_id")


def encode_gif_animation(frames: list[np.ndarray],
                         delays_cs: list[int]) -> bytes:
    """Multi-frame GIF89a: one global palette over all frames, a GCE
    (delay, disposal=1) per frame, full-canvas rects.  Same minimal
    always-valid LZW stream as :func:`encode_gif`."""
    h, w, _ = frames[0].shape
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs <= 256 colors, got {len(colors)}")
    bits = max(2, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[:len(colors)] = colors
    mcs = bits
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    room = (1 << (mcs + 1)) - (clear + 2)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0]) + pal.tobytes()
    n_px = h * w
    for fi, (frame, delay) in enumerate(zip(frames, delays_cs)):
        out += bytes([0x21, 0xF9, 4, 1 << 2, delay & 0xFF,
                      (delay >> 8) & 0xFF, 0, 0])       # GCE, disposal 1
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0, mcs])
        wtr = _LSBWriter()
        wtr.write(clear, mcs + 1)
        since = 0
        for v in inverse[fi * n_px:(fi + 1) * n_px]:
            if since == room:
                wtr.write(clear, mcs + 1)
                since = 0
            wtr.write(int(v), mcs + 1)
            since += 1
        wtr.write(eoi, mcs + 1)
        data = wtr.tobytes()
        pos = 0
        while pos < len(data):
            chunk = data[pos:pos + 255]
            out += bytes([len(chunk)]) + chunk
            pos += 255
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def encode_y4m(frames_luma: list[np.ndarray], fps: int = 25) -> bytes:
    """YUV4MPEG2 (C420) from luma-plane frames: chroma planes are a
    flat 128 (gray), which keeps the payload deterministic and the
    sampled luma frames equal to the inputs."""
    h, w = frames_luma[0].shape
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A0:0 C420\n".encode())
    uv = np.full(((h // 2) * (w // 2)), 128, np.uint8).tobytes()
    for f in frames_luma:
        out += b"FRAME\n" + f.tobytes() + uv + uv
    return bytes(out)


def synth_video_rows(per_format: int = 4, width: int = 16,
                     height: int = 12, n_frames: int = 3) -> list[tuple]:
    """Deterministic (media_id, fmt, payload) animated payloads:
    *per_format* each of animated GIF (10 cs/frame), Y4M (25 fps) and
    animated WebP (lossless VP8L frames, 100 ms each).  Frame f of
    media_id m uses :func:`synth_pixels`' formula with seed
    ``m * 101 + f`` (GIF frames quantized to 3 bits/channel)."""
    rows: list[tuple] = []
    mid = 1000                       # offset: distinct from image ids
    for fmt in ("gif_anim", "y4m", "webp_anim"):
        for _ in range(per_format):
            seeds = [mid * 101 + f for f in range(n_frames)]
            if fmt == "gif_anim":
                frames = [(synth_pixels(s, width, height) & 0xE0) | 0x10
                          for s in seeds]
                payload = encode_gif_animation(frames,
                                               [10] * n_frames)
            elif fmt == "webp_anim":
                frames = [synth_pixels(s, width, height) for s in seeds]
                payload = encode_webp_animation(frames,
                                                [100] * n_frames)
            else:
                lumas = [synth_pixels(s, width, height)[:, :, 0]
                         for s in seeds]
                payload = encode_y4m(lumas, fps=25)
            rows.append((mid, fmt, bytearray(payload)))
            mid += 1
    return rows


def synth_video_table(spark: SparkSession, per_format: int = 4,
                      width: int = 16, height: int = 12,
                      n_frames: int = 3) -> DataFrame:
    """The synthetic animated-media table
    ``(media_id long, fmt string, payload binary)``."""
    rows = synth_video_rows(per_format, width, height, n_frames)
    df = local_df(spark, rows, "media_id long, fmt string, payload binary")
    return df.repartition(4, "media_id")


# ---------------------------------------------------------------------------
# Minimal ISO-BMFF (MP4) video muxer + HEVC synthesis.  The muxer is
# the WRITE-side mirror of multimodal's sample-table reader: one video
# track, one chunk per sample, stts/stsc/stsz/stco + optional stss —
# enough container for any codec whose samples are self-delimiting.
# ---------------------------------------------------------------------------

_MP4_UNITY_MATRIX = (struct.pack(">II", 0x10000, 0) + b"\x00" * 8
                     + struct.pack(">II", 0x10000, 0) + b"\x00" * 8
                     + struct.pack(">I", 0x40000000))


def _box(typ: bytes, *payload: bytes) -> bytes:
    body = b"".join(payload)
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, version: int, flags: int, *payload: bytes) -> bytes:
    return _box(typ, bytes([version]) + struct.pack(">I", flags)[1:],
                *payload)


def mux_mp4_video(samples: list[bytes], fps: int, w: int, h: int,
                  codec: bytes, entry_children: bytes = b"",
                  sync_samples: list[int] | None = None,
                  timescale: int | None = None) -> bytes:
    """Single-video-track progressive MP4: ftyp + mdat(samples) + moov.
    One chunk per sample (exact stco offsets, trivially correct);
    *entry_children* carries the codec configuration box (hvcC, av1C,
    ...); *sync_samples* (0-based) emits an stss box."""
    ts = timescale or fps
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200),
                b"isomiso2mp41")
    mdat = _box(b"mdat", *samples)
    n = len(samples)
    offs, off = [], len(ftyp) + 8
    for s in samples:
        offs.append(off)
        off += len(s)
    e = bytearray()
    e += b"\x00" * 6 + struct.pack(">H", 1)          # dref index
    e += struct.pack(">HH", 0, 0) + b"\x00" * 12
    e += struct.pack(">HH", w, h)
    e += struct.pack(">II", 0x480000, 0x480000)      # 72 dpi
    e += struct.pack(">I", 0) + struct.pack(">H", 1)
    e += b"\x00" * 32                                # compressorname
    e += struct.pack(">Hh", 24, -1)
    e += entry_children
    entry = struct.pack(">I", 8 + len(e)) + codec + bytes(e)
    stbl_children = [
        _full(b"stsd", 0, 0, struct.pack(">I", 1), entry),
        _full(b"stts", 0, 0, struct.pack(">I", 1),
              struct.pack(">II", n, ts // fps)),
        _full(b"stsc", 0, 0, struct.pack(">I", 1),
              struct.pack(">III", 1, 1, 1)),
        _full(b"stsz", 0, 0, struct.pack(">II", 0, n),
              b"".join(struct.pack(">I", len(s)) for s in samples)),
        _full(b"stco", 0, 0, struct.pack(">I", n),
              b"".join(struct.pack(">I", o) for o in offs))]
    if sync_samples is not None:
        stbl_children.append(
            _full(b"stss", 0, 0, struct.pack(">I", len(sync_samples)),
                  b"".join(struct.pack(">I", s + 1)
                           for s in sync_samples)))
    stbl = _box(b"stbl", *stbl_children)
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIII", 0, 0, ts, n * (ts // fps)),
                 struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0), b"vide",
                 b"\x00" * 12, b"VideoHandler\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    url = _full(b"url ", 0, 1)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1), url)
    minf = _box(b"minf", vmhd, _box(b"dinf", dref), stbl)
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    tkhd = _full(b"tkhd", 0, 3, struct.pack(">IIII", 0, 0, 1, 0),
                 struct.pack(">I", n * 1000 // fps), b"\x00" * 8,
                 struct.pack(">HHHH", 0, 0, 0, 0), _MP4_UNITY_MATRIX,
                 struct.pack(">II", w << 16, h << 16))
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, 1000, n * 1000 // fps),
                 struct.pack(">I", 0x10000), struct.pack(">H", 0x100),
                 b"\x00" * 10, _MP4_UNITY_MATRIX, b"\x00" * 24,
                 struct.pack(">I", 2))
    return ftyp + mdat + _box(b"moov", mvhd,
                              _box(b"trak", tkhd, mdia))


def synth_hevc_luma(media_id: int, frame: int, h: int = 24,
                    w: int = 32) -> np.ndarray:
    """The SQL-expressible luma formula the hevc contract oracle
    re-derives: ``(17*row + 31*col + 53*frame + 7*media_id) % 256``."""
    rr, cc = np.mgrid[0:h, 0:w]
    return ((17 * rr + 31 * cc + 53 * frame + 7 * media_id) % 256) \
        .astype(np.uint8)


def encode_hevc_mp4(lumas: list[np.ndarray], fps: int = 10,
                    all_intra: bool = False) -> bytes:
    """Luma frames -> a REAL hev1 MP4: lossless libx265 encoding
    (chroma flat 128 so decoded RGB is exact grayscale), hvcC from the
    encoder's parameter sets, length-prefixed samples.  With
    *all_intra* false the track carries genuine P frames — the decode
    side must run the full reference-state pass."""
    from .hevccodec import (annexb_to_length_prefixed, build_hvcc,
                            encode_hevc_yuv)
    h, w = lumas[0].shape
    uv = np.full((h // 2, w // 2), 128, np.uint8)
    headers, payloads = encode_hevc_yuv(
        [(f, uv, uv) for f in lumas], fps=fps, all_intra=all_intra)
    hvcc = build_hvcc(headers)
    samples = [annexb_to_length_prefixed(p) for p in payloads]
    sync = list(range(len(samples))) if all_intra else [0]
    return mux_mp4_video(
        samples, fps=fps, w=w, h=h, codec=b"hev1",
        entry_children=_box(b"hvcC", hvcc), sync_samples=sync)


def synth_hevc_video_table(spark: SparkSession, n_media: int = 3,
                           n_frames: int = 4, h: int = 24,
                           w: int = 32) -> DataFrame:
    """``(media_id long, payload binary)`` of real hev1 MP4s encoded
    with the system libx265 (driver-side — the payloads are
    metadata-sized); raises pointedly when libx265 is absent."""
    rows = []
    for m in range(n_media):
        lumas = [synth_hevc_luma(m, f, h, w) for f in range(n_frames)]
        rows.append((m, bytearray(encode_hevc_mp4(lumas))))
    df = local_df(spark, rows, "media_id long, payload binary")
    return df.repartition(2, "media_id")
