"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side machinery — schemas, Arrow-batched ``mapInPandas``
pipelines, partition sizing — is real, and so is the decoding for the
formats the Python standard library can parse without external codecs:

* **images**: BMP (24-bit uncompressed, via ``struct``), the PNM
  family P2/P3/P5/P6 (PGM/PPM, ASCII + binary), **PNG** (8-bit
  gray/RGB/palette/alpha, all five row filters — stdlib ``zlib`` +
  numpy unfiltering) and **JPEG**: baseline, extended-sequential AND
  progressive/SOF2 (Huffman + spectral-selection/successive-
  approximation scans + IDCT + 4:2:0/4:2:2 upsampling + restart
  markers, pure numpy) and **GIF** (stdlib LZW, global/local
  palettes, interlacing, transparency — first frame) — the formats
  real image corpora are overwhelmingly made of;
* **audio**: WAV/PCM via :mod:`wave` (8/16/32-bit) and raw-PCM MP4
  tracks (sowt/twos/'raw ' sample entries — chunk-level extraction,
  so million-frame PCM tables never materialize per-frame);
* **video**: YUV4MPEG2 (``.y4m`` — uncompressed frames behind a text
  header; the interchange format ffmpeg/mjpegtools emit) and **MP4 /
  ISO-BMFF** containers: full box + sample-table parsing
  (stts/stsz/stsc/stco/co64), metadata probe for every codec, and
  frame DECODE for MJPEG tracks (samples are plain JPEG).

AVIF decodes by DELEGATING to the system libavif when the shared
library is loadable (:mod:`.avifcodec` — AV1 is codec-sized, binding
the reference decoder is the production answer, and the executors
resolve the ``.so`` locally); ``av01`` MP4 tracks frame-sample through
the same library by re-boxing each SYNC sample (plus the track's
``av1C`` config) as a single-item AVIF, with non-sync (inter) samples
skipped honestly via the ``stss`` table.  Payloads still needing a
codec library that is absent (AVIF/av01 without libavif; VP8 inter
frames; avc1 samples) raise ``ValueError`` with a pointed message —
swap the per-payload decoder for PIL/pyav in production and the Spark
plumbing holds unchanged at scale.

Design rules baked in:

* media bytes ride in a ``binary`` column next to a typed ``meta`` struct,
  so predicates/pruning work on metadata without touching payloads;
* per-batch work happens in Arrow-batched ``mapInPandas`` (one
  Python round-trip per ~10k rows, not per row);
* decoded features come back as fixed-schema columns, never pickled blobs.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sha256", T.StringType(), True),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType(), False), True),
])


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive cheap metadata (byte size, content hash) without decoding."""
    return (df
            .withColumn("n_bytes", F.octet_length(payload_col))
            .withColumn("payload_hash", F.sha2(F.col(payload_col), 256)))


def _decode_image_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decode + feature-extract'.

    Stands in for a real image decode (PIL/torchvision unavailable here):
    derives a *dim*-float pseudo-feature from the payload's sha256 so tests
    are reproducible.  Replace with a real decoder in production.
    """
    if payload is None:
        return []
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_image_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "media_id", dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` gives one Python invocation per Arrow batch; at 100 TB
    the parallelism knob is the input partitioning (use
    ``spark.sql.files.maxPartitionBytes`` to keep batches ~128 MB).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "sha256": payloads.map(
                    lambda p: hashlib.sha256(p).hexdigest() if p is not None else None),
                "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                "feature": payloads.map(lambda p: _decode_image_stub(p, dim)),
            })

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA)


def normalize_embeddings_per_group(df: DataFrame, vec_col: str = "embedding",
                                   group_col: str = "label",
                                   id_col: str = "vec_id") -> DataFrame:
    """Per-group embedding centering via ``applyInPandas`` (grouped-map).

    Subtracts each group's mean vector — the grouped-map pattern for
    anything needing a whole group in memory at once (normalization,
    whitening, per-group PCA).  One shuffle on *group_col*; groups must fit
    an executor (true for per-label/per-source groups; salt the key if a
    group can exceed memory).
    """
    import numpy as np

    out_schema = df.select(id_col, group_col, vec_col).schema

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        M = M - M.mean(axis=0)
        pdf = pdf.copy()
        pdf[vec_col] = [row.astype(np.float32).tolist() for row in M]
        return pdf

    return (df.select(id_col, group_col, vec_col)
            .groupBy(group_col).applyInPandas(center, schema=out_schema))


# ---------------------------------------------------------------------------
# stdlib decoders (pure Python + numpy — no external codec libraries)
# ---------------------------------------------------------------------------


def _decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed BMP -> (h, w, 3) uint8 RGB array.  24-bit (BGR),
    32-bit (BGRX — the padding byte is NOT alpha in BI_RGB files, so
    it is dropped) and 8-bit palettized (BGRX color table after the
    header)."""
    off, = struct.unpack_from("<I", b, 10)
    hdr_size, = struct.unpack_from("<I", b, 14)
    w, h = struct.unpack_from("<ii", b, 18)
    bpp, = struct.unpack_from("<H", b, 28)
    comp, = struct.unpack_from("<I", b, 30)
    if comp != 0 or bpp not in (8, 24, 32):
        raise ValueError(
            f"BMP decode supports 8/24/32-bit uncompressed only "
            f"(bpp={bpp}, compression={comp})")
    bottom_up, h = h > 0, abs(h)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3     # rows padded to 4 bytes
    px = (np.frombuffer(b, np.uint8, stride * h, off)
          .reshape(h, stride)[:, :w * nbytes].reshape(h, w, nbytes))
    if bottom_up:
        px = px[::-1]
    if bpp == 8:
        n_colors, = struct.unpack_from("<I", b, 46)
        n_colors = n_colors or 256
        table = np.frombuffer(b, np.uint8, n_colors * 4,
                              14 + hdr_size).reshape(-1, 4)
        return np.ascontiguousarray(table[px[..., 0]][..., 2::-1])
    return np.ascontiguousarray(px[..., 2::-1])    # BGR(X) -> RGB


def _decode_pnm(b: bytes) -> np.ndarray:
    """PNM P2/P3/P5/P6 -> (h, w, c) uint8 array (c=1 gray, c=3 RGB)."""
    magic = b[:2]
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError(f"not a supported PNM magic: {magic!r}")
    # header = magic + 3 ASCII ints (w, h, maxval), '#' comments allowed
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":
            pos = b.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(b) and not b[end:end + 1].isspace():
            end += 1
        vals.append(int(b[pos:end]))
        pos = end
    w, h, maxval = vals
    if maxval > 65535:
        raise ValueError(f"PNM maxval {maxval} out of spec range")
    channels = 3 if magic in (b"P3", b"P6") else 1
    n = w * h * channels
    if magic in (b"P5", b"P6"):
        if maxval > 255:                # 16-bit: big-endian, scale to 8
            wide = np.frombuffer(b, ">u2", n, pos + 1).astype(np.float64)
            px = np.round(wide * (255.0 / maxval)).astype(np.uint8)
        else:
            px = np.frombuffer(b, np.uint8, n, pos + 1)  # ws after maxval
    else:
        wide = np.array(b[pos:].split()[:n], dtype=np.int64)
        if maxval > 255:
            wide = np.round(wide * (255.0 / maxval)).astype(np.int64)
        px = wide.astype(np.uint8)
    return px.reshape(h, w, channels)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, h: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Undo PNG per-row filtering: *raw* is ``h`` rows of
    ``1 + stride`` bytes (filter tag + filtered bytes); returns the
    reconstructed ``(h, stride)`` byte matrix.

    Filters None/Up are vectorized whole-row; Sub is a per-residue-class
    cumulative sum (mod 256); Average/Paeth reconstruct left-to-right
    with a numpy column loop (each byte needs the already-reconstructed
    left neighbor — inherently sequential in x, vector in nothing, but
    rows are short and this runs inside Arrow-batched ``mapInPandas``,
    never per-corpus-token)."""
    raw = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint16)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        ft, row = int(raw[y, 0]), raw[y, 1:].astype(np.uint16)
        if ft == 0:
            rec = row
        elif ft == 1:      # Sub: rec[i] = row[i] + rec[i-bpp]
            rec = row.copy()
            for r in range(bpp):
                rec[r::bpp] = np.cumsum(rec[r::bpp]) & 0xFF
        elif ft == 2:      # Up
            rec = (row + prev) & 0xFF
        elif ft == 3:      # Average
            rec = row.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:      # Paeth
            rec = row.copy()
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(out[y - 1, i - bpp]) if (y > 0 and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out


# Adam7 pass geometry (PNG spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _decode_png(b: bytes) -> np.ndarray:
    """PNG -> (h, w, c) uint8 array.  Full depth coverage: 8-bit, 16-bit
    (big-endian high byte = the standard v >> 8 down-conversion) and
    sub-byte 1/2/4-bit (gray expanded to 0..255, palette indices
    direct); color types 0 (gray), 2 (RGB), 3 (palette, incl. tRNS
    transparency -> RGBA), 4 (gray+alpha), 6 (RGBA); non-interlaced
    AND Adam7-interlaced (each pass is an independently filtered
    sub-image scattered back on the pass grid).
    Pure stdlib: chunk walk + zlib inflate + numpy unfiltering."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, idat, plte, trns = 8, [], None, None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(b):
        ln, typ = struct.unpack_from(">I4s", b, pos)
        data = b[pos + 8:pos + 8 + ln]
        pos += 12 + ln                  # len + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    if depth in (8, 16):
        sampw = depth // 8              # bytes per sample
        bpp = channels * sampw          # filter distance is in BYTES

        def row_bytes(rw: int) -> int:
            return rw * bpp

        def to_px(rows: np.ndarray, rh: int, rw: int) -> np.ndarray:
            # 16-bit samples are big-endian, so byte 0 IS the
            # standard v >> 8 down-conversion
            a = rows.astype(np.uint8).reshape(rh, rw, channels, sampw)
            return np.ascontiguousarray(a[..., 0])
    elif depth in (1, 2, 4) and ctype in (0, 3):
        bpp = 1                         # sub-byte: filter distance 1 byte

        def row_bytes(rw: int) -> int:
            return (rw * depth + 7) // 8

        def to_px(rows: np.ndarray, rh: int, rw: int) -> np.ndarray:
            bits = np.unpackbits(rows.astype(np.uint8), axis=1)
            weights = 1 << np.arange(depth - 1, -1, -1)
            vals = bits[:, :(bits.shape[1] // depth) * depth] \
                .reshape(rh, -1, depth) @ weights
            vals = vals[:, :rw]
            if ctype == 0:              # gray: expand to full 0..255
                vals = vals * (255 // ((1 << depth) - 1))
            return vals.astype(np.uint8).reshape(rh, rw, 1)
    else:
        raise ValueError(
            f"PNG bit depth {depth} with color type {ctype} not "
            "supported (sub-byte depths are gray/palette only)")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)

    if interlace == 0:
        stride = row_bytes(w)
        if raw.size != h * (1 + stride):
            raise ValueError("PNG pixel data size mismatch")
        px = to_px(_png_unfilter(raw, h, stride, bpp), h, w)
    elif interlace == 1:
        px = np.zeros((h, w, channels), np.uint8)
        at = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:      # empty pass: no bytes at all
                continue
            pstride = row_bytes(pw)
            need = ph * (1 + pstride)
            if at + need > raw.size:
                raise ValueError("PNG Adam7 pass truncated")
            sub = _png_unfilter(raw[at:at + need], ph, pstride, bpp)
            px[y0::dy, x0::dx] = to_px(sub, ph, pw)
            at += need
        if at != raw.size:
            raise ValueError("PNG Adam7 trailing pixel data")
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = px[..., 0]
        if trns is not None:            # palette transparency -> RGBA
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = trns[:len(plte)]
            px = np.concatenate([plte[idx], alpha[idx][..., None]],
                                axis=2)
        else:
            px = plte[idx]
    return np.ascontiguousarray(px)


def _apng_frames(b: bytes):
    """APNG -> yields ``(rgb canvas copy, delay_ms)`` per frame.

    The canvas is RGB (video-pipeline currency): alpha regions either
    blend over the existing canvas (blend op 1) or, for blend op 0
    ("source" — alpha REPLACES the region per spec), flatten over
    black since an RGB canvas carries no alpha plane.  Frame
    regions decode through the same zlib+unfilter pipeline as still
    PNGs (8-bit, non-interlaced frames — the practical APNG universe),
    then composite with the spec's blend ops (0 = source replace,
    1 = alpha over) and dispose ops (0 none, 1 clear region,
    2 restore previous).  A zero delay numerator renders as 100 ms
    (same de-facto convention as the GIF path); denominator 0 means
    1/100 s units per the spec."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    w = h = depth = ctype = interlace = None
    plte = trns = None
    actl = None
    entries: list = []          # [(fctl dict | None, [data bytes])]
    cur_data: list | None = None
    idat_fctl_seen = False
    while pos + 8 <= len(b):
        ln, typ = struct.unpack_from(">I4s", b, pos)
        data = b[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _c, _f, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif typ == b"acTL":
            actl = struct.unpack(">II", data)
        elif typ == b"fcTL":
            f = dict(zip(("seq", "w", "h", "x", "y", "dnum", "dden",
                          "dispose", "blend"),
                         struct.unpack(">IIIIIHHBB", data)))
            cur_data = []
            entries.append((f, cur_data))
        elif typ == b"IDAT":
            if entries and not entries[-1][1] and not idat_fctl_seen:
                idat_fctl_seen = True       # IDAT belongs to fcTL #0
            if entries and idat_fctl_seen:
                entries[-1][1].append(data)
            # IDAT before any fcTL = default image, not an anim frame
        elif typ == b"fdAT":
            if cur_data is None:
                raise ValueError("APNG fdAT without a preceding fcTL")
            cur_data.append(data[4:])       # strip sequence number
        elif typ == b"IEND":
            break
    if actl is None:
        raise ValueError("PNG without an acTL chunk is not animated")
    if depth != 8 or interlace != 0:
        raise ValueError("APNG frames supported at 8-bit "
                         "non-interlaced only")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    canvas = np.zeros((h, w, 3), np.uint8)
    for f, datas in entries:
        fw, fh, x0, y0 = f["w"], f["h"], f["x"], f["y"]
        raw = np.frombuffer(zlib.decompress(b"".join(datas)), np.uint8)
        stride = fw * channels
        if raw.size != fh * (1 + stride):
            raise ValueError("APNG frame pixel data size mismatch")
        px = _png_unfilter(raw, fh, stride, channels).astype(np.uint8) \
            .reshape(fh, fw, channels)
        if ctype == 3:
            if plte is None:
                raise ValueError("palette APNG missing PLTE chunk")
            idx = px[..., 0]
            if trns is not None:
                alpha = np.full(len(plte), 255, np.uint8)
                alpha[:len(trns)] = trns[:len(plte)]
                rgb, a = plte[idx], alpha[idx]
            else:
                rgb, a = plte[idx], None
        elif ctype == 0:
            rgb, a = np.repeat(px, 3, axis=2), None
        elif ctype == 2:
            rgb, a = px, None
        elif ctype == 4:
            rgb, a = np.repeat(px[..., :1], 3, axis=2), px[..., 1]
        else:                                   # 6: RGBA
            rgb, a = px[..., :3], px[..., 3]
        prev = canvas.copy() if f["dispose"] == 2 else None
        view = canvas[y0:y0 + fh, x0:x0 + fw]
        if f["blend"] == 1 and a is not None:   # over
            af = a.astype(np.float64)[..., None] / 255.0
            view[:] = np.round(af * rgb + (1 - af) * view) \
                .astype(np.uint8)
        elif a is not None:                     # source, with alpha:
            view[:] = np.round(rgb * (a.astype(np.float64)[..., None]
                                      / 255.0)).astype(np.uint8)
        else:
            view[:] = rgb
        dden = f["dden"] or 100
        delay = 1000.0 * f["dnum"] / dden if f["dnum"] else 100.0
        yield canvas.copy(), delay
        if f["dispose"] == 1:
            canvas[y0:y0 + fh, x0:x0 + fw] = 0
        elif f["dispose"] == 2:
            canvas = prev


_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# orthonormal 8-point DCT-II basis; IDCT of coeff block B is A.T @ B @ A
_DCT_A = np.array([[(1 / np.sqrt(2) if u == 0 else 1.0) * 0.5
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    for x in range(8)] for u in range(8)])


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy-coded segment."""

    def __init__(self, data: bytes):
        self.data, self.pos, self.bit = data, 0, 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # spec (ITU-T T.81 F.2.2.5): the entropy stream pads with 1
            # bits.  Must match exactly: for a stream ending mid-code,
            # all-ones prefixes are typically unassigned in canonical
            # Huffman tables, so 1-padding errors out where 0-padding
            # could silently decode a wrong symbol.
            return 1
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_extend(v: int, s: int) -> int:
    """JPEG coefficient sign extension: an s-bit magnitude code maps to
    [-(2^s - 1) .. -2^(s-1)] when its top bit is 0."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _scan_entropy(b: bytes, pos: int) -> tuple:
    """De-stuffed entropy-coded segments starting at *pos* (split at
    restart markers); returns ``(segments, end_pos)`` with *end_pos* at
    the 0xFF of the terminating marker — the walker continues there (a
    progressive stream holds many scans, with DHT redefinitions between
    them)."""
    segments: list = []
    cur = bytearray()
    i = pos
    while i < len(b):
        byte = b[i]
        if byte == 0xFF:
            nxt = b[i + 1] if i + 1 < len(b) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break                               # EOI or next marker
        cur.append(byte)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def _seq_block(reader: _BitReader, dc_tab: dict, ac_tab: dict,
               zz: np.ndarray, pred_val: int) -> int:
    """Sequential full-band block decode into a zigzag coefficient row;
    returns the updated DC predictor."""
    s = _huff_decode(reader, dc_tab)
    pred_val += _jpeg_extend(reader.read_bits(s), s)
    zz[0] = pred_val
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:                         # ZRL: 16 zeros
                k += 16
                continue
            break                               # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overflow")
        zz[k] = _jpeg_extend(reader.read_bits(s), s)
        k += 1
    return pred_val


# -- progressive scan block decoders (T.81 G.2; the successive-
# -- approximation control flow mirrors the reference libjpeg
# -- jdphuff.c algorithm, which is the de-facto conformance target) ------

def _dc_first(reader: _BitReader, dc_tab: dict, zz: np.ndarray,
              al: int, pred_val: int) -> int:
    s = _huff_decode(reader, dc_tab)
    pred_val += _jpeg_extend(reader.read_bits(s), s)
    zz[0] = pred_val << al
    return pred_val


def _dc_refine(reader: _BitReader, zz: np.ndarray, al: int) -> None:
    # OR into the two's-complement stored value — exact for negatives
    if reader.read_bit():
        zz[0] |= (1 << al)


def _ac_first(reader: _BitReader, ac_tab: dict, zz: np.ndarray,
              ss: int, se: int, al: int, eobrun: int) -> int:
    """First AC scan of a band: values arrive at reduced precision
    (``<< al``); EOB runs span blocks.  Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            if k > se:
                raise ValueError("JPEG AC index overflow")
            zz[k] = _jpeg_extend(reader.read_bits(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1               # this block ends here
            k += 16                             # ZRL
    return 0


def _ac_refine(reader: _BitReader, ac_tab: dict, zz: np.ndarray,
               ss: int, se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement: each already-nonzero
    coefficient receives a correction bit (in positional order); newly
    nonzero coefficients arrive as +-1 at the new bit position, with
    run lengths counted over ZERO-HISTORY positions only."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tab)
            r, s = rs >> 4, rs & 0xF
            sval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break                       # EOB logic finishes block
                # ZRL: 16 zero-history positions, no new coefficient
            else:
                sval = p1 if reader.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sval and k <= se:
                zz[k] = sval
            k += 1
    if eobrun > 0:
        while k <= se:                          # trailing correction bits
            if zz[k] != 0:
                if reader.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _apply_scan(coefs: dict, comps: list, huff: dict, scan_comps: list,
                ss: int, se: int, ah: int, al: int, segments: list,
                restart_interval: int, geom: tuple, w: int, h: int,
                progressive: bool) -> None:
    """Run one entropy-coded scan over the coefficient arrays."""
    hmax, vmax, mcus_x, mcus_y = geom
    cinfo = {cid: (hs, vs) for cid, hs, vs, _q in comps}
    tables = {cid: (huff.get((0, td)), huff.get((1, ta)))
              for cid, td, ta in scan_comps}
    interleaved = len(scan_comps) > 1
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError(
                "invalid progressive scan: DC scan must have Se=0 "
                f"(got Ss={ss}, Se={se})")
        if ss > 0 and interleaved:
            raise ValueError(
                "invalid progressive scan: AC scans are single-component")
    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        # T.81 §A.2.2: a NON-INTERLEAVED scan (sequential or progressive)
        # walks one-block data units in the component's own raster order
        # — bw x bh blocks, no MCU padding
        cid0 = scan_comps[0][0]
        hs, vs = cinfo[cid0]
        comp_w = (w * hs + hmax - 1) // hmax
        comp_h = (h * vs + vmax - 1) // vmax
        bw = (comp_w + 7) // 8
        bh = (comp_h + 7) // 8
        n_units = bw * bh
    per_seg = restart_interval or n_units
    reader = _BitReader(segments[0])
    seg_idx = 0
    pred = {cid: 0 for cid, _td, _ta in scan_comps}
    eobrun = 0
    for u in range(n_units):
        if restart_interval and u and u % per_seg == 0:
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            pred = {cid: 0 for cid in pred}
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, mcus_x)
            for cid, _td, _ta in scan_comps:
                hs, vs = cinfo[cid]
                dc_tab, ac_tab = tables[cid]
                for by in range(vs):
                    for bx in range(hs):
                        zz = coefs[cid][my * vs + by, mx * hs + bx]
                        if not progressive:
                            pred[cid] = _seq_block(
                                reader, dc_tab, ac_tab, zz, pred[cid])
                        elif ah == 0:
                            pred[cid] = _dc_first(
                                reader, dc_tab, zz, al, pred[cid])
                        else:
                            _dc_refine(reader, zz, al)
        else:                                   # non-interleaved, one comp
            by, bx = divmod(u, bw)
            zz = coefs[cid0][by, bx]
            dc_tab, ac_tab = tables[cid0]
            if not progressive:
                pred[cid0] = _seq_block(reader, dc_tab, ac_tab, zz,
                                        pred[cid0])
            elif ss == 0:
                if ah == 0:
                    pred[cid0] = _dc_first(reader, dc_tab, zz, al,
                                           pred[cid0])
                else:
                    _dc_refine(reader, zz, al)
            elif ah == 0:
                eobrun = _ac_first(reader, ac_tab, zz, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(reader, ac_tab, zz, ss, se, al,
                                    eobrun)


def _jpeg_upsample(p: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Chroma upsampling.  Factor-2 axes use the TRIANGLE filter
    (3*nearer + further) / 4 with edge replication — libjpeg's "fancy"
    h2v1/h2v2 upsampling, which JFIF's half-sample-offset chroma
    positioning makes the faithful reconstruction (and what
    libjpeg-derived decoders like the JVM's emit, pinned within +-2 by
    tests/test_imageio_interop.py).  Other factors replicate."""
    if fy == 2:
        up = np.empty((p.shape[0] * 2, p.shape[1]))
        above = np.vstack([p[:1], p[:-1]])
        below = np.vstack([p[1:], p[-1:]])
        up[0::2] = (3.0 * p + above) / 4.0
        up[1::2] = (3.0 * p + below) / 4.0
        p = up
    elif fy != 1:
        p = np.repeat(p, fy, 0)
    if fx == 2:
        up = np.empty((p.shape[0], p.shape[1] * 2))
        left = np.hstack([p[:, :1], p[:, :-1]])
        right = np.hstack([p[:, 1:], p[:, -1:]])
        up[:, 0::2] = (3.0 * p + left) / 4.0
        up[:, 1::2] = (3.0 * p + right) / 4.0
        p = up
    elif fx != 1:
        p = np.repeat(p, fx, 1)
    return p


def _decode_jpeg(b: bytes) -> np.ndarray:
    """Huffman JPEG -> (h, w, c) uint8 array, c = 1 (grayscale) or 3
    (RGB).  Baseline, extended-sequential (SOF0/SOF1) AND progressive
    (SOF2 — spectral selection + successive approximation, the majority
    format in real web image corpora).  Pure stdlib + numpy: marker
    walk, per-table canonical Huffman, per-scan coefficient
    accumulation, vectorized dequantize + IDCT, nearest-neighbor chroma
    upsampling, JFIF YCbCr -> RGB.  Lossless/arithmetic-coded variants
    raise a pointed ``ValueError``.

    Per-block Huffman decoding is a Python loop — acceptable because it
    runs once per image row inside Arrow-batched ``mapInPandas``, and
    thumbnails/MCU counts are small; the IDCT and color math are numpy.
    """
    qt: dict = {}
    huff: dict = {}
    comps: list = []
    w = h = None
    progressive = False
    restart_interval = 0
    coefs: dict | None = None
    geom = None
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln, = struct.unpack_from(">H", b, pos)
        data = b[pos + 2:pos + ln]
        if marker == 0xDB:                      # DQT
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0xF
                i += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        data, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    qt[tq] = np.frombuffer(
                        data, ">u2", 64, i).astype(np.int32)
                    i += 128
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/1 seq, SOF2 prog
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack_from(">BHHB", data, 0)
            comps = [(data[6 + 3 * i], data[7 + 3 * i] >> 4,
                      data[7 + 3 * i] & 0xF, data[8 + 3 * i])
                     for i in range(nc)]        # (id, hs, vs, qid)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/extended-sequential/progressive Huffman "
                f"JPEG is supported (SOF marker 0x{marker:02X})")
        elif marker == 0xC4:                    # DHT
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0xF
                counts = list(data[i + 1:i + 17])
                i += 17
                table: dict = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = data[i]
                        code += 1
                        i += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker == 0xDD:                    # DRI
            restart_interval, = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:                    # SOS (possibly many)
            ns = data[0]
            scan_comps = [(data[1 + 2 * i], data[2 + 2 * i] >> 4,
                           data[2 + 2 * i] & 0xF) for i in range(ns)]
            ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
            ahal = data[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if w is None:
                raise ValueError("JPEG SOS before SOF")
            if geom is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                geom = (hmax, vmax, mcus_x, mcus_y)
                coefs = {cid: np.zeros((mcus_y * vs, mcus_x * hs, 64),
                                       np.int32)
                         for cid, hs, vs, _q in comps}
            segments, end = _scan_entropy(b, pos + ln)
            _apply_scan(coefs, comps, huff, scan_comps, ss, se, ah, al,
                        segments, restart_interval, geom, w, h,
                        progressive)
            pos = end
            continue
        pos += ln
    if coefs is None:
        raise ValueError("JPEG missing SOF/SOS")

    hmax, vmax, mcus_x, mcus_y = geom
    full = []
    for cid, hs, vs, qid in comps:
        c = coefs[cid].astype(np.int64)
        nat = np.zeros_like(c)
        nat[..., _ZIGZAG] = c * qt[qid]
        bh, bw = c.shape[:2]
        blocks = nat.reshape(bh, bw, 8, 8).astype(np.float64)
        spatial = np.einsum("ij,abjk,kl->abil",
                            _DCT_A.T, blocks, _DCT_A) + 128
        p = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # crop to the component's TRUE sample grid before upsampling so
        # the triangle filter's edge replication never reads block
        # padding
        ch = -(-h * vs // vmax)
        cw = -(-w * hs // hmax)
        p = _jpeg_upsample(p[:ch, :cw], vmax // vs, hmax // hs)
        full.append(p[:h, :w])
    if len(full) == 1:
        px = full[0][..., None]
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        bl = y + 1.772 * (cb - 128)
        px = np.stack([r, g, bl], axis=-1)
    else:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    return np.clip(np.rint(px), 0, 255).astype(np.uint8)


def _gif_lzw(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW decode (LSB-first variable-width codes, CLEAR/EOI
    handling, code-size growth at 2^n up to 12 bits) -> uint8 index
    array of length *n_pixels*."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = i = 0

    def reset():
        return min_code_size + 1, {c: bytes([c]) for c in range(clear)}, eoi + 1

    code_size, table, next_code = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < code_size:
            if i >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            code_size, table, next_code = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]             # the KwKwK case
        else:
            raise ValueError(f"GIF LZW bad code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW produced too few pixels")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(b: bytes) -> np.ndarray:
    """GIF87a/89a -> (h, w, c) uint8 array: stdlib LZW, global/local
    palettes, interlacing, transparency (c=4 RGBA when a transparent
    index is declared, else c=3).  FIRST frame only — animated GIFs
    return frame 1 composited on the logical screen (the standard
    thumbnail/near-dup treatment for web corpora)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF: {b[:6]!r}")
    try:
        return _decode_gif_body(b)
    except (struct.error, IndexError) as e:     # truncated/corrupt
        raise ValueError(f"corrupt GIF: {e}") from None


def _gif_screen(b: bytes) -> tuple[int, int, np.ndarray | None, int]:
    """Logical-screen header -> (w, h, global color table, pos)."""
    w, h = struct.unpack_from("<HH", b, 6)
    packed = b[10]
    pos = 13
    gct = None
    if packed >> 7:
        n = 2 << (packed & 7)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    return w, h, gct, pos


def _gif_blocks(b: bytes):
    """Walk GIF rendering blocks: yields one dict per image descriptor
    (de-interlaced index grid + its color table + the preceding
    graphic-control fields); the low-level half shared by the
    first-frame decoder and the animation frame generator."""
    _w, _h, gct, pos = _gif_screen(b)
    gce: dict = {}
    while pos < len(b):
        blk = b[pos]
        if blk == 0x21:                          # extension
            label = b[pos + 1]
            pos += 2
            if label == 0xF9 and b[pos] >= 4:    # graphic control
                flags = b[pos + 1]
                gce = {"transparent": b[pos + 4] if flags & 1 else None,
                       "disposal": (flags >> 2) & 7,
                       "delay_cs": struct.unpack_from("<H", b,
                                                      pos + 2)[0]}
            while b[pos] != 0:
                pos += b[pos] + 1
            pos += 1
        elif blk == 0x2C:                        # image descriptor
            x0, y0, iw, ih = struct.unpack_from("<HHHH", b, pos + 1)
            p2 = b[pos + 9]
            pos += 10
            ct = gct
            if p2 >> 7:                          # local color table
                n = 2 << (p2 & 7)
                ct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF image without a color table")
            min_code_size = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                n = b[pos]
                data += b[pos + 1:pos + 1 + n]
                pos += n + 1
            pos += 1
            idx = _gif_lzw(bytes(data), min_code_size,
                           iw * ih).reshape(ih, iw)
            if (p2 >> 6) & 1:                    # interlaced row order
                rows = np.empty(ih, np.int64)
                src_r = 0
                for first, step in _GIF_INTERLACE:
                    for r in range(first, ih, step):
                        rows[r] = src_r
                        src_r += 1
                # rows[r] = stream row that belongs at display row r
                idx = idx[rows]
            yield {"x0": x0, "y0": y0, "iw": iw, "ih": ih,
                   "idx": idx, "ct": ct, "gce": gce}
            gce = {}                             # GCE covers ONE image
        elif blk == 0x3B:                        # trailer
            return
        else:
            raise ValueError(f"GIF: unexpected block 0x{blk:02X}")


def _decode_gif_body(b: bytes) -> np.ndarray:
    w, h, _gct, _pos = _gif_screen(b)
    for img in _gif_blocks(b):
        idx, ct = img["idx"], img["ct"]
        transparent = img["gce"].get("transparent")
        px = ct[idx]                             # (ih, iw, 3)
        if transparent is not None:
            alpha = np.where(idx == transparent, 0, 255) \
                .astype(np.uint8)[..., None]
            px = np.concatenate([px, alpha], axis=-1)
        c = px.shape[-1]
        canvas = np.zeros((h, w, c), np.uint8)
        x0, y0 = img["x0"], img["y0"]
        canvas[y0:y0 + img["ih"], x0:x0 + img["iw"]] = \
            px[:h - y0, :w - x0]
        return canvas
    raise ValueError("GIF missing image data")


def _gif_frames(b: bytes):
    """Animated GIF -> (rgb canvas copy, delay_ms) per frame, with
    disposal semantics: 0/1 leave in place, 2 restore-to-background
    (clear the frame's rect), 3 restore-to-previous; transparent
    pixels composite over the existing canvas.  A zero delay renders
    as 100 ms (the de-facto browser convention — GIF has no fps)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF: {b[:6]!r}")
    w, h, _gct, _pos = _gif_screen(b)
    canvas = np.zeros((h, w, 3), np.uint8)
    for img in _gif_blocks(b):
        gce = img["gce"]
        disp = gce.get("disposal", 0)
        tr = gce.get("transparent")
        delay_cs = gce.get("delay_cs", 0)
        x0, y0 = img["x0"], img["y0"]
        ih = min(img["ih"], h - y0)
        iw = min(img["iw"], w - x0)
        if ih <= 0 or iw <= 0:
            continue
        prev = canvas.copy() if disp == 3 else None
        idx = img["idx"][:ih, :iw]
        region = img["ct"][idx]
        view = canvas[y0:y0 + ih, x0:x0 + iw]
        if tr is not None:
            m = idx != tr
            view[m] = region[m]
        else:
            view[:] = region
        yield canvas.copy(), (delay_cs * 10 if delay_cs > 0 else 100)
        if disp == 2:
            canvas[y0:y0 + ih, x0:x0 + iw] = 0
        elif disp == 3:
            canvas = prev


def _webp_frames(b: bytes):
    """Animated WebP (VP8X + ANIM + ANMF) -> (rgb canvas copy,
    delay_ms) per frame, mirroring :func:`_gif_frames`'s contract:
    frames composite onto an internal RGBA canvas honoring each ANMF's
    blend flag (bit 1: 1 = overwrite the rect, alpha included) and
    dispose flag (bit 0: 1 = restore the frame rect to the ANIM
    background color).  Frame payloads decode through the in-repo VP8L
    and VP8-keyframe decoders; a separate ALPH plane (lossy-with-alpha)
    decodes into the frame's alpha channel.  Each yielded frame is the
    RGBA canvas PROJECTED to RGB by compositing over the opaque ANIM
    background color (the GIF-canvas convention this generator's
    contract promises downstream).  A zero duration renders as 100 ms
    (the browser convention, like GIF)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WEBP RIFF container")
    pos, cw, ch, bg = 12, None, None, np.array([255, 255, 255],
                                               np.uint8)
    frames = []
    while pos + 8 <= len(b):
        fourcc = b[pos:pos + 4]
        size, = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if fourcc == b"VP8X" and size >= 10:
            cw = 1 + int.from_bytes(b[body + 4:body + 7], "little")
            ch = 1 + int.from_bytes(b[body + 7:body + 10], "little")
        elif fourcc == b"ANIM" and size >= 6:
            bgra = b[body:body + 4]
            bg = np.array([bgra[2], bgra[1], bgra[0]], np.uint8)
        elif fourcc == b"ANMF" and size >= 16:
            fx = int.from_bytes(b[body:body + 3], "little") * 2
            fy = int.from_bytes(b[body + 3:body + 6], "little") * 2
            dur = int.from_bytes(b[body + 12:body + 15], "little")
            flags = b[body + 15]
            frames.append((fx, fy, dur, flags, body + 16, body + size))
        pos = body + size + (size & 1)
    if not frames:
        raise ValueError("WEBP without ANMF frames (not animated)")
    if cw is None:
        raise ValueError("animated WEBP without VP8X canvas dims")
    bg4 = np.array([bg[0], bg[1], bg[2], 255], np.uint8)
    canvas = np.empty((ch, cw, 4), np.uint8)
    canvas[:] = bg4
    for fx, fy, dur, flags, p0, p1 in frames:
        px = None
        alph = None
        q = p0
        while q + 8 <= p1:
            fcc = b[q:q + 4]
            sz, = struct.unpack_from("<I", b, q + 4)
            payload = b[q + 8:q + 8 + sz]
            if fcc == b"VP8L":
                px = _decode_vp8l(payload)
            elif fcc == b"VP8 ":
                from .vp8 import decode_vp8_keyframe
                px = _with_alpha(decode_vp8_keyframe(payload), alph)
            elif fcc == b"ALPH":
                alph = payload
            q += 8 + sz + (sz & 1)
        if px is None:
            raise ValueError("ANMF frame without a VP8/VP8L payload")
        ih = min(px.shape[0], ch - fy)
        iw = min(px.shape[1], cw - fx)
        if ih <= 0 or iw <= 0:
            continue
        view = canvas[fy:fy + ih, fx:fx + iw]
        sub = px[:ih, :iw]
        if sub.shape[-1] != 4:
            sub = np.dstack([sub, np.full(sub.shape[:2], 255, np.uint8)])
        if flags & 2:                    # do not blend: replace the
            view[:] = sub                # rect, alpha included
        elif bool((view[..., 3] == 255).all()):
            # opaque underlay: plain source-over (the historical path,
            # same rounding as before the RGBA canvas)
            a = sub[..., 3:4].astype(np.int32)
            rgb = sub[..., :3].astype(np.int32)
            under = view[..., :3].astype(np.int32)
            view[..., :3] = ((rgb * a + under * (255 - a) + 127)
                             // 255).astype(np.uint8)
        else:                            # source-over in straight alpha
            a = sub[..., 3:4].astype(np.int32)
            ua = view[..., 3:4].astype(np.int32)
            out_a = a * 255 + ua * (255 - a)            # x255 scale
            rgb = (sub[..., :3].astype(np.int32) * a * 255
                   + view[..., :3].astype(np.int32) * ua * (255 - a))
            safe = np.maximum(out_a, 1)
            view[..., :3] = ((rgb + safe // 2) // safe).astype(np.uint8)
            view[..., 3:4] = ((out_a + 127) // 255).astype(np.uint8)
        # yielded contract stays RGB: project over the opaque ANIM
        # background color (documented projection; translucent canvas
        # regions keep their alpha internally for later blends)
        ca = canvas[..., 3:4].astype(np.int32)
        rgb_out = ((canvas[..., :3].astype(np.int32) * ca
                    + bg.astype(np.int32)[None, None, :] * (255 - ca)
                    + 127) // 255).astype(np.uint8)
        yield rgb_out, float(dur if dur > 0 else 100)
        if flags & 1:                    # dispose to background
            canvas[fy:fy + ih, fx:fx + iw] = bg4


# ---------------------------------------------------------------------------
# WebP — VP8L (lossless) bitstream, pure stdlib + numpy.
#
# Implements the public "WebP Lossless Bitstream Specification": LSB-first
# bit packing, canonical (DEFLATE-convention) Huffman codes with the
# VP8L code-length-code encoding, color cache, LZ77 backward references
# (direct and 2D plane distance codes), meta-Huffman entropy images, and
# all four transforms (predictor, cross-color, subtract-green, color
# indexing incl. sub-byte pixel bundling).  Lossy VP8 KEYFRAMES
# decode via operators/vp8.py (round 10); inter frames still raise.
#
# Verification note (same class as the progressive-JPEG caveat from the
# round-7 review): no independent WebP codec exists in this environment,
# so correctness is pinned by (a) roundtrips against the in-test VP8L
# encoder written from the same public spec and (b) hand-computed
# fixtures for the table-driven corners (plane-code map head, predictor
# edge rules).  The far tail of _VP8L_DIST_MAP is the least-verifiable
# piece; entries follow the spec's published table.
# ---------------------------------------------------------------------------

class _VP8LBitReader:
    """LSB-first bit reader (VP8L convention, like DEFLATE/GIF)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos          # byte position
        self.bit = 0            # bit position within data[pos]

    def read(self, n: int) -> int:
        v = 0
        got = 0
        while got < n:
            if self.pos >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            take = min(8 - self.bit, n - got)
            chunk = (self.data[self.pos] >> self.bit) & ((1 << take) - 1)
            v |= chunk << got
            got += take
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


_VP8L_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                  11, 12, 13, 14, 15)

# 2D offsets for distance codes 1..120 (spec "plane codes"): (dx, dy),
# distance = dy * xsize + dx (minimum 1).
_VP8L_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
    (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
    (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3),
    (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5), (3, 4),
    (-3, 4), (4, 3), (-4, 3), (5, 0), (1, 5), (-1, 5),
    (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3),
    (0, 6), (6, 0), (1, 6), (-1, 6), (6, 1), (-6, 1),
    (2, 6), (-2, 6), (6, 2), (-6, 2), (4, 5), (-4, 5),
    (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5),
    (7, 1), (-7, 1), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1),
    (8, 2), (6, 6), (-6, 6), (8, 3), (5, 7), (-5, 7),
    (7, 5), (-7, 5), (8, 4), (6, 7), (-6, 7), (7, 6),
    (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _vp8l_canonical(lengths: list[int]) -> dict:
    """RFC1951 canonical code assignment: {(length, code): symbol}."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table = {}
    for sym, ln in enumerate(lengths):
        if ln:
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
    # completeness (a lone 1-bit code is tolerated like libwebp does)
    return table


class _VP8LTree:
    """Either a 'simple' (0/1/2-symbol) code or a canonical table."""

    def __init__(self, simple_syms=None, lengths=None):
        self.simple = simple_syms
        if simple_syms is None:
            self.table = _vp8l_canonical(lengths)
            self.max_len = max(ln for ln in lengths if ln)

    def read(self, br: _VP8LBitReader) -> int:
        if self.simple is not None:
            if len(self.simple) == 1:
                return self.simple[0]
            return self.simple[br.read(1)]
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)     # MSB-of-code first
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid Huffman code")


def _vp8l_read_code_lengths(br, cl_tree, alphabet_size):
    lengths = [0] * alphabet_size
    if br.read(1):                              # bounded symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_tree.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            lengths[symbol:symbol + rep] = [prev] * min(
                rep, alphabet_size - symbol)
            symbol += rep
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:                                   # 18
            symbol += 11 + br.read(7)
    return lengths


def _vp8l_read_tree(br, alphabet_size) -> _VP8LTree:
    if br.read(1):                              # simple code
        n_syms = br.read(1) + 1
        if br.read(1):                          # 8-bit first symbol
            syms = [br.read(8)]
        else:
            syms = [br.read(1)]
        if n_syms == 2:
            syms.append(br.read(8))
        return _VP8LTree(simple_syms=syms)
    num_cl = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_VP8L_CL_ORDER[i]] = br.read(3)
    cl_used = [i for i, x in enumerate(cl_lengths) if x]
    if len(cl_used) == 1:
        # single-symbol code-length code: a 0-BIT code (libwebp's
        # BuildHuffmanTable special case) — e.g. "repeat-prev only",
        # which expands to an all-8-bit alphabet without consuming
        # any code-length bits
        cl_tree = _VP8LTree(simple_syms=[cl_used[0]])
    else:
        cl_tree = _VP8LTree(lengths=cl_lengths)
    lengths = _vp8l_read_code_lengths(br, cl_tree, alphabet_size)
    used = sum(1 for x in lengths if x)
    if used == 0:
        raise ValueError("VP8L: empty Huffman tree")
    if used == 1:                               # degenerate: 0-bit code
        return _VP8LTree(
            simple_syms=[next(i for i, x in enumerate(lengths) if x)])
    return _VP8LTree(lengths=lengths)


def _vp8l_prefix_value(br, code: int) -> int:
    """LZ77 length/distance prefix decoding (shared formula)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _vp8l_groups(br, w, h, cache_bits, top_level):
    """Huffman group(s) + optional meta-huffman entropy image."""
    meta = None
    hb = 0
    n_groups = 1
    if top_level and br.read(1):                # meta huffman
        hb = br.read(3) + 2
        mw = (w + (1 << hb) - 1) >> hb
        mh = (h + (1 << hb) - 1) >> hb
        ent = _vp8l_decode_image(br, mw, mh, top_level=False)
        meta = (((ent >> 16) & 0xFF) << 8) | ((ent >> 8) & 0xFF)
        n_groups = int(meta.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = [[_vp8l_read_tree(br, s) for s in sizes]
              for _ in range(n_groups)]
    return groups, meta, hb


def _vp8l_decode_image(br, w, h, top_level) -> np.ndarray:
    """Entropy-coded ARGB image -> flat uint32 array of length w*h."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError(f"VP8L: invalid color-cache bits {cache_bits}")
    groups, meta, hb = _vp8l_groups(br, w, h, cache_bits, top_level)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = w * h
    px = np.zeros(n, np.uint32)
    pos = 0
    g = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta[(y >> hb) * ((w + (1 << hb) - 1) >> hb)
                               + (x >> hb)])]
        s = g[0].read(br)
        if s < 256:                             # literal
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            px[pos] = argb
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * argb) & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = argb
        elif s < 256 + 24:                      # backward reference
            length = _vp8l_prefix_value(br, s - 256)
            dist_code = _vp8l_prefix_value(br, g[4].read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _VP8L_DIST_MAP[dist_code - 1]
                dist = max(dy * w + dx, 1)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for i in range(length):
                argb = int(px[pos - dist])
                px[pos] = argb
                pos += 1
                if cache is not None:
                    cache[((0x1E35A7BD * argb) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb
        else:                                   # color-cache hit
            idx = s - 256 - 24
            if cache is None or idx >= len(cache):
                raise ValueError("VP8L: cache hit without cache")
            px[pos] = cache[idx]
            pos += 1
    return px


def _vp8l_avg2(a, b):
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _vp8l_clamp_add_sub_full(l, t, tl):
    out = 0
    for sh in (24, 16, 8, 0):
        c = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, c)) << sh
    return out


def _vp8l_clamp_add_sub_half(ave, tl):
    # Spec / libwebp use C integer division (truncation toward zero) for
    # (a - tl) / 2; Python's // floors, which differs for negative odd
    # deltas (e.g. a=10, tl=13: trunc -> 9, floor -> 8).
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        c = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= max(0, min(255, c)) << sh
    return out


def _vp8l_select(l, t, tl):
    """Predictor 11: pick L or T, whichever is closer (sum of absolute
    per-channel distances) to the gradient estimate L + T - TL; ties go
    to T, matching the spec (`if (pL < pT) return L; else return T`) and
    libwebp (`pa_minus_pb <= 0 ? T : L`)."""
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        p = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        p_l += abs(p - ((l >> sh) & 0xFF))
        p_t += abs(p - ((t >> sh) & 0xFF))
    return t if p_t <= p_l else l


def _vp8l_inverse_predictor(px, w, h, bs, modes, mw):
    out = px.astype(np.int64)

    def predict(mode, x, y):
        # only called with x >= 1, y >= 1 (edges use fixed L/T rules).
        # TR at the right edge deliberately reads ONE PAST the top
        # row's end — the current row's FIRST pixel in the contiguous
        # buffer, which is already reconstructed.  This is the spec's
        # (and libwebp's) actual behavior, not an accident; clamping
        # TR to T here diverges from real encoder streams (caught by
        # the libwebp interop sweep, round 11).
        l = int(out[y * w + x - 1])
        t = int(out[(y - 1) * w + x])
        tl = int(out[(y - 1) * w + x - 1])
        tr = int(out[(y - 1) * w + x + 1])
        if mode == 0:
            return 0xFF000000
        if mode == 1:
            return l
        if mode == 2:
            return t
        if mode == 3:
            return tr
        if mode == 4:
            return tl
        if mode == 5:
            return _vp8l_avg2(_vp8l_avg2(l, tr), t)
        if mode == 6:
            return _vp8l_avg2(l, tl)
        if mode == 7:
            return _vp8l_avg2(l, t)
        if mode == 8:
            return _vp8l_avg2(tl, t)
        if mode == 9:
            return _vp8l_avg2(t, tr)
        if mode == 10:
            return _vp8l_avg2(_vp8l_avg2(l, tl), _vp8l_avg2(t, tr))
        if mode == 11:
            return _vp8l_select(l, t, tl)
        if mode == 12:
            return _vp8l_clamp_add_sub_full(l, t, tl)
        if mode == 13:
            return _vp8l_clamp_add_sub_half(_vp8l_avg2(l, t), tl)
        raise ValueError(f"VP8L: invalid predictor mode {mode}")

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[x - 1])                   # L
            elif x == 0:
                pred = int(out[(y - 1) * w])             # T
            else:
                mode = (int(modes[(y >> bs) * mw + (x >> bs)]) >> 8) & 0xFF
                pred = predict(mode, x, y)
            v = int(out[y * w + x])
            res = 0
            for sh in (24, 16, 8, 0):
                res |= ((((v >> sh) & 0xFF) + ((pred >> sh) & 0xFF))
                        & 0xFF) << sh
            out[y * w + x] = res
    return out.astype(np.uint32)


def _vp8l_delta(t, c):
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5 (arithmetic)."""
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def _vp8l_inverse_color_transform(px, w, h, bs, elems, mw):
    out = px.copy()
    for y in range(h):
        for x in range(w):
            e = int(elems[(y >> bs) * mw + (x >> bs)])
            # ColorTransformElement packing (spec 4.2.2 / libwebp
            # ColorCodeToMultipliers): green_to_red in bits 0-7 (the
            # BLUE channel), green_to_blue in bits 8-15, red_to_blue
            # in bits 16-23
            g2r = e & 0xFF
            g2b = (e >> 8) & 0xFF
            r2b = (e >> 16) & 0xFF
            v = int(out[y * w + x])
            a = (v >> 24) & 0xFF
            r = (v >> 16) & 0xFF
            g = (v >> 8) & 0xFF
            b = v & 0xFF
            r = (r + _vp8l_delta(g2r, g)) & 0xFF
            b = (b + _vp8l_delta(g2b, g) + _vp8l_delta(r2b, r)) & 0xFF
            out[y * w + x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 3|4) uint8 pixels."""
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _VP8LBitReader(data, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                                  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    px = _vp8l_image_stream(br, w, h)
    a = ((px >> np.uint32(24)) & np.uint32(0xFF)).astype(np.uint8)
    r = ((px >> np.uint32(16)) & np.uint32(0xFF)).astype(np.uint8)
    g = ((px >> np.uint32(8)) & np.uint32(0xFF)).astype(np.uint8)
    b = (px & np.uint32(0xFF)).astype(np.uint8)
    if bool((a != 255).any()):
        out = np.stack([r, g, b, a], -1)
    else:
        out = np.stack([r, g, b], -1)
    return out.reshape(h, w, -1)


def _vp8l_image_stream(br: "_VP8LBitReader", w: int, h: int) -> np.ndarray:
    """Headerless VP8L image stream (optional transforms + entropy-coded
    image) of EXTERNALLY known dimensions -> flat uint32 ARGB array.

    Shared by the VP8L chunk decoder (dimensions from the VP8L header)
    and the ALPH plane decoder (dimensions from the lossy VP8 frame),
    which the WebP spec defines as exactly this signature-less stream.
    """
    transforms = []
    cur_w = w
    while br.read(1):
        typ = br.read(2)
        if any(t[0] == typ for t in transforms):
            raise ValueError(f"VP8L: duplicate transform {typ}")
        if typ in (0, 1):                       # predictor / color
            sb = br.read(3) + 2
            mw = (cur_w + (1 << sb) - 1) >> sb
            mh = (h + (1 << sb) - 1) >> sb
            sub = _vp8l_decode_image(br, mw, mh, top_level=False)
            transforms.append((typ, sb, sub, mw, cur_w))
        elif typ == 2:                          # subtract green
            transforms.append((2, cur_w))
        else:                                   # color indexing
            psize = br.read(8) + 1
            pal = _vp8l_decode_image(br, psize, 1, top_level=False)
            # palette colors are component-wise delta-coded
            acc = 0
            colors = np.zeros(psize, np.uint32)
            for i in range(psize):
                v = int(pal[i])
                s = 0
                for sh in (24, 16, 8, 0):
                    s |= ((((acc >> sh) & 0xFF) + ((v >> sh) & 0xFF))
                          & 0xFF) << sh
                acc = s
                colors[i] = s
            if psize <= 2:
                wb = 3
            elif psize <= 4:
                wb = 2
            elif psize <= 16:
                wb = 1
            else:
                wb = 0
            packed_w = (cur_w + (1 << wb) - 1) >> wb
            transforms.append((3, wb, colors, cur_w))
            cur_w = packed_w
    px = _vp8l_decode_image(br, cur_w, h, top_level=True)
    for t in reversed(transforms):
        if t[0] == 3:
            _typ, wb, colors, orig_w = t
            if wb:
                per = 1 << wb
                bits = 8 >> wb
                mask = (1 << bits) - 1
                idx = np.zeros(orig_w * h, np.int64)
                pw = (orig_w + per - 1) >> wb
                for y in range(h):
                    for x in range(orig_w):
                        packed = int(px[y * pw + (x >> wb)])
                        green = (packed >> 8) & 0xFF
                        idx[y * orig_w + x] = (green >> ((x % per) * bits)) \
                            & mask
            else:
                idx = ((px >> np.uint32(8)) & np.uint32(0xFF)).astype(
                    np.int64)
            # Indices >= color_table_size decode as 0x00000000
            # (transparent black) per the spec, not the last entry.
            ext = np.concatenate([colors, np.zeros(1, np.uint32)])
            px = ext[np.minimum(idx, len(colors))]
            cur_w = orig_w
        elif t[0] == 2:
            cw = t[1]
            g = (px >> np.uint32(8)) & np.uint32(0xFF)
            r = (((px >> np.uint32(16)) & np.uint32(0xFF)) + g) \
                & np.uint32(0xFF)
            b = ((px & np.uint32(0xFF)) + g) & np.uint32(0xFF)
            px = (px & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
            cur_w = cw
        elif t[0] == 0:
            _typ, sb, modes, mw, cw = t
            px = _vp8l_inverse_predictor(px, cw, h, sb, modes, mw)
            cur_w = cw
        else:
            _typ, sb, elems, mw, cw = t
            px = _vp8l_inverse_color_transform(px, cw, h, sb, elems, mw)
            cur_w = cw
    return px


def _alpha_unfilter(a: np.ndarray, method: int) -> np.ndarray:
    """Invert the ALPH plane's row filter IN PLACE (WebP container spec
    / libwebp filters: 1 = horizontal, 2 = vertical, 3 = gradient).
    Row 0 always unfilters horizontally with a zero seed; column 0 of
    later rows predicts from the pixel ABOVE."""
    h, w = a.shape
    if method == 1:                              # horizontal
        seed = 0                                 # row 0 predicts from 0
        for y in range(h):
            a[y] = ((np.cumsum(a[y].astype(np.int64)) + seed)
                    & 0xFF).astype(np.uint8)
            seed = int(a[y, 0])                  # next row col 0: above
        return a
    if method == 2:                              # vertical
        a[0] = np.cumsum(a[0].astype(np.int64)) & 0xFF
        for y in range(1, h):
            a[y] = (a[y].astype(np.int64) + a[y - 1]) & 0xFF
        return a
    if method == 3:                              # gradient
        a[0] = np.cumsum(a[0].astype(np.int64)) & 0xFF
        for y in range(1, h):
            prev = a[y - 1].astype(np.int64)
            left = int(prev[0])
            tl = left
            row = a[y].astype(np.int64)
            out = np.empty(w, np.int64)
            for x in range(w):
                top = int(prev[x])
                g = left + top - tl
                pred = 0 if g < 0 else (255 if g > 255 else g)
                left = (row[x] + pred) & 0xFF
                out[x] = left
                tl = top
            a[y] = out.astype(np.uint8)
        return a
    raise ValueError(f"ALPH: invalid filtering method {method}")


def _decode_alph(body: bytes, w: int, h: int) -> np.ndarray:
    """WebP ``ALPH`` chunk -> (h, w) uint8 alpha plane.

    Header byte: compression (bits 0-1: 0 = raw, 1 = signature-less
    VP8L stream carrying alpha in the GREEN channel), filtering method
    (bits 2-3, inverted by :func:`_alpha_unfilter`), pre-processing
    (bits 4-5 — informative per the spec; a level-quantized plane is
    returned as coded, without libwebp's optional smoothing pass).
    """
    if not body:
        raise ValueError("ALPH: empty chunk")
    method = body[0] & 3
    filt = (body[0] >> 2) & 3
    if method == 0:
        if len(body) < 1 + w * h:
            raise ValueError("ALPH: raw plane shorter than width*height")
        a = np.frombuffer(body, np.uint8, w * h, 1).reshape(h, w).copy()
    elif method == 1:
        br = _VP8LBitReader(body, 1)
        px = _vp8l_image_stream(br, w, h)
        a = ((px >> np.uint32(8)) & np.uint32(0xFF)).astype(
            np.uint8).reshape(h, w)
    else:
        raise ValueError(f"ALPH: invalid compression method {method}")
    if filt:
        _alpha_unfilter(a, filt)
    return a


def _with_alpha(rgb: np.ndarray, alph_body: bytes | None) -> np.ndarray:
    """Attach a decoded ALPH plane to lossy RGB pixels (h, w, 4)."""
    if alph_body is None:
        return rgb
    h, w = rgb.shape[:2]
    a = _decode_alph(alph_body, w, h)
    return np.dstack([rgb[..., :3], a])


def _decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP container -> pixels.  VP8L (lossless) and lossy VP8
    KEYFRAMES (every still WebP) decode natively — see
    :mod:`.vp8` for the keyframe decoder; an ``ALPH`` chunk ahead of
    the VP8 frame decodes into a fourth channel (lossy-with-alpha)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WEBP RIFF container")
    pos = 12
    alph = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return _decode_vp8l(body)
        if fourcc == b"ALPH":
            alph = body
        if fourcc == b"VP8 ":
            from .vp8 import decode_vp8_keyframe
            return _with_alpha(decode_vp8_keyframe(body), alph)
        pos += 8 + size + (size & 1)            # chunks are 2-aligned
    if payload.find(b"ANMF", 12) != -1:
        # animated WebP: still-image decode = FIRST frame (the GIF
        # convention _decode_gif follows); full timeline via
        # sample_video_frames -> _webp_frames
        canvas, _delay = next(_webp_frames(payload))
        return canvas
    raise ValueError("WEBP container without a VP8L/VP8 chunk")


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """Decode BMP/PNM/PNG/GIF/JPEG (baseline, extended-sequential and
    progressive), WebP-lossless (VP8L) and WebP-lossy (VP8 keyframe +
    ALPH alpha, :mod:`.vp8`) payload bytes to an (h, w, c) uint8 pixel
    array — pure stdlib + numpy, no codec libraries.

    AVIF delegates to the system libavif when one is loadable
    (:mod:`.avifcodec` — AV1 is codec-sized, so binding the reference
    decoder IS the production answer) and raises the usual pointed
    ``ValueError`` otherwise; every caller's Spark plumbing is
    format-agnostic either way.
    """
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return _decode_webp(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp" \
            and payload[8:12] in (b"avif", b"avis", b"mif1"):
        from .avifcodec import decode_avif_bytes
        return decode_avif_bytes(payload)
    if payload[:1] == b"P":
        return _decode_pnm(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    raise ValueError(
        f"unsupported image magic {payload[:4]!r}: stdlib decode covers "
        "BMP/PGM/PPM/PNG/GIF/JPEG (incl. progressive)/WebP "
        "(VP8L + VP8 keyframes + ALPH); AVIF needs the system libavif "
        "in the runtime image")


def encode_pnm(px: np.ndarray) -> bytes:
    """(h, w, c) uint8 array -> binary PGM (c=1) / PPM (c=3) bytes."""
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError(f"PNM encode needs 1 or 3 channels, got {c}")
    magic = b"P5" if c == 1 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


def _pcm_to_float(raw: bytes, sw: int) -> np.ndarray:
    """Little-endian PCM bytes -> float64 samples (8-bit centered at 0,
    24-bit sign-extended from packed triples)."""
    if sw == 1:
        return np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0
    if sw == 2:
        return np.frombuffer(raw, "<i2").astype(np.float64)
    if sw == 3:
        u = np.frombuffer(raw, np.uint8)
        u = u[:(u.size // 3) * 3].reshape(-1, 3).astype(np.int32)
        v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
        return np.where(v >= 1 << 23, v - (1 << 24), v).astype(np.float64)
    if sw == 4:
        return np.frombuffer(raw, "<i4").astype(np.float64)
    raise ValueError(f"unsupported WAV sample width {sw}")


def decode_wav_bytes(payload: bytes) -> tuple[int, int, int, float]:
    """WAV/PCM bytes -> (n_channels, sample_rate, n_frames, rms)."""
    with wave.open(io.BytesIO(payload)) as wv:
        nch, sw = wv.getnchannels(), wv.getsampwidth()
        rate, nf = wv.getframerate(), wv.getnframes()
        raw = wv.readframes(nf)
    arr = _pcm_to_float(raw, sw)
    rms = float(np.sqrt(np.mean(arr * arr))) if arr.size else 0.0
    return nch, rate, nf, rms


def _parse_y4m(b: bytes) -> tuple[int, int, float, int, int]:
    """YUV4MPEG2 header -> (width, height, fps, frame_bytes, body_offset)."""
    nl = b.index(b"\n")
    fields = b[:nl].decode("ascii", "replace").split(" ")
    if fields[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    fps, chroma = 30.0, "420"
    for f in fields[1:]:
        if f.startswith("W"):
            w = int(f[1:])
        elif f.startswith("H"):
            h = int(f[1:])
        elif f.startswith("F"):
            num, den = f[1:].split(":")
            fps = int(num) / int(den)
        elif f.startswith("C"):
            chroma = f[1:]
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if chroma.startswith("420"):
        frame_bytes = w * h * 3 // 2
    elif chroma.startswith("444"):
        frame_bytes = w * h * 3
    elif chroma.startswith("mono"):
        frame_bytes = w * h
    else:
        raise ValueError(f"unsupported y4m chroma {chroma}")
    return w, h, fps, frame_bytes, nl + 1


# ---------------------------------------------------------------------------
# MP4 / ISO base media file format (ISO/IEC 14496-12, public spec).
#
# Container parsing is REAL: box walking (incl. 64-bit largesize),
# moov/trak/mdia/minf/stbl descent, and the full sample-table machinery
# (stts decode times, stsz sizes, stsc sample->chunk runs, stco/co64
# chunk offsets) so every sample's (offset, size, timestamp) is exact.
# Per-sample DECODING is real for: MJPEG (fourcc 'jpeg'/'mjpa' —
# samples are plain JPEG images), av01 SYNC samples (re-boxed for the
# system libavif, :mod:`.avifcodec`), and hev1/hvc1 tracks FULLY —
# inter frames included — via the system libde265
# (:mod:`.hevccodec`, one streaming pass with reference state).
# Remaining inter-frame codecs (avc1/vp09/mp4v) raise pointedly —
# this container ships no H.264/VP9 decoder (probed; COVERAGE.md);
# the Spark plumbing (sampling cadence, luma PGM hand-off, error
# columns) is codec-agnostic and holds unchanged when one is added.
# ---------------------------------------------------------------------------

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(b: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        size, = struct.unpack_from(">I", b, pos)
        fourcc = b[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                       # 64-bit largesize follows
            if body + 8 > end:
                raise ValueError("MP4 box truncated (largesize)")
            size, = struct.unpack_from(">Q", b, body)
            body += 8
            box_end = pos + size
        elif size == 0:                     # box extends to end of file
            box_end = end
        else:
            box_end = pos + size
        if size != 0 and (box_end < body or box_end > end):
            raise ValueError(f"MP4 box {fourcc!r} overruns container")
        yield fourcc, body, box_end
        pos = box_end


def _mp4_fullbox(b: bytes, pos: int) -> tuple[int, int]:
    """FullBox header -> (version, pos past version+flags)."""
    return b[pos], pos + 4


def _mp4_stsd_entry(b: bytes, pos: int, end: int, kind: str) -> dict:
    """First SampleEntry of an stsd box -> codec + typed fields."""
    fmt = b[pos + 4:pos + 8].decode("ascii", "replace")
    out = {"codec": fmt}
    if kind == "video" and pos + 36 <= end:
        w, h = struct.unpack_from(">HH", b, pos + 32)
        out["width"], out["height"] = w, h
        # child boxes follow the 78-byte VisualSampleEntry fields;
        # capture the AV1 codec config (av1C) — its payload is
        # byte-compatible with AVIF's av1C property, which is what
        # lets av01 sync samples re-box as AVIF items for libavif
        child = pos + 8 + 78
        while child + 8 <= end:
            csz, = struct.unpack_from(">I", b, child)
            if csz < 8:
                break
            if b[child + 4:child + 8] == b"av1C":
                out["av1c"] = b[child + 8:child + csz]
            elif b[child + 4:child + 8] == b"hvcC":
                # HEVC decoder configuration record — parameter sets
                # for the libde265-backed hev1/hvc1 decode path
                out["hvcc"] = b[child + 8:child + csz]
            child += csz
    elif kind == "audio" and pos + 36 <= end:
        version, = struct.unpack_from(">H", b, pos + 16)
        if version == 2 and pos + 52 <= end:
            # QuickTime SoundDescriptionV2 moves the fields: sample
            # rate becomes a float64 and channel count a 32-bit int
            # (the v0 slots hold constants there, so reading them as
            # v0 would report channels=3, rate=0 silently)
            rate = struct.unpack_from(">d", b, pos + 40)[0]
            ch, = struct.unpack_from(">I", b, pos + 48)
            out["channels"], out["sample_rate"] = ch, int(round(rate))
        else:
            # v0 and v1 share the layout through samplerate (v1 only
            # APPENDS four compression fields)
            ch, _bits = struct.unpack_from(">HH", b, pos + 24)
            rate_fixed, = struct.unpack_from(">I", b, pos + 32)
            out["channels"], out["sample_rate"] = ch, rate_fixed >> 16
    return out


def _mp4_sample_table(b: bytes, stbl_pos: int, stbl_end: int,
                      kind: str) -> dict:
    """stbl children -> codec fields + per-sample (offset, size, t_units)."""
    info: dict = {}
    sizes: list[int] = []
    fixed = 0
    stsc: list[tuple[int, int]] = []
    chunk_offsets: list[int] = []
    stts: list[tuple[int, int]] = []
    for cc, p, e in _mp4_boxes(b, stbl_pos, stbl_end):
        if cc == b"stsd":
            _, q = _mp4_fullbox(b, p)
            n_entries, = struct.unpack_from(">I", b, q)
            if n_entries >= 1:
                info.update(_mp4_stsd_entry(b, q + 4, e, kind))
        elif cc == b"stts":
            _, q = _mp4_fullbox(b, p)
            n, = struct.unpack_from(">I", b, q)
            stts = [struct.unpack_from(">II", b, q + 4 + 8 * i)
                    for i in range(n)]
        elif cc == b"stsz":
            _, q = _mp4_fullbox(b, p)
            fixed, n = struct.unpack_from(">II", b, q)
            if fixed:
                sizes = [fixed] * n
            else:
                sizes = list(struct.unpack_from(f">{n}I", b, q + 8))
        elif cc == b"stsc":
            _, q = _mp4_fullbox(b, p)
            n, = struct.unpack_from(">I", b, q)
            stsc = [struct.unpack_from(">II", b, q + 4 + 12 * i)
                    for i in range(n)]        # (first_chunk, samples/chunk)
        elif cc in (b"stco", b"co64"):
            _, q = _mp4_fullbox(b, p)
            n, = struct.unpack_from(">I", b, q)
            fmt = ">Q" if cc == b"co64" else ">I"
            step = 8 if cc == b"co64" else 4
            chunk_offsets = [struct.unpack_from(fmt, b, q + 4 + step * i)[0]
                             for i in range(n)]
        elif cc == b"stss":                      # sync (keyframe) table
            _, q = _mp4_fullbox(b, p)
            n, = struct.unpack_from(">I", b, q)
            info["sync_samples"] = {
                struct.unpack_from(">I", b, q + 4 + 4 * i)[0] - 1
                for i in range(n)}               # spec is 1-based
    n_samples = len(sizes)
    # expand stsc runs to samples-per-chunk, then lay samples into chunks
    spc: list[int] = []
    for i, (fc, per) in enumerate(stsc):
        last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) \
            else len(chunk_offsets)
        spc.extend([per] * (last - fc + 1))
    if kind == "audio":
        # chunk-level layout only: a PCM "sample" is ONE audio frame and
        # numbers in the millions — per-frame python lists don't scale,
        # and PCM frames are fixed-size so (chunk offset, frame count)
        # is the whole story
        chunks, si = [], 0
        for ci, coff in enumerate(chunk_offsets):
            k = min(spc[ci] if ci < len(spc) else 0, n_samples - si)
            chunks.append((coff, k))
            si += k
        info["chunks"] = chunks
        info["samples"] = []
        info["n_samples"] = n_samples
        info["fixed_size"] = fixed or None
        return info
    offsets: list[int] = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        off = coff
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if si >= n_samples:
                break
            offsets.append(off)
            off += sizes[si]
            si += 1
    if len(offsets) < n_samples:
        raise ValueError("MP4 sample tables inconsistent "
                         f"({len(offsets)} chunk slots, {n_samples} sizes)")
    # expand stts runs to per-sample start times (media timescale units)
    times: list[int] = []
    t = 0
    for cnt, delta in stts:
        for _ in range(cnt):
            if len(times) >= n_samples:
                break
            times.append(t)
            t += delta
    while len(times) < n_samples:                 # tolerate short stts
        times.append(t)
        t += stts[-1][1] if stts else 0
    info["samples"] = list(zip(offsets, sizes, times))
    return info


def _parse_mp4(b: bytes) -> dict:
    """ISO-BMFF bytes -> {brand, duration_ms, tracks:[{kind, codec, ...}]}.

    Progressive (non-fragmented) files only: fragmented MP4 (``moof``)
    keeps its sample tables in per-fragment ``trun`` boxes and raises
    pointedly.  Known simplifications (fine for the MJPEG/PCM decode
    paths, stated for honesty): edit lists (``elst``) are ignored, so
    timestamps are media-relative, and composition offsets (``ctts``)
    are ignored — both only matter for B-frame codecs that need
    libavcodec anyway.
    """
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 file (missing ftyp)")
    out: dict = {"brand": b[8:12].decode("ascii", "replace"),
                 "duration_ms": None, "tracks": []}
    for cc, p, e in _mp4_boxes(b, 0, len(b)):
        if cc == b"moof":
            raise ValueError("fragmented MP4 (moof) not supported; "
                             "flatten with a remux first")
        if cc != b"moov":
            continue
        for tc, tp, te in _mp4_boxes(b, p, e):
            if tc == b"mvhd":
                v, q = _mp4_fullbox(b, tp)
                if v == 1:
                    ts, = struct.unpack_from(">I", b, q + 16)
                    dur, = struct.unpack_from(">Q", b, q + 20)
                else:
                    ts, dur = struct.unpack_from(">II", b, q + 8)
                if ts:
                    out["duration_ms"] = 1000.0 * dur / ts
            elif tc == b"trak":
                trk = _mp4_track(b, tp, te)
                if trk is not None:
                    out["tracks"].append(trk)
    if not out["tracks"]:
        raise ValueError("MP4 without a moov/trak (or moov after EOF)")
    return out


def _mp4_track(b: bytes, trak_pos: int, trak_end: int) -> dict | None:
    """One trak box -> track dict, or None when it has no sample table."""
    kind, timescale, dur_units = "other", 0, 0
    stbl_span = None
    for mc, mp, me in _mp4_boxes(b, trak_pos, trak_end):
        if mc != b"mdia":
            continue
        for hc, hp, he in _mp4_boxes(b, mp, me):
            if hc == b"mdhd":
                v, q = _mp4_fullbox(b, hp)
                if v == 1:
                    timescale, = struct.unpack_from(">I", b, q + 16)
                    dur_units, = struct.unpack_from(">Q", b, q + 20)
                else:
                    timescale, dur_units = struct.unpack_from(">II", b, q + 8)
            elif hc == b"hdlr":
                handler = b[hp + 8:hp + 12]
                kind = {b"vide": "video", b"soun": "audio"}.get(
                    handler, handler.decode("ascii", "replace"))
            elif hc == b"minf":
                for sc, sp, se in _mp4_boxes(b, hp, he):
                    if sc == b"stbl":
                        stbl_span = (sp, se)
    if stbl_span is None:
        return None
    trk = {"kind": kind, "timescale": timescale,
           "duration_ms": (1000.0 * dur_units / timescale)
           if timescale else None}
    trk.update(_mp4_sample_table(b, stbl_span[0], stbl_span[1],
                                 kind if kind in ("video", "audio")
                                 else "video"))
    return trk


_MP4_JPEG_CODECS = ("jpeg", "mjpa")   # samples are plain JPEG images


def _mp4_luma_frames(b: bytes, every_ms: int):
    """First video track of an MP4 -> (frame_idx, ts_ms, luma-PGM bytes)
    per sampled frame, one per *every_ms* of media time.  MJPEG samples
    decode through :func:`decode_image_bytes`; luma is BT.601
    (0.299 R + 0.587 G + 0.114 B — the JPEG Y channel, recovered)."""
    parsed = _parse_mp4(b)
    video = next((t for t in parsed["tracks"] if t["kind"] == "video"),
                 None)
    if video is None:
        raise ValueError("MP4 has no video track")
    codec = video.get("codec", "?")
    is_av1 = codec == "av01"
    is_hevc = codec in ("hev1", "hvc1")
    if codec not in _MP4_JPEG_CODECS and not is_av1 and not is_hevc:
        raise ValueError(
            f"MP4 codec {codec!r} needs libavcodec; MJPEG "
            f"({'/'.join(_MP4_JPEG_CODECS)}) samples decode natively, "
            "av01 SYNC samples decode via the system libavif, and "
            "hev1/hvc1 tracks decode fully via the system libde265")
    sync = video.get("sync_samples")             # None => all sync
    ts_scale = video["timescale"] or 1
    if is_hevc:
        # libde265 is a FULL decoder: one streaming pass over the
        # whole track (references included, so INTER frames decode
        # too — unlike the per-image av01/VP8 sync-only contract);
        # the sampling cadence gates which display-order pictures
        # are kept, one picture in flight at a time
        from .hevccodec import decode_hevc_track, hevc_available
        if not hevc_available():
            raise ValueError(
                f"MP4 codec {codec!r} needs the system libde265; "
                "none is loadable here")
        hvcc = video.get("hvcc")
        if hvcc is None:
            raise ValueError(f"{codec} track has no hvcC record")

        def _hevc_samples():
            for i, (off, size, _t) in enumerate(video["samples"]):
                sample = b[off:off + size]
                if len(sample) < size:
                    raise ValueError(
                        f"MP4 sample {i} overruns file "
                        f"(offset {off}, size {size})")
                yield sample, i
        next_ms = 0.0
        for i, px in decode_hevc_track(_hevc_samples(), hvcc):
            ts_ms = 1000.0 * video["samples"][i][2] / ts_scale
            if ts_ms + 1e-9 < next_ms:
                continue
            next_ms = ts_ms + every_ms
            yield i, ts_ms, _luma_pgm(px)
        return
    next_ms = 0.0
    for idx, (off, size, t_units) in enumerate(video["samples"]):
        ts_ms = 1000.0 * t_units / ts_scale
        if ts_ms + 1e-9 < next_ms:
            continue
        if is_av1 and sync is not None and idx not in sync:
            # inter frame: needs reference-frame state no per-image
            # decode can supply — skip to the next sync sample (the
            # honest keyframe-sampling contract, like VP8)
            continue
        next_ms = ts_ms + every_ms
        sample = b[off:off + size]
        if len(sample) < size:
            raise ValueError(f"MP4 sample {idx} overruns file "
                             f"(offset {off}, size {size})")
        if is_av1:
            from .avifcodec import decode_av1_obus
            px = decode_av1_obus(sample, video.get("av1c", b"\x81\x00"
                                                   b"\x00\x00"),
                                 video.get("width", 0),
                                 video.get("height", 0))
            yield idx, ts_ms, _luma_pgm(px)
        else:
            yield idx, ts_ms, _luma_pgm(decode_image_bytes(sample))


def _luma_pgm(px: np.ndarray) -> bytes:
    """(h, w, c) pixels -> binary PGM of the BT.601 luma plane — the
    shared frame currency of the video pipelines (y4m Y plane, MJPEG
    Y recovered from RGB, GIF canvases)."""
    if px.shape[2] == 1:
        luma = px[:, :, 0]
    else:
        rgb = px[:, :, :3].astype(np.float64)
        luma = np.clip(np.round(
            0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2]), 0, 255).astype(np.uint8)
    return encode_pnm(luma.reshape(*luma.shape[:2], 1))


# raw-PCM sample-entry fourccs (ISO/QuickTime): little/big-endian 16-bit
# and 8-bit unsigned — the uncompressed audio MP4/MOV files actually carry
_MP4_PCM = {"sowt": ("<i2", 2), "twos": (">i2", 2), "raw ": ("u1", 1)}


def _mp4_pcm_samples(b: bytes) -> tuple[int, int, np.ndarray]:
    """First audio track of an MP4 -> (n_channels, sample_rate,
    interleaved float64 samples) for raw-PCM codecs, on the same scale
    as :func:`_wav_samples` (16-bit kept at integer scale, 8-bit
    centered at 0).  Compressed codecs (mp4a/AAC) raise pointedly."""
    parsed = _parse_mp4(b)
    aud = next((t for t in parsed["tracks"] if t["kind"] == "audio"),
               None)
    if aud is None:
        raise ValueError("MP4 has no audio track")
    codec = aud.get("codec", "?")
    if codec not in _MP4_PCM:
        raise ValueError(
            f"MP4 audio codec {codec!r} needs libavcodec; only raw PCM "
            f"({'/'.join(sorted(_MP4_PCM))}) decodes natively")
    dtype, bps = _MP4_PCM[codec]
    nch = aud.get("channels") or 1
    fsz = aud.get("fixed_size") or nch * bps
    parts = []
    for off, k in aud["chunks"]:
        seg = b[off:off + k * fsz]
        if len(seg) < k * fsz:
            raise ValueError("MP4 PCM chunk overruns file")
        parts.append(seg)
    raw = b"".join(parts)
    x = np.frombuffer(raw, dtype).astype(np.float64)
    if codec == "raw ":
        x = x - 128.0
    return nch, aud.get("sample_rate") or 0, x


def _audio_samples(payload: bytes) -> np.ndarray:
    """WAV or PCM-MP4 bytes -> interleaved float64 samples (the shared
    input of the gain-invariant energy fingerprint, so the same audio
    hashes identically across both containers)."""
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return _mp4_pcm_samples(payload)[2]
    return _wav_samples(payload)


MP4_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("brand", T.StringType(), True),
    T.StructField("duration_ms", T.DoubleType(), True),
    T.StructField("n_tracks", T.IntegerType(), True),
    T.StructField("video_codec", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("fps", T.DoubleType(), True),
    T.StructField("audio_codec", T.StringType(), True),
    T.StructField("audio_channels", T.IntegerType(), True),
    T.StructField("audio_rate", T.IntegerType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def mp4_metadata(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_id") -> DataFrame:
    """Container-level MP4 probe over Arrow batches: brand, duration,
    per-track codec/dims/rates — METADATA ONLY, no sample decoding, so
    it works (and stays cheap) for every codec including avc1/av01.
    At 100 TB this is the pruning pass that runs before any decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = _parse_mp4(bytes(p))
                    vid = next((t for t in m["tracks"]
                                if t["kind"] == "video"), {})
                    aud = next((t for t in m["tracks"]
                                if t["kind"] == "audio"), {})
                    nf = len(vid.get("samples", ())) or None
                    fps = None
                    if nf and vid.get("duration_ms"):
                        fps = round(1000.0 * nf / vid["duration_ms"], 6)
                    rows.append((
                        mid, m["brand"], m["duration_ms"],
                        len(m["tracks"]), vid.get("codec"),
                        vid.get("width"), vid.get("height"), nf, fps,
                        aud.get("codec"), aud.get("channels"),
                        aud.get("sample_rate"), None))
                except Exception as e:  # noqa: BLE001 — error column
                    rows.append((mid, None, None, None, None, None, None,
                                 None, None, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              MP4_META_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=MP4_META_SCHEMA)


# ---------------------------------------------------------------------------
# Unified header-only media probe: the pruning pass that runs BEFORE any
# decode at 100 TB.  Reads only headers (plus, for GIF/Y4M, a block/
# frame-marker walk that skips pixel data), so it is cheap for every
# format — including ones whose pixel decode needs a codec library
# (avc1/av01 report their dimensions here even though decode raises).
# ---------------------------------------------------------------------------

def _probe_jpeg(b: bytes) -> dict:
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        m = b[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        ln, = struct.unpack_from(">H", b, pos + 2)
        if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            h, w = struct.unpack_from(">HH", b, pos + 5)
            return {"format": "jpeg", "width": w, "height": h}
        pos += 2 + ln
    raise ValueError("JPEG without a SOF header")


def _probe_gif(b: bytes) -> dict:
    w, h, _gct, pos = _gif_screen(b)
    frames, total_cs = 0, 0
    while pos < len(b):
        blk = b[pos]
        if blk == 0x21:
            if b[pos + 1] == 0xF9 and b[pos + 2] >= 4:
                total_cs += struct.unpack_from("<H", b, pos + 4)[0] or 10
            pos += 2
            while b[pos] != 0:
                pos += b[pos] + 1
            pos += 1
        elif blk == 0x2C:
            p2 = b[pos + 9]
            pos += 10
            if p2 >> 7:
                pos += (2 << (p2 & 7)) * 3
            pos += 1                    # min code size
            while b[pos] != 0:          # skip LZW sub-blocks unread
                pos += b[pos] + 1
            pos += 1
            frames += 1
        elif blk == 0x3B:
            break
        else:
            raise ValueError(f"GIF: unexpected block 0x{blk:02X}")
    out = {"format": "gif", "width": w, "height": h, "n_frames": frames}
    if frames > 1:
        out["kind"] = "video"
        out["duration_ms"] = total_cs * 10.0
    return out


def _probe_webp(b: bytes) -> dict:
    out = {"format": "webp"}
    pos = 12
    frames, total_ms = 0, 0
    while pos + 8 <= len(b):
        fourcc = b[pos:pos + 4]
        size, = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if fourcc == b"ANMF" and size >= 16:
            frames += 1
            total_ms += int.from_bytes(b[body + 12:body + 15], "little")
        elif fourcc == b"VP8X" and size >= 10:
            out["width"] = 1 + int.from_bytes(b[body + 4:body + 7],
                                              "little")
            out["height"] = 1 + int.from_bytes(b[body + 7:body + 10],
                                               "little")
        elif fourcc == b"VP8L" and b[body] == 0x2F:
            v, = struct.unpack_from("<I", b, body + 1)
            out.setdefault("width", (v & 0x3FFF) + 1)
            out.setdefault("height", ((v >> 14) & 0x3FFF) + 1)
            out["codec"] = "vp8l"
        elif fourcc == b"VP8 " and size >= 10 \
                and b[body + 3:body + 6] == b"\x9d\x01\x2a":
            w, h = struct.unpack_from("<HH", b, body + 6)
            out.setdefault("width", w & 0x3FFF)
            out.setdefault("height", h & 0x3FFF)
            out["codec"] = "vp8"        # keyframes decode (vp8.py)
        pos = body + size + (size & 1)
    if "width" not in out:
        raise ValueError("WEBP container without VP8/VP8L/VP8X dims")
    if frames > 1:                      # animated WebP (ANMF chunks)
        out.update({"kind": "video", "n_frames": frames,
                    "duration_ms": float(total_ms)})
    return out


def _probe_pnm(b: bytes) -> dict:
    pos, vals = 2, []
    while len(vals) < 3 and pos < len(b):
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":
            pos = b.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(b) and not b[end:end + 1].isspace():
            end += 1
        vals.append(int(b[pos:end]))
        pos = end
    return {"format": "pnm", "width": vals[0], "height": vals[1]}


def probe_media_bytes(b: bytes) -> dict:
    """Payload bytes -> typed metadata dict (kind/format/dims/frames/
    duration/codec/audio fields) WITHOUT decoding pixel or sample data."""
    out: dict = {"kind": "image", "n_frames": 1}
    if b[:2] == b"BM":
        w, h = struct.unpack_from("<ii", b, 18)
        out.update({"format": "bmp", "width": w, "height": abs(h)})
    elif b[:8] == _PNG_SIG:
        w, h = struct.unpack_from(">II", b, 16)
        out.update({"format": "png", "width": w, "height": h})
        pos, frames, total = 8, 0, 0.0
        while pos + 8 <= len(b):        # chunk-header walk, data skipped
            ln, typ = struct.unpack_from(">I4s", b, pos)
            if typ == b"fcTL":
                dnum, dden = struct.unpack_from(">HH", b, pos + 8 + 20)
                total += 1000.0 * dnum / (dden or 100) if dnum else 100.0
                frames += 1
            elif typ == b"IEND":
                break
            pos += 12 + ln
        if frames > 1:
            out.update({"kind": "video", "format": "apng",
                        "n_frames": frames, "duration_ms": total})
    elif b[:2] == b"\xff\xd8":
        out.update(_probe_jpeg(b))
    elif b[:6] in (b"GIF87a", b"GIF89a"):
        out.update(_probe_gif(b))
    elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        out.update(_probe_webp(b))
    elif b[:1] == b"P" and b[1:2] in b"23456":
        out.update(_probe_pnm(b))
    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        with wave.open(io.BytesIO(b)) as wv:
            out.update({
                "kind": "audio", "format": "wav",
                "n_channels": wv.getnchannels(),
                "sample_rate": wv.getframerate(),
                "n_frames": wv.getnframes(),
                "duration_ms": 1000.0 * wv.getnframes()
                / wv.getframerate()})
    elif b[:9] == b"YUV4MPEG2":
        w, h, fps, fbytes, pos = _parse_y4m(b)
        frames = 0
        while pos < len(b):
            nl = b.index(b"\n", pos)
            if not b[pos:nl].startswith(b"FRAME"):
                raise ValueError("malformed y4m FRAME marker")
            frames += 1
            pos = nl + 1 + fbytes
        out.update({"kind": "video", "format": "y4m", "width": w,
                    "height": h, "n_frames": frames,
                    "duration_ms": 1000.0 * frames / fps})
    elif len(b) >= 12 and b[4:8] == b"ftyp" \
            and b[8:12] in (b"avif", b"avis", b"mif1"):
        # AVIF (ISO-BMFF meta/iloc layout, not moov tracks): dims from
        # the ispe (image spatial extents) property box — header-only
        idx = b.find(b"ispe")
        if idx < 0 or idx + 16 > len(b):
            raise ValueError("AVIF without an ispe property box")
        w, h = struct.unpack_from(">II", b, idx + 8)
        out.update({"format": "avif", "width": int(w), "height": int(h),
                    "codec": "av01"})
        if b[8:12] == b"avis":
            out["kind"] = "video"
    elif len(b) >= 12 and b[4:8] == b"ftyp":
        m = _parse_mp4(b)
        vid = next((t for t in m["tracks"] if t["kind"] == "video"),
                   None)
        aud = next((t for t in m["tracks"] if t["kind"] == "audio"),
                   None)
        out.update({"kind": "video" if vid else "audio",
                    "format": "mp4", "duration_ms": m["duration_ms"]})
        if vid:
            out.update({"width": vid.get("width"),
                        "height": vid.get("height"),
                        "n_frames": len(vid.get("samples", ())),
                        "codec": vid.get("codec")})
        if aud:
            out.setdefault("codec", aud.get("codec"))
            out.update({"n_channels": aud.get("channels"),
                        "sample_rate": aud.get("sample_rate")})
    else:
        raise ValueError(f"unrecognized media magic {b[:8]!r}")
    return out


MEDIA_PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),
    T.StructField("format", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("duration_ms", T.DoubleType(), True),
    T.StructField("codec", T.StringType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def probe_media(df: DataFrame, payload_col: str = "payload",
                id_col: str = "media_id") -> DataFrame:
    """Header-only probe across EVERY supported payload format in one
    pass — kind/format/dims/frames/duration/codec without touching
    pixel or sample data.  This is the partition-prunable metadata a
    100 TB multimodal pipeline filters on before paying for decode
    (e.g. keep only videos longer than 2 s, or images >= 256 px)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MEDIA_PROBE_SCHEMA.fields]
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = probe_media_bytes(bytes(p))
                    rows.append((mid, m.get("kind"), m.get("format"),
                                 m.get("width"), m.get("height"),
                                 m.get("n_frames"), m.get("duration_ms"),
                                 m.get("codec"), m.get("n_channels"),
                                 m.get("sample_rate"), None))
                except Exception as e:  # noqa: BLE001 — error column
                    rows.append((mid,) + (None,) * 9 + (str(e),))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=MEDIA_PROBE_SCHEMA)


IMAGE_DECODE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("channel_means", T.ArrayType(T.DoubleType(), False), True),
    T.StructField("decode_error", T.StringType(), True),
])


def decode_images(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """Real image decode over Arrow batches: (id, width, height, channels,
    per-channel means, decode_error).  Undecodable payloads produce a row
    with ``decode_error`` set and null dims — the pipeline never dies on a
    corrupt blob (at 100 TB there WILL be corrupt blobs)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px = decode_image_bytes(bytes(p))
                    h, w, c = px.shape
                    means = px.reshape(-1, c).mean(axis=0)
                    rows.append((mid, w, h, c,
                                 [float(m) for m in means], None))
                except Exception as e:  # noqa: BLE001 — error column by design
                    rows.append((mid, None, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "channels", "channel_means",
                "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=IMAGE_DECODE_SCHEMA)


PIXEL_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("px_sum", T.LongType(), True),
    T.StructField("px_min", T.IntegerType(), True),
    T.StructField("px_max", T.IntegerType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def image_pixel_stats(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "media_id") -> DataFrame:
    """EXACT integer pixel statistics over Arrow batches: (id, dims,
    sum/min/max across every channel value).  The integer sum makes
    decoded content value-comparable against an independent oracle
    with no float tolerance — the contract-driver companion to
    :func:`decode_images`' float channel means."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px = decode_image_bytes(bytes(p))
                    h, w, c = px.shape
                    rows.append((mid, w, h, c,
                                 int(px.sum(dtype=np.int64)),
                                 int(px.min()), int(px.max()), None))
                except Exception as e:  # noqa: BLE001 — error column by design
                    rows.append((mid, None, None, None, None, None,
                                 None, str(e)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "channels", "px_sum",
                "px_min", "px_max", "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=PIXEL_STATS_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("duration_ms", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def _audio_features_bytes(b: bytes) -> tuple[int, int, int, float]:
    """WAV or PCM-MP4 bytes -> (n_channels, sample_rate, n_frames, rms)."""
    if len(b) >= 12 and b[4:8] == b"ftyp":
        nch, rate, x = _mp4_pcm_samples(b)
        nf = x.size // max(nch, 1)
        rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
        return nch, rate, nf, rms
    return decode_wav_bytes(b)


def audio_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """WAV (stdlib ``wave``) and PCM-MP4 decode + features over Arrow
    batches; compressed MP4 audio (mp4a/AAC) surfaces a pointed
    ``decode_error`` row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    nch, rate, nf, rms = _audio_features_bytes(bytes(p))
                    rows.append((mid, nch, rate, nf, 1000.0 * nf / rate, rms,
                                 None))
                except Exception as e:  # noqa: BLE001
                    rows.append((mid, None, None, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_channels", "sample_rate", "n_frames",
                "duration_ms", "rms", "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """Nearest-neighbor resize of BMP/PNM payloads, re-encoded as binary
    PPM/PGM.  Pure numpy index-gather per Arrow batch — no codec libs;
    swap :func:`decode_image_bytes` + :func:`encode_pnm` for PIL calls to
    cover compressed formats, the batch shape is identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px = decode_image_bytes(bytes(p))
                    h0, w0, _ = px.shape
                    yi = (np.arange(height) * h0 // height)
                    xi = (np.arange(width) * w0 // width)
                    out = px[yi][:, xi]
                    rows.append((mid, encode_pnm(out), width, height, None))
                except Exception as e:  # noqa: BLE001
                    rows.append((mid, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "payload", "width", "height", "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), True),
    T.StructField("ts_ms", T.DoubleType(), True),
    T.StructField("frame_payload", T.BinaryType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def sample_video_frames(df: DataFrame, every_ms: int,
                        payload_col: str = "payload",
                        id_col: str = "media_id") -> DataFrame:
    """Sample one frame per *every_ms* from YUV4MPEG2 (.y4m) payloads,
    MP4 (ISO-BMFF) containers carrying MJPEG video tracks, animated
    GIFs (composited canvases on the GCE delay timeline, disposal
    methods 1/2/3 honored), APNG, and animated WebP (ANMF blend +
    dispose-to-background semantics; VP8L and VP8-keyframe frame
    payloads).

    Emits one row per sampled frame; ``frame_payload`` is the luma plane
    re-encoded as binary PGM, so the sampled frames feed directly into
    :func:`decode_images` / :func:`resize_images`.  y4m extraction is
    pure offset arithmetic; MP4 walks the real sample tables
    (stts/stsz/stsc/stco) and decodes MJPEG samples with the in-repo
    JPEG decoder, av01 SYNC samples via the system libavif, and
    hev1/hvc1 tracks FULLY (inter frames included) via the system
    libde265 (:mod:`.hevccodec`); remaining inter-frame codecs
    (avc1/vp09) surface a pointed ``decode_error`` row — only the
    per-payload decoder changes when a codec library is swapped in."""
    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive, got {every_ms}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    b = bytes(p)
                    if len(b) >= 12 and b[4:8] == b"ftyp":
                        for fi, ts, pgm in _mp4_luma_frames(b, every_ms):
                            rows.append((mid, fi, ts, pgm, None))
                        continue
                    anim = None
                    if b[:6] in (b"GIF87a", b"GIF89a"):
                        anim = _gif_frames(b)
                    elif b[:8] == _PNG_SIG and b.find(b"acTL", 8) != -1:
                        anim = _apng_frames(b)
                    elif (b[:4] == b"RIFF" and b[8:12] == b"WEBP"
                          and b.find(b"ANMF", 12) != -1):
                        anim = _webp_frames(b)
                    if anim is not None:
                        ts = next_ms = 0.0
                        for fi, (canvas, delay) in enumerate(anim):
                            if ts + 1e-9 >= next_ms:
                                rows.append((mid, fi, ts,
                                             _luma_pgm(canvas), None))
                                next_ms = ts + every_ms
                            ts += delay
                        continue
                    w, h, fps, fbytes, pos = _parse_y4m(b)
                    step = max(1, round(every_ms * fps / 1000.0))
                    idx = 0
                    while pos < len(b):
                        nl = b.index(b"\n", pos)     # FRAME[ params]\n
                        if not b[pos:nl].startswith(b"FRAME"):
                            raise ValueError("malformed y4m FRAME marker")
                        data = b[nl + 1: nl + 1 + fbytes]
                        if len(data) < fbytes:
                            raise ValueError("truncated y4m frame")
                        if idx % step == 0:
                            luma = np.frombuffer(data, np.uint8, w * h
                                                 ).reshape(h, w, 1)
                            rows.append((mid, idx, idx * 1000.0 / fps,
                                         encode_pnm(luma), None))
                        idx += 1
                        pos = nl + 1 + fbytes
                except Exception as e:  # noqa: BLE001
                    rows.append((mid, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "ts_ms", "frame_payload",
                "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=FRAME_SCHEMA)


AHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("ahash", T.LongType(), True),
    T.StructField("decode_error", T.StringType(), True),
])

IHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("ihash", T.LongType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def image_ahash_bytes(payload: bytes, grid: int = 8) -> int:
    """Average-hash of decoded pixels: grayscale, nearest-resize to
    ``grid``x``grid``, threshold at the mean → a 64-bit signed int
    (row-major bit order).  Deterministic, codec-free, and robust to
    re-encoding / resizing — the standard cheap perceptual fingerprint."""
    small = _gray_grid(payload, grid, grid)
    return _bits_to_long(small > small.mean())


def _gray_grid(payload: bytes, gh: int, gw: int) -> np.ndarray:
    """Decoded payload -> grayscale nearest-sampled to (gh, gw)."""
    px = decode_image_bytes(payload).astype(np.float64)
    gray = px.mean(axis=2) if px.ndim == 3 else px
    h0, w0 = gray.shape
    yi = (np.arange(gh) * h0 // gh)
    xi = (np.arange(gw) * w0 // gw)
    return gray[yi][:, xi]


def _bits_to_long(bits: np.ndarray) -> int:
    val = 0
    for i, b in enumerate(bits.flatten()):
        if b:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def image_dhash_bytes(payload: bytes, grid: int = 8) -> int:
    """Difference-hash: grayscale (grid x grid+1), bit = left pixel
    brighter than its right neighbor.  Captures gradients rather than
    absolute levels, so it survives global brightness/contrast shifts
    that flip ahash bits near the mean."""
    small = _gray_grid(payload, grid, grid + 1)
    return _bits_to_long(small[:, :-1] > small[:, 1:])


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    a = np.sqrt(2.0 / n) * np.cos((2 * m + 1) * k * np.pi / (2 * n))
    a[0] = np.sqrt(1.0 / n)
    return a


_PHASH_DCT = _dct_matrix(32)


def image_phash_bytes(payload: bytes, grid: int = 32,
                      keep: int = 8) -> int:
    """DCT perceptual hash: grayscale (grid x grid), orthonormal 2D
    DCT-II, keep the top-left ``keep x keep`` low-frequency block, bit =
    coefficient above the block's median (the imagehash convention,
    DC included in both block and median).  The most re-encoding- and
    resize-robust of the three hashes; still pure numpy."""
    small = _gray_grid(payload, grid, grid)
    a = _PHASH_DCT if grid == 32 else _dct_matrix(grid)
    coef = a @ small @ a.T
    low = coef[:keep, :keep]
    return _bits_to_long(low > np.median(low))


_IMAGE_HASHERS = {
    "ahash": image_ahash_bytes,
    "dhash": image_dhash_bytes,
    "phash": image_phash_bytes,
}


def image_hash(df: DataFrame, payload_col: str = "payload",
               id_col: str = "media_id",
               method: str = "ahash") -> DataFrame:
    """Per-image perceptual hash (``ahash`` / ``dhash`` / ``phash``)
    over Arrow batches — same shape as :func:`image_ahash` but with the
    hash family selectable; output column is ``ihash``."""
    try:
        hasher = _IMAGE_HASHERS[method]
    except KeyError:
        raise ValueError(
            f"method must be one of {sorted(_IMAGE_HASHERS)} [{method}]")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rows.append((mid, hasher(bytes(p)), None))
                except Exception as e:  # noqa: BLE001
                    rows.append((mid, None, str(e)))
            yield pd.DataFrame(
                rows, columns=["media_id", "ihash", "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=IHASH_SCHEMA)


def image_ahash(df: DataFrame, payload_col: str = "payload",
                id_col: str = "media_id", grid: int = 8) -> DataFrame:
    """Per-image perceptual average-hash over Arrow batches
    (``mapInPandas`` — the only Python hop; everything downstream is
    Column algebra).  Corrupt payloads surface in ``decode_error``
    instead of failing the job, matching the decode family."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rows.append((mid, image_ahash_bytes(bytes(p), grid),
                                 None))
                except Exception as e:  # noqa: BLE001
                    rows.append((mid, None, str(e)))
            yield pd.DataFrame(rows,
                               columns=["media_id", "ahash", "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=AHASH_SCHEMA)


def image_near_dup_pairs(df: DataFrame, payload_col: str = "payload",
                         id_col: str = "media_id", max_hamming: int = 3,
                         max_bucket: int = 200,
                         method: str = "ahash") -> DataFrame:
    """Perceptual image dedup: ahash/dhash/phash signatures through the
    same pigeonhole 16-bit-chunk hamming join the text SimHash family
    uses (``dedup.hamming_pairs``) — re-encoded/renamed copies of an
    image collide, the join stays equi-key, and undecodable payloads
    simply propose no pairs.  Returns ``(id_a, id_b, hamming)``."""
    from .dedup import hamming_pairs
    if method == "ahash":
        sigs = image_ahash(df, payload_col, id_col)
        sig_col = "ahash"
    else:
        sigs = image_hash(df, payload_col, id_col, method=method)
        sig_col = "ihash"
    sigs = sigs.where(F.col("decode_error").isNull())
    return hamming_pairs(sigs, id_col="media_id", sig_col=sig_col,
                         max_hamming=max_hamming, max_bucket=max_bucket)


AUDIO_HASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("audio_hash", T.LongType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def _wav_samples(payload: bytes) -> np.ndarray:
    """WAV/PCM bytes -> float64 sample vector (channels interleaved)."""
    with wave.open(io.BytesIO(payload)) as wv:
        sw, nf = wv.getsampwidth(), wv.getnframes()
        raw = wv.readframes(nf)
    return _pcm_to_float(raw, sw)


def audio_energy_hash_bytes(payload: bytes, windows: int = 64) -> int:
    """Energy-profile fingerprint: split the track into ``windows`` equal
    windows, bit i = window energy above the median window energy —
    amplitude-scaling invariant (gain changes multiply every window
    equally) and robust to re-encoding; the audio counterpart of
    :func:`image_ahash_bytes`.  Accepts WAV and raw-PCM MP4 payloads
    (via :func:`_audio_samples`), so the same audio fingerprints
    identically across both containers."""
    arr = _audio_samples(payload)
    if arr.size == 0:
        return 0
    n = (arr.size // windows) * windows
    if n == 0:  # shorter than one sample per window: pad with zeros
        pad = np.zeros(windows, np.float64)
        pad[:arr.size] = arr
        arr, n = pad, windows
    e = (arr[:n].reshape(windows, -1) ** 2).sum(axis=1)
    bits = e > np.median(e)
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def audio_fingerprint(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "media_id",
                      windows: int = 64) -> DataFrame:
    """Per-track energy-profile hash over Arrow batches; corrupt
    payloads surface in ``decode_error``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rows.append((mid,
                                 audio_energy_hash_bytes(bytes(p), windows),
                                 None))
                except Exception as e:  # noqa: BLE001
                    rows.append((mid, None, str(e)))
            yield pd.DataFrame(
                rows, columns=["media_id", "audio_hash", "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=AUDIO_HASH_SCHEMA)


def audio_near_dup_pairs(df: DataFrame, payload_col: str = "payload",
                         id_col: str = "media_id", max_hamming: int = 3,
                         max_bucket: int = 200) -> DataFrame:
    """Audio dedup through the shared pigeonhole hamming join
    (``dedup.hamming_pairs``): gain-adjusted or re-encoded copies of a
    track collide; the join never plans a cross product."""
    from .dedup import hamming_pairs
    sigs = (audio_fingerprint(df, payload_col, id_col)
            .where(F.col("decode_error").isNull()))
    return hamming_pairs(sigs, id_col="media_id", sig_col="audio_hash",
                         max_hamming=max_hamming, max_bucket=max_bucket)


FRAME_HASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), True),
    T.StructField("ahash", T.LongType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def video_frame_hashes(df: DataFrame, every_ms: int = 1000,
                       payload_col: str = "payload",
                       id_col: str = "media_id",
                       method: str = "ahash") -> DataFrame:
    """Sampled-frame perceptual hashes: ``sample_video_frames`` → one
    perceptual hash per sampled luma frame — the unit of video identity
    (``(media_id, frame_idx, ahash)``; the ``ahash`` column carries
    whichever *method* (ahash/dhash/phash) was selected)."""
    try:
        hasher = _IMAGE_HASHERS[method]
    except KeyError:
        raise ValueError(
            f"method must be one of {sorted(_IMAGE_HASHERS)} [{method}]")
    frames = sample_video_frames(df, every_ms, payload_col, id_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, fi, fp, err in zip(pdf["media_id"], pdf["frame_idx"],
                                        pdf["frame_payload"],
                                        pdf["decode_error"]):
                if err is not None or fp is None:
                    rows.append((mid, None, None, err))
                    continue
                try:
                    rows.append((mid, int(fi),
                                 hasher(bytes(fp)), None))
                except Exception as e:  # noqa: BLE001
                    rows.append((mid, int(fi), None, str(e)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "ahash", "decode_error"])

    return frames.mapInPandas(batches, schema=FRAME_HASH_SCHEMA)


def video_near_dup_pairs(df: DataFrame, every_ms: int = 1000,
                         min_shared: float = 0.5, max_hamming: int = 3,
                         payload_col: str = "payload",
                         id_col: str = "media_id",
                         max_bucket: int = 200,
                         method: str = "ahash") -> DataFrame:
    """Video dedup by frame-hash containment: two videos are near-dups
    when at least ``min_shared`` of the shorter one's sampled frames
    have a hamming-close (≤ ``max_hamming``) counterpart in the other —
    catches re-encodes, trims, and watermark-level edits that exact
    payload hashing misses.

    Pipeline is a composition of existing machinery: frame sampling →
    per-frame average-hash → the pigeonhole hamming join over frames
    (frame identity = ``media_id * 2**20 + frame_idx``; sampled frame
    counts must stay below 2**20) → per-video-pair containment
    aggregate.  Returns ``(id_a, id_b, shared_frames, shared_frac)``.
    """
    from .dedup import hamming_pairs
    fh = (video_frame_hashes(df, every_ms, payload_col, id_col, method)
          .where(F.col("ahash").isNotNull())
          .withColumn("__fid", F.col("media_id") * F.lit(1 << 20)
                      + F.col("frame_idx")))
    counts = fh.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("__n_frames"))
    fpairs = hamming_pairs(fh, id_col="__fid", sig_col="ahash",
                           max_hamming=max_hamming, max_bucket=max_bucket)
    vid = lambda c: F.shiftright(F.col(c), 20)  # exact, no float hop  # noqa: E731
    cross = (fpairs
             .select(vid("id_a").alias("va"), F.col("id_a").alias("fa"),
                     vid("id_b").alias("vb"), F.col("id_b").alias("fb"))
             .where(F.col("va") != F.col("vb")))
    # orient every pair (smaller video id first) and count distinct
    # matched frames of the SHORTER side
    oriented = cross.select(
        F.least("va", "vb").alias("id_a"),
        F.greatest("va", "vb").alias("id_b"),
        F.when(F.col("va") < F.col("vb"), F.col("fa")).otherwise(F.col("fb"))
        .alias("fa"),
        F.when(F.col("va") < F.col("vb"), F.col("fb")).otherwise(F.col("fa"))
        .alias("fb"))
    agg = (oriented.groupBy("id_a", "id_b")
           .agg(F.countDistinct("fa").alias("__ma"),
                F.countDistinct("fb").alias("__mb")))
    na = counts.select(F.col("media_id").alias("id_a"),
                       F.col("__n_frames").alias("__na"))
    nb = counts.select(F.col("media_id").alias("id_b"),
                       F.col("__n_frames").alias("__nb"))
    return (agg.join(na, "id_a").join(nb, "id_b")
            .withColumn("shared_frames",
                        F.greatest("__ma", "__mb"))
            .withColumn("shared_frac",
                        F.greatest(F.col("__ma") / F.col("__na"),
                                   F.col("__mb") / F.col("__nb")))
            .where(F.col("shared_frac") >= min_shared)
            .select("id_a", "id_b", "shared_frames",
                    F.round("shared_frac", 6).alias("shared_frac")))
