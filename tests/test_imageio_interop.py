"""Image decoders vs the JVM's javax.imageio — a second reference codec.

Spark ships a full JVM, and ``javax.imageio`` contains independent
JPEG/PNG/BMP/GIF encoders AND decoders (the JPEG pair wraps libjpeg).
That gives the suite real third-party bitstreams with zero ctypes/ABI
risk — the py4j gateway of the session's own SparkSession is the
transport.

Expectations:

* PNG, BMP, GIF: lossless formats — our decode of Java-encoded bytes
  must EQUAL Java's own decode (and the original pixels) exactly.
* JPEG grayscale: no chroma, so any two conformant decoders agree to
  IDCT rounding — |diff| <= 1 required.
* JPEG color: the encoder subsamples chroma 4:2:0 and the upsampling
  filter is a decoder CHOICE (libjpeg uses a triangle filter; this
  repo uses the same); |diff| <= 2 required against Java's output.

Gray-image gotcha encoded here so it isn't rediscovered: Java's
``TYPE_BYTE_GRAY`` get/setRGB apply linear<->sRGB conversion; all
pixel I/O goes through Raster samples instead.
"""

import numpy as np
import pytest

from legend_community_delta_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def jio(spark):
    jvm = spark._jvm
    return jvm, jvm.javax.imageio.ImageIO, jvm.java.awt.image.BufferedImage


def _encode(jio, arr, fmt):
    jvm, ImageIO, BI = jio
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        img = BI(w, h, BI.TYPE_BYTE_GRAY)
        ras = img.getRaster()
        for y in range(h):
            for x in range(w):
                ras.setSample(x, y, 0, int(arr[y, x]))
    else:
        img = BI(w, h, BI.TYPE_INT_RGB)
        for y in range(h):
            for x in range(w):
                r, g, b = (int(arr[y, x, 0]), int(arr[y, x, 1]),
                           int(arr[y, x, 2]))
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert ImageIO.write(img, fmt, baos)
    return bytes(baos.toByteArray())


def _jdecode(jio, data, gray=False):
    jvm, ImageIO, _ = jio
    dec = ImageIO.read(jvm.java.io.ByteArrayInputStream(data))
    h, w = dec.getHeight(), dec.getWidth()
    if gray:
        ras = dec.getRaster()
        out = np.zeros((h, w), np.uint8)
        for y in range(h):
            for x in range(w):
                out[y, x] = ras.getSample(x, y, 0)
        return out
    out = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            v = dec.getRGB(x, y)
            out[y, x] = [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF]
    return out


def _rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 9) % 256, (yy * 13) % 256,
                     (xx + yy) % 256], -1).astype(np.uint8)


@pytest.mark.parametrize("fmt", ["png", "bmp", "gif"])
def test_lossless_formats_match_java_exactly(spark, jio, fmt):
    img = _rgb(13, 19)
    if fmt == "gif":                     # GIF needs <= 256 colors
        img = (img & 0xE0) | 0x10
    data = _encode(jio, img, fmt)
    ours = MM.decode_image_bytes(data)
    if ours.shape[-1] == 4:
        ours = ours[..., :3]
    ref = _jdecode(jio, data)
    assert np.array_equal(ref, img), "Java round-trip must be lossless"
    assert np.array_equal(ours, ref)


def test_gray_jpeg_within_idct_rounding_of_java(spark, jio):
    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((xx * 7 + yy * 11) % 256).astype(np.uint8)
    data = _encode(jio, g, "jpg")
    ours = MM.decode_image_bytes(data)
    o = ours[..., 0] if ours.ndim == 3 else ours
    ref = _jdecode(jio, data, gray=True)
    assert np.abs(o.astype(int) - ref.astype(int)).max() <= 1


def test_color_jpeg_close_to_java(spark, jio):
    img = _rgb(24, 32)
    data = _encode(jio, img, "jpg")
    ours = MM.decode_image_bytes(data)
    ref = _jdecode(jio, data)
    d = np.abs(ours.astype(int) - ref.astype(int))
    assert d.max() <= 2, (
        f"color JPEG maxdiff {d.max()} vs Java/libjpeg — beyond "
        "chroma-upsample + IDCT rounding tolerance")


def test_progressive_jpeg_from_real_encoder(spark, jio):
    """Java's writer in MODE_DEFAULT emits a REAL multi-scan
    progressive stream (SOF2 + spectral selection + successive
    approximation) — previously our progressive path was pinned by
    in-repo fixtures only."""
    jvm, ImageIO, BI = jio
    img = _rgb(24, 32)
    bi = BI(32, 24, BI.TYPE_INT_RGB)
    for y in range(24):
        for x in range(32):
            bi.setRGB(x, y, (int(img[y, x, 0]) << 16)
                      | (int(img[y, x, 1]) << 8) | int(img[y, x, 2]))
    writer = ImageIO.getImageWritersByFormatName("jpg").next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(
        jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    mos = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    writer.setOutput(mos)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None),
                 param)
    mos.flush()
    data = bytes(baos.toByteArray())
    assert b"\xff\xc2" in data          # SOF2: actually progressive
    ours = MM.decode_image_bytes(data)
    ref = _jdecode(jio, data)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_16bit_gray_png_from_real_encoder(spark, jio):
    """Java's PNG writer emits true 16-bit grayscale; our decoder
    projects to 8-bit (documented) — the HIGH byte must be exact."""
    jvm, ImageIO, BI = jio
    h, w = 9, 13
    vals = ((np.arange(h * w).reshape(h, w) * 523) % 65536) \
        .astype(np.uint16)
    bi = BI(w, h, BI.TYPE_USHORT_GRAY)
    ras = bi.getRaster()
    for y in range(h):
        for x in range(w):
            ras.setSample(x, y, 0, int(vals[y, x]))
    baos = jvm.java.io.ByteArrayOutputStream()
    assert ImageIO.write(bi, "png", baos)
    out = MM.decode_image_bytes(bytes(baos.toByteArray()))
    assert out.shape == (h, w, 1)
    assert np.array_equal(out[..., 0], (vals >> 8).astype(np.uint8))


def test_indexed_png_from_real_encoder(spark, jio):
    """Palette (TYPE_BYTE_INDEXED) PNG round-trips exactly."""
    jvm, ImageIO, BI = jio
    h, w = 9, 13
    bi = BI(w, h, BI.TYPE_BYTE_INDEXED)
    for y in range(h):
        for x in range(w):
            v = (y * 13 + x * 7) % 256
            bi.setRGB(x, y, (v << 16) | ((255 - v) << 8) | 128)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert ImageIO.write(bi, "png", baos)
    data = bytes(baos.toByteArray())
    out = MM.decode_image_bytes(data)
    ref = _jdecode(jio, data)
    assert np.array_equal(out[..., :3], ref)
