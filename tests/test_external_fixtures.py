"""Externally-generated wire-format fixtures (ADVICE r4 medium).

Every decoder here previously validated only against this repo's own
encoders — a mirrored encoder/decoder bug would pass every round-trip yet
corrupt real crawl files.  These fixtures were produced by independent
tools (CPython test-suite assets: ImageMagick-era GIFs, libpng PNGs,
PCM WAVs; Rust/Node documentation assets: libjpeg baseline + progressive
JPEGs) and are checked into tests/external_fixtures/:

* GIF: 89a palette (python.gif), 87a (PyBanner048.gif), and a 783-frame
  640x421 animation with full 12-bit LZW tables — a single bit-width or
  dictionary off-by-one desynchronizes the stream within a few codes, so
  a complete exact-length decode of 543 KB of real LZW is strong
  spec-conformance evidence (it adjudicated the encoder width rule).
* PNG: palette (color type 3), RGB (2), RGBA (6), gray+alpha (4).
* JPEG: libjpeg baseline and PROGRESSIVE (SOF2) color files.
* WAV: 8-bit and 16-bit PCM from CPython's audiodata.
* WebP: libwebp VP8X whose ALPH chunk is a real VP8L lossless stream.
* TIFF: uncompressed RGBA (python.tiff — decodes pixel-identical to the
  palette PNG of the same logo: cross-format agreement).
* AU (G.711 mu-law) and AIFF/AIFC PCM from CPython test data.

Pixel md5s below are regression pins recorded from this decoder AFTER the
structural validation above (dims exact, streams fully consumed, no
desync across half a megabyte of foreign LZW); arithmetic JPEG, Adam7
PNG, qpdf-produced LZW/encrypted PDFs, and VP8L's transform layer
(the ALPH pin exercises the entropy layer — prefix codes, LZ77,
distance map — but no external file here carries VP8L predictor/color
transforms) have no external producer in this container and remain
covered by round-trip + FIPS-197/T.81 pins.
"""

import hashlib
import os

import numpy as np
import pytest

from qwen_ocr_spark.functions import codecs

FIX = os.path.join(os.path.dirname(__file__), "external_fixtures")


def _md5(arr: np.ndarray) -> str:
    return hashlib.md5(np.ascontiguousarray(arr).tobytes()).hexdigest()[:12]


def _read(name: str) -> bytes:
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name,shape,pix", [
    ("png_palette_python.png", (16, 16, 4), "d5ebfcd830af"),
    ("png_rgb_trpl21.png", (320, 372, 3), "31decfb872a9"),
    ("png_rgba_idle32.png", (32, 32, 4), "68d3e6b443ba"),
])
def test_external_png_decodes_exactly(name, shape, pix):
    img = codecs.decode_png(_read(name))
    assert img.shape == shape
    assert _md5(img) == pix


def test_external_png_gray_alpha():
    img = codecs.decode_png(_read("png_grayalpha_favicon.png"))
    assert img.shape[:2] == (32, 32) and img.shape[2] in (2, 4)


@pytest.mark.parametrize("name,shape", [
    ("jpeg_baseline_python.jpg", (16, 16, 3)),
    ("jpeg_progressive_stripe.jpg", None),
])
def test_external_jpeg_decodes(name, shape):
    img = codecs.decode_jpeg(_read(name))
    if shape is not None:
        assert img.shape == shape
    assert img.ndim == 3 and img.dtype == np.uint8
    # plausible image content, not garbage: non-constant, full range used
    assert img.std() > 1.0


def test_external_gif_89a_and_87a():
    img = codecs.decode_gif(_read("gif89a_python.gif"))
    assert img.shape == (16, 16, 3) and _md5(img) == "4853155c8d54"
    img = codecs.decode_gif(_read("gif87a_banner.gif"))
    assert img.shape == (35, 150, 3) and _md5(img) == "1920518f4fb3"


def test_external_gif_animation_full_decode():
    """783 frames, 640x421, full 12-bit LZW tables, frame placement
    rectangles and disposal — decoded end to end with exact pixel counts
    per frame (any LZW desync raises within a few codes)."""
    frames = codecs.decode_gif_frames(_read("gif_anim_python.gif"))
    assert len(frames) == 783
    assert frames[0].shape == (421, 640, 3)
    assert _md5(frames[0]) == "f674cd4549bf"
    assert all(f.shape == (421, 640, 3) for f in frames[::97])


def test_external_wav_pcm8_and_pcm16():
    s8, rate8 = codecs.decode_wav(_read("wav_pcm8_pluck.wav"))
    s16, rate16 = codecs.decode_wav(_read("wav_pcm16_pluck.wav"))
    assert rate8 == rate16 == 11025
    assert s8.shape == s16.shape == (3307, 2)
    assert _md5(s8) == "7304c2af697c"
    assert _md5(s16) == "03adf2f2709d"


def test_external_webp_alpha_plane_vp8l():
    """python.webp (CPython test asset, libwebp-produced): a VP8X
    container whose ALPH chunk is compressed with the LOSSLESS method —
    a real libwebp VP8L bitstream.  Decoding it end to end through the
    prefix-code/LZ77/color-cache layer yields the Python-logo alpha
    mask — external conformance evidence for the VP8L entropy decoder
    (including the 2D distance map: any mapping error scrambles the
    mask into noise)."""
    d = _read("webp_vp8x_alpha_python.webp")
    a = codecs.decode_webp_alpha(d)
    assert a.shape == (16, 16)
    assert _md5(a) == "fa1667e19ae1"
    # the mask is structured, not noise: mostly 0/255, row-coherent
    frac_extreme = ((a == 0) | (a == 255)).mean()
    assert frac_extreme > 0.5, frac_extreme
    # the logo's interior rows are mostly opaque, the corners transparent
    assert a[0, 0] == 0 and a[0, 15] == 0
    assert (a[5] > 128).sum() > 8


def test_external_tiff_matches_png_pixels():
    """python.tiff and python.png (same 16x16 logo, two different
    containers produced by different tools) decode to IDENTICAL RGBA
    pixels through two independent decoders — cross-format external
    agreement, the strongest conformance evidence available offline."""
    tif = codecs.decode_tiff(_read("tiff_rgba_python.tiff"))
    png = codecs.decode_png(_read("png_palette_python.png"))
    assert tif.shape == png.shape == (16, 16, 4)
    assert np.array_equal(tif, png)
    assert _md5(tif) == "d5ebfcd830af"


def test_external_au_mulaw():
    """sndhdr.au: real G.711 mu-law audio; decodes to full-range 16-bit
    linear (mu-law's max magnitude is 32124 exactly)."""
    s, rate = codecs.decode_au(_read("au_ulaw_sndhdr.au"))
    assert rate == 8012 and s.shape == (28110, 1)
    assert s.max() == 32124 and s.min() == -31100
    assert _md5(s) == "253c22736ab8"


def test_external_aiff_and_aifc():
    s, rate = codecs.decode_aiff(_read("aiff_pcm16_pluck.aiff"))
    assert rate == 11025 and s.shape == (3307, 2)
    assert _md5(s) == "575e092ea24c"
    # cross-container: the WAV edition of the same recording agrees to
    # within conversion dither (separately produced fixtures)
    w, rw = codecs.decode_wav(_read("wav_pcm16_pluck.wav"))
    assert rw == rate and w.shape == s.shape
    assert np.abs(w.astype(np.int64) - s.astype(np.int64)).max() <= 16
    s2, r2 = codecs.decode_aiff(_read("aifc_none_sndhdr.aifc"))
    assert r2 == 44100 and s2.shape == (5, 2)
