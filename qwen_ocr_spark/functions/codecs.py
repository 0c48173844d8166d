"""Pure-stdlib media codecs: PNG, BMP, PGM images; WAV audio.

This container ships no PIL/libav, but several real-world formats are
decodable with nothing beyond ``zlib``/``wave``/``struct`` + numpy — so
the multimodal operators decode them FOR REAL instead of stubbing:

* PNG  — 8-bit depth, color types 0 (gray) / 2 (RGB) / 6 (RGBA), all five
         scanline filters, non-interlaced (the overwhelming majority of
         crawl PNGs; Adam7 + 16-bit raise ``ValueError`` into the row
         error channel).
* BMP  — uncompressed 24-bit BI_RGB, bottom-up or top-down.
* PGM  — binary P5, maxval <= 255.
* WAV  — PCM via the stdlib ``wave`` module (8/16/32-bit).

Encoders exist for each (deterministic bytes) so synthetic corpora and
tests can round-trip without external fixtures.

Images decode to ``np.uint8`` arrays of shape (h, w) or (h, w, channels);
``to_gray`` folds channels with the integer mean (deterministic, no float
luma ambiguity across engines).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = ct = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h = (int.from_bytes(chunk[0:4], "big"),
                    int.from_bytes(chunk[4:8], "big"))
            bit_depth, ct, interlace = chunk[8], chunk[9], chunk[12]
            if bit_depth != 8 or ct not in (0, 2, 6) or interlace:
                raise ValueError(
                    f"unsupported PNG variant (depth={bit_depth}, "
                    f"color={ct}, interlace={interlace})")
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = {0: 1, 2: 3, 6: 4}[ct]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if f == 0:
            pass
        elif f == 1:    # Sub: + left
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:    # Up: + above
            line = bytearray((np.frombuffer(bytes(line), np.uint8)
                              + prev).astype(np.uint8).tobytes())
        elif f == 3:    # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:    # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                line[i] = (line[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = np.frombuffer(bytes(line), np.uint8)
        prev = out[y]
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """Deterministic PNG writer: filter 0, fixed zlib level."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ct, ch = 0, 1
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        ct, ch = (2, 3) if img.shape[2] == 3 else (6, 4)
        h, w = img.shape[:2]
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    flat = img.reshape(h, w * ch)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit)
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack("<I", data[10:14])[0]
    w, h_signed = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    h = abs(h_signed)
    row = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(data[off:off + row * h], np.uint8)
    if px.size < row * h:
        raise ValueError("BMP data truncated")
    px = px.reshape(h, row)[:, :w * 3].reshape(h, w, 3)
    if h_signed > 0:            # bottom-up storage
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    elif img.ndim == 3 and img.shape[2] == 4:
        img = img[:, :, :3]  # 24bpp container: drop alpha, don't corrupt
    elif img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"unsupported shape {img.shape} for 24-bit BMP")
    h, w = img.shape[:2]
    row = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = img[:, :, ::-1]
    pad = b"\x00" * (row - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + pad
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                            2835, 2835, 0, 0))
    return header + bytes(body)


# ---------------------------------------------------------------------------
# PGM (binary P5)
# ---------------------------------------------------------------------------

def decode_pgm(data: bytes) -> np.ndarray:
    if data[:2] != b"P5":
        raise ValueError("not a binary PGM")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    w, h, maxval = fields
    # spec: exactly ONE whitespace separator after maxval, but Windows
    # writers emit \r\n.  A \r followed by \n is genuinely ambiguous in
    # binary PGM (CRLF separator vs bare-\r separator + 0x0A first pixel);
    # disambiguate by size: when skipping only the \r leaves EXACTLY w*h
    # raster bytes, the \n is a pixel (keep it); when there is at least one
    # spare byte, CRLF writers are overwhelmingly the real-world case —
    # treat the pair as one separator.
    pos += 1
    if (data[pos - 1:pos] == b"\r" and data[pos:pos + 1] == b"\n"
            and len(data) - pos >= w * h + 1):
        pos += 1
    if maxval > 255:
        raise ValueError("16-bit PGM unsupported")
    px = np.frombuffer(data[pos:pos + w * h], np.uint8)
    if px.size < w * h:
        raise ValueError("PGM data truncated")
    return px.reshape(h, w).copy()


def encode_pgm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    return f"P5\n{w} {h}\n255\n".encode() + img.tobytes()


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """→ (samples int32 array of shape (n, channels), sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        n, ch, width = f.getnframes(), f.getnchannels(), f.getsampwidth()
        rate = f.getframerate()
        raw = f.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = np.frombuffer(raw, dtype).astype(np.int32)
    if width == 1:
        samples -= 128  # 8-bit WAV is unsigned, center it
    return samples.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """16-bit PCM writer (mono or multichannel)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s.reshape(-1, 1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(s.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def to_gray(img: np.ndarray) -> np.ndarray:
    """Channel fold by integer mean — deterministic across engines."""
    if img.ndim == 2:
        return img
    return (img[:, :, :3].astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)


def decode_image(codec: str, payload: bytes, width: int = 0,
                 height: int = 0) -> np.ndarray:
    """Dispatch: RAWGRAY (needs width/height from metadata) or a
    self-describing container format."""
    if codec == "RAWGRAY":
        a = np.frombuffer(payload, dtype=np.uint8)
        if a.size < width * height:
            raise ValueError(f"payload {a.size}B < {width}x{height}")
        return a[: width * height].reshape(height, width)
    if codec == "PNG":
        return decode_png(payload)
    if codec == "BMP":
        return decode_bmp(payload)
    if codec == "PGM":
        return decode_pgm(payload)
    raise KeyError(codec)
