"""Shared block model, boilerplate classifier, and markdown emitter.

Both extraction paths (HTML via ``htmlx``, PDF via ``pdfx``) reduce a
document to an ordered list of :class:`Block` per page; this module owns

1. the content/boilerplate decision (text-density + link-density scoring —
   the deterministic replacement for the reference's VLM text prompt,
   per BASELINE.json ``north_star``), and
2. the markdown emitter implementing the reference's output contract
   (/root/reference/src/config.py:78-124): headings by level, HTML
   ``<table>`` passthrough (never pipe tables), LaTeX left verbatim,
   ``![caption]({page}_fig{n}.png)`` figure refs, ordered lists continuing
   across page boundaries, NO page markers or extra blank lines between
   pages, sentences merged across page breaks, running headers/footers
   removed (/root/reference/src/config.py:88-91), and
3. the whole-document assembly: the batch-of-10 header-breadcrumb fold
   (/root/reference/src/models/document_job.py:321-375) re-expressed as a
   per-document sequential scan.

Everything here is pure Python over in-memory values — it runs inside the
Arrow-batched UDF in ``operators/extract.py`` and is unit-tested directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from qwen_ocr_spark import config
from qwen_ocr_spark.functions import markdown as mdk
from qwen_ocr_spark.functions import figures as figk

# block kinds
HEADING = "heading"
PARA = "para"
LIST = "list"
TABLE = "table"
FIGURE = "figure"
PRE = "pre"


@dataclass
class ListItem:
    text: str
    ordered: bool
    depth: int = 0
    link_chars: int = 0


@dataclass
class Block:
    kind: str
    text: str = ""                 # collapsed plain text (heading/para/pre)
    level: int = 0                 # heading level 1-6
    link_chars: int = 0
    total_chars: int = 0
    in_chrome: bool = False        # inside nav/aside/header/footer/form
    items: list[ListItem] = field(default_factory=list)
    html: str = ""                 # sanitized serialization (tables)
    figure: figk.Figure | None = None
    ol_start: int | None = None    # explicit <ol start=N>


@dataclass
class PageBlocks:
    page_number: int
    blocks: list[Block]


@dataclass
class DocResult:
    markdown: str
    extracted_text: str
    figures: list[figk.Figure]
    header_stack: list[mdk.Header]
    n_blocks_kept: int
    n_blocks_dropped: int


def link_density(link_chars: int, total_chars: int) -> float:
    return (link_chars / total_chars) if total_chars > 0 else 0.0


def is_content(block: Block) -> bool:
    """Content/boilerplate decision — the scoring core.

    Rules (deterministic, frozen by golden tests):
    * headings, tables, figures: content unless inside page chrome
      (nav/aside/header/footer/form subtrees).
    * text blocks: content when link density <= LINK_DENSITY_MAX and at
      least MIN_CONTENT_WORDS words, outside chrome; a long low-link block
      (>= LONG_TEXT_WORDS words, density <= 0.1) is content even inside
      chrome (rescue rule for articles wrapped in <header> etc.).
    * lists: scored on aggregate item text; link-heavy lists (nav menus,
      tag clouds) are boilerplate wherever they appear.
    """
    if block.kind == HEADING:
        return not block.in_chrome and bool(block.text)
    if block.kind in (TABLE, FIGURE):
        return not block.in_chrome
    if block.kind == LIST:
        total = sum(len(i.text) for i in block.items)
        links = sum(i.link_chars for i in block.items)
        if total == 0:
            return False
        return not block.in_chrome and link_density(links, total) <= config.LINK_DENSITY_MAX
    # PARA / PRE
    words = len(block.text.split())
    if words == 0:
        return False
    ld = link_density(block.link_chars, block.total_chars)
    if words >= config.LONG_TEXT_WORDS and ld <= 0.1:
        return True
    return not block.in_chrome and ld <= config.LINK_DENSITY_MAX and words >= config.MIN_CONTENT_WORDS


def strip_running_lines(pages: list[PageBlocks]) -> list[PageBlocks]:
    """Drop repeated per-page running headers/footers.

    A PARA block text appearing as the first or last block on strictly more
    than half the pages of a multi-page document is chrome
    (reference prompt rule /root/reference/src/config.py:90).
    """
    if len(pages) < config.RUNNING_LINE_MIN_PAGES:
        return pages
    counts: dict[str, int] = {}
    for p in pages:
        edge_texts = set()
        for b in (p.blocks[:1] + p.blocks[-1:]):
            if b.kind == PARA and b.text:
                edge_texts.add(b.text)
        for t in edge_texts:
            counts[t] = counts.get(t, 0) + 1
    threshold = len(pages) / 2.0
    running = {t for t, c in counts.items() if c > threshold}
    if not running:
        return pages
    out = []
    for p in pages:
        kept = list(p.blocks)
        # only strip at the page edges, never mid-page occurrences
        while kept and kept[0].kind == PARA and kept[0].text in running:
            kept.pop(0)
        while kept and kept[-1].kind == PARA and kept[-1].text in running:
            kept.pop()
        out.append(PageBlocks(p.page_number, kept))
    return out


_SENTENCE_END = (".", "!", "?", ":", ";", '"', "'", ")", "]", "…")


def _merge_cross_page(prev: Block, nxt: Block) -> bool:
    """True when nxt continues prev's sentence across a page break."""
    if prev.kind != PARA or nxt.kind != PARA:
        return False
    if not prev.text or not nxt.text:
        return False
    if prev.text.endswith(_SENTENCE_END):
        return False
    first = nxt.text[0]
    return first.islower() or first.isdigit()


def assemble_document(pages: list[PageBlocks]) -> DocResult:
    """Whole-document assembly: classify → de-chrome → number figures →
    fold batches of BATCH_SIZE pages carrying the header-breadcrumb stack
    and the ordered-list counter → emit one continuous markdown string.

    The fold is sequential per document by construction (one row = one
    document inside the UDF); documents are the unit of parallelism.
    """
    pages = sorted(pages, key=lambda p: p.page_number)
    pages = strip_running_lines(pages)

    kept_pages: list[PageBlocks] = []
    n_kept = n_dropped = 0
    for p in pages:
        kb = []
        for b in p.blocks:
            if is_content(b):
                kb.append(b)
                n_kept += 1
            else:
                n_dropped += 1
        kept_pages.append(PageBlocks(p.page_number, kb))

    # figure filtering + numbering across the whole document
    all_figs: list[figk.Figure] = []
    for p in kept_pages:
        for b in p.blocks:
            if b.kind == FIGURE and b.figure is not None:
                f = b.figure
                f.page_number = p.page_number
                all_figs.append(f)
    valid = set(id(f) for f in figk.filter_figures(all_figs))
    figures = figk.number_figures([f for f in all_figs if id(f) in valid])
    for p in kept_pages:
        p.blocks = [
            b for b in p.blocks
            if not (b.kind == FIGURE and (b.figure is None or id(b.figure) not in valid))
        ]

    # flatten to one block stream, merging sentence-spanning paragraphs
    stream: list[tuple[int, Block]] = []
    for p in kept_pages:
        for b in p.blocks:
            if (
                stream
                and stream[-1][0] != p.page_number
                and _merge_cross_page(stream[-1][1], b)
            ):
                prev = stream[-1][1]
                merged = Block(
                    kind=PARA,
                    text=prev.text + " " + b.text,
                    link_chars=prev.link_chars + b.link_chars,
                    total_chars=prev.total_chars + b.total_chars,
                )
                stream[-1] = (p.page_number, merged)
                continue
            stream.append((p.page_number, b))

    # fold in batches of pages, carrying breadcrumb + ordered-list counter
    header_stack: list[mdk.Header] = []
    ordered_counter = 0
    segments: list[str] = []
    text_lines: list[str] = []
    page_nums = sorted({p.page_number for p in kept_pages})
    if page_nums:
        lo, hi = page_nums[0], page_nums[-1]
    else:
        lo, hi = 1, 0
    for _, p_start, p_end in mdk.iter_batches(lo, hi, config.BATCH_SIZE):
        batch_blocks = [b for pn, b in stream if p_start <= pn <= p_end]
        seg_parts: list[str] = []
        for b in batch_blocks:
            rendered, ordered_counter = _emit_block(b, text_lines, ordered_counter)
            if rendered:
                seg_parts.append(rendered)
        segment = "\n\n".join(seg_parts)
        if segment:
            segments.append(segment)
        header_stack = mdk.update_header_stack(header_stack, mdk.extract_headers(segment))

    markdown = "\n\n".join(segments)
    extracted_text = "\n".join(text_lines)
    return DocResult(
        markdown=markdown,
        extracted_text=extracted_text,
        figures=figures,
        header_stack=header_stack,
        n_blocks_kept=n_kept,
        n_blocks_dropped=n_dropped,
    )


def _emit_block(b: Block, text_lines: list[str], ordered_counter: int) -> tuple[str, int]:
    """Render one block to markdown, appending its plain text to text_lines.

    Returns (markdown_fragment, updated_ordered_counter).  The ordered-list
    counter continues across blocks and pages unless the list declares an
    explicit start (contract: lists continue numbering across pages,
    /root/reference/src/config.py:113-114).
    """
    if b.kind == HEADING:
        text_lines.append(b.text)
        return "#" * b.level + " " + b.text, ordered_counter
    if b.kind == PARA or b.kind == PRE:
        text_lines.append(b.text)
        if b.kind == PRE:
            return "```\n" + b.text + "\n```", ordered_counter
        return b.text, ordered_counter
    if b.kind == LIST:
        lines = []
        has_ordered = any(i.ordered for i in b.items)
        if has_ordered and b.ol_start is not None:
            ordered_counter = b.ol_start - 1
        for item in b.items:
            text_lines.append(item.text)
            indent = "  " * item.depth
            if item.ordered:
                ordered_counter += 1
                lines.append(f"{indent}{ordered_counter}. {item.text}")
            else:
                lines.append(f"{indent}- {item.text}")
        if not has_ordered:
            # an unordered list does not interrupt ordered numbering
            return "\n".join(lines), ordered_counter
        return "\n".join(lines), ordered_counter
    if b.kind == TABLE:
        if b.text:
            text_lines.append(b.text)
        return b.html, ordered_counter
    if b.kind == FIGURE and b.figure is not None:
        f = b.figure
        if f.caption:
            text_lines.append(f.caption)
        return figk.figure_ref(f.page_number, f.fig_number, f.caption), ordered_counter
    return "", ordered_counter
