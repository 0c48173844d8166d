"""Golden-file byte-identity tests — the north-star invariant.

Each committed fixture dir holds an input document and the frozen expected
markdown / extracted_text / figure metadata.  Extraction must reproduce all
three byte-for-byte (extracted_text is THE invariant per BASELINE.json
input_hint; markdown and figures lock the full output contract).

Also asserts per-rule properties so a fixture regeneration that silently
broke a rule cannot pass by matching itself.
"""

import json
from pathlib import Path

import pytest

from qwen_ocr_spark.functions.htmlx import decode_html_bytes, extract_html
from qwen_ocr_spark.functions.pdfx import extract_pdf

FIX = Path(__file__).resolve().parent / "fixtures"
CASES = sorted(p.name for p in FIX.iterdir() if p.is_dir()) if FIX.exists() else []


def _extract(case_dir: Path):
    html = case_dir / "input.html"
    if html.exists():
        return extract_html(decode_html_bytes(html.read_bytes()))
    return extract_pdf((case_dir / "input.pdf").read_bytes())


@pytest.mark.parametrize("case", CASES)
def test_golden_byte_identity(case):
    d = FIX / case
    res = _extract(d)
    assert res.markdown.encode("utf-8") == (d / "expected.md").read_bytes(), \
        f"{case}: markdown drifted"
    assert res.extracted_text.encode("utf-8") == (d / "expected_text.txt").read_bytes(), \
        f"{case}: extracted_text drifted (THE invariant)"
    got = [
        {"page_number": f.page_number, "fig_number": f.fig_number,
         "bbox": list(f.bbox), "caption": f.caption,
         "element_type": f.element_type, "img_format": f.img_format}
        for f in res.figures
    ]
    assert got == json.loads((d / "expected_figures.json").read_text()), \
        f"{case}: figure metadata drifted"


def test_goldens_exist():
    assert len(CASES) >= 15


# --- per-rule semantic assertions on the frozen expectations -------------

def _md(case):
    return (FIX / case / "expected.md").read_text()


def test_rule_headers_hierarchy():
    md = _md("headers_hierarchy")
    assert "# Root" in md and "## Branch A" in md and "### Leaf A1" in md and "## Branch B" in md


def test_rule_html_table():
    md = _md("html_table")
    assert '<th colspan="2">' in md and '<td rowspan="2">' in md
    assert "|" not in md and 'border=' not in md


def test_rule_latex():
    md = _md("latex_math")
    assert "$e^{i\\pi} + 1 = 0$" in md and "$$\\sum_{k=1}^n k = \\frac{n(n+1)}{2}$$" in md


def test_rule_figure_ref():
    assert "![Figure 1: System architecture](1_fig1.png)" in _md("figure_ref")


def test_rule_area_filter():
    md = _md("figure_area_filter")
    assert "![Figure 2: the real chart](1_fig1.png)" in md
    assert "tiny icon" not in md and "full page scan" not in md


def test_rule_bbox_bounds():
    md = _md("bbox_bounds")
    assert "continues normally" in md and "inverted" not in md


def test_rule_footnotes():
    md = _md("footnotes")
    assert "[^1]" in md and "[^1]:" in md


def test_rule_boilerplate():
    md = _md("boilerplate_html")
    assert "The Actual Article Title" in md and "genuine article body" in md
    for chrome in ("Home", "MegaSite", "Accept cookies", "Copyright", "Related"):
        assert chrome not in md


def test_rule_empty_doc():
    assert _md("empty_doc") == ""


def test_rule_xy_cut_reading_order():
    t = (FIX / "pdf_xy_cut" / "expected_text.txt").read_text()
    assert t.index("left column line 4") < t.index("right column line 0")


def test_rule_continuous_flow():
    md = _md("continuous_flow")
    assert "first page and finishes on the second" in md
    assert "Page" not in md


def test_rule_running_headers():
    md = _md("running_headers")
    assert "Journal of Synthetic Results" not in md
    assert "CONFIDENTIAL DRAFT" not in md
    assert "Unique second page paragraph" in md


def test_rule_list_continuation():
    md = _md("list_continuation")
    for item in ("1. configure", "2. load", "3. run", "4. verify"):
        assert item in md


def test_rule_pdf_figure_caption():
    figs = json.loads((FIX / "pdf_figure" / "expected_figures.json").read_text())
    assert figs[0]["caption"] == "Figure 1: Throughput by executor count"
    assert figs[0]["element_type"] == "chart"


def test_rule_pdf_table():
    md = _md("pdf_table")
    assert "<table><tr><th>config</th><th>p50</th><th>p99</th></tr>" in md
    assert "<td>small</td><td>12ms</td><td>40ms</td>" in md

def test_rule_charset_latin1():
    md = _md("charset_latin1")
    assert "Café résumé" in md and "Straße" in md and "naïve" in md


def test_rule_flate_tj_identity():
    """The three encodings of the same document share frozen expectations."""
    a = (FIX / "pdf_flate" / "expected_text.txt").read_bytes()
    b = (FIX / "pdf_tj_arrays" / "expected_text.txt").read_bytes()
    c = (FIX / "pdf_flate_tj" / "expected_text.txt").read_bytes()
    assert a == b == c and b"FlateDecode content stream" in a
    # and the compressed input really is compressed (no plaintext title)
    assert b"Compressed Stream Document Title" not in (FIX / "pdf_flate" / "input.pdf").read_bytes()
