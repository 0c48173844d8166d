"""HTML extraction path: boilerplate stripping + markdown contract.

One test per output-contract rule (FIXTURES.md §3; contract source
/root/reference/src/config.py:78-124)."""

from qwen_ocr_spark.functions.htmlx import extract_html


ARTICLE = """<!doctype html>
<html><head><title>T</title><style>p{color:red}</style>
<script>var x = 1;</script></head>
<body>
<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
<header><p>SiteName — the best site</p></header>
<article>
<h1>Deep Learning at Scale</h1>
<p>This paper describes a system for training large models efficiently
and reliably on commodity hardware.</p>
<h2>Methods</h2>
<p>We use data parallelism with gradient compression and a novel
all-reduce schedule that overlaps communication and compute.</p>
</article>
<aside><p>Subscribe to our newsletter for more great content today</p></aside>
<footer><p>Copyright 2026 <a href="/tos">Terms</a></p></footer>
</body></html>"""


def test_boilerplate_stripped_content_kept():
    r = extract_html(ARTICLE)
    assert "# Deep Learning at Scale" in r.markdown
    assert "## Methods" in r.markdown
    assert "gradient compression" in r.markdown
    # chrome gone
    assert "Home" not in r.markdown
    assert "SiteName" not in r.markdown
    assert "newsletter" not in r.markdown
    assert "Copyright" not in r.markdown
    assert "var x" not in r.markdown
    assert "color:red" not in r.markdown


def test_markdown_structure_and_extracted_text():
    r = extract_html(ARTICLE)
    blocks = r.markdown.split("\n\n")
    assert blocks[0] == "# Deep Learning at Scale"
    assert blocks[2] == "## Methods"
    # extracted_text: plain text lines of kept blocks, in order
    lines = r.extracted_text.split("\n")
    assert lines[0] == "Deep Learning at Scale"
    assert lines[2] == "Methods"
    # whitespace collapsed inside paragraphs
    assert "efficiently and reliably" in lines[1]


def test_header_stack_after_document():
    r = extract_html(ARTICLE)
    assert r.header_stack == [
        (1, "# Deep Learning at Scale"),
        (2, "## Methods"),
    ]


def test_long_text_rescued_from_chrome():
    html = """<body><header>
    <p>This long introductory paragraph inside a header element still counts
    as real content because it has many words and zero links in it.</p>
    </header></body>"""
    r = extract_html(html)
    assert "introductory paragraph" in r.markdown


def test_link_density_kills_link_farms():
    html = """<body><div>
    <p><a href="/1">one link</a> <a href="/2">two link</a> <a href="/3">red link</a></p>
    <p>A genuine sentence of real prose content without any links at all.</p>
    </div></body>"""
    r = extract_html(html)
    assert "genuine sentence" in r.markdown
    assert "red link" not in r.markdown


def test_html_table_passthrough_rowspan_colspan():
    html = """<body><article>
    <p>Table 1 shows the results of the experiment in summary form.</p>
    <table class="data" style="x">
      <thead><tr><th colspan="2">Header</th></tr></thead>
      <tbody><tr><td rowspan="2">a</td><td>b</td></tr><tr><td>c</td></tr></tbody>
    </table>
    </article></body>"""
    r = extract_html(html)
    assert '<table><thead><tr><th colspan="2">Header</th></tr></thead>' in r.markdown
    assert '<td rowspan="2">a</td>' in r.markdown
    # attributes other than rowspan/colspan are dropped; no pipe tables
    assert 'class="data"' not in r.markdown
    assert "|" not in r.markdown


def test_latex_preserved_verbatim():
    html = "<body><p>The loss is $L = \\sum_i x_i^2$ and also $$\\int_0^1 f$$ here.</p></body>"
    r = extract_html(html)
    assert "$L = \\sum_i x_i^2$" in r.markdown
    assert "$$\\int_0^1 f$$" in r.markdown


def test_figure_ref_numbering_and_caption():
    html = """<body><article>
    <p>We evaluate on three datasets and report accuracy below it.</p>
    <figure><img src="a.png" data-bbox="100,100,600,500"/>
    <figcaption>Figure 1: Accuracy over time</figcaption></figure>
    <figure><img src="b.png" data-bbox="100,550,600,950"/>
    <figcaption>Figure 2: Loss curves</figcaption></figure>
    </article></body>"""
    r = extract_html(html)
    assert "![Figure 1: Accuracy over time](1_fig1.png)" in r.markdown
    assert "![Figure 2: Loss curves](1_fig2.png)" in r.markdown
    assert len(r.figures) == 2
    assert r.figures[0].fig_number == 1
    assert r.figures[1].fig_number == 2


def test_figure_area_filter_drops_tiny_and_huge():
    html = """<body><article>
    <p>Some sufficiently long paragraph about the experimental setup here.</p>
    <figure><img src="tiny.png" data-bbox="0,0,100,100"/>
    <figcaption>Figure 1: tiny logo</figcaption></figure>
    <figure><img src="big.png" data-bbox="0,0,1000,950"/>
    <figcaption>Figure 2: full page scan</figcaption></figure>
    <figure><img src="ok.png" data-bbox="100,100,700,700"/>
    <figcaption>Figure 3: the real chart</figcaption></figure>
    </article></body>"""
    r = extract_html(html)
    assert len(r.figures) == 1
    assert r.figures[0].caption == "Figure 3: the real chart"
    # the kept figure is renumbered 1 on its page
    assert "![Figure 3: the real chart](1_fig1.png)" in r.markdown
    assert "tiny logo" not in r.markdown
    assert "full page scan" not in r.markdown


def test_invalid_bbox_skips_figure_not_document():
    html = """<body><article>
    <p>Valid prose continues even when one figure is malformed badly.</p>
    <figure><img src="bad.png" data-bbox="600,100,100,500"/>
    <figcaption>Figure 1: inverted bbox</figcaption></figure>
    </article></body>"""
    r = extract_html(html)
    assert len(r.figures) == 0
    assert "Valid prose continues" in r.markdown


def test_ordered_list_and_start():
    html = """<body><article>
    <p>The procedure has the following steps in exact order today.</p>
    <ol><li>first step</li><li>second step</li></ol>
    <ol start="3"><li>third step</li><li>fourth step</li></ol>
    <ul><li>unordered note</li></ul>
    </article></body>"""
    r = extract_html(html)
    assert "1. first step\n2. second step" in r.markdown
    assert "3. third step\n4. fourth step" in r.markdown
    assert "- unordered note" in r.markdown


def test_nav_lists_dropped():
    html = """<body>
    <ul><li><a href="/x">Nav X</a></li><li><a href="/y">Nav Y</a></li></ul>
    <p>Real content paragraph with enough words to pass the filter.</p>
    </body>"""
    r = extract_html(html)
    assert "Nav X" not in r.markdown
    assert "Real content" in r.markdown


def test_entities_decoded():
    html = "<body><p>A &amp; B &lt; C &#8212; D with many more words here.</p></body>"
    r = extract_html(html)
    assert "A & B < C — D" in r.markdown


def test_empty_doc_yields_empty_strings():
    r = extract_html("<body><nav><a href='/'>x</a></nav></body>")
    assert r.markdown == ""
    assert r.extracted_text == ""
    assert r.figures == []


def test_pre_block_fenced():
    html = "<body><pre>def f(x):\n    return x</pre><p>Explanatory sentence follows the code block here.</p></body>"
    r = extract_html(html)
    assert r.markdown.startswith("```\n")


def test_determinism_byte_identical():
    a = extract_html(ARTICLE)
    b = extract_html(ARTICLE)
    assert a.markdown == b.markdown
    assert a.extracted_text == b.extracted_text


def test_decode_html_bytes_sniffing():
    from qwen_ocr_spark.functions.htmlx import decode_html_bytes
    # BOM wins
    assert decode_html_bytes(b"\xef\xbb\xbf<p>caf\xc3\xa9</p>") == "<p>café</p>"
    assert decode_html_bytes("<p>café</p>".encode("utf-16")) == "<p>café</p>"
    # meta charset (both forms), case-insensitive, quoted or bare
    latin = '<head><meta charset=ISO-8859-1></head><p>caf\xe9</p>'.encode("latin-1")
    assert "café" in decode_html_bytes(latin)
    legacy = ('<head><meta http-equiv="content-type" content="text/html; '
              'charset=windows-1252"></head><p>\x93quoted\x94</p>').encode("latin-1")
    assert "“quoted”" in decode_html_bytes(legacy)
    # unknown charset → utf-8 fallback, never an exception
    assert "x" in decode_html_bytes(b'<meta charset="no-such-enc"><p>x</p>')
    # no declaration → utf-8
    assert decode_html_bytes("<p>模型</p>".encode()) == "<p>模型</p>"


def test_decode_html_bytes_sniff_is_not_fooled():
    from qwen_ocr_spark.functions.htmlx import decode_html_bytes
    # charset= inside an unrelated attribute value must not hijack decode
    tricky = ('<meta name="description" content="convert charset=shift_jis">'
              '<meta charset="utf-8"><p>模型</p>').encode("utf-8")
    assert "模型" in decode_html_bytes(tricky)
    # commented-out meta is not a declaration
    commented = ('<!-- <meta charset="koi8-r"> --><p>é</p>').encode("utf-8")
    assert "é" in decode_html_bytes(commented)
    # WHATWG: meta-DECLARED utf-16 over ascii-compatible bytes decodes as
    # utf-8 (the declaration was readable, so the bytes are not utf-16)
    lying = b'<meta charset="utf-16"><p>plain ascii text</p>'
    assert "plain ascii text" in decode_html_bytes(lying)


def test_decode_html_bytes_hostile_declarations():
    from qwen_ocr_spark.functions.htmlx import decode_html_bytes
    # NUL byte inside a declared charset: codecs.lookup raises ValueError,
    # which must fall back to utf-8, never crash the document
    assert "ok" in decode_html_bytes(b'<meta charset="utf\x00-8"><p>ok</p>')
    # a valueless <meta charset> must not shadow the real declaration
    page = '<meta charset><meta charset="latin-1"><p>caf\xe9</p>'.encode("latin-1")
    assert "café" in decode_html_bytes(page)
