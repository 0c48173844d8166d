"""Equivalence pin for the round-6 fast HTML tokenizer (htmlx._fast_feed).

The fast one-shot driver must produce the IDENTICAL block stream to the
stdlib incremental ``HTMLParser.feed()`` path for every document the
engine can meet: the full synthetic crawl template space, the bridge
corpus, and a battery of malformed-markup edge cases drawn from the
stdlib parser's own tokenization arms (bogus comments, bare ``<``/``&``,
unterminated constructs, CDATA content with fake closers, ...).

Blocks are dataclasses, so ``==`` compares every field (kind, text,
level, link/total chars, chrome flag, list items, table html, figures).
"""

from __future__ import annotations

import pytest

from qwen_ocr_spark.functions import htmlx
from qwen_ocr_spark.sources import pages as pg

EDGE_CASES = [
    # plain + entities in data and attributes
    "<p>a &amp; b &#65; &#x42; &notentity; &lt;tag&gt;</p>",
    "<p title='x &amp; y'>t</p><img src=x alt='a&amp;b'/>",
    # unquoted / bare / duplicate-ish attributes
    '<p class=big data-x=1 checked>t</p>',
    "<a href=/x>link</a> trailing",
    # case folding and self-closing
    "<ARTICLE><H1>T</H1><P>body</P><BR/><HR/></ARTICLE>",
    "<p/>after",
    # bare < and & in data, incomplete entity at EOF
    "<p>3 < 5 and a&b</p>",
    "<p>ends with amp &am",
    "<p>ends with lt <",
    # comments, doctype, PI, bogus declarations, marked sections
    "<!doctype html><p>x</p><!-- c -- ><p>y</p>",
    "<!-- unterminated <p>never</p>",
    "<?php echo 1 ?><p>x</p>",
    "<!weird decl><p>x</p>",
    "<![CDATA[ raw <p>no</p> ]]><p>x</p>",
    # end-tag arms: junk, </>, missing close
    "<p>a</ p><p>b</p>",
    "<p>a</>b<p>c</p>",
    "<p>a</p junk>z",
    # unterminated start tags
    "<p>a<a href=\"x",
    "<p>a<a ",
    "<p>a<a",
    # script/style CDATA with hostile content
    '<p>a</p><script>if (a<b) { s = "</scr" + "ipt>&amp;"; }</script><p>b</p>',
    "<style>p { content: '</sty' }</style><p>c</p>",
    "<script>unterminated <p>gone</p>",
    "<script>x</script foo><p>after-junk-close</p>",
    "<SCRIPT>UP</SCRIPT><p>up</p>",
    # structures the extractor models
    '<nav><ul><li><a href="/h">H</a></li></ul></nav><article><h2>s</h2>'
    '<p>body text here</p><ol start="4"><li>i1</li><li>i2</li></ol>'
    '<table><tr><th colspan="2">h</th></tr><tr><td>a</td><td>1</td></tr>'
    "</table>"
    '<figure><img src="f.png" data-bbox="1,2,300,400" '
    'data-element-type="chart" alt="alt cap"/><figcaption>cap</figcaption>'
    "</figure></article><footer><p>foot</p></footer>",
    # img outside figure, width/height bbox, pre with verbatim whitespace
    '<img src="x" width="300" height="200" alt="w/h">'
    "<pre>  spaced\n\tkept  </pre><p>tail</p>",
    # empty document / whitespace only / no markup at all
    "",
    "   \n\t  ",
    "no tags at all & < done",
]


def _blocks(html: str, fast: bool):
    return htmlx.parse_html(html, fast=fast).blocks


@pytest.mark.parametrize("case", range(len(EDGE_CASES)))
def test_edge_case_equivalence(case):
    html = EDGE_CASES[case]
    assert _blocks(html, fast=True) == _blocks(html, fast=False)


def test_crawl_corpus_equivalence():
    """Every synthetic crawl template family, 300 documents."""
    mismatches = []
    for doc_id in range(300):
        url, _ts, payload, _text, _lang = pg.gen_page(42, doc_id)
        if url.endswith(".pdf"):
            continue
        html = htmlx.decode_html_bytes(payload)
        if _blocks(html, fast=True) != _blocks(html, fast=False):
            mismatches.append(doc_id)
    assert mismatches == []


def test_bridge_corpus_equivalence():
    for doc_id in range(0, 120):
        text = f"some words for doc {doc_id} " * (doc_id % 7 + 1)
        for payload in (pg._bridge_html(doc_id, text),
                        pg._bridge_html_figured(doc_id, text)):
            html = payload.decode("utf-8")
            assert _blocks(html, fast=True) == _blocks(html, fast=False)
