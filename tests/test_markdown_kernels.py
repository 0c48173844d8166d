"""Unit tests for the deterministic markdown kernels.

Each case mirrors the observable behavior of the reference functions
(/root/reference/src/processing.py:15-66, src/models/document_job.py:53-63).
"""

from qwen_ocr_spark.functions.markdown import (
    build_context,
    clean_markdown_output,
    extract_headers,
    iter_batches,
    num_batches,
    update_header_stack,
)


def test_extract_headers_basic():
    md = "# Title\n\nbody\n## Sub\n   ### Indented\n#notext-is-header-with-text\n####### seven\n##\n# "
    hs = extract_headers(md)
    assert hs == [
        (1, "# Title"),
        (2, "## Sub"),
        (3, "   ### Indented"),
        (1, "#notext-is-header-with-text"),
    ]


def test_extract_headers_preserves_original_line():
    md = "  ## Spaced"
    assert extract_headers(md) == [(2, "  ## Spaced")]


def test_clean_markdown_fenced():
    assert clean_markdown_output("```markdown\n# T\nbody\n```") == "# T\nbody"


def test_clean_markdown_only_exact_fences():
    s = "```python\nx\n```extra"
    assert clean_markdown_output(s) == s
    assert clean_markdown_output("```markdown\nx") == "x"
    assert clean_markdown_output("x\n```") == "x"


def test_update_header_stack_push_deeper():
    st = update_header_stack([], [(1, "# A"), (2, "## B"), (3, "### C")])
    assert st == [(1, "# A"), (2, "## B"), (3, "### C")]


def test_update_header_stack_replace_equal():
    st = update_header_stack([(1, "# A"), (2, "## B")], [(2, "## B2")])
    assert st == [(1, "# A"), (2, "## B2")]


def test_update_header_stack_pop_shallower():
    st = update_header_stack(
        [(1, "# A"), (2, "## B"), (3, "### C")], [(2, "## D")]
    )
    assert st == [(1, "# A"), (2, "## D")]


def test_update_header_stack_pop_to_empty():
    st = update_header_stack([(2, "## B"), (3, "### C")], [(1, "# A")])
    assert st == [(1, "# A")]


def test_update_header_stack_skips_levels():
    # jump 1 -> 4 pushes; then 2 pops both 4 and anything >= 2
    st = update_header_stack([], [(1, "# A"), (4, "#### D"), (2, "## B")])
    assert st == [(1, "# A"), (2, "## B")]


def test_build_context_indentation():
    ctx = build_context([(1, "# A"), (3, "### C")])
    assert ctx == "### DOCUMENT LOCATION BREADCRUMB\n# A\n    ### C"


def test_iter_batches_clamps_last():
    assert list(iter_batches(1, 25, 10)) == [(0, 1, 10), (1, 11, 20), (2, 21, 25)]
    assert list(iter_batches(1, 10, 10)) == [(0, 1, 10)]
    assert list(iter_batches(5, 4, 10)) == []


def test_num_batches():
    assert num_batches(25, 10) == 3
    assert num_batches(10, 10) == 1
    assert num_batches(0, 10) == 0
