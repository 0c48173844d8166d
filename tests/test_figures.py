"""Unit tests for figure bbox/area/numbering kernels (reference:
/root/reference/src/pdf_handler.py:105-110, src/models/document_job.py:203-227)."""

from qwen_ocr_spark.functions.figures import (
    Figure,
    area_in_bounds,
    bbox_valid,
    figure_ref,
    filter_figures,
    image_tokens,
    number_figures,
    scale_bbox_to_pixels,
)


def test_bbox_valid_bounds():
    assert bbox_valid((0, 0, 1000, 1000))
    assert bbox_valid((1, 2, 3, 4))
    assert not bbox_valid((3, 0, 3, 10))      # x1 == x2
    assert not bbox_valid((5, 10, 4, 20))     # x1 > x2
    assert not bbox_valid((-1, 0, 10, 10))    # negative
    assert not bbox_valid((0, 0, 1001, 10))   # beyond scale


def test_area_filter_bounds():
    # exactly 5% and 85% are inclusive (reference uses <=/>=)
    assert area_in_bounds((0, 0, 1000, 50))          # 5.0%
    assert area_in_bounds((0, 0, 1000, 850))         # 85.0%
    assert not area_in_bounds((0, 0, 100, 100))      # 1%
    assert not area_in_bounds((0, 0, 1000, 900))     # 90%
    assert area_in_bounds((100, 100, 700, 700))      # 36%


def test_filter_drops_invalid_and_out_of_bounds():
    figs = [
        Figure(1, (0, 0, 1000, 400)),   # keep (40%)
        Figure(1, (0, 0, 100, 100)),    # drop area
        Figure(1, (10, 10, 5, 20)),     # drop invalid
    ]
    kept = filter_figures(figs)
    assert len(kept) == 1 and kept[0].bbox == (0, 0, 1000, 400)


def test_numbering_restarts_per_page_ordered_by_position():
    figs = [
        Figure(2, (0, 500, 400, 900)),
        Figure(1, (500, 0, 900, 400)),
        Figure(1, (0, 0, 400, 400)),
        Figure(2, (0, 0, 400, 400)),
    ]
    numbered = number_figures(figs)
    got = [(f.page_number, f.fig_number, f.bbox[:2]) for f in numbered]
    assert got == [
        (1, 1, (0, 0)),
        (1, 2, (500, 0)),
        (2, 1, (0, 0)),
        (2, 2, (0, 500)),
    ]


def test_figure_ref_format():
    assert figure_ref(3, 2, "Figure 7: loss") == "![Figure 7: loss](3_fig2.png)"
    assert figure_ref(1, 1, None) == "![](1_fig1.png)"


def test_scale_bbox_truncates():
    assert scale_bbox_to_pixels((0, 0, 1000, 1000), 850, 1100) == (0, 0, 850, 1100)
    assert scale_bbox_to_pixels((333, 250, 667, 750), 850, 1100) == (283, 275, 566, 825)


def test_image_tokens():
    assert image_tokens(850, 1100) == (850 // 28) * (1100 // 28)
    assert image_tokens(27, 1000) == 0
