"""MultiRange parity tests (multi_range.rb:3-78 behaviors)."""

from pdfextract_ray.kernel.multirange import MultiRange


def mr(*ranges):
    m = MultiRange()
    for lo, hi in ranges:
        m.append(lo, hi)
    return m


def test_append_merges_incident():
    m = mr((0, 10), (5, 15))
    assert m.ranges == [(0, 15)]


def test_append_keeps_disjoint():
    m = mr((0, 10), (20, 30))
    assert m.count == 2
    assert m.min == 0 and m.max == 30


def test_touching_endpoints_merge():
    # Ruby Range#include? is endpoint-inclusive
    m = mr((0, 10), (10, 20))
    assert m.ranges == [(0, 20)]


def test_merged_range_appended_last():
    # order sensitivity: merged ranges go to the END of the list
    m = mr((0, 5), (20, 25), (4, 6))
    assert m.ranges == [(20, 25), (0, 6)]


def test_excluded_edges():
    m = mr((0, 10), (20, 30), (40, 50))
    assert m.max_excluded == 40   # bottom edge of topmost run
    assert m.min_excluded == 10   # top edge of bottommost run
    single = mr((3, 7))
    assert single.max_excluded == 7
    assert single.min_excluded == 3


def test_width_stats():
    m = mr((0, 10), (20, 25), (40, 70))
    assert m.widest == 30
    assert m.narrowest == 5
    assert m.avg == (10 + 5 + 30) / 3.0
    assert m.covered == 45


def test_bridge_merge_collapses_three():
    m = mr((0, 10), (20, 30), (8, 22))
    assert m.ranges == [(0, 30)]
