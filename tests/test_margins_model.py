"""Margins-model semantics ported from the reference suite
(tests/test_margins/test_margins.py): Margins arithmetic, positivity, and
GlobalMargins composition (sum of cumulatives, max with non-cumulatives)
plus the exact to_dict serialization the output config persists."""

import pytest

from pandora_tpu.margins import GlobalMargins, Margins


def test_margins_are_summable():
    assert Margins(1, 2, 3, 4) + Margins(4, 3, 2, 1) == Margins(5, 5, 5, 5)


def test_margins_to_dict():
    assert Margins(1, 2, 3, 4).to_dict() == {"left": 1, "up": 2, "right": 3, "down": 4}


def test_margins_are_positive():
    with pytest.raises(Exception):
        Margins(-1, 2, 3, 4)


@pytest.mark.parametrize(
    ["cumulatives", "non_cumulatives", "expected"],
    [
        # sum of cumulatives only
        ({"a": Margins(1, 1, 1, 1), "b": Margins(2, 0, 1, 3)}, {}, Margins(3, 1, 2, 4)),
        # non-cumulative maxes against the cumulative total
        (
            {"matching_cost": Margins(2, 2, 2, 2)},
            {"filter": Margins(3, 3, 3, 3)},
            Margins(3, 3, 3, 3),
        ),
        # per-component max
        (
            {"a": Margins(4, 0, 0, 0)},
            {"f": Margins(3, 3, 3, 3)},
            Margins(4, 3, 3, 3),
        ),
    ],
)
def test_global_property(cumulatives, non_cumulatives, expected):
    gm = GlobalMargins()
    for step, m in cumulatives.items():
        gm.add_cumulative(step, m)
    for step, m in non_cumulatives.items():
        gm.add_non_cumulative(step, m)
    assert gm.global_margins == expected


def test_global_margins_to_dict():
    """reference test_margins.py:185-204 exact serialization."""
    gm = GlobalMargins()
    gm.add_cumulative("matching_cost", Margins(2, 2, 2, 2))
    gm.add_cumulative("disparity", Margins(0, 0, 0, 0))
    gm.add_cumulative("refinement", Margins(0, 0, 0, 0))
    gm.add_non_cumulative("filter", Margins(3, 3, 3, 3))
    assert gm.to_dict() == {
        "cumulative margins": {
            "matching_cost": {"left": 2, "up": 2, "right": 2, "down": 2},
            "disparity": {"left": 0, "up": 0, "right": 0, "down": 0},
            "refinement": {"left": 0, "up": 0, "right": 0, "down": 0},
        },
        "non-cumulative margins": {
            "filter": {"left": 3, "up": 3, "right": 3, "down": 3},
        },
        "global margins": {"left": 3, "up": 3, "right": 3, "down": 3},
    }


def test_max_margins():
    a, b = Margins(1, 5, 2, 0), Margins(3, 1, 2, 4)
    assert a.max(b) == Margins(3, 5, 2, 4)


# ---------------------------------------------------------------------------
# CARS get_margins entry point (reference tests/test_marge.py)
# ---------------------------------------------------------------------------

import pytest

from pandora_tpu.margins import get_margins

_VALID_FILTER = {
    "refinement": {"refinement_method": "vfit"},
    "filter": {"filter_method": "median", "filter_size": 3},
    "validation": {"validation_method": "cross_checking_accurate", "cross_checking_threshold": 1},
}


@pytest.mark.parametrize("method", ["sgm", "3sgm"])
@pytest.mark.parametrize(
    "disp,expected",
    [
        ((-13, 14), [54, 40, 54, 40]),
        ((3, 14), [54, 40, 54, 40]),
        ((-13, -2), [53, 40, 53, 40]),
    ],
)
def test_get_margins_sgm(method, disp, expected):
    """reference test_marge.py:47-110 (sgm and 3sgm give the same)."""
    cfg = {
        "matching_cost": {"matching_cost_method": "census", "window_size": 5},
        "optimization": {"optimization_method": method},
        **_VALID_FILTER,
    }
    res = get_margins(disp[0], disp[1], cfg)
    assert res["left_margin"] == expected
    assert res["right_margin"] == expected
    assert (res["disp_min"], res["disp_max"]) == disp


@pytest.mark.parametrize(
    "mc,filter_size,disp,expected",
    [
        (("census", 3), 3, (-13, 14), [17, 2, 17, 2]),
        (("sad", 9), 3, (3, 14), [20, 5, 20, 5]),
        (("sad", 1), 5, (-13, -2), [16, 2, 16, 2]),
    ],
)
def test_get_margins_without_sgm(mc, filter_size, disp, expected):
    """reference test_marge.py:111-158."""
    cfg = {
        "matching_cost": {"matching_cost_method": mc[0], "window_size": mc[1]},
        "refinement": {"refinement_method": "vfit"},
        "filter": {"filter_method": "median", "filter_size": filter_size},
        "validation": {"validation_method": "cross_checking_accurate", "cross_checking_threshold": 1},
    }
    res = get_margins(disp[0], disp[1], cfg)
    assert res["left_margin"] == expected
    assert res["right_margin"] == expected
