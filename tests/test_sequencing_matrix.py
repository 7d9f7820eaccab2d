"""Pipeline sequencing matrix (reference test_pandora_machine.py +
state_machine.py:75-140 transition table): every legal chain builds, every
illegal one raises MachineError, repeated steps use name.suffix, and
margins accumulate per the reference calculus."""

import pytest

from pandora_tpu.margins import Margins
from pandora_tpu.pipeline import MachineError, Pipeline

MC = {"matching_cost_method": "census", "window_size": 5}
WTA = {"disparity_method": "wta"}


def _pipe(keys):
    cfgs = {
        "matching_cost": MC,
        "aggregation": {"aggregation_method": "cbca"},
        "semantic_segmentation": {
            "segmentation_method": "ARNN",
            "RGB_bands": {"R": "r", "G": "g", "B": "b"},
            "vegetation_band": {"classes": []},
        },
        "optimization": {"optimization_method": "sgm"},
        "cost_volume_confidence": {"confidence_method": "ambiguity"},
        "disparity": WTA,
        "filter": {"filter_method": "median", "filter_size": 3},
        "refinement": {"refinement_method": "vfit"},
        "validation": {"validation_method": "cross_checking_accurate"},
        "multiscale": {
            "multiscale_method": "fixed_zoom_pyramid",
            "num_scales": 2,
            "scale_factor": 2,
            "marge": 1,
        },
    }
    return Pipeline({k: cfgs[k.split(".")[0]] for k in keys})


@pytest.mark.parametrize(
    "keys",
    [
        ["matching_cost", "disparity"],
        ["matching_cost", "aggregation", "disparity"],
        ["matching_cost", "semantic_segmentation", "optimization", "disparity"],
        ["matching_cost", "optimization", "cost_volume_confidence", "disparity"],
        [
            "matching_cost",
            "cost_volume_confidence",
            "optimization",
            "cost_volume_confidence.after",
            "disparity",
        ],
        ["matching_cost", "disparity", "filter", "refinement", "validation"],
        ["matching_cost", "disparity", "validation", "filter.post"],
        ["matching_cost", "disparity", "multiscale"],
        ["matching_cost", "disparity", "refinement", "multiscale"],
    ],
    ids=lambda k: ">".join(k) if isinstance(k, list) else str(k),
)
def test_legal_sequences(keys):
    pipe = _pipe(keys)
    assert len(pipe.steps) == len(keys)


@pytest.mark.parametrize(
    "keys",
    [
        ["disparity"],
        ["matching_cost", "matching_cost.2"],
        ["matching_cost", "disparity", "aggregation"],
        ["matching_cost", "refinement"],
        ["matching_cost", "disparity", "optimization"],
        ["matching_cost", "disparity", "semantic_segmentation"],
        ["matching_cost", "multiscale"],
        ["matching_cost", "disparity", "disparity.2"],
        ["matching_cost", "validation"],
    ],
    ids=lambda k: ">".join(k) if isinstance(k, list) else str(k),
)
def test_illegal_sequences(keys):
    with pytest.raises(MachineError):
        _pipe(keys)


def test_repeated_confidence_suffix_becomes_indicator():
    """state_machine.cost_volume_confidence_run (:571-576): the suffix is
    appended to the indicator name."""
    pipe = _pipe(
        [
            "matching_cost",
            "cost_volume_confidence",
            "optimization",
            "cost_volume_confidence.after",
            "disparity",
        ]
    )
    suffixed = dict(pipe.steps)["cost_volume_confidence.after"]
    assert suffixed.cfg["indicator"] == ".after"


def test_margins_sgm_and_filters():
    """Cumulative (matching_cost + optimization + refinement) ⊕ max of the
    filters (margins/margins.py:73-143; SGM fixed 40 px, marge.py:86-89)."""
    pipe = _pipe(
        ["matching_cost", "optimization", "disparity", "filter", "refinement", "validation"]
    )
    g = pipe.margins.global_margins
    # cumulative: census5 half-window 2 + SGM 40 + vfit 1 = 43
    # global = MAX(cumulative sum, each non-cumulative filter margin)
    # (margins/margins.py:124-126) — the filter's 3 px is absorbed
    d = pipe.margins.to_dict()
    assert d["cumulative margins"]["optimization"]["left"] == 40
    assert d["cumulative margins"]["matching_cost"]["left"] == 2
    assert g == Margins(43, 43, 43, 43)


def test_validation_sets_right_disp_map():
    pipe = _pipe(["matching_cost", "disparity", "validation"])
    assert pipe.right_disp_map == "cross_checking_accurate"
