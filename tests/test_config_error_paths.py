"""Config/machine error paths ported from the reference's
``tests/test_config.py`` + ``test_check_configuration.py`` +
``test_pandora_machine.py`` (round-5 VERDICT #3): every rejected config
asserts the rejection, nominal configs assert the defaults folded in.
"""

import numpy as np
import pytest

from pandora_tpu.config import (
    check_conf,
    check_input_section,
    memory_consumption_estimation,
)
from pandora_tpu.pipeline import MachineError, Pipeline
from pandora_tpu.utils.schema import SchemaError

REF = "/root/reference/tests/pandora"

BASIC_INPUT = {
    "left": {"img": f"{REF}/left.png", "disp": [-60, 0]},
    "right": {"img": f"{REF}/right.png"},
}
BASIC_PIPELINE = {
    "matching_cost": {"matching_cost_method": "census", "window_size": 5, "subpix": 1},
    "disparity": {"disparity_method": "wta", "invalid_disparity": -9999},
}


# ---------------------------------------------------------------------------
# input-section type/compatibility/order errors (test_config.py:107-200)
# ---------------------------------------------------------------------------


def test_left_disp_scalar_int_rejected():
    cfg = {
        "left": {"img": f"{REF}/left.png", "disp": 45},
        "right": {"img": f"{REF}/right.png"},
    }
    with pytest.raises(SchemaError):
        check_input_section(cfg)


def test_right_disp_scalar_int_rejected():
    cfg = {
        "left": {"img": f"{REF}/left.png", "disp": [0, 45]},
        "right": {"img": f"{REF}/right.png", "disp": 32},
    }
    with pytest.raises(SchemaError):
        check_input_section(cfg)


def test_left_grid_right_pair_rejected():
    cfg = {
        "left": {"img": f"{REF}/left.png", "disp": f"{REF}/left_disparity_grid.tif"},
        "right": {"img": f"{REF}/right.png", "disp": [0, 45]},
    }
    with pytest.raises(SchemaError, match="grid"):
        check_input_section(cfg)


def test_left_pair_right_grid_rejected():
    cfg = {
        "left": {"img": f"{REF}/left.png", "disp": [-4, 0]},
        "right": {"img": f"{REF}/right.png", "disp": f"{REF}/right_disparity_grid.tif"},
    }
    with pytest.raises(SchemaError, match="pair"):
        check_input_section(cfg)


@pytest.mark.parametrize("side", ["left", "right"])
def test_inverted_disparity_rejected(side):
    cfg = {
        "left": {"img": f"{REF}/left.png", "disp": [-4, 0]},
        "right": {"img": f"{REF}/right.png"},
    }
    cfg[side]["disp"] = [0, -4]
    with pytest.raises(SchemaError, match="min must be <= max"):
        check_input_section(cfg)


def test_missing_sections_rejected():
    with pytest.raises(SchemaError, match="input"):
        check_conf({"pipeline": dict(BASIC_PIPELINE)})
    with pytest.raises(SchemaError, match="pipeline"):
        check_conf({"input": dict(BASIC_INPUT)})


def test_nonexistent_image_path_rejected():
    cfg = {
        "input": {
            "left": {"img": f"{REF}/left_fake.png", "disp": [-60, 0]},
            "right": {"img": f"{REF}/right.png"},
        },
        "pipeline": dict(BASIC_PIPELINE),
    }
    with pytest.raises(SchemaError, match="file not found"):
        check_conf(cfg)


# ---------------------------------------------------------------------------
# pipeline sequencing errors (test_config.py:615-637,
# test_pandora_machine.py transition coverage)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "pipeline",
    [
        {  # filter before disparity (the reference's canonical error)
            "matching_cost": {"matching_cost_method": "census", "window_size": 5, "subpix": 2},
            "filter": {"filter_method": "median"},
            "disparity": {"disparity_method": "wta", "invalid_disparity": -9999},
            "validation": {"validation_method": "cross_checking_accurate"},
        },
        {  # refinement without disparity
            "matching_cost": {"matching_cost_method": "census"},
            "refinement": {"refinement_method": "vfit"},
        },
        {  # disparity first
            "disparity": {"disparity_method": "wta"},
            "matching_cost": {"matching_cost_method": "census"},
        },
        {  # aggregation after disparity
            "matching_cost": {"matching_cost_method": "census"},
            "disparity": {"disparity_method": "wta"},
            "aggregation": {"aggregation_method": "cbca"},
        },
        {  # multiscale must be last
            "matching_cost": {"matching_cost_method": "census"},
            "multiscale": {"multiscale_method": "fixed_zoom_pyramid"},
            "disparity": {"disparity_method": "wta"},
        },
    ],
    ids=["filter-before-disparity", "refinement-no-disparity", "disparity-first",
         "aggregation-after-disparity", "multiscale-not-last"],
)
def test_invalid_sequencing_rejected(pipeline):
    with pytest.raises(MachineError):
        Pipeline(pipeline)


def test_unknown_method_rejected_with_available_list():
    with pytest.raises(KeyError, match="available"):
        Pipeline({"matching_cost": {"matching_cost_method": "tornado"}})


def test_step_parameter_rejected():
    """step != 1 is reserved for Pandora2D (test_config.py:771-790 exits)."""
    with pytest.raises(SchemaError):
        Pipeline(
            {
                "matching_cost": {"matching_cost_method": "zncc", "window_size": 5,
                                  "subpix": 2, "step": 2},
                "disparity": {"disparity_method": "wta"},
            }
        )


# ---------------------------------------------------------------------------
# multiband band validation through full check_conf (test_config.py:202-313)
# ---------------------------------------------------------------------------


def _rgb_cfg(band=None, extra_mc=None):
    mc = {"matching_cost_method": "zncc", "window_size": 5, "subpix": 2}
    if band is not None:
        mc["band"] = band
    mc.update(extra_mc or {})
    return {
        "input": {
            "left": {"img": f"{REF}/left_rgb.tif", "disp": [-60, 0]},
            "right": {"img": f"{REF}/right_rgb.tif"},
        },
        "pipeline": {
            "matching_cost": mc,
            "disparity": {"disparity_method": "wta", "invalid_disparity": -9999},
        },
    }


def test_multiband_pipeline_nominal():
    cfg, pipe = check_conf(_rgb_cfg(band="red"))
    assert cfg["pipeline"]["matching_cost"]["band"] == "red"
    assert cfg["input"]["left"]["nodata"] == -9999  # defaults folded in
    assert cfg["input"]["right"]["disp"] is None
    assert isinstance(pipe, Pipeline)


def test_multiband_wrong_band_rejected():
    with pytest.raises(Exception, match="nir"):
        check_conf(_rgb_cfg(band="nir"))


def test_multiband_missing_band_rejected():
    with pytest.raises(Exception, match="[Bb]and"):
        check_conf(_rgb_cfg(band=None))


# ---------------------------------------------------------------------------
# check_conf nominal: defaults folded in (test_config.py:439-614)
# ---------------------------------------------------------------------------


def test_check_conf_nominal_defaults():
    cfg, pipe = check_conf({"input": dict(BASIC_INPUT), "pipeline": dict(BASIC_PIPELINE)})
    left = cfg["input"]["left"]
    assert left["nodata"] == -9999
    assert left["mask"] is None and left["classif"] is None and left["segm"] is None
    mc = cfg["pipeline"]["matching_cost"]
    assert mc["window_size"] == 5 and mc["subpix"] == 1 and mc["step"] == 1
    assert cfg["pipeline"]["disparity"]["invalid_disparity"] == -9999


def test_check_conf_left_right_grids():
    cfg, _ = check_conf(
        {
            "input": {
                "left": {"img": f"{REF}/left.png", "disp": f"{REF}/left_disparity_grid.tif"},
                "right": {"img": f"{REF}/right.png", "disp": f"{REF}/right_disparity_grid.tif"},
            },
            "pipeline": dict(BASIC_PIPELINE),
        }
    )
    assert cfg["input"]["left"]["disp"].endswith("left_disparity_grid.tif")


def test_grid_disparity_with_multiscale_rejected():
    """Grid disparities cannot drive multiscale (the reference exits,
    test_config.py:771-790-adjacent machine check)."""
    cfg = {
        "input": {
            "left": {"img": f"{REF}/left.png", "disp": f"{REF}/left_disparity_grid.tif"},
            "right": {"img": f"{REF}/right.png"},
        },
        "pipeline": {
            **BASIC_PIPELINE,
            "multiscale": {"multiscale_method": "fixed_zoom_pyramid", "num_scales": 2,
                           "scale_factor": 2, "marge": 1},
        },
    }
    with pytest.raises(Exception, match="[Mm]ultiscale|grid"):
        check_conf(cfg)


# ---------------------------------------------------------------------------
# memory consumption model (test_config.py:639-770)
# ---------------------------------------------------------------------------


def _expected_bounds(cv_size, m, n):
    peak = m * cv_size + n
    return 0.9 * peak, 1.1 * peak


def test_memory_consumption_estimation_basic():
    """wta is the most consuming step of the basic pipeline (coefficients
    from check_configuration.py:657-671)."""
    lo, hi = memory_consumption_estimation(
        {"pipeline": dict(BASIC_PIPELINE)}, (375, 450), -60, 0
    )
    exp_lo, exp_hi = _expected_bounds(450 * 375 * 61, 8.68e-06, 243)
    np.testing.assert_allclose((lo, hi), (exp_lo, exp_hi), rtol=1e-2)


def test_memory_consumption_estimation_grid_range():
    """Grid disparities use the extremal range (the reference's 75-disp
    left_disparity_grid case)."""
    lo, hi = memory_consumption_estimation(
        {"pipeline": dict(BASIC_PIPELINE)}, (375, 450), -74, 0
    )
    exp_lo, exp_hi = _expected_bounds(450 * 375 * 75, 8.68e-06, 243)
    np.testing.assert_allclose((lo, hi), (exp_lo, exp_hi), rtol=1e-2)


def test_memory_consumption_sgm_dominates():
    pipe = {
        "pipeline": {
            **BASIC_PIPELINE,
            "optimization": {"optimization_method": "sgm"},
        }
    }
    lo, hi = memory_consumption_estimation(pipe, (375, 450), -60, 0)
    exp_lo, exp_hi = _expected_bounds(450 * 375 * 61, 1.26e-05, 237)
    np.testing.assert_allclose((lo, hi), (exp_lo, exp_hi), rtol=1e-2)


def test_memory_consumption_none_for_unknown_steps():
    assert memory_consumption_estimation(
        {"pipeline": {"refinement": {"refinement_method": "vfit"}}}, (10, 10), -3, 0
    ) is None
