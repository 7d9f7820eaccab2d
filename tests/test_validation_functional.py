"""CLI-level validation functional tests ported from the reference's
``tests/functional_tests/test_validation.py`` (round-5 VERDICT #3):
cross_checking_fast must produce STRICTLY the same left disparity as
cross_checking_accurate through the whole `main` flow, fast mode must not
emit right products, and the interval-regularized double-confidence
pipeline must run with validation configured.
"""

import json
import os

import numpy as np
import pytest

import pandora_tpu
from pandora_tpu.io.raster import read_raster

REF = "/root/reference/tests/pandora"


def _cfg(method, validation):
    return {
        "input": {
            "left": {"img": f"{REF}/left.png", "disp": [-60, 0]},
            "right": {"img": f"{REF}/right.png"},
        },
        "pipeline": {
            "matching_cost": {"matching_cost_method": method},
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
            "validation": {"validation_method": validation},
        },
    }


@pytest.mark.functional
@pytest.mark.parametrize("method", ["census", "zncc"])
def test_validation_fast_equals_accurate_through_main(tmp_path, method):
    """reference functional test_validation_fast (:155-193): run the full
    config-file flow twice; left disparities must be strictly equal."""
    outs = {}
    for validation in ("cross_checking_fast", "cross_checking_accurate"):
        cfg_path = tmp_path / f"cfg_{validation}.json"
        cfg_path.write_text(json.dumps(_cfg(method, validation)))
        out = tmp_path / f"out_{validation}"
        pandora_tpu.main(str(cfg_path), str(out), verbose=False)
        disp, *_ = read_raster(str(out / "left_disparity.tif"))
        outs[validation] = (np.asarray(disp[0]), out)

    fast, out_fast = outs["cross_checking_fast"]
    accurate, out_accurate = outs["cross_checking_accurate"]
    np.testing.assert_array_equal(
        np.nan_to_num(fast, nan=-9999.0), np.nan_to_num(accurate, nan=-9999.0)
    )
    # fast mode wipes the derived right products (state_machine parity);
    # accurate writes them
    assert not os.path.exists(out_fast / "right_disparity.tif")
    assert os.path.exists(out_accurate / "right_disparity.tif")


@pytest.mark.functional
def test_validation_fast_with_interval_regularization_pipeline(tmp_path):
    """reference functional test_validation_fast_right_output (:195-255):
    the double-confidence + median_for_intervals(regularization) + fast
    validation pipeline runs end-to-end and emits no right products."""
    cfg = {
        "input": {
            "left": {"img": f"{REF}/left.png", "disp": [-60, 0]},
            "right": {"img": f"{REF}/right.png"},
        },
        "pipeline": {
            "matching_cost": {"matching_cost_method": "census"},
            "cost_volume_confidence.amb": {
                "confidence_method": "ambiguity", "eta_max": 0.7, "eta_step": 0.01,
            },
            "cost_volume_confidence.int": {
                "confidence_method": "interval_bounds", "regularization": False,
            },
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
            "filter": {"filter_method": "median"},
            "filter.int": {
                "filter_method": "median_for_intervals",
                "interval_indicator": "int",
                "regularization": True,
                "ambiguity_indicator": "amb",
            },
            "validation": {"validation_method": "cross_checking_fast"},
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "out"
    pandora_tpu.main(str(cfg_path), str(out), verbose=False)
    assert os.path.exists(out / "left_disparity.tif")
    assert os.path.exists(out / "left_confidence_measure.tif")
    assert not os.path.exists(out / "right_disparity.tif")
    conf, *_, names = read_raster(str(out / "left_confidence_measure.tif"))
    assert any("amb" in (n or "") for n in (names or ()))
