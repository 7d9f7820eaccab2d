"""End-to-end accuracy gates the reference pins but round 2 lacked:
grid-disparity full-pipeline (tests/pandora/left_disparity_grid.tif),
multiscale cones (test_pandora.py:613, bad-1 <= 0.25) and subpix 2/4 cones
(test_pandora.py census subpix variants, bad-1 <= 0.20 with SGM)."""

import numpy as np
import pytest

import pandora_tpu
from pandora_tpu.config import check_conf

from conftest import error_rate

BASE = "/root/reference/tests/pandora"

SGM_TAIL = {
    "optimization": {"optimization_method": "sgm"},
    "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
    "refinement": {"refinement_method": "vfit"},
    "filter": {"filter_method": "median", "filter_size": 3},
}


def _run(pipeline_cfg, disp=(-60, 0)):
    cfg = {
        "input": {
            "left": {"img": f"{BASE}/left.png", "disp": list(disp) if not isinstance(disp, str) else disp},
            "right": {"img": f"{BASE}/right.png"},
        },
        "pipeline": pipeline_cfg,
    }
    validated, pipeline = check_conf(cfg)
    left, right = pandora_tpu.images_from_config(validated["input"])
    return pandora_tpu.run(pipeline, left, right)


@pytest.mark.functional
def test_grid_disparity_end_to_end(cones):
    """Per-pixel disparity grids drive the whole pipeline: every computed
    disparity obeys its pixel's [dmin, dmax] interval and quality still
    beats the raw-WTA floor (reference grid rasters left_disparity_grid.tif,
    img_tools.add_disparity_grid + cv_masked per-pixel range pass)."""
    from pandora_tpu.io.raster import read_raster

    grid_path = f"{BASE}/left_disparity_grid.tif"
    # WTA-only: every winner sits exactly inside its pixel's interval
    ld, _, _ = _run(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
        },
        disp=grid_path,
    )
    d = np.asarray(ld.disparity_map)
    grid, *_ = read_raster(grid_path)
    ok = ~np.isnan(d)
    assert ok.any()
    assert (d[ok] >= grid[0][ok]).all() and (d[ok] <= grid[1][ok]).all()

    # full pipeline (SGM + vfit + median regularize ACROSS ranges, like the
    # reference plugin): quality gate only
    ld, _, _ = _run(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            **SGM_TAIL,
        },
        disp=grid_path,
    )
    assert error_rate(np.asarray(ld.disparity_map), cones["gt_left"], 1) <= 0.25


@pytest.mark.functional
def test_multiscale_cones_gate(cones):
    """Coarse-to-fine multiscale census+SGM reaches the reference's
    multiscale gate (test_pandora.py:613): bad-1 <= 0.25."""
    ld, _, _ = _run(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            **SGM_TAIL,
            "multiscale": {
                "multiscale_method": "fixed_zoom_pyramid",
                "num_scales": 2,
                "scale_factor": 2,
                "marge": 1,
            },
        }
    )
    assert error_rate(np.asarray(ld.disparity_map), cones["gt_left"], 1) <= 0.25


@pytest.mark.functional
@pytest.mark.parametrize("subpix", [2, 4])
def test_subpix_cones_gate(cones, subpix):
    """Subpixel-shifted right images (subpix 2/4) keep the headline census+
    SGM pipeline under the reference's 0.20 gate (test_pandora.py subpix
    variants; shift_right_img img_tools.py:713-752)."""
    ld, _, _ = _run(
        {
            "matching_cost": {
                "matching_cost_method": "census",
                "window_size": 5,
                "subpix": subpix,
            },
            **SGM_TAIL,
        }
    )
    assert error_rate(np.asarray(ld.disparity_map), cones["gt_left"], 1) <= 0.20


@pytest.mark.functional
def test_rgb_band_pipeline_gate(cones):
    """reference test_pandora.py:587-614 (test_main_with_rgb_image): the
    basic zncc pipeline on the RGB pair correlating the green band, bad-1
    <= 0.25 vs cones ground truth."""
    cfg = {
        "input": {
            "left": {"img": f"{BASE}/left_rgb.tif", "disp": [-60, 0], "nodata": "NaN"},
            "right": {"img": f"{BASE}/right_rgb.tif", "nodata": "NaN"},
        },
        "pipeline": {
            "matching_cost": {
                "matching_cost_method": "zncc",
                "window_size": 5,
                "subpix": 2,
                "band": "green",
            },
            "disparity": {"disparity_method": "wta", "invalid_disparity": -9999},
            "refinement": {"refinement_method": "vfit"},
            "filter": {"filter_method": "median", "filter_size": 3},
        },
    }
    validated, pipeline = check_conf(cfg)
    left, right = pandora_tpu.images_from_config(validated["input"])
    ld, _, _ = pandora_tpu.run(pipeline, left, right)
    d = np.where(np.asarray(ld.disparity_map) == -9999, np.nan, np.asarray(ld.disparity_map))
    assert error_rate(d, cones["gt_left"]) <= 0.25


@pytest.mark.functional
def test_rgb_band_mask_validation_gate(cones):
    """reference test_pandora.py:686-723 (validation with rgb + mask): the
    accurate cross-checking pipeline on the green band with the occlusion
    mask on the left image, bad-1 <= 0.25."""
    cfg = {
        "input": {
            "left": {
                "img": f"{BASE}/left_rgb.tif",
                "disp": [-60, 0],
                "nodata": "NaN",
                "mask": f"{BASE}/occlusion.png",
            },
            "right": {"img": f"{BASE}/right_rgb.tif", "disp": [0, 60], "nodata": "NaN"},
        },
        "pipeline": {
            "matching_cost": {
                "matching_cost_method": "zncc",
                "window_size": 5,
                "subpix": 2,
                "band": "green",
            },
            "cost_volume_confidence": {"confidence_method": "std_intensity"},
            "disparity": {"disparity_method": "wta", "invalid_disparity": -9999},
            "refinement": {"refinement_method": "vfit"},
            "filter": {"filter_method": "median", "filter_size": 3},
            "validation": {
                "validation_method": "cross_checking_accurate",
                "cross_checking_threshold": 1.0,
            },
        },
    }
    validated, pipeline = check_conf(cfg)
    left, right = pandora_tpu.images_from_config(validated["input"])
    ld, _, _ = pandora_tpu.run(pipeline, left, right)
    d = np.where(np.asarray(ld.disparity_map) == -9999, np.nan, np.asarray(ld.disparity_map))
    assert error_rate(d, cones["gt_left"]) <= 0.25


@pytest.mark.functional
def test_multiscale_with_confidence_and_validation_gate(cones):
    """reference test_pandora.py:396-441 (test_multiechelles_and_confidence):
    zncc subpix-2 + ambiguity + wta + vfit + median + accurate
    cross-checking under a 2-scale pyramid — left/right bad-1 <= 0.20 and
    the bit-8/9 occlusion detection within 0.16 of the ground-truth
    occlusion mask."""
    ld, rd, _ = _run(
        {
            "matching_cost": {"matching_cost_method": "zncc", "window_size": 5, "subpix": 2},
            "cost_volume_confidence": {"confidence_method": "ambiguity"},
            "disparity": {"disparity_method": "wta", "invalid_disparity": -9999},
            "refinement": {"refinement_method": "vfit"},
            "filter": {"filter_method": "median", "filter_size": 3},
            "validation": {"validation_method": "cross_checking_accurate"},
            "multiscale": {
                "multiscale_method": "fixed_zoom_pyramid",
                "num_scales": 2,
                "scale_factor": 2,
                "marge": 1,
            },
        }
    )
    assert error_rate(np.asarray(ld.disparity_map), cones["gt_left"], 1) <= 0.20
    assert rd is not None
    assert error_rate(-np.asarray(rd.disparity_map), cones["gt_right"], 1) <= 0.20
    # occlusion agreement: computed occluded = bits >= 512 (occlusion or
    # mismatch), gt occlusion.png is 0 at occluded pixels
    vm = np.asarray(ld.validity_mask)
    occ = np.ones(vm.shape)
    occ[vm >= 512] = 0
    gt_occ = (cones["occlusion"] > 0).astype(float)
    err_mask = float((occ != gt_occ).mean())
    assert err_mask <= 0.16, err_mask
