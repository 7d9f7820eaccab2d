"""Pipeline sequencing, config validation, margins and functional E2E gates
(reference test_pandora_machine.py / test_config.py / functional tests)."""

import json
import os

import numpy as np
import pytest

import pandora_tpu
from pandora_tpu.pipeline import MachineError, Pipeline
from pandora_tpu.config import check_conf, memory_consumption_estimation
from pandora_tpu.utils.schema import SchemaError

from conftest import error_rate


def test_valid_sequencing():
    p = Pipeline(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5, "subpix": 1},
            "disparity": {"disparity_method": "wta"},
            "refinement": {"refinement_method": "vfit"},
        }
    )
    assert [k for k, _ in p.steps] == ["matching_cost", "disparity", "refinement"]


def test_invalid_sequencing_raises():
    with pytest.raises(MachineError):
        Pipeline({"disparity": {"disparity_method": "wta"}})
    with pytest.raises(MachineError):
        Pipeline(
            {
                "matching_cost": {"matching_cost_method": "census"},
                "refinement": {"refinement_method": "vfit"},
            }
        )


def test_unknown_method_raises():
    with pytest.raises(KeyError):
        Pipeline({"matching_cost": {"matching_cost_method": "nope"}})


def test_census_window_schema():
    with pytest.raises(SchemaError):
        Pipeline({"matching_cost": {"matching_cost_method": "census", "window_size": 15}})


def test_defaults_folded():
    p = Pipeline({"matching_cost": {"matching_cost_method": "census"}, "disparity": {"disparity_method": "wta"}})
    cfg = p.validated_cfg
    assert cfg["matching_cost"]["window_size"] == 5
    assert cfg["matching_cost"]["subpix"] == 1
    assert cfg["disparity"]["invalid_disparity"] == -9999


def test_margins_accumulate():
    p = Pipeline(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            "disparity": {"disparity_method": "wta"},
            "refinement": {"refinement_method": "vfit"},
        }
    )
    g = p.margins.global_margins
    assert g.astuple == (3, 3, 3, 3)  # half window 2 + refinement 1


def test_check_conf_input_coherence():
    cfg = {
        "input": {
            "left": {"img": "x.png", "disp": [2, -2]},
            "right": {"img": "y.png"},
        },
        "pipeline": {"matching_cost": {"matching_cost_method": "census"}, "disparity": {"disparity_method": "wta"}},
    }
    with pytest.raises(SchemaError):
        check_conf(cfg)


def test_memory_estimation():
    pipe = {"matching_cost": {"matching_cost_method": "census"}, "disparity": {"disparity_method": "wta"}}
    lo, hi = memory_consumption_estimation({"pipeline": pipe}, (375, 450), -60, 0)
    cv_size = 375 * 450 * 61
    expected = 8.68e-06 * cv_size + 243
    assert abs(hi / 1.1 - expected) < 1e-6


# ---------------- functional gates on the cones pair ----------------------


def _run_pipeline(pipeline_cfg):
    cfg = {
        "input": {
            "left": {"img": "/root/reference/tests/pandora/left.png", "disp": [-60, 0]},
            "right": {"img": "/root/reference/tests/pandora/right.png"},
        },
        "pipeline": pipeline_cfg,
    }
    validated, pipeline = check_conf(cfg)
    left, right = pandora_tpu.images_from_config(validated["input"])
    ld, rd, state = pandora_tpu.run(pipeline, left, right)
    return ld, rd, state


@pytest.mark.functional
def test_census_wta_cones(cones):
    ld, rd, _ = _run_pipeline(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5, "subpix": 1},
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
            "refinement": {"refinement_method": "vfit"},
        }
    )
    err = error_rate(np.asarray(ld.disparity_map), cones["gt_left"], 1)
    assert err <= 0.45  # raw local WTA (no SGM/filter) quality floor
    assert rd is None


@pytest.mark.functional
def test_census_sgm_cones_reference_gate(cones):
    """The reference's headline accuracy gate (functional_tests/
    test_basic.py:159, test_pandora.py:137-140): census 5x5 + SGM(8,32) +
    vfit + median + cross-checking must reach bad-1 <= 0.20 on both maps."""
    ld, rd, _ = _run_pipeline(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5, "subpix": 1},
            "optimization": {
                "optimization_method": "sgm",
                "penalty": {"penalty_method": "sgm_penalty", "P1": 8, "P2": 32, "p2_method": "constant"},
            },
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
            "refinement": {"refinement_method": "vfit"},
            "filter": {"filter_method": "median", "filter_size": 3},
            "validation": {"validation_method": "cross_checking_accurate", "cross_checking_threshold": 1},
            "filter.after": {"filter_method": "median", "filter_size": 3},
        }
    )
    assert error_rate(np.asarray(ld.disparity_map), cones["gt_left"], 1) <= 0.20
    assert error_rate(-np.asarray(rd.disparity_map), cones["gt_right"], 1) <= 0.20


@pytest.mark.functional
def test_cli_main_outputs(tmp_path, cones):
    cfg = {
        "input": {
            "left": {"img": "/root/reference/tests/pandora/left.png", "disp": [-60, 0]},
            "right": {"img": "/root/reference/tests/pandora/right.png"},
        },
        "pipeline": {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5, "subpix": 1},
            "disparity": {"disparity_method": "wta"},
        },
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    pandora_tpu.main(str(cfg_path), str(tmp_path))
    from pandora_tpu.io.raster import read_raster

    disp, *_ = read_raster(str(tmp_path / "left_disparity.tif"))
    assert disp.shape == (1, 375, 450)
    vmask, *_ = read_raster(str(tmp_path / "left_validity_mask.tif"))
    assert vmask.shape == (1, 375, 450)
    saved = json.loads((tmp_path / "cfg" / "config.json").read_text())
    assert "margins" in saved
    err = error_rate(disp[0], cones["gt_left"], 1)
    assert err <= 0.45


@pytest.mark.functional
def test_profiling_outputs(tmp_path, cones):
    """Opt-in profiler writes profiling/ artifacts and rows with device
    timing (reference test_profiling.py behavior, profiler.py:59-168)."""
    from pandora_tpu.profiler import Profiler

    cfg = {
        "input": {
            "left": {"img": "/root/reference/tests/pandora/left.png", "disp": [-60, 0]},
            "right": {"img": "/root/reference/tests/pandora/right.png"},
        },
        "pipeline": {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5, "subpix": 1},
            "disparity": {"disparity_method": "wta"},
            "filter": {"filter_method": "median", "filter_size": 3},
        },
        "profiling": True,
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    try:
        pandora_tpu.main(str(cfg_path), str(tmp_path))
        rows = Profiler.rows()
        names = {r["name"] for r in rows}
        assert {"matching_cost", "disparity", "filter"} <= names
        assert all(r["time"] >= 0 for r in rows)
        assert (tmp_path / "profiling" / "raw_data.json").exists()
        assert (tmp_path / "profiling" / "summary.csv").exists()
        assert (tmp_path / "profiling" / "call_tree.txt").exists()
        # self-contained icicle (reference plotly time_graph parity)
        html = (tmp_path / "profiling" / "time_graph.html").read_text()
        assert "<svg" in html and "matching_cost" in html
    finally:
        Profiler.reset()
    assert not Profiler.enabled


_SAMPLE_CONFIGS = [
    # (name, bad-1 gate): SGM pipelines match the reference functional gate
    # (test_pandora.py:137-140 <= 0.20, multiscale-class 0.25); the two
    # local block-matching configs are REGRESSION-pinned at their measured
    # repo values + 0.03 (0.1775 / 0.2375 measured 2026-08, round 5)
    ("a_local_block_matching.json", 0.21),
    ("a_local_block_matching_for_multiband_img.json", 0.27),
    ("a_semi_global_matching.json", 0.25),
    ("a_semi_global_matching_with_confidence.json", 0.25),
    ("a_semi_global_matching_with_mccnn_similarity_measure.json", 0.25),
]


@pytest.fixture(scope="session")
def sample_scene(tmp_path_factory):
    """Unzip the data_samples cones images next to copies of the five JSON
    configs, so each config runs UNCHANGED (its relative ./left.png paths
    resolve against the config directory, like the reference README flow)."""
    import glob
    import shutil
    import zipfile

    scene = tmp_path_factory.mktemp("data_samples")
    for z in ("cones.zip", "cones_rgb.zip"):
        with zipfile.ZipFile(f"/root/reference/data_samples/images/{z}") as zf:
            zf.extractall(scene)
    for p in glob.glob("/root/reference/data_samples/json_conf_files/*.json"):
        shutil.copy(p, scene)
    return scene


@pytest.mark.functional
@pytest.mark.parametrize("name,gate", _SAMPLE_CONFIGS, ids=[c[0] for c in _SAMPLE_CONFIGS])
def test_sample_configs_run_end_to_end(sample_scene, tmp_path, name, gate):
    """All five reference data_samples configs EXECUTE unchanged (SURVEY
    §5.6) and their left disparity passes the quality gate vs the cones
    ground truth."""
    from pandora_tpu.io.raster import read_raster

    out = tmp_path / "out"
    pandora_tpu.main(str(sample_scene / name), str(out), verbose=False)
    disp, *_ = read_raster(str(out / "left_disparity.tif"))
    gt, *_ = read_raster("/root/reference/tests/pandora/disp_left.tif")
    mask = gt[0] != 0
    bad1 = float((np.abs(disp[0][mask] + gt[0][mask]) > 1).sum() / disp[0].size)
    assert bad1 <= gate, f"{name}: bad-1 {bad1:.3f} > {gate}"
    # every config runs accurate cross-checking: the right products exist
    assert (out / "right_disparity.tif").exists()
    assert (out / "left_validity_mask.tif").exists()
    vm, *_ = read_raster(str(out / "left_validity_mask.tif"))
    assert vm.dtype.kind in "ui" or np.all(vm >= 0)
    saved = json.loads((out / "cfg" / "config.json").read_text())
    assert "margins" in saved and "pipeline" in saved


def test_multiband_band_names_from_gdal_metadata():
    """Band descriptions come from the GDAL_METADATA TIFF tag, so
    band="r" selection works like rasterio descriptions
    (img_tools.py:392-400)."""
    from pandora_tpu.io.raster import read_raster

    data, _, _, _, band_names = read_raster("/root/reference/tests/pandora/left_rgb.tif")
    assert data.shape[0] == 3
    assert band_names == ("red", "green", "blue")


@pytest.mark.functional
def test_confidence_band_names_roundtrip(tmp_path):
    """Confidence GeoTIFF carries indicator band descriptions
    (write_data_array band_names, common.py:70-99) and cfg/ holds
    command_line.txt (output_tree_design OTD)."""
    cfg = {
        "input": {
            "left": {"img": "/root/reference/tests/pandora/left.png", "disp": [-60, 0]},
            "right": {"img": "/root/reference/tests/pandora/right.png"},
        },
        "pipeline": {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            "cost_volume_confidence": {"confidence_method": "std_intensity"},
            "cost_volume_confidence.amb": {"confidence_method": "ambiguity"},
            "disparity": {"disparity_method": "wta"},
        },
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    pandora_tpu.main(str(cfg_path), str(tmp_path))
    from pandora_tpu.io.raster import read_raster

    conf, _, _, _, names = read_raster(str(tmp_path / "left_confidence_measure.tif"))
    assert conf.shape[0] == 2
    assert names == (
        "confidence_from_intensity_std",
        "confidence_from_ambiguity.amb",
    )
    assert (tmp_path / "cfg" / "command_line.txt").exists()


def test_check_datasets():
    """check_datasets coherence rules (check_configuration.py:145-167)."""
    import jax.numpy as jnp

    from pandora_tpu import check_datasets, make_image

    left = make_image(np.zeros((1, 6, 8), np.float32), disp=[-2, 2])
    right = make_image(np.zeros((1, 6, 8), np.float32))
    check_datasets(left, right)

    with pytest.raises(AttributeError, match="disparity"):
        check_datasets(right, left)
    bad = make_image(np.zeros((1, 6, 9), np.float32))
    with pytest.raises(AttributeError, match="same shape"):
        check_datasets(left, bad)
    badmask = make_image(
        np.zeros((1, 6, 8), np.float32), disp=[-2, 2], msk=np.zeros((5, 8), np.int16)
    )
    with pytest.raises(AttributeError, match="msk"):
        check_datasets(badmask, right)
