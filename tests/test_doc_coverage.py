"""Documentation coverage: every configuration key accepted by every
registered pipeline step appears in docs/steps.md (the per-step
reference page), and every public API symbol in docs/api.md.

This is the enforcement half of round-5 VERDICT item #8 — the docs can't
silently drift from the schemas in pandora_tpu/steps/.
"""

import os

import pytest

import pandora_tpu  # noqa: F401  (registers all steps)
from pandora_tpu.steps.base import STEP_FAMILIES, make_step

DOCS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "docs")

# minimal VALID config per registered (family, method) — enough for
# check_conf to fold in every default key
MINIMAL = {
    ("matching_cost", "census"): {"matching_cost_method": "census"},
    ("matching_cost", "sad"): {"matching_cost_method": "sad"},
    ("matching_cost", "ssd"): {"matching_cost_method": "ssd"},
    ("matching_cost", "zncc"): {"matching_cost_method": "zncc"},
    ("matching_cost", "mc_cnn"): {"matching_cost_method": "mc_cnn"},
    ("aggregation", "cbca"): {"aggregation_method": "cbca"},
    ("semantic_segmentation", "ARNN"): {
        "segmentation_method": "ARNN",
        "RGB_bands": {"R": "r", "G": "g", "B": "b"},
        "vegetation_band": {"classes": []},
    },
    ("optimization", "sgm"): {"optimization_method": "sgm"},
    ("optimization", "3sgm"): {"optimization_method": "3sgm"},
    ("cost_volume_confidence", "ambiguity"): {"confidence_method": "ambiguity"},
    ("cost_volume_confidence", "risk"): {"confidence_method": "risk"},
    ("cost_volume_confidence", "interval_bounds"): {
        "confidence_method": "interval_bounds"
    },
    ("cost_volume_confidence", "std_intensity"): {
        "confidence_method": "std_intensity"
    },
    ("disparity", "wta"): {"disparity_method": "wta"},
    ("refinement", "vfit"): {"refinement_method": "vfit"},
    ("refinement", "quadratic"): {"refinement_method": "quadratic"},
    ("filter", "median"): {"filter_method": "median"},
    ("filter", "bilateral"): {"filter_method": "bilateral"},
    ("filter", "disparity_denoiser"): {"filter_method": "disparity_denoiser"},
    ("filter", "median_for_intervals"): {"filter_method": "median_for_intervals"},
    ("validation", "cross_checking_accurate"): {
        "validation_method": "cross_checking_accurate"
    },
    ("validation", "cross_checking_fast"): {
        "validation_method": "cross_checking_fast"
    },
    ("multiscale", "fixed_zoom_pyramid"): {
        "multiscale_method": "fixed_zoom_pyramid"
    },
}


def _all_registered():
    return sorted(
        (family, method)
        for family, methods in STEP_FAMILIES.items()
        for method in methods
    )


def test_every_registered_step_has_a_minimal_config():
    """MINIMAL must track the registry: a newly registered step without a
    minimal config (and therefore without doc coverage) fails here."""
    assert set(_all_registered()) == set(MINIMAL)


@pytest.fixture(scope="module")
def steps_md():
    with open(os.path.join(DOCS, "steps.md"), encoding="utf-8") as fh:
        return fh.read()


@pytest.mark.parametrize("family,method", sorted(MINIMAL), ids="-".join)
def test_step_config_keys_documented(family, method, steps_md):
    step = make_step(family, MINIMAL[(family, method)])
    assert f"### {method}" in steps_md or method in steps_md, method
    for key in step.cfg:
        assert f"`{key}`" in steps_md, (
            f"{family}.{method} config key {key!r} missing from docs/steps.md"
        )
        if key == "penalty":
            for pkey in step.cfg["penalty"]:
                assert f"`{pkey}`" in steps_md, (
                    f"penalty sub-key {pkey!r} missing from docs/steps.md"
                )


def test_api_reference_covers_public_surface():
    with open(os.path.join(DOCS, "api.md"), encoding="utf-8") as fh:
        api_md = fh.read()
    for symbol in (
        "main", "run", "check_conf", "read_config_file", "get_metadata",
        "images_from_config", "create_image_from_inputs", "check_datasets",
        "import_plugin", "Pipeline", "Image", "CostVolume", "DisparityMap",
        "make_image", "Margins", "stereo_pipeline", "make_jitted_pipeline",
        "make_mesh", "make_mesh2d", "tiled_stereo_pipeline",
        "exchange_tiled_stereo_pipeline", "tiled_modular_pipeline",
        "halo_width", "SceneRunner", "get_margins", "read_raster", "write_geotiff",
        "read_raster_header", "read_image_input", "get_window",
        "Profiler.enable_from_config", "generate_summary", "profile",
    ):
        assert symbol in api_md, f"{symbol} missing from docs/api.md"


def test_arnn_synthetic_training_caveat_documented(steps_md):
    assert "synthetic" in steps_md and "model_path" in steps_md
