"""Entry-point plugin loading (reference: the ``pandora.plugin`` group,
src/pandora/__init__.py:141-148 — the mechanism by which plugin_libsgm /
plugin_mccnn / plugin_arnn attach to the reference).

pandora_tpu absorbed those three capabilities natively, but third-party
packages still need a discovery hook: ``pandora_tpu.import_plugin()`` loads
every ``pandora_tpu.plugin`` entry point, whose module registers new Steps.

The test installs a dummy distribution on sys.path (a real
``.dist-info/entry_points.txt`` that importlib.metadata discovers — no
mocking of the loader itself) and runs its filter from a pipeline config.
"""

import sys
import textwrap

import numpy as np
import pytest

import pandora_tpu
from pandora_tpu.steps.base import STEP_FAMILIES


@pytest.fixture
def dummy_plugin_dist(tmp_path):
    """A minimal installed distribution exposing a pandora_tpu.plugin
    entry point whose module registers filter method 'plugin_offset'."""
    (tmp_path / "dummy_tpu_plug.py").write_text(
        textwrap.dedent(
            """
            import jax.numpy as jnp
            from pandora_tpu.steps.base import Step


            @Step.register("filter", "plugin_offset")
            class PluginOffsetFilter(Step):
                cumulative_margins = False

                def check_conf(self, **cfg):
                    return {
                        "filter_method": "plugin_offset",
                        "offset": float(cfg.get("offset", 1.0)),
                    }

                def run(self, state):
                    dm = state.left_disparity
                    dm.disparity_map = dm.disparity_map + jnp.float32(
                        self.cfg["offset"]
                    )
            """
        )
    )
    dist_info = tmp_path / "dummy_tpu_plug-0.1.dist-info"
    dist_info.mkdir()
    (dist_info / "METADATA").write_text(
        "Metadata-Version: 2.1\nName: dummy-tpu-plug\nVersion: 0.1\n"
    )
    (dist_info / "entry_points.txt").write_text(
        "[pandora_tpu.plugin]\ndummy = dummy_tpu_plug\n"
    )
    (dist_info / "RECORD").write_text("")
    sys.path.insert(0, str(tmp_path))
    try:
        yield tmp_path
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("dummy_tpu_plug", None)
        STEP_FAMILIES.get("filter", {}).pop("plugin_offset", None)


def test_import_plugin_registers_step(dummy_plugin_dist):
    assert "plugin_offset" not in STEP_FAMILIES.get("filter", {})
    pandora_tpu.import_plugin()
    assert "plugin_offset" in STEP_FAMILIES["filter"]


def test_plugin_step_runs_from_pipeline_config(dummy_plugin_dist):
    import jax.numpy as jnp

    from pandora_tpu.datamodel import Image
    from pandora_tpu.pipeline import Pipeline
    from pandora_tpu.steps.base import PipelineState

    pandora_tpu.import_plugin()
    pipe = Pipeline(
        {
            "matching_cost": {
                "matching_cost_method": "sad",
                "window_size": 3,
                "subpix": 1,
            },
            "disparity": {"disparity_method": "wta", "invalid_disparity": -9999},
            "filter": {"filter_method": "plugin_offset", "offset": 2.5},
        }
    )
    rng = np.random.default_rng(0)
    im = (rng.random((16, 24), np.float32) * 255).astype(np.float32)
    limg = Image(
        im=jnp.asarray(im)[None],
        disp_min=jnp.full(im.shape, -3.0),
        disp_max=jnp.full(im.shape, 3.0),
    )
    rimg = Image(im=jnp.asarray(np.roll(im, 1, axis=1))[None])
    state = PipelineState(left_img=limg, right_img=rimg)

    # same pipeline without the plugin filter: the offset must be the
    # only difference on valid pixels
    pipe_nofilter = Pipeline(
        {
            "matching_cost": {
                "matching_cost_method": "sad",
                "window_size": 3,
                "subpix": 1,
            },
            "disparity": {"disparity_method": "wta", "invalid_disparity": -9999},
        }
    )
    state0 = PipelineState(left_img=limg, right_img=rimg)
    pipe_nofilter.run(state0)
    pipe.run(state)
    base = np.asarray(state0.left_disparity.disparity_map)
    got = np.asarray(state.left_disparity.disparity_map)
    np.testing.assert_allclose(got, base + 2.5, rtol=0, atol=1e-6)


def test_import_plugin_no_plugins_is_noop():
    before = {f: dict(m) for f, m in STEP_FAMILIES.items()}
    pandora_tpu.import_plugin()
    after = {f: dict(m) for f, m in STEP_FAMILIES.items()}
    assert before == after
