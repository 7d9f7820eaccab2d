"""Census transform kernel tests."""

import numpy as np


def test_census_transform_pallas_matches_xla():
    """The one-pass Pallas census transform (interpret mode) packs bits
    identically to the XLA formulation, incl. multi-word windows."""
    import jax.numpy as jnp

    from pandora_tpu.ops.census import census_transform, census_transform_pallas

    rng = np.random.default_rng(7)
    im = jnp.asarray(rng.random((21, 37), np.float32) * 255)
    for win in (3, 5, 7):  # 7x7 = 49 bits = 2 words
        want = np.asarray(census_transform(im, win, win))
        got = np.asarray(census_transform_pallas(im, win, interpret=True))
        np.testing.assert_array_equal(got.astype(np.uint32), want)
