"""Pallas SGM kernel (interpret mode) vs the lax.scan implementation."""

import numpy as np
import jax.numpy as jnp

from pandora_tpu.ops.sgm import sgm_aggregate, penalty_planes
from pandora_tpu.ops.sgm_pallas import sgm_aggregate_pallas

RNG = np.random.default_rng(11)


def test_pallas_matches_lax_constant():
    cost = (RNG.random((9, 11, 6)) * 10).astype(np.float32)
    p1p = jnp.full((8, 1, 1), 1.5)
    p2p = jnp.full((8, 1, 1), 4.0)
    want, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p)
    got = sgm_aggregate_pallas(jnp.asarray(cost), 1.5, 4.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)


def test_pallas_matches_lax_perpixel_p2():
    cost = (RNG.random((7, 9, 5)) * 10).astype(np.float32)
    img = (RNG.random((7, 9)) * 50).astype(np.float32)
    p1p, p2p, _ = penalty_planes(
        jnp.asarray(img), "inverseGradient", 2.0, 8.0, 10.0, 1.0, 3.0
    )
    want, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p)
    got = sgm_aggregate_pallas(
        jnp.asarray(cost), 2.0, 0.0, p2_planes=p2p, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)


def test_pallas_matches_lax_unaligned_multiblock():
    """Shapes that straddle several 8-blocks with ragged padding."""
    cost = (RNG.random((19, 27, 7)) * 10).astype(np.float32)
    p1p = jnp.full((8, 1, 1), 2.0)
    p2p = jnp.full((8, 1, 1), 9.0)
    want, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p)
    got = sgm_aggregate_pallas(jnp.asarray(cost), 2.0, 9.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)

    img = (RNG.random((19, 27)) * 50).astype(np.float32)
    p1g, p2g, _ = penalty_planes(
        jnp.asarray(img), "negativeGradient", 2.0, 9.0, 0.1, 1.0, 6.0
    )
    want2, _ = sgm_aggregate(jnp.asarray(cost), p1g, p2g)
    got2 = sgm_aggregate_pallas(jnp.asarray(cost), 2.0, 0.0, p2_planes=p2g, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-5, atol=1e-4)
