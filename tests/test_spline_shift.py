"""Golden tests: shift_subpix == scipy.ndimage.zoom for every spline
order the config allows (img_tools.shift_right_img, img_tools.py:713-752
— order = the sad/ssd ``spline_order``), for subpix 2 and 4."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from pandora_tpu.ops.shift import shift_subpix

RNG = np.random.default_rng(5)


def _reference_shifts(im, subpix, order):
    """Verbatim re-derivation of shift_right_img's zoom call."""
    ny, nx = im.shape
    out = [im]
    for ind in range(1, subpix):
        factor = (nx * subpix - (subpix - 1)) / float(nx)
        out.append(ndimage.zoom(im, (1, factor), order=order)[:, ind::subpix])
    return out


@pytest.mark.parametrize("subpix", [2, 4])
@pytest.mark.parametrize("order", [1, 2, 3, 4, 5])
def test_shift_matches_scipy_zoom(order, subpix):
    im = (RNG.random((13, 37)) * 255).astype(np.float32)
    got = shift_subpix(jnp.asarray(im), subpix, order)
    want = _reference_shifts(im.astype(np.float64), subpix, order)
    assert len(got) == len(want) == subpix
    for g, w in zip(got[1:], want[1:]):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-3)


def test_shift_linear_exact():
    """order=1 closed form == scipy zoom, tight tolerance."""
    im = (RNG.random((7, 21)) * 255).astype(np.float32)
    got = shift_subpix(jnp.asarray(im), 2, 1)[1]
    want = _reference_shifts(im.astype(np.float64), 2, 1)[1]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_spline_operator_is_exact_float64():
    """The extracted operator itself reproduces scipy to f64 precision
    (any test error above comes only from the f32 matmul)."""
    from pandora_tpu.ops.shift import _spline_shift_matrix

    im = RNG.random((3, 29))
    m = _spline_shift_matrix(29, 2, 1, 3).astype(np.float64)
    got = im @ m
    want = _reference_shifts(im, 2, 3)[1]
    np.testing.assert_allclose(got, want, atol=1e-5)
