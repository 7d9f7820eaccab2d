"""MC-CNN *fast* learned matching cost.

Re-implements the capability of the external pandora_plugin_mccnn
(docs/source/userguide/plugins/plugin_mccnn.rst:1-58: mc-cnn fast
architecture, fixed ``window_size=11``, ``subpix=1``) as a native JAX
network instead of a torch plugin:

* siamese feature extractor: ``n_layers`` (default 5, receptive field
  11x11) of 3x3 valid convolutions with 64 feature maps, ReLU between
  layers, L2-normalized output features (Zbontar & LeCun 2016, the
  "fast" variant scored by a dot product);
* the cost volume is ``-cosine_similarity`` so ``type_measure="min"``
  like every other cost in the framework; invalid positions (window
  falling off either image) are NaN exactly like census;
* weights load from an ``.npz`` checkpoint (``model_path``) holding
  ``conv{i}/kernel`` (3, 3, c_in, c_out) and ``conv{i}/bias`` arrays; a
  seeded He initialization is used when no checkpoint is given so the
  pipeline stays runnable (documented as untrained);
* ``mc_cnn_train_step`` provides the paper's hinge-loss training rule on
  (anchor, positive, negative) patch triples so checkpoints can be
  produced in-framework.

Convolutions run in NHWC/HWIO layout, feeding the TPU MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

N_FEATURES = 64
N_LAYERS = 5  # receptive field 2*n+1 = 11
WINDOW = 2 * N_LAYERS + 1


def init_params(seed: int = 0, n_layers: int = N_LAYERS, n_feat: int = N_FEATURES) -> Params:
    """He-normal initialization of the feature net."""
    rng = np.random.default_rng(seed)
    params: Params = {}
    c_in = 1
    for i in range(n_layers):
        fan_in = 3 * 3 * c_in
        params[f"conv{i}/kernel"] = jnp.asarray(
            rng.normal(0.0, np.sqrt(2.0 / fan_in), (3, 3, c_in, n_feat)).astype(np.float32)
        )
        params[f"conv{i}/bias"] = jnp.zeros((n_feat,), jnp.float32)
        c_in = n_feat
    return params


def load_params(path: str) -> Params:
    """Load a checkpoint written by ``save_params`` (npz of kernel/bias)."""
    with np.load(path) as data:
        return {k: jnp.asarray(data[k]) for k in data.files}


def save_params(path: str, params: Params) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def n_layers_of(params: Params) -> int:
    return sum(1 for k in params if k.endswith("/kernel"))


def features(params: Params, img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) image → (H-2n, W-2n, C) L2-normalized features."""
    x = img[None, :, :, None]  # NHWC
    n = n_layers_of(params)
    for i in range(n):
        x = jax.lax.conv_general_dilated(
            x,
            params[f"conv{i}/kernel"],
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = x + params[f"conv{i}/bias"]
        if i < n - 1:
            x = jax.nn.relu(x)
    x = x[0]
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(norm, 1e-12)


@partial(jax.jit, static_argnames=("dmin", "dmax"))
def mc_cnn_cost_volume(
    params: Params,
    left: jnp.ndarray,
    right: jnp.ndarray,
    dmin: int,
    dmax: int,
) -> jnp.ndarray:
    """(row, col, disp) cost volume: -cos-similarity of the 11x11 learned
    features; NaN where either window falls off an image (same validity
    footprint as census, census.cpp:132-172)."""
    h, w = left.shape
    n = n_layers_of(params)
    m = n  # margin = receptive radius
    # per-image zero-mean / unit-std normalization (Žbontar-2016 §3.3;
    # training patches in scripts/train_mc_cnn.py see the same transform).
    # Statistics are computed over real pixels only: the -9999 nodata fill
    # written by read_image_input (and NaN) would otherwise skew the whole
    # image's normalization and degrade the learned cost everywhere.
    def _norm(img):
        valid = jnp.isfinite(img) & (img != -9999.0)
        n_valid = jnp.maximum(jnp.sum(valid), 1)
        safe = jnp.where(valid, img, 0.0)
        mean = jnp.sum(safe) / n_valid
        var = jnp.sum(jnp.where(valid, jnp.square(img - mean), 0.0)) / n_valid
        return (img - mean) / (jnp.sqrt(var) + 1e-8)

    left = _norm(left)
    right = _norm(right)
    fl = features(params, left)  # (h', w', C)
    fr = features(params, right)
    hp, wp, c = fl.shape
    n_disp = dmax - dmin + 1

    # pad the right features along cols so col+d is a static slice per d
    fr_pad = jnp.pad(
        fr, ((0, 0), (max(0, -dmin), max(0, dmax)), (0, 0)), constant_values=jnp.nan
    )

    def one_disp(_, k):
        d = k + dmin
        start = d - dmin  # offset into fr_pad
        fr_d = jax.lax.dynamic_slice_in_dim(fr_pad, start, wp, axis=1)
        sim = jnp.sum(fl * fr_d, axis=-1)  # (h', w')
        return None, -sim

    _, sims = jax.lax.scan(one_disp, None, jnp.arange(n_disp))
    cv_inner = jnp.moveaxis(sims, 0, -1)  # (h', w', D)

    cv = jnp.full((h, w, n_disp), jnp.nan, jnp.float32)
    return jax.lax.dynamic_update_slice(cv, cv_inner.astype(jnp.float32), (m, m, 0))


def mc_cnn_hinge_loss(params: Params, anchor, positive, negative, margin: float = 0.2):
    """Žbontar-2016 fast-variant hinge loss on patch triples:
    max(0, margin + s(a, n) − s(a, p)) with s = feature dot product.

    anchor/positive/negative: (B, WINDOW, WINDOW) patches."""
    feat = jax.vmap(lambda p: features(params, p)[0, 0])
    fa, fp, fn_ = feat(anchor), feat(positive), feat(negative)
    s_pos = jnp.sum(fa * fp, axis=-1)
    s_neg = jnp.sum(fa * fn_, axis=-1)
    return jnp.mean(jnp.maximum(0.0, margin + s_neg - s_pos))


@jax.jit
def mc_cnn_train_step(params: Params, anchor, positive, negative, lr: float = 0.002):
    """One SGD step on the hinge loss; returns (params, loss)."""
    loss, grads = jax.value_and_grad(mc_cnn_hinge_loss)(params, anchor, positive, negative)
    new_params = {k: v - lr * grads[k] for k, v in params.items()}
    return new_params, loss
