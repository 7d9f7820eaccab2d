"""LinkNet building-segmentation network in native JAX.

Capability of the external pandora_plugin_arnn (plugin_arnn.rst:9-40):
a LinkNet [Chaurasia-2017] over the RGB bands produces a building mask
that feeds 3SGM piecewise optimization.  The plugin's torch model becomes
a pure-JAX parameter pytree: ResNet18-style encoder (4 stages of 2
residual units) and the LinkNet decoder (1x1 reduce → 3x3 stride-2
transposed conv → 1x1 expand) with skip additions, sigmoid head.

Weights load from an ``.npz`` checkpoint (``model_path``); a seeded He
initialization keeps the pipeline runnable untrained (warned).  The
automatic-annotation refinement loop of the plugin (DISCA interactive
learning) is exposed as a training hook rather than re-run per scene.

All convs run NHWC on the MXU; BatchNorm is folded into conv scale/bias
(inference form), matching how deployed checkpoints are exported.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

STAGES = (64, 128, 256, 512)


def _conv(x, k, b, stride=1, transpose=False):
    if transpose:
        y = jax.lax.conv_transpose(
            x, k, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    else:
        y = jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    return y + b


def _he(rng, shape):
    fan_in = int(np.prod(shape[:-1]))
    return rng.normal(0.0, np.sqrt(2.0 / fan_in), shape).astype(np.float32)


def init_params(seed: int = 0, in_ch: int = 3) -> Params:
    rng = np.random.default_rng(seed)
    p: Params = {}

    def add(name, shape):
        p[f"{name}/kernel"] = jnp.asarray(_he(rng, shape))
        p[f"{name}/bias"] = jnp.zeros((shape[-1],), jnp.float32)

    add("stem", (7, 7, in_ch, STAGES[0]))
    c_in = STAGES[0]
    for s, c_out in enumerate(STAGES):
        for u in range(2):
            cin = c_in if u == 0 else c_out
            add(f"enc{s}/u{u}/conv1", (3, 3, cin, c_out))
            add(f"enc{s}/u{u}/conv2", (3, 3, c_out, c_out))
            if u == 0 and cin != c_out:
                add(f"enc{s}/u{u}/proj", (1, 1, cin, c_out))
        c_in = c_out
    for s in range(len(STAGES) - 1, -1, -1):
        c_out = STAGES[s - 1] if s > 0 else STAGES[0]
        c_mid = STAGES[s] // 4
        add(f"dec{s}/reduce", (1, 1, STAGES[s], c_mid))
        add(f"dec{s}/deconv", (3, 3, c_mid, c_mid))
        add(f"dec{s}/expand", (1, 1, c_mid, c_out))
    add("head1", (3, 3, STAGES[0], 32))
    add("head2", (3, 3, 32, 1))
    return p


def load_params(path: str) -> Params:
    """Checkpoints may be stored float16 (half the bundle size); compute
    always runs float32."""
    with np.load(path) as data:
        return {k: jnp.asarray(data[k], jnp.float32) for k in data.files}


def save_params(path: str, params: Params) -> None:
    """Compressed float16 storage — lossless for inference quality at
    these magnitudes, half the disk footprint of f32."""
    np.savez_compressed(
        path, **{k: np.asarray(v).astype(np.float16) for k, v in params.items()}
    )


def _unit(p, name, x, stride):
    y = jax.nn.relu(_conv(x, p[f"{name}/conv1/kernel"], p[f"{name}/conv1/bias"], stride))
    y = _conv(y, p[f"{name}/conv2/kernel"], p[f"{name}/conv2/bias"])
    if f"{name}/proj/kernel" in p:
        x = _conv(x, p[f"{name}/proj/kernel"], p[f"{name}/proj/bias"], stride)
    elif stride != 1:
        x = x[:, ::stride, ::stride]
    return jax.nn.relu(x + y)


def segment(params: Params, rgb: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) RGB → (H, W) building probability in [0, 1]."""
    _, h, w = rgb.shape
    # pad to a multiple of 32 (stem /2, 4 stages with /2 each except stage 0)
    hp = -(-h // 32) * 32
    wp = -(-w // 32) * 32
    x = jnp.moveaxis(rgb, 0, -1)[None]  # NHWC
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    x = x / 255.0

    p = params
    x = jax.nn.relu(_conv(x, p["stem/kernel"], p["stem/bias"], stride=2))
    skips = []
    for s in range(len(STAGES)):
        stride = 1 if s == 0 else 2
        x = _unit(p, f"enc{s}/u0", x, stride)
        x = _unit(p, f"enc{s}/u1", x, 1)
        skips.append(x)
    for s in range(len(STAGES) - 1, -1, -1):
        y = jax.nn.relu(_conv(x, p[f"dec{s}/reduce/kernel"], p[f"dec{s}/reduce/bias"]))
        if s > 0:
            y = jax.nn.relu(
                _conv(y, p[f"dec{s}/deconv/kernel"], p[f"dec{s}/deconv/bias"], 2, transpose=True)
            )
        else:
            y = jax.nn.relu(_conv(y, p[f"dec{s}/deconv/kernel"], p[f"dec{s}/deconv/bias"]))
        y = jax.nn.relu(_conv(y, p[f"dec{s}/expand/kernel"], p[f"dec{s}/expand/bias"]))
        x = y + skips[s - 1] if s > 0 else y
    # undo the stem stride
    x = jax.image.resize(x, (1, hp, wp, x.shape[-1]), "bilinear")
    x = jax.nn.relu(_conv(x, p["head1/kernel"], p["head1/bias"]))
    x = _conv(x, p["head2/kernel"], p["head2/bias"])
    return jax.nn.sigmoid(x[0, :h, :w, 0])


def bce_loss(params: Params, rgb: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on a (3, H, W) image vs (H, W) 0/1 target — the
    refinement hook used to fine-tune on automatic annotations."""
    pred = segment(params, rgb)
    eps = 1e-7
    return -jnp.mean(
        target * jnp.log(pred + eps) + (1.0 - target) * jnp.log(1.0 - pred + eps)
    )


@jax.jit
def train_step(params: Params, rgb, target, lr: float = 1e-3):
    loss, grads = jax.value_and_grad(bce_loss)(params, rgb, target)
    return {k: v - lr * grads[k] for k, v in params.items()}, loss
