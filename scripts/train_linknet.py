"""Train the LinkNet building-segmentation network in-framework.

The reference consumes the pandora_plugin_arnn pretrained building
checkpoint (plugin_arnn.rst:1-80); here the same LinkNet architecture
(pandora_tpu/ops/linknet.py) is trained natively on TPU on **fully
synthetic aerial building scenes** and exported as the ``.npz``
checkpoint the ``semantic_segmentation`` step loads via ``model_path``
(bundled default: ``pandora_tpu/data/linknet.npz``).

Scene generator: a fractal ground texture, axis-aligned and rotated
rectangular "buildings" with brighter rooftops, roof texture, soft cast
shadows, and sensor noise; the target mask is the exact building
footprint — ground truth by construction, disjoint from any evaluation
imagery.

Usage:
    PYTHONPATH=. python scripts/train_linknet.py [steps] [out.npz]
"""

import os
import sys
import time

import numpy as np
from scipy.ndimage import gaussian_filter, rotate

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from pandora_tpu.ops import linknet

H = W = 128
BATCH = 8


def fractal_texture(rng, h, w, color_jitter=True):
    img = np.zeros((h, w), np.float32)
    for sigma, amp in ((0.0, 1.0), (2.0, 2.0), (6.0, 4.0), (16.0, 8.0)):
        nz = rng.standard_normal((h, w)).astype(np.float32)
        if sigma:
            nz = gaussian_filter(nz, sigma) * (1.0 + sigma)
        img += amp * nz
    lo, hi = img.min(), img.max()
    base = (img - lo) / (hi - lo + 1e-6)
    rgb = np.stack([base] * 3)
    if color_jitter:
        tint = rng.uniform(0.6, 1.4, (3, 1, 1)).astype(np.float32)
        rgb = np.clip(rgb * tint, 0, 1)
    return rgb


def make_scene(rng):
    """(3, H, W) uint8-range image + (H, W) 0/1 building mask."""
    rgb = fractal_texture(rng, H, W) * rng.uniform(60, 140)
    mask = np.zeros((H, W), np.float32)
    for _ in range(rng.integers(1, 6)):
        bh, bw = rng.integers(12, 48, 2)
        r0 = rng.integers(0, H - bh)
        c0 = rng.integers(0, W - bw)
        footprint = np.zeros((H, W), np.float32)
        footprint[r0 : r0 + bh, c0 : c0 + bw] = 1.0
        angle = float(rng.uniform(-30, 30)) if rng.random() < 0.5 else 0.0
        if angle:
            footprint = (rotate(footprint, angle, reshape=False, order=0) > 0.5).astype(
                np.float32
            )
        roof = fractal_texture(rng, H, W) * rng.uniform(150, 240)
        # soft shadow offset to the lower-right of the footprint
        shadow = np.roll(footprint, (rng.integers(2, 6), rng.integers(2, 6)), (0, 1))
        shadow = gaussian_filter(shadow, 1.5) * (1 - footprint)
        rgb = rgb * (1 - footprint[None]) + roof * footprint[None]
        rgb = rgb * (1 - 0.5 * shadow[None])
        mask = np.maximum(mask, footprint)
    rgb += rng.normal(0, 3.0, rgb.shape)
    return np.clip(rgb, 0, 255).astype(np.float32), mask


@jax.jit
def batched_step(params, rgbs, targets, lr):
    def loss_fn(p):
        losses = jax.vmap(lambda im, t: linknet.bce_loss(p, im, t))(rgbs, targets)
        return jnp.mean(losses)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return {k: v - lr * grads[k] for k, v in params.items()}, loss


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "pandora_tpu", "data", "linknet.npz"
        )
    )
    rng = np.random.default_rng(0)
    params = linknet.init_params(seed=0)
    t0 = time.time()
    for step in range(steps):
        ims, masks = zip(*(make_scene(rng) for _ in range(BATCH)))
        rgbs = jnp.asarray(np.stack(ims))
        targets = jnp.asarray(np.stack(masks))
        lr = 3e-3 if step < steps // 2 else 1e-3
        params, loss = batched_step(params, rgbs, targets, jnp.float32(lr))
        if step % 25 == 0 or step == steps - 1:
            print(f"step {step:5d}  loss {float(loss):.4f}  {time.time()-t0:.0f}s", flush=True)
    linknet.save_params(out, params)
    print("saved", out)

    # quick self-check: IoU on fresh scenes
    ious = []
    for _ in range(8):
        im, mask = make_scene(rng)
        pred = np.asarray(linknet.segment(params, jnp.asarray(im))) > 0.5
        inter = (pred & (mask > 0.5)).sum()
        union = (pred | (mask > 0.5)).sum()
        ious.append(inter / max(union, 1))
    print("held-out IoU:", round(float(np.mean(ious)), 3))


if __name__ == "__main__":
    main()
