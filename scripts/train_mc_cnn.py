"""Train the MC-CNN *fast* matching-cost network in-framework.

The reference consumes externally trained torch checkpoints
(pandora_plugin_mccnn, plugin_mccnn.rst:42-58); here the same
hinge-loss-on-triplets training rule (Žbontar & LeCun 2016) runs natively
on TPU and produces the ``.npz`` checkpoint the ``mc_cnn`` matching-cost
step loads via ``model_path`` (bundled default:
``pandora_tpu/data/mc_cnn_fast.npz``).

Triples are sampled from a ground-truthed stereo pair: anchor = left
11x11 patch, positive = right patch at the true disparity (±1 px jitter,
dataset rule from the paper), negative = right patch offset by 4-8 px.

Usage:
    PYTHONPATH=. python scripts/train_mc_cnn.py [steps] [out.npz]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from pandora_tpu.io.raster import read_raster
from pandora_tpu.ops import mc_cnn

DATA = "/root/reference/tests/pandora"
WINDOW = mc_cnn.WINDOW
R = WINDOW // 2


def sample_triples(rng, left, right, gt, n):
    """(anchor, positive, negative) (n, WINDOW, WINDOW) batches."""
    h, w = left.shape
    rows, cols, disps = [], [], []
    while len(rows) < n:
        r = rng.integers(R, h - R, 4 * n)
        c = rng.integers(R, w - R, 4 * n)
        d = gt[r, c]  # positive disparity magnitude (reference GT convention)
        cr = c - np.rint(d).astype(int)  # right col at true disparity
        ok = (d != 0) & (cr >= R + 9) & (cr < w - R - 9)
        r, c, cr = r[ok][:n], c[ok][:n], cr[ok][:n]
        rows.extend(r)
        cols.extend(c)
        disps.extend(cr)
    rows = np.asarray(rows[:n])
    cols = np.asarray(cols[:n])
    cr = np.asarray(disps[:n])
    opos = rng.integers(-1, 2, n)  # dataset_pos jitter
    oneg = rng.integers(4, 9, n) * rng.choice([-1, 1], n)  # dataset_neg offset

    def patches(img, rr, cc):
        out = np.empty((n, WINDOW, WINDOW), np.float32)
        for i, (a, b) in enumerate(zip(rr, cc)):
            out[i] = img[a - R : a + R + 1, b - R : b + R + 1]
        return out

    anchor = patches(left, rows, cols)
    positive = patches(right, rows, np.clip(cr + opos, R, w - R - 1))
    negative = patches(right, rows, np.clip(cr + oneg, R, w - R - 1))
    return anchor, positive, negative


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "pandora_tpu", "data", "mc_cnn_fast.npz")
    )
    left, *_ = read_raster(f"{DATA}/left.png")
    right, *_ = read_raster(f"{DATA}/right.png")
    gt, *_ = read_raster(f"{DATA}/disp_left.tif")
    left, right, gt = left[0], right[0], gt[0]
    # the paper normalizes patches to zero mean / unit std per image
    left = (left - left.mean()) / left.std()
    right = (right - right.mean()) / right.std()

    rng = np.random.default_rng(0)
    params = mc_cnn.init_params(seed=0)
    batch = 256
    t0 = time.time()
    for step in range(steps):
        a, p, ng = sample_triples(rng, left, right, gt, batch)
        params, loss = mc_cnn.mc_cnn_train_step(
            params, jnp.asarray(a), jnp.asarray(p), jnp.asarray(ng), lr=0.002
        )
        if step % 200 == 0 or step == steps - 1:
            print(f"step {step}: hinge loss {float(loss):.4f}  ({time.time()-t0:.0f}s)")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    mc_cnn.save_params(out, params)
    print("saved", out)


if __name__ == "__main__":
    main()
