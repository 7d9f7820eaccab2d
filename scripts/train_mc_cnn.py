"""Train the MC-CNN *fast* matching-cost network in-framework.

The reference consumes externally trained torch checkpoints
(pandora_plugin_mccnn, plugin_mccnn.rst:42-58); here the same
hinge-loss-on-triplets training rule (Žbontar & LeCun 2016, JMLR §3.3)
runs natively on TPU and produces the ``.npz`` checkpoint the ``mc_cnn``
matching-cost step loads via ``model_path`` (bundled default:
``pandora_tpu/data/mc_cnn_fast.npz``).

**Training data is fully synthetic and disjoint from every evaluation
pair.** Each training pair is procedurally generated: a fractal-noise
texture rendered on the right-image plane, a piecewise-constant random
disparity field (fronto-parallel patches, the dominant local model in
rectified stereo), and the left image resampled from the texture at
``col - d`` — so ground truth is exact by construction. Photometric
asymmetry (per-image brightness/contrast jitter + sensor noise) follows
the paper's data-augmentation recipe. The Middlebury cones pair used by
the quality gates (tests/test_mc_cnn.py, tests/test_pandora_e2e.py) is
never read here.

Triples are sampled per the paper: anchor = left 11x11 patch, positive =
right patch at the true disparity (±1 px jitter, ``dataset_pos``),
negative = right patch offset by 4-8 px (``dataset_neg``).

Usage:
    PYTHONPATH=. python scripts/train_mc_cnn.py [steps] [out.npz]
"""

import os
import sys
import time

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view
from scipy.ndimage import gaussian_filter

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp

from pandora_tpu.ops import mc_cnn

WINDOW = mc_cnn.WINDOW
R = WINDOW // 2
N_PAIRS = 48
PAIR_H, PAIR_W = 220, 300
DMAX = 28


def fractal_texture(rng, h, w):
    """Multi-octave smoothed noise with ~natural image statistics."""
    img = np.zeros((h, w), np.float32)
    for sigma, amp in ((0.0, 1.0), (1.5, 2.0), (4.0, 4.0), (12.0, 8.0), (32.0, 16.0)):
        n = rng.standard_normal((h, w)).astype(np.float32)
        if sigma:
            n = gaussian_filter(n, sigma) * (1.0 + sigma)  # restore power
        img += amp * n
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo + 1e-6) * 255.0


def disparity_field(rng, h, w):
    """Piecewise-constant positive disparity: background plane + random
    fronto-parallel rectangles/ellipses pasted nearer (larger d)."""
    d = np.full((h, w), int(rng.integers(1, 6)), np.int32)
    yy, xx = np.mgrid[:h, :w]
    for _ in range(int(rng.integers(6, 14))):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        ry, rx = rng.integers(12, h // 2), rng.integers(12, w // 2)
        val = int(rng.integers(2, DMAX + 1))
        if rng.random() < 0.5:
            m = (np.abs(yy - cy) < ry) & (np.abs(xx - cx) < rx)
        else:
            m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
        d[m] = val
    return d


def make_pair(rng):
    """(left, right, gt): exact-GT synthetic rectified pair.

    Texture lives on the right-image plane (widened by DMAX on the left
    so every left pixel has a valid match): right = scene[:, DMAX:],
    left[r, c] = scene[r, DMAX + c - d(r, c)]  (reference convention:
    positive GT magnitude, right match col = c - d)."""
    scene = fractal_texture(rng, PAIR_H, PAIR_W + DMAX)
    gt = disparity_field(rng, PAIR_H, PAIR_W)
    cols = np.arange(PAIR_W)[None, :]
    left = scene[np.arange(PAIR_H)[:, None], DMAX + cols - gt]
    right = scene[:, DMAX:]
    # photometric asymmetry between the two cameras (Žbontar §3.3)
    for img in (left, right):
        img *= float(rng.uniform(0.8, 1.2))
        img += float(rng.uniform(-20, 20))
        img += rng.standard_normal(img.shape).astype(np.float32) * rng.uniform(0, 4)
    # per-image zero mean / unit std, as the CV path applies at inference
    left = (left - left.mean()) / (left.std() + 1e-8)
    right = (right - right.mean()) / (right.std() + 1e-8)
    return left.astype(np.float32), right.astype(np.float32), gt


def sample_triples(rng, pairs, n):
    """(anchor, positive, negative) (n, WINDOW, WINDOW) from one random pair."""
    left, right, gt = pairs[rng.integers(len(pairs))]
    h, w = left.shape
    lwin = sliding_window_view(left, (WINDOW, WINDOW))
    rwin = sliding_window_view(right, (WINDOW, WINDOW))
    rows, cols, crs = [], [], []
    while len(rows) < n:
        r = rng.integers(R, h - R, 4 * n)
        c = rng.integers(R, w - R, 4 * n)
        d = gt[r, c]
        cr = c - d  # right col at true disparity
        ok = (d > 0) & (cr >= R + 9) & (cr < w - R - 9)
        rows.extend(r[ok][:n])
        cols.extend(c[ok][:n])
        crs.extend(cr[ok][:n])
    rows = np.asarray(rows[:n])
    cols = np.asarray(cols[:n])
    cr = np.asarray(crs[:n])
    opos = rng.integers(-1, 2, n)  # dataset_pos jitter
    oneg = rng.integers(4, 9, n) * rng.choice([-1, 1], n)  # dataset_neg offset
    anchor = lwin[rows - R, cols - R]
    positive = rwin[rows - R, np.clip(cr + opos - R, 0, w - WINDOW)]
    negative = rwin[rows - R, np.clip(cr + oneg - R, 0, w - WINDOW)]
    return anchor, positive, negative


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "pandora_tpu", "data", "mc_cnn_fast.npz")
    )
    rng = np.random.default_rng(0)
    print(f"generating {N_PAIRS} synthetic pairs ({PAIR_H}x{PAIR_W}, dmax={DMAX})...")
    pairs = [make_pair(rng) for _ in range(N_PAIRS)]

    params = mc_cnn.init_params(seed=0)
    batch = 256
    t0 = time.time()
    for step in range(steps):
        lr = 0.002 if step < steps * 0.8 else 0.0002  # paper's late decay
        a, p, ng = sample_triples(rng, pairs, batch)
        params, loss = mc_cnn.mc_cnn_train_step(
            params, jnp.asarray(a), jnp.asarray(p), jnp.asarray(ng), lr=lr
        )
        if step % 200 == 0 or step == steps - 1:
            print(f"step {step}: hinge loss {float(loss):.4f}  ({time.time()-t0:.0f}s)", flush=True)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    mc_cnn.save_params(out, params)
    print("saved", out)


if __name__ == "__main__":
    main()
