#!/usr/bin/env python
"""Per-stage timing of the fused census+SGM+WTA+vfit+median pipeline on the
real chip.  Prints one line per stage so the bottleneck is visible.

Timing: the axon platform's block_until_ready does not synchronize, so each
timed loop chains a scalar reduction and forces one host transfer at the end.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ROWS, COLS, NDISP = 1024, 1024, 64


def timeit(fn, *args, n=10, reps=3):
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        accs = []
        for _ in range(n):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            accs.append(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))
        _ = float(jnp.stack(accs).sum())
        best = min(best, (time.time() - t0) / n)
    return best, out


def main():
    from pandora_tpu.fused import _SUPER, _THRESH, make_jitted_pipeline
    from pandora_tpu.ops.census import census_cost_volume, census_transform
    from pandora_tpu.ops.filters import median_filter_disparity
    from pandora_tpu.ops.sgm_pallas import (
        combine_wta_pallas,
        sgm_aggregate_partials_pallas,
    )

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)
    right = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)
    dmin, dmax = -(NDISP - 1), 0

    print(f"workload: {ROWS}x{COLS}x{NDISP}  ({ROWS*COLS/1e6:.2f} Mpix)")

    # full pipeline
    fn = make_jitted_pipeline(
        dmin=dmin, dmax=dmax, subpix=1, window_size=5, matching_cost="census",
        optimization="sgm", p1=8.0, p2=32.0, refinement="vfit", median_size=3,
    )
    dt, _ = timeit(fn, left, right)
    print(f"full pipeline:      {dt*1e3:8.2f} ms   {ROWS*COLS/1e6/dt:7.1f} Mpix/s")

    # census transform alone
    ct = jax.jit(lambda im: census_transform(im, 5, 5))
    dt, _ = timeit(ct, left)
    print(f"census transform:   {dt*1e3:8.2f} ms")

    # census CV (scan mode, sentinel)
    cvf = jax.jit(
        lambda l, r: census_cost_volume(l, r, dmin, dmax, 1, 5, unroll=False,
                                        invalid_value=_SUPER)
    )
    dt, cv = timeit(cvf, left, right)
    print(f"census CV (scan):   {dt*1e3:8.2f} ms")

    # SGM partials (bf16)
    agg = jax.jit(
        lambda c: sgm_aggregate_partials_pallas(c, 8.0, 32.0, out_dtype=jnp.bfloat16)
    )
    dt, (partials, hw8) = timeit(agg, cv)
    print(f"SGM partials bf16:  {dt*1e3:8.2f} ms")

    # combine + WTA + triplet
    comb = jax.jit(
        lambda ps: combine_wta_pallas(ps, (ROWS, COLS), NDISP, _THRESH)
    )
    dt, (idx, c0, c1, c2) = timeit(comb, partials)
    print(f"combine+WTA:        {dt*1e3:8.2f} ms")

    # median filter
    disp = jnp.asarray(rng.random((ROWS, COLS), np.float32))
    vm = jnp.zeros((ROWS, COLS), jnp.uint16)
    med = jax.jit(lambda d, v: median_filter_disparity(d, v, 0x3C3, 3))
    dt, _ = timeit(med, disp, vm)
    print(f"median 3x3:         {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
