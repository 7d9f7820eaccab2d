#!/usr/bin/env python
"""Per-stage timings of the fused census+SGM pipeline on the real chip.

Each stage is timed as its own jitted program (so inter-stage fusion is
broken intentionally) with a nansum sync, best of 3 batches of n runs.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ROWS, COLS, NDISP = 1024, 1024, 64


def timeit(fn, *args, n=10):
    out = fn(*args)
    _ = float(jnp.nansum(jax.tree_util.tree_leaves(out)[0]))
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        accs = []
        for _ in range(n):
            out = fn(*args)
            accs.append(jnp.nansum(jax.tree_util.tree_leaves(out)[0]))
        _ = float(jnp.stack(accs).sum())
        dt = min(dt, (time.time() - t0) / n)
    return dt, out


def main():
    from pandora_tpu.fused import _SUPER, _THRESH
    from pandora_tpu.ops.census import census_cost_volume, census_transform
    from pandora_tpu.ops.filters import median_filter_disparity
    from pandora_tpu.ops.sgm_pallas import combine_wta_pallas, sgm_partials_pallas

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)
    right = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)

    # stage 1: census transform both images
    ct = jax.jit(lambda a, b: (census_transform(a, 5, 5), census_transform(b, 5, 5)))
    dt, _ = timeit(lambda a, b: ct(a, b)[0].astype(jnp.float32), left, right)
    print(f"census_transform x2          : {dt*1e3:8.3f} ms")

    # stage 2: full CV build (incl. transform; scan layout, super-sentinel)
    cv_fn = jax.jit(
        lambda a, b: census_cost_volume(a, b, -(NDISP - 1), 0, 1, 5, invalid_value=_SUPER)
    )
    dt_cv, cv = timeit(cv_fn, left, right)
    print(f"census cost volume (scan)    : {dt_cv*1e3:8.3f} ms")

    # stage 3: SGM row+col passes (bf16 partials)
    agg = jax.jit(
        lambda c: sgm_partials_pallas(c, 8.0, 32.0, out_dtype=jnp.bfloat16)
    )
    dt_agg, partials = timeit(agg, cv)
    print(f"SGM 8-path partials (pallas) : {dt_agg*1e3:8.3f} ms")

    # stage 4: combine + WTA + triplet (rebuild static hwd inside the jit)
    from pandora_tpu.ops.sgm_pallas import SgmPartials

    comb = jax.jit(
        lambda rn, rf, cn, cf: combine_wta_pallas(
            SgmPartials(rn, rf, cn, cf, None, None, (ROWS, COLS, NDISP)), _THRESH
        )
    )
    dt_c, (idx, c0, c1, c2) = timeit(
        comb, partials.row_n, partials.row_f, partials.col_n, partials.col_f
    )
    print(f"combine+WTA+triplet (pallas) : {dt_c*1e3:8.3f} ms")

    # stage 5: median filter
    disp = idx.astype(jnp.float32)
    vmask = jnp.zeros_like(idx, jnp.uint16)
    med = jax.jit(lambda d, v: median_filter_disparity(d, v, 1, 3))
    dt_m, _ = timeit(med, disp, vmask)
    print(f"median filter 3x3            : {dt_m*1e3:8.3f} ms")

    # full fused pipeline for reference
    from pandora_tpu.fused import make_jitted_pipeline

    fn = make_jitted_pipeline(
        dmin=-(NDISP - 1), dmax=0, subpix=1, window_size=5,
        matching_cost="census", optimization="sgm", p1=8.0, p2=32.0,
        refinement="vfit", median_size=3,
    )
    dt_f, _ = timeit(fn, left, right)
    print(f"FULL fused pipeline          : {dt_f*1e3:8.3f} ms"
          f"  = {ROWS*COLS/1e6/dt_f:.1f} Mpix/s")


if __name__ == "__main__":
    main()
