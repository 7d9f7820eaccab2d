"""Combine-kernel variants on the real TPU: where does the time go?

Variants (u8 partials, 1024x1024x64, production shapes):
  A. current 2-D grid kernel (VMEM (T,D,T) transpose of the col sum)
  B. same kernel with the transpose SKIPPED (wrong values — isolates the
     transpose cost)
  C. per-d 2-D slice transposes instead of one 3-D transpose
  D. 1-D kernel + XLA whole-volume u8 add+transpose of the col partials

Run:  PYTHONPATH=/root/.axon_site:. python scripts/sweep_combine.py
"""

import json
import os
import sys
import time
from functools import partial

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_pandora")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pandora_tpu.fused import _U8P_THRESH
from pandora_tpu.ops.census import census_cost_volume_scan_layouts
from pandora_tpu.ops.sgm_pallas import (
    SgmPartials,
    _VMEM_PARAMS,
    _to_f32,
    combine_wta_pallas,
    sgm_partials_from_layouts,
)

ROWS = COLS = 1024
NDISP = 64
_BIG = 1.0e30


def timeit(fn, *args, n=10):
    out = fn(*args)
    _ = float(jnp.nansum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        accs = []
        for _ in range(n):
            out = fn(*args)
            accs.append(jnp.nansum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        _ = float(jnp.stack(accs).sum())
        dt = min(dt, (time.time() - t0) / n)
    return dt


def finish_variant(n_disp, d_pad, threshold, mode, *refs):
    rn, rf, cn, cf, idx_ref, c0_ref, c1_ref, c2_ref = refs
    cs = _to_f32(cn[...]) + _to_f32(cf[...])  # (T, D, T)
    if mode == "none":
        cs_t = cs  # WRONG on purpose: timing-only variant
    elif mode == "slices":
        d = cs.shape[1]
        cs_t = jnp.stack([cs[:, k, :].T for k in range(d)], axis=1)
    else:
        cs_t = jnp.transpose(cs, (2, 1, 0))
    t = _to_f32(rn[...]) + _to_f32(rf[...]) + cs_t
    inv = t >= threshold
    g = jnp.where(inv, _BIG, t)
    m = jnp.min(g, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    idx = jnp.min(jnp.where(g == m, iota, d_pad), axis=1)
    idx_c = jnp.clip(idx, 1, n_disp - 2)
    tn = jnp.where(inv, jnp.nan, t)
    ic = idx_c[:, None, :]

    def sel(sel_idx):
        return jnp.sum(jnp.where(iota == sel_idx, tn, 0.0), axis=1)

    all_inv = m[:, 0] >= _BIG * 0.5
    idx_ref[...] = idx.astype(jnp.float32)
    c0_ref[...] = sel(ic - 1)
    c1_ref[...] = jnp.where(all_inv, jnp.nan, m[:, 0])
    c2_ref[...] = sel(ic + 1)


def combine_variant(parts, threshold, mode):
    h, w, d = parts.hwd
    h8, d8, w8 = parts.row_n.shape
    tb = 128
    grb, gw = h8 // tb, w8 // tb
    map_sds = jax.ShapeDtypeStruct((h8, w8), jnp.float32)
    row_spec = pl.BlockSpec((tb, d8, tb), lambda r, c: (r, 0, c), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((tb, d8, tb), lambda r, c: (c, 0, r), memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((tb, tb), lambda r, c: (r, c), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(finish_variant, d, d8, threshold, mode),
        grid=(grb, gw),
        in_specs=[row_spec, row_spec, col_spec, col_spec],
        out_specs=(map_spec,) * 4,
        out_shape=(map_sds,) * 4,
        compiler_params=_VMEM_PARAMS,
    )(parts.row_n, parts.row_f, parts.col_n, parts.col_f)


def main():
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)
    right = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)
    cvf = jax.jit(
        lambda a, b: census_cost_volume_scan_layouts(a, b, -(NDISP - 1), 0, 1, 5, jnp.uint8)[:2]
    )
    rdw, cdh = cvf(left, right)
    pf = jax.jit(
        lambda r, c: sgm_partials_from_layouts(
            r, c, (ROWS, COLS, NDISP), 8.0, 32.0, out_dtype=jnp.uint8, block=16
        )
    )
    parts = pf(rdw, cdh)

    base = jax.jit(
        lambda rn, rf, cn, cf: combine_wta_pallas(
            SgmPartials(rn, rf, cn, cf, None, None, (ROWS, COLS, NDISP)), _U8P_THRESH
        )
    )
    dt = timeit(base, parts.row_n, parts.row_f, parts.col_n, parts.col_f)
    print(json.dumps({"cfg": "A current 2d", "ms": round(dt * 1e3, 3)}), flush=True)

    for mode in ("none", "slices", "transpose"):
        fn = jax.jit(
            lambda rn, rf, cn, cf, m=mode: combine_variant(
                SgmPartials(rn, rf, cn, cf, None, None, (ROWS, COLS, NDISP)),
                _U8P_THRESH,
                m,
            )
        )
        try:
            dt = timeit(fn, parts.row_n, parts.row_f, parts.col_n, parts.col_f)
            print(json.dumps({"cfg": f"variant {mode}", "ms": round(dt * 1e3, 3)}), flush=True)
        except Exception as exc:
            print(json.dumps({"cfg": f"variant {mode}", "error": str(exc)[:150]}), flush=True)

    d1 = jax.jit(
        lambda rn, rf, cn, cf: combine_wta_pallas(
            SgmPartials(rn, rf, cn, cf, None, None, (ROWS, COLS, NDISP)),
            _U8P_THRESH,
            two_d=False,
        )
    )
    dt = timeit(d1, parts.row_n, parts.row_f, parts.col_n, parts.col_f)
    print(json.dumps({"cfg": "D 1d xla-transpose u8", "ms": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
