"""Census cost-volume production strategies on the real TPU.

Compares, for the headline 1024x1024x64 u8 workload:
  A. current census_cost_volume_scan_layouts (two hamming volumes, one per
     scan orientation, from normal + transposed signatures)
  B. row-layout volume only + one XLA u8 transpose (2,1,0) for the col
     layout
  C. the row-layout volume alone (lower bound for any col strategy)

Run:  PYTHONPATH=/root/.axon_site:. python scripts/sweep_census.py
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_pandora")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pandora_tpu.ops.census import census_cost_volume_scan_layouts

ROWS = COLS = 1024
NDISP = 64


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


def main():
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)
    right = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)

    both = jax.jit(
        lambda a, b: census_cost_volume_scan_layouts(a, b, -(NDISP - 1), 0, 1, 5, jnp.uint8)[:2]
    )
    dt = timeit(both, left, right)
    print(json.dumps({"cfg": "A current both-layouts", "ms": round(dt * 1e3, 3)}), flush=True)

    row_only = jax.jit(
        lambda a, b: census_cost_volume_scan_layouts(
            a, b, -(NDISP - 1), 0, 1, 5, jnp.uint8, col_layout=False
        )[0]
    )
    dt = timeit(row_only, left, right)
    print(json.dumps({"cfg": "C row layout only", "ms": round(dt * 1e3, 3)}), flush=True)

    row_t = jax.jit(
        lambda a, b: (
            lambda rdw: (rdw, jnp.transpose(rdw, (2, 1, 0)))
        )(
            census_cost_volume_scan_layouts(
                a, b, -(NDISP - 1), 0, 1, 5, jnp.uint8, col_layout=False
            )[0]
        )
    )
    dt = timeit(row_t, left, right)
    print(json.dumps({"cfg": "B row + XLA u8 transpose", "ms": round(dt * 1e3, 3)}), flush=True)

    # sanity: B == A
    rdw_a, cdh_a = both(left, right)
    rdw_b, cdh_b = row_t(left, right)
    ok = bool(jnp.array_equal(rdw_a, rdw_b)) and bool(jnp.array_equal(cdh_a, cdh_b))
    print(json.dumps({"cfg": "B==A bit-exact", "ok": ok}), flush=True)


if __name__ == "__main__":
    main()
