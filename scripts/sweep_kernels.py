"""Kernel-parameter sweep on the real TPU: scan block size, combine tile,
and the u8-plane census.  Prints one JSON line per configuration.

Run:  PYTHONPATH=/root/.axon_site:. python scripts/sweep_kernels.py
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

from pandora_tpu.fused import _U8P_THRESH
from pandora_tpu.ops.census import census_cost_volume_scan_layouts
from pandora_tpu.ops.sgm_pallas import (
    SgmPartials,
    combine_wta_pallas,
    sgm_partials_from_layouts,
)

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

    cvf = jax.jit(
        lambda a, b: census_cost_volume_scan_layouts(a, b, -(NDISP - 1), 0, 1, 5, jnp.uint8)[:2]
    )
    dt = timeit(cvf, left, right)
    print(json.dumps({"cfg": "census u8-planes", "ms": round(dt * 1e3, 3)}), flush=True)
    rdw, cdh = cvf(left, right)

    for block in (8, 16, 32):
        pf = jax.jit(
            lambda r, c, blk=block: sgm_partials_from_layouts(
                r, c, (ROWS, COLS, NDISP), 8.0, 32.0, out_dtype=jnp.uint8, block=blk
            )
        )
        dt = timeit(pf, rdw, cdh)
        print(json.dumps({"cfg": f"partials u8 block={block}", "ms": round(dt * 1e3, 3)}), flush=True)
        parts = pf(rdw, cdh)

    for tile in (128, 256, 512):
        cb = jax.jit(
            lambda rn, rf, cn, cf, t=tile: combine_wta_pallas(
                SgmPartials(rn, rf, cn, cf, None, None, (ROWS, COLS, NDISP)),
                _U8P_THRESH,
                tile=t,
            )
        )
        try:
            dt = timeit(cb, parts.row_n, parts.row_f, parts.col_n, parts.col_f)
            print(json.dumps({"cfg": f"combine 2d tile={tile}", "ms": round(dt * 1e3, 3)}), flush=True)
        except Exception as exc:  # VMEM overflow etc.
            print(json.dumps({"cfg": f"combine 2d tile={tile}", "error": str(exc)[:120]}), flush=True)


if __name__ == "__main__":
    main()


def sweep_i16():
    """Probe packed-int16 support (the roofline's 2x scan lever).

    Round-5 result on v5e: only add/and compile; sub, mul, min/max, shifts,
    compares and selects are rejected ("Target does not support this
    comparison" on vector<8x128x2xi16>), and int16 sublane reductions are
    unimplemented — so the int16 SGM recurrence
    (sgm_partials_from_layouts(compute_dtype=jnp.int16), bit-exact in
    interpret mode) cannot compile.  Re-run after libtpu updates: if
    'minimum' and 'compare_ge_select' flip to COMPILES, enable the path
    for ~2x scan throughput.  See BASELINE.md."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def probe(name, body):
        def kern(a_ref, b_ref, o_ref):
            o_ref[...] = body(a_ref[...], b_ref[...])

        x = jnp.arange(16 * 256, dtype=jnp.int16).reshape(16, 256) % 200
        y = (x * 3 + 7) % 150
        try:
            f = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int16),
            )
            out = jax.jit(f)(x, y)
            jax.block_until_ready(out)
            want = body(x.astype(jnp.int32), y.astype(jnp.int32)).astype(jnp.int16)
            print(json.dumps({"i16_op": name, "status": "COMPILES",
                              "numerics_ok": bool(jnp.all(out == want))}), flush=True)
        except Exception as exc:
            msg = str(exc)
            key = "unsupported" if "not support" in msg else msg[:100].replace("\n", " ")
            print(json.dumps({"i16_op": name, "status": "FAIL", "why": key}), flush=True)

    probe("add", lambda a, b: a + b)
    probe("sub", lambda a, b: a - b)
    probe("mul", lambda a, b: a * b)
    probe("minimum", lambda a, b: jnp.minimum(a, b))
    probe("maximum", lambda a, b: jnp.maximum(a, b))
    probe("shift_right", lambda a, b: a >> 3)
    probe("and", lambda a, b: a & b)
    probe("compare_ge_select", lambda a, b: jnp.where(a >= b, a, b))
    probe("equal", lambda a, b: (a == b).astype(jnp.int16))
    # the full recurrence, in case single ops start passing
    from pandora_tpu.ops.census import census_cost_volume_scan_layouts
    from pandora_tpu.ops.sgm_pallas import sgm_partials_from_layouts

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((128, 256), np.float32) * 255)
    right = jnp.asarray(rng.random((128, 256), np.float32) * 255)
    rdw, cdh, hwd = census_cost_volume_scan_layouts(left, right, -63, 0, 1, 5, jnp.uint8)
    try:
        p = jax.jit(
            lambda r, c: sgm_partials_from_layouts(
                r, c, hwd, 8.0, 32.0, out_dtype=jnp.uint8, block=16,
                compute_dtype=jnp.int16,
            )
        )(rdw, cdh)
        jax.block_until_ready(p)
        print(json.dumps({"i16_op": "sgm_recurrence", "status": "COMPILES"}), flush=True)
    except Exception as exc:
        print(json.dumps({"i16_op": "sgm_recurrence", "status": "FAIL",
                          "why": str(exc)[:160].replace("\n", " ")}), flush=True)


def sweep_bf16():
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)
    right = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)
    cvf = jax.jit(
        lambda a, b: census_cost_volume_scan_layouts(a, b, -(NDISP - 1), 0, 1, 5, jnp.uint8)[:2]
    )
    rdw, cdh = cvf(left, right)
    from pandora_tpu.fused import _U8_THRESH
    pf = jax.jit(
        lambda r, c: sgm_partials_from_layouts(
            r, c, (ROWS, COLS, NDISP), 8.0, 32.0, out_dtype=jnp.bfloat16
        )
    )
    dt = timeit(pf, rdw, cdh)
    print(json.dumps({"cfg": "partials bf16 block=8", "ms": round(dt * 1e3, 3)}), flush=True)
    parts = pf(rdw, cdh)
    cb = jax.jit(
        lambda rn, rf, cn, cf: combine_wta_pallas(
            SgmPartials(rn, rf, cn, cf, None, None, (ROWS, COLS, NDISP)), _U8_THRESH
        )
    )
    dt = timeit(cb, parts.row_n, parts.row_f, parts.col_n, parts.col_f)
    print(json.dumps({"cfg": "combine 2d bf16 tile=128", "ms": round(dt * 1e3, 3)}), flush=True)
    cb1 = jax.jit(
        lambda rn, rf, cn, cf: combine_wta_pallas(
            SgmPartials(rn, rf, cn, cf, None, None, (ROWS, COLS, NDISP)), _U8_THRESH,
            two_d=False,
        )
    )
    dt = timeit(cb1, parts.row_n, parts.row_f, parts.col_n, parts.col_f)
    print(json.dumps({"cfg": "combine 1d bf16 (xla transpose)", "ms": round(dt * 1e3, 3)}), flush=True)


sweep_bf16()
