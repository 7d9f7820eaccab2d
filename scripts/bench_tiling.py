"""Tiled-SGM scheme comparison on a virtual-CPU device mesh: the
replication-halo scheme (parallel/tiling.py) vs the boundary-state
exchange scheme (parallel/sgm_exchange.py) at 2 and 8 devices.

Run standalone or via ``bench.py`` (which shells out here so the main
bench can stay on the TPU platform):

    JAX_PLATFORMS=cpu python scripts/bench_tiling.py

Prints one JSON line per (scheme, n_devices).  Both schemes run the same
lax-scan backend on the same mesh, so the ratio isolates the redundant
halo compute the exchange scheme eliminates (census/WTA/refinement run
on exactly the tile's own pixels; scans re-sweep only an influence-wide
band per boundary).
"""

import json
import os
import sys
import time

N_DEVICES = (2, 8)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={max(N_DEVICES)}"
)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_pandora")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pandora_tpu.parallel import (
    exchange_tiled_stereo_pipeline,
    make_mesh,
    tiled_stereo_pipeline,
)

ROWS, COLS, NDISP = 512, 1024, 32

CFG = dict(
    dmin=-(NDISP - 1),
    dmax=0,
    subpix=1,
    window_size=5,
    matching_cost="census",
    p1=8.0,
    p2=32.0,
    refinement="vfit",
    median_size=3,
)


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = min(dt, time.time() - t0)
    return dt


def main():
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((1, ROWS, COLS), np.float32) * 255)
    right = jnp.asarray(
        np.roll(np.asarray(left), -9, axis=2)
        + rng.normal(0, 2, (1, ROWS, COLS)).astype(np.float32)
    )
    for n in N_DEVICES:
        mesh = make_mesh(n_data=1, n_tile=n, devices=jax.devices()[:n])
        sh = NamedSharding(mesh, P("data", None, "tile"))
        ls, rs = jax.device_put(left, sh), jax.device_put(right, sh)
        repl = tiled_stereo_pipeline(mesh, optimization="sgm", **CFG)
        exch = exchange_tiled_stereo_pipeline(mesh, **CFG)
        t_repl = timeit(repl, ls, rs)
        t_exch = timeit(exch, ls, rs)
        mp = ROWS * COLS / 1e6
        print(
            json.dumps(
                {
                    "metric": f"tiled SGM replication-halo @ {n} virtual dev (CPU lax backend)",
                    "value": round(mp / t_repl, 3),
                    "unit": "Mpix/s",
                }
            ),
            flush=True,
        )
        print(
            json.dumps(
                {
                    "metric": f"tiled SGM boundary-state exchange @ {n} virtual dev (CPU lax backend)",
                    "value": round(mp / t_exch, 3),
                    "unit": "Mpix/s",
                    "vs_replication": round(t_repl / t_exch, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
