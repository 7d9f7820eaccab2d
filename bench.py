#!/usr/bin/env python
"""Headline benchmark: census 5x5 + 8-path SGM + WTA + vfit + median.

Prints ONE JSON line:
  {"metric": ..., "value": Mpix/s on the TPU chip, "unit": "Mpix/s",
   "vs_baseline": speedup vs a single-threaded -O3 C++ CPU reference
   (same census+SGM+WTA algorithm, measured on this machine — the
   reference CNES/Pandora publishes no perf numbers, BASELINE.md)}

Timing methodology: the axon TPU platform's block_until_ready does not
synchronize, so each timed batch chains a scalar nansum per run and forces
one tiny host transfer at the end.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROWS, COLS, NDISP = 1024, 1024, 64
HERE = os.path.dirname(os.path.abspath(__file__))


def cpu_baseline_seconds() -> float:
    """Compile (once) and run the C++ single-thread reference; cache result."""
    cache = os.path.join(HERE, "native", ".cpu_baseline.json")
    key = f"{ROWS}x{COLS}x{NDISP}"
    try:
        with open(cache) as fh:
            data = json.load(fh)
        if key in data:
            return data[key]
    except (OSError, ValueError):
        data = {}
    binp = os.path.join(HERE, "native", "cpu_baseline")
    src = os.path.join(HERE, "native", "cpu_baseline.cpp")
    if not os.path.exists(binp) or os.path.getmtime(binp) < os.path.getmtime(src):
        subprocess.run(["g++", "-O3", "-march=native", "-o", binp, src], check=True)
    out = subprocess.run(
        [binp, str(ROWS), str(COLS), str(NDISP), "2"],
        check=True,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    secs = float(out.stdout.strip())
    data[key] = secs
    with open(cache, "w") as fh:
        json.dump(data, fh)
    return secs


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pandora_tpu.fused import make_jitted_pipeline

    fn = make_jitted_pipeline(
        dmin=-(NDISP - 1),
        dmax=0,
        subpix=1,
        window_size=5,
        matching_cost="census",
        optimization="sgm",
        p1=8.0,
        p2=32.0,
        refinement="vfit",
        median_size=3,
    )
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)
    right = jnp.asarray(rng.random((ROWS, COLS), np.float32) * 255)

    # warm up + force completion with a host read
    out = fn(left, right)
    _ = float(jnp.nansum(out[0]))

    # best of 3 batches: on the tunneled axon platform the first batch
    # after warmup still pays deferred program-upload work (~90 ms)
    n = 10
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        accs = []
        for _ in range(n):
            out = fn(left, right)
            accs.append(jnp.nansum(out[0]))
        _ = float(jnp.stack(accs).sum())  # single sync point
        dt = min(dt, (time.time() - t0) / n)

    mpix_s = (ROWS * COLS / 1e6) / dt
    cpu_secs = cpu_baseline_seconds()
    cpu_mpix_s = (ROWS * COLS / 1e6) / cpu_secs
    print(
        json.dumps(
            {
                "metric": f"census5x5+SGM8+WTA+vfit+median Mpix/s/chip ({ROWS}x{COLS}x{NDISP})",
                "value": round(mpix_s, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / cpu_mpix_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
