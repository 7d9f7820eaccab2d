#!/usr/bin/env python
"""Headline benchmark: census 5x5 + 8-path SGM + WTA + vfit + median.

Prints ONE JSON line:
  {"metric": ..., "value": Mpix/s on the TPU chip, "unit": "Mpix/s",
   "vs_baseline": speedup vs a single-threaded -O3 C++ CPU reference
   (same census+SGM+WTA algorithm, measured on this machine — the
   reference CNES/Pandora publishes no perf numbers, BASELINE.md)}

Every run also emits: the cones bad-1 accuracy line through the compiled
TPU path (gate <= 0.20, reference functional_tests/test_basic.py:159),
the compiled-kernel equality checks, the per-stage timing breakdown, the
modular-JSON-engine line, and the tiled-SGM scheme comparison — all
unconditional so each round's artifact pins them.  Options:
  --no-accuracy  timing-only run: skip everything except the headline
  --scene        also run the SceneRunner large-scene line (host-IO-bound
                 on a tunneled TPU)

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

# persistent compile cache: axon remote compiles run many minutes; cached
# executables make repeat benches start in seconds
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_pandora")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

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


def _timeit(fn, *args, n=10):
    import jax
    import jax.numpy as jnp

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
    return dt, out


def _stage_breakdown(left, right):
    """Per-stage timings of the production (uint8 scan-layout) fast path."""
    import jax
    import jax.numpy as jnp

    from pandora_tpu.fused import _U8P_THRESH as _U8_THRESH
    from pandora_tpu.ops.census import census_cost_volume_scan_layouts
    from pandora_tpu.ops.sgm_pallas import (
        SgmPartials,
        combine_wta_pallas,
        sgm_partials_from_layouts,
    )

    cvf = jax.jit(
        lambda a, b: census_cost_volume_scan_layouts(
            a, b, -(NDISP - 1), 0, 1, 5, jnp.uint8
        )[:2]
    )
    dt_cv, (rdw, cdh) = _timeit(cvf, left, right)

    pf = jax.jit(
        lambda r, c: sgm_partials_from_layouts(
            r, c, (ROWS, COLS, NDISP), 8.0, 32.0, out_dtype=jnp.uint8, block=16
        )
    )
    dt_p, parts = _timeit(pf, rdw, cdh)

    cb = jax.jit(
        lambda rn, rf, cn, cf: combine_wta_pallas(
            SgmPartials(rn, rf, cn, cf, None, None, (ROWS, COLS, NDISP)), _U8_THRESH
        )
    )
    dt_c, _ = _timeit(cb, parts.row_n, parts.row_f, parts.col_n, parts.col_f)
    for name, dt in (
        ("census+cost-volume (u8 scan layouts)", dt_cv),
        ("SGM 8-path partials (pallas)", dt_p),
        ("combine+WTA+vfit-triplet (pallas)", dt_c),
    ):
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}))


def _accuracy_line():
    """bad-1 on cones through the compiled TPU fast path (not interpret)."""
    import jax.numpy as jnp

    from pandora_tpu.fused import make_jitted_pipeline
    from pandora_tpu.io.raster import read_raster

    base = "/root/reference/tests/pandora"
    left, *_ = read_raster(os.path.join(base, "left.png"))
    right, *_ = read_raster(os.path.join(base, "right.png"))
    gt, *_ = read_raster(os.path.join(base, "disp_left.tif"))
    left, right, gt = left[0], right[0], gt[0]

    fn = make_jitted_pipeline(
        dmin=-60, dmax=0, subpix=1, window_size=5,
        matching_cost="census", optimization="sgm", p1=8.0, p2=32.0,
        refinement="vfit", median_size=3,
    )
    disp, _ = fn(jnp.asarray(left), jnp.asarray(right))
    d = np.asarray(disp)
    mask = gt != 0
    bad1 = float((np.abs(d[mask] + gt[mask]) > 1).sum() / d.size)
    print(
        json.dumps(
            {
                "metric": "cones bad-1 (TPU compiled fused path)",
                "value": round(bad1, 4),
                "unit": "error rate",
                "gate": 0.20,
            }
        )
    )


def _hw_checks_line():
    """Run the two cheapest compiled-kernel equality checks from
    tests/test_tpu_hw.py and record pass/fail in the bench artifact, so
    compiled-vs-lax kernel equality is gated every round rather than only
    behind the manual PANDORA_TPU_HW_TESTS env var."""
    sys.path.insert(0, os.path.join(HERE, "tests"))
    from test_tpu_hw import (
        test_census_cv_kernel_multiword_oracle,
        test_pallas_compiled_equals_lax_scan,
    )

    results = {}
    for name, fn in (
        ("pallas_sgm_equals_lax_scan", test_pallas_compiled_equals_lax_scan),
        ("census_cv_multiword_oracle", test_census_cv_kernel_multiword_oracle),
    ):
        try:
            fn()
            results[name] = "pass"
        except Exception as exc:  # record, don't abort the bench
            results[name] = f"FAIL: {str(exc)[:160]}"
    print(json.dumps({"metric": "compiled-kernel equality checks", **results}))


def _modular_line(left, right):
    """Time the MODULAR JSON engine on the headline workload.  On TPU the
    pipeline router sends this census+SGM+WTA+vfit+median config through
    the fused uint8 scan-layout kernels (pipeline._fused_plan), so the
    user-facing entry point rides the same fast path as stereo_pipeline."""
    import jax.numpy as jnp

    from pandora_tpu.datamodel import Image
    from pandora_tpu.pipeline import Pipeline
    from pandora_tpu.steps.base import PipelineState

    pipe = Pipeline(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            "optimization": {"optimization_method": "sgm"},
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
            "refinement": {"refinement_method": "vfit"},
            "filter": {"filter_method": "median", "filter_size": 3},
        }
    )
    limg = Image(
        im=left[None],
        disp_min=jnp.full(left.shape, float(-(NDISP - 1))),
        disp_max=jnp.zeros(left.shape),
    )
    rimg = Image(im=right[None])

    def run_once():
        state = PipelineState(left_img=limg, right_img=rimg)
        pipe.run(state)
        return state.left_disparity.disparity_map

    dt, _ = _timeit(run_once, n=5)
    mpix_s = (ROWS * COLS / 1e6) / dt
    print(
        json.dumps(
            {
                "metric": f"modular JSON engine, same workload ({ROWS}x{COLS}x{NDISP})",
                "value": round(mpix_s, 3),
                "unit": "Mpix/s",
            }
        )
    )


def _tiling_compare_lines():
    """Replication-halo vs boundary-state-exchange tiled SGM at 2 and 8
    virtual devices (scripts/bench_tiling.py in a CPU subprocess — the
    main bench stays on the TPU platform)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONSTARTUP", None)
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, "scripts", "bench_tiling.py")],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
        if out.returncode != 0:
            print(json.dumps({"metric": "tiled SGM scheme compare",
                              "error": out.stderr[-200:]}))
    except Exception as exc:
        print(json.dumps({"metric": "tiled SGM scheme compare", "error": str(exc)[:200]}))


def _scene_line():
    """Production serving path: a 4096x4096 scene through SceneRunner
    (1024^2 tiles + SGM halos, per-tile host round trips + atomic
    checkpoints + stitch) — the CARS-style large-scene contract.

    On this environment the number is HOST-IO-BOUND: every tile ships
    ~20 MB through the remote axon tunnel (~0.5 s/tile) while the TPU
    compute is ~10 ms/tile; on a directly-attached TPU host (PCIe DMA)
    the same path runs ~50x faster.  Reported for completeness under
    --scene, not as a chip-performance metric."""
    import shutil
    import tempfile

    from pandora_tpu.parallel.scene import SceneRunner

    rows = cols = 4096
    rng = np.random.default_rng(7)
    left = (rng.random((rows, cols), np.float32) * 255).astype(np.float32)
    right = np.roll(left, -11, axis=1) + rng.normal(0, 2, (rows, cols)).astype(np.float32)

    def read_block(r0, c0, nr, nc):
        return left[r0 : r0 + nr, c0 : c0 + nc], right[r0 : r0 + nr, c0 : c0 + nc]

    workdir = tempfile.mkdtemp(prefix="bench_scene_")
    try:
        runner = SceneRunner(
            workdir, tile_shape=(1024, 1024),
            dmin=-(NDISP - 1), dmax=0, subpix=1, window_size=5,
            matching_cost="census", optimization="sgm", p1=8.0, p2=32.0,
            refinement="vfit", median_size=3,
        )
        runner.run(read_block, rows, cols)  # warm-up/compile pass
        shutil.rmtree(workdir)
        os.makedirs(workdir)
        t0 = time.time()
        runner._check_meta()
        runner.run(read_block, rows, cols)
        disp, _ = runner.stitch(rows, cols)
        dt = time.time() - t0
        assert disp.shape == (rows, cols)
        print(
            json.dumps(
                {
                    "metric": f"SceneRunner tiled scene e2e ({rows}x{cols}, 1024^2 tiles + halos)",
                    "value": round(rows * cols / 1e6 / dt, 3),
                    "unit": "Mpix/s",
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
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

    # time the headline FIRST, on an idle machine (the auxiliary sections
    # below spawn CPU subprocesses whose load would perturb it), but print
    # it last so the driver's last-line parse picks it up
    dt, _ = _timeit(fn, left, right)
    mpix_s = (ROWS * COLS / 1e6) / dt

    if "--no-accuracy" not in sys.argv:
        _accuracy_line()
        _hw_checks_line()
        _stage_breakdown(left, right)
        _modular_line(left, right)
        _tiling_compare_lines()
    if "--scene" in sys.argv:
        _scene_line()
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
