"""Opt-in time + memory profiler (TPU-native rework of the reference's
decorator profiler, profiler.py:59-375).

Same façade and config surface as the reference:

* ``"profiling": true`` or ``{"save_graphs": ..., "save_raw_data": ...}``
  at the config root enables it (profiler.py:59-100);
* ``@profile(name, memprof=True)`` decorates hot functions and records
  (level, parent, name, uuid, time, call_time, memory) rows keyed by a
  call-stack of uuids (profiler.py:254-328);
* ``Profiler.generate_summary(out)`` writes ``out/profiling/``
  (profiler.py:121-168);
* zero overhead when disabled (profiler.py:281-282).

TPU-native differences (SURVEY.md §5.1):

* timing is device-true: the wrapped function's jax outputs are
  ``jax.block_until_ready``-ed before the clock stops, so a row measures
  compile+execute rather than async dispatch;
* memory has two columns: host peak RSS (sampled from ``/proc/self/status``
  by a 50 ms thread, replacing the psutil/Pipe MemProf of profiler.py:331-375)
  and device HBM ``bytes_in_use`` from ``jax.local_devices()`` memory stats;
* ``{"trace_dir": path}`` in the profiling config additionally wraps the run
  in a ``jax.profiler.trace`` so TensorBoard/XProf can inspect XLA ops.
"""

from __future__ import annotations

import functools
import json
import os
import threading
import time
import uuid as uuid_mod
from typing import Any, Callable, Dict, List, Optional


def _rss_mib() -> float:
    """Current process resident set size in MiB (host)."""
    try:
        with open("/proc/self/status", "r", encoding="ascii") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _device_bytes_in_use() -> Optional[int]:
    """HBM bytes in use on the first addressable device, when the backend
    exposes memory_stats (TPU/GPU do; CPU returns None)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return int(stats.get("bytes_in_use", 0))
    except Exception:  # pragma: no cover - backend-dependent
        pass
    return None


class _MemSampler:
    """50 ms host-RSS peak sampler (replaces the reference MemProf thread +
    multiprocessing.Pipe, profiler.py:331-375)."""

    def __init__(self, interval: float = 0.05):
        self._interval = interval
        self._stop = threading.Event()
        self.peak = _rss_mib()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            self.peak = max(self.peak, _rss_mib())

    def __enter__(self) -> "_MemSampler":
        self._thread.start()
        return self

    def __exit__(self, *exc: Any) -> None:
        self._stop.set()
        self._thread.join()
        self.peak = max(self.peak, _rss_mib())


class Profiler:
    """Class-level profiling registry (mirrors reference Profiler)."""

    enabled = False
    save_graphs = False
    save_raw_data = False
    trace_dir: Optional[str] = None
    _rows: List[Dict[str, Any]] = []
    _stack: List[str] = []  # uuids of currently-running profiled calls
    _trace_active = False

    @staticmethod
    def enable_from_config(conf: Dict[str, Any]) -> None:
        """Enable from the root-level ``profiling`` config key
        (profiler.py:59-100)."""
        base_conf = conf.get("profiling", False)
        if isinstance(base_conf, bool):
            base_conf = {"save_graphs": base_conf, "save_raw_data": base_conf}
        elif isinstance(base_conf, dict):
            base_conf = {
                "save_graphs": bool(base_conf.get("save_graphs", False)),
                "save_raw_data": bool(base_conf.get("save_raw_data", False)),
                "trace_dir": base_conf.get("trace_dir"),
            }
        else:
            raise TypeError("The 'profiling' key has to be either a dict or a boolean.")
        Profiler.save_graphs = base_conf["save_graphs"]
        Profiler.save_raw_data = base_conf["save_raw_data"]
        Profiler.trace_dir = base_conf.get("trace_dir")
        Profiler.enabled = (
            Profiler.save_graphs or Profiler.save_raw_data or Profiler.trace_dir is not None
        )
        if Profiler.enabled and Profiler.trace_dir:
            import jax

            jax.profiler.start_trace(Profiler.trace_dir)
            Profiler._trace_active = True

    @staticmethod
    def reset() -> None:
        Profiler.enabled = False
        Profiler.save_graphs = False
        Profiler.save_raw_data = False
        Profiler.trace_dir = None
        Profiler._rows = []
        Profiler._stack = []

    @staticmethod
    def add_row(row: Dict[str, Any]) -> None:
        Profiler._rows.append(row)

    @staticmethod
    def rows() -> List[Dict[str, Any]]:
        return list(Profiler._rows)

    @staticmethod
    def generate_summary(base_output: str) -> None:
        """Write ``<out>/profiling/``: raw rows (json + pandas pickle for
        parity with the reference raw_data.pickle), a per-name aggregate
        csv, and a text call tree (stand-in for the plotly icicle when
        plotly is absent)."""
        if Profiler._trace_active:
            import jax

            jax.profiler.stop_trace()
            Profiler._trace_active = False
        if not Profiler.enabled or not (Profiler.save_graphs or Profiler.save_raw_data):
            return
        output = os.path.join(base_output, "profiling")
        os.makedirs(output, exist_ok=True)
        rows = Profiler._rows
        if Profiler.save_raw_data:
            with open(os.path.join(output, "raw_data.json"), "w", encoding="utf-8") as fh:
                json.dump(rows, fh, indent=1)
            try:
                import pandas as pd

                pd.DataFrame(rows).to_pickle(os.path.join(output, "raw_data.pickle"))
            except ImportError:  # pragma: no cover
                pass
        if Profiler.save_graphs:
            # per-name aggregate
            agg: Dict[str, Dict[str, float]] = {}
            for r in rows:
                a = agg.setdefault(r["name"], {"calls": 0, "time": 0.0, "mem": 0.0, "hbm": 0})
                a["calls"] += 1
                a["time"] += r["time"]
                a["mem"] = max(a["mem"], r["memory"] or 0.0)
                a["hbm"] = max(a["hbm"], r["device_bytes"] or 0)
            with open(os.path.join(output, "summary.csv"), "w", encoding="utf-8") as fh:
                fh.write("name,calls,total_time_s,peak_host_mib,peak_device_bytes\n")
                for name, a in sorted(agg.items(), key=lambda kv: -kv[1]["time"]):
                    fh.write(f"{name},{a['calls']},{a['time']:.6f},{a['mem']:.1f},{a['hbm']}\n")
            # text icicle: indentation by level, ordered by call time
            with open(os.path.join(output, "call_tree.txt"), "w", encoding="utf-8") as fh:
                for r in sorted(rows, key=lambda r: r["call_time"]):
                    fh.write(
                        f"{'  ' * r['level']}{r['name']}: {r['time']:.4f}s"
                        f" host={r['memory'] or 0:.0f}MiB"
                        f" hbm={(r['device_bytes'] or 0) / 2**20:.0f}MiB\n"
                    )
            _write_icicle_html(os.path.join(output, "time_graph.html"), rows)


_ICICLE_COLORS = (
    "#4e79a7", "#f28e2b", "#59a14f", "#e15759", "#76b7b2",
    "#edc948", "#b07aa1", "#9c755f",
)


def _write_icicle_html(path: str, rows: List[Dict[str, Any]]) -> None:
    """Self-contained HTML+SVG icicle time graph — the human-facing
    artifact matching the reference's plotly ``time_graph.html``
    (profiler.py:121-168) with zero dependencies: each profiled call is a
    box at depth ``level``, x-positioned by wall-clock start, width
    proportional to duration; hover shows name/time/memory."""
    if not rows:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write("<html><body>no profiled calls</body></html>")
        return
    t0 = min(r["call_time"] for r in rows)
    t1 = max(r["call_time"] + r["time"] for r in rows)
    span = max(t1 - t0, 1e-9)
    width, row_h, pad = 1200, 34, 2
    n_levels = max(r["level"] for r in rows) + 1
    height = n_levels * (row_h + pad) + 30
    boxes = []
    from html import escape

    for i, r in enumerate(sorted(rows, key=lambda r: r["call_time"])):
        x = (r["call_time"] - t0) / span * width
        w = max(r["time"] / span * width, 1.5)
        y = r["level"] * (row_h + pad)
        color = _ICICLE_COLORS[i % len(_ICICLE_COLORS)]
        name = escape(str(r["name"]))
        tip = (
            f"{name}: {r['time']:.4f}s"
            f" | host {r['memory'] or 0:.0f} MiB"
            f" | hbm {(r['device_bytes'] or 0) / 2**20:.0f} MiB"
        )
        label = name if w > 8 * len(name) else ""
        boxes.append(
            f'<g><rect x="{x:.1f}" y="{y}" width="{w:.1f}" height="{row_h}" '
            f'fill="{color}" rx="3"><title>{tip}</title></rect>'
            f'<text x="{x + 4:.1f}" y="{y + row_h * 0.65:.1f}" font-size="12" '
            f'fill="#fff">{label}</text></g>'
        )
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="sans-serif">'
        + "".join(boxes)
        + f'<text x="0" y="{height - 8}" font-size="11" fill="#666">'
        f"total {span:.3f}s — hover boxes for timings</text></svg>"
    )
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(
            "<!doctype html><html><head><meta charset='utf-8'>"
            "<title>pandora_tpu profiling</title></head><body>"
            f"<h3>Call icicle ({len(rows)} profiled calls)</h3>{svg}</body></html>"
        )


def _block_outputs(result: Any) -> None:
    """block_until_ready on any jax arrays in the result pytree so the
    timer measures device completion, not async dispatch."""
    try:
        import jax

        jax.block_until_ready(result)
    except Exception:
        pass


def profile(
    name: Optional[str] = None, interval: float = 0.05, memprof: bool = False
) -> Callable:
    """Profiling decorator (reference profiler.profile, profiler.py:254-328).

    Zero overhead when ``Profiler.enabled`` is False.
    """

    def decorator(fn: Callable) -> Callable:
        fn_name = name if name is not None else fn.__name__

        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any):
            if not Profiler.enabled:
                return fn(*args, **kwargs)
            call_uuid = str(uuid_mod.uuid4())
            level = len(Profiler._stack)
            parent = Profiler._stack[-1] if Profiler._stack else "root"
            Profiler._stack.append(call_uuid)
            call_time = time.time()
            start = time.perf_counter()
            try:
                if memprof:
                    with _MemSampler(interval) as sampler:
                        result = fn(*args, **kwargs)
                        _block_outputs(result)
                    mem = sampler.peak
                else:
                    result = fn(*args, **kwargs)
                    _block_outputs(result)
                    mem = None
            finally:
                Profiler._stack.pop()
            elapsed = time.perf_counter() - start
            Profiler.add_row(
                {
                    "level": level,
                    "parent": parent,
                    "name": fn_name,
                    "uuid": call_uuid,
                    "time": elapsed,
                    "call_time": call_time,
                    "memory": mem,
                    "device_bytes": _device_bytes_in_use(),
                }
            )
            return result

        return wrapper

    return decorator
