"""Margin calculus for windowed / global-influence pipeline steps.

Pure-dataclass re-design of the reference margin model
(reference: src/pandora/margins/margins.py:36-158, marge.py:85-106):
each step declares a :class:`Margins`; *cumulative* steps (matching cost,
aggregation, optimization, refinement, disparity) sum, *non-cumulative*
steps (filters) take the element-wise max.  The global margins are the
element-wise max of the cumulative sum and each non-cumulative entry
(the reference's ``max_margins`` semantics).

These margins drive two things in the TPU engine:

* host-side ROI reads (read a window enlarged by the global margins), and
* the halo width of the spatial tiling in :mod:`pandora_tpu.parallel`
  (plus ``max(|disp|)`` on the column axis for the disparity gather).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class Margins:
    """Left/up/right/down margins in pixels (all >= 0)."""

    left: int = 0
    up: int = 0
    right: int = 0
    down: int = 0

    def __post_init__(self):
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v < 0:
                raise ValueError(f"margin {f.name} must be >= 0, got {v}")

    def __add__(self, other: "Margins") -> "Margins":
        return Margins(
            self.left + other.left,
            self.up + other.up,
            self.right + other.right,
            self.down + other.down,
        )

    def max(self, other: "Margins") -> "Margins":
        return Margins(
            max(self.left, other.left),
            max(self.up, other.up),
            max(self.right, other.right),
            max(self.down, other.down),
        )

    @property
    def astuple(self):
        return (self.left, self.up, self.right, self.down)

    def to_dict(self):
        return {"left": self.left, "up": self.up, "right": self.right, "down": self.down}


def half_window_margins(window_size: int) -> Margins:
    """Margins of a centered odd square window (reference descriptors
    HalfWindowMargins, margins/descriptors.py:45-77)."""
    half = (window_size - 1) // 2
    return Margins(half, half, half, half)


def uniform_margins(value: int) -> Margins:
    """Uniform margins on the four sides (reference UniformMargins; SGM uses
    40, marge.py:86-89)."""
    return Margins(value, value, value, value)


NULL_MARGINS = Margins(0, 0, 0, 0)

# SGM's influence is theoretically global; the reference truncates it to a
# 40 px halo (marge.py:86-89, optimization/optimization.py:43).  We keep the
# same truncation as the tiling halo for the block-parallel SGM scans.
SGM_MARGINS = uniform_margins(40)


class GlobalMargins:
    """Accumulates per-step margins into the run-global margins.

    Mirrors reference GlobalMargins (margins/margins.py:73-143): global =
    MAX(sum of cumulatives, each non-cumulative) element-wise — the
    non-cumulative filters overlap the cumulative pipeline reach rather
    than stacking on top of it.
    """

    def __init__(self):
        self._cumulative: dict[str, Margins] = {}
        self._non_cumulative: dict[str, Margins] = {}

    def add_cumulative(self, step: str, margins: Margins) -> None:
        if step in self._non_cumulative:
            raise KeyError(f"{step} is already a non-cumulative margins")
        self._cumulative[step] = margins

    def add_non_cumulative(self, step: str, margins: Margins) -> None:
        if step in self._cumulative:
            raise KeyError(f"{step} is already a cumulative margins")
        self._non_cumulative[step] = margins

    @property
    def cumulative_margins(self) -> Margins:
        total = NULL_MARGINS
        for m in self._cumulative.values():
            total = total + m
        return total

    @property
    def non_cumulative_margins(self) -> Margins:
        total = NULL_MARGINS
        for m in self._non_cumulative.values():
            total = total.max(m)
        return total

    @property
    def global_margins(self) -> Margins:
        # max_margins([cumulatives.sum(), *non_cumulatives], margins.py:126)
        return self.cumulative_margins.max(self.non_cumulative_margins)

    def to_dict(self):
        # per-step breakdown, exactly the reference's persisted shape
        # (margins/margins.py:129-135 → output cfg "margins" section)
        return {
            "cumulative margins": {
                s: m.to_dict() for s, m in self._cumulative.items()
            },
            "non-cumulative margins": {
                s: m.to_dict() for s, m in self._non_cumulative.items()
            },
            "global margins": self.global_margins.to_dict(),
        }

    def get(self, step: str):
        """Margins registered for ``step`` under either kind, else None."""
        if step in self._cumulative:
            return self._cumulative[step]
        return self._non_cumulative.get(step)


def get_margins(disp_min: int, disp_max: int, cfg) -> dict:
    """CARS tiling entry point: image read margins for a pipeline config
    (reference pandora.marge.get_margins, marge.py:32-118).

    Starts from the disparity reach ``[disp_max, 0, -disp_min, 0]`` (and
    its mirror for the right image), adds the matching-cost half window,
    the vfit column reach (±1) and the median half filter, then takes the
    element-wise max with the SGM/3SGM 40 px truncated-influence margins;
    left and right get the same (larger) margin.

    :return: ``{"left_margin": [left, up, right, down],
        "right_margin": [...], "disp_min": ..., "disp_max": ...}``
        (plain lists instead of the reference's xarray Dataset).
    """
    r_marg = [disp_max, 0, -disp_min, 0]
    s_marg = [-disp_min, 0, disp_max, 0]

    window_size = cfg["matching_cost"]["window_size"]
    if window_size != 1:
        half = int(window_size / 2)
        r_marg = [m + half for m in r_marg]
        s_marg = [m + half for m in s_marg]

    if cfg.get("refinement", {}).get("refinement_method") == "vfit":
        for marg in (r_marg, s_marg):
            marg[0] += 1
            marg[2] += 1

    if cfg.get("filter", {}).get("filter_method") == "median":
        half = int(cfg["filter"]["filter_size"] / 2)
        r_marg = [m + half for m in r_marg]
        s_marg = [m + half for m in s_marg]

    if cfg.get("optimization", {}).get("optimization_method") in ("sgm", "3sgm"):
        sgm = SGM_MARGINS.left
        r_opt = [sgm + disp_max, sgm, sgm - disp_min, sgm]
        s_opt = [sgm - disp_min, sgm, sgm + disp_max, sgm]
        r_marg = [max(a, b) for a, b in zip(r_marg, r_opt)]
        s_marg = [max(a, b) for a, b in zip(s_marg, s_opt)]

    same = [max(a, b) for a, b in zip(r_marg, s_marg)]
    return {
        "left_margin": same,
        "right_margin": list(same),
        "disp_min": disp_min,
        "disp_max": disp_max,
    }
