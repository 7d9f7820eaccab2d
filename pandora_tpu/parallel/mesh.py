"""Device-mesh construction for distributed stereo matching.

The reference has no distributed compute — it delegates scale-out to CARS
via ROI windows + margins (SURVEY §2.5).  Here distribution is first-class:

* axis ``data``  — independent stereo pairs (batch) across hosts/chips (DCN
  for multi-host, the stereo analogue of data parallelism);
* axis ``tile``  — column-wise spatial tiling of one scene across chips
  with disparity-aware halo exchange over ICI (the sequence/context
  parallel analogue; SGM path scans use the reference's 40 px truncated
  influence margin, marge.py:86-89, as the halo).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_data: int = 1,
    n_tile: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "tile") mesh over the available devices.

    ``n_tile`` defaults to len(devices) // n_data."""
    devices = list(devices if devices is not None else jax.devices())
    if n_tile is None:
        n_tile = len(devices) // n_data
    if n_data * n_tile > len(devices):
        raise ValueError(f"mesh {n_data}x{n_tile} exceeds {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(grid, axis_names=("data", "tile"))


def make_mesh2d(
    n_data: int = 1,
    n_row: int = 1,
    n_col: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "row", "col") mesh for 2-D spatial tiling — the
    stereo analogue of 2-D context parallelism (SURVEY §2.5), replacing the
    reference's (row, col) ROI windows (img_tools.get_window)."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_row * n_col
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_row}x{n_col} exceeds {len(devices)} devices")
    grid = np.asarray(devices[:need]).reshape(n_data, n_row, n_col)
    return Mesh(grid, axis_names=("data", "row", "col"))
