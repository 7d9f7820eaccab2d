"""Large-scene streaming executor with per-tile checkpoint / resume.

The reference has no checkpointing: its de-facto unit of restartability is
the whole run, and scale-out/resume is delegated to CARS, which re-runs ROI
tiles (SURVEY §5.3/§5.4; img_tools.get_window img_tools.py:61-98 is the ROI
hook).  Here that pattern is first-class: a scene too big for one cost
volume is executed as a grid of overlapping ROI tiles; each finished tile's
disparity block is checkpointed to disk (atomic rename), so a preempted or
failed run resumes by recomputing only the missing tiles — the
checkpoint story multi-host TPU jobs need.

Each tile is read with a margin equal to the tiled-pipeline halo
(``halo_width``/``row_halo_width``: window + max|disp| + 40 px SGM influence
+ filter reach), so within the reference's own tiling contract the stitched
result equals the untiled one.  Tiles stream through the single jitted
program one by one (uniform shapes → one XLA compilation; device compute
overlaps the host's read of the next tile via JAX async dispatch).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from ..fused import make_jitted_pipeline
from .tiling import halo_width, row_halo_width


class SceneRunner:
    """Checkpointed tile-grid execution of the fused stereo pipeline.

    :param workdir: checkpoint directory (one ``.npz`` per finished tile)
    :param tile_shape: interior tile size (rows, cols); every tile is read
        with the halo margin added on each side
    :param cfg: fused-pipeline config (dmin, dmax, window_size, ...)
    """

    def __init__(self, workdir: str, tile_shape: Tuple[int, int] = (512, 512), **cfg):
        self.workdir = workdir
        self.tile_rows, self.tile_cols = tile_shape
        self.cfg = cfg
        fm = cfg.get("median_size", 0) // 2
        use_sgm = cfg.get("optimization") == "sgm"
        self.col_halo = halo_width(
            cfg["dmin"], cfg["dmax"], cfg.get("window_size", 5), use_sgm, fm
        )
        self.row_halo = row_halo_width(cfg.get("window_size", 5), use_sgm, fm)
        os.makedirs(workdir, exist_ok=True)
        self._fn = None
        self._check_meta()

    def _check_meta(self) -> None:
        """Tile checkpoints are only valid for the (cfg, tile_shape) they
        were computed under; refuse to resume across a config change so
        stale tiles are never silently stitched into a new run."""
        meta = {
            "tile_shape": [self.tile_rows, self.tile_cols],
            "cfg": {k: repr(v) for k, v in sorted(self.cfg.items())},
        }
        path = os.path.join(self.workdir, "meta.json")
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                existing = json.load(f)
            if existing != meta:
                has_tiles = any(
                    n.startswith("tile_") and n.endswith(".npz")
                    for n in os.listdir(self.workdir)
                )
                if has_tiles:
                    raise ValueError(
                        f"checkpoint dir {self.workdir} holds tiles computed under a "
                        "different cfg/tile_shape; clear it (or use a fresh workdir) "
                        "before resuming with the new configuration"
                    )
        with open(path, "w", encoding="utf-8") as f:
            json.dump(meta, f)

    # -- checkpoint bookkeeping ------------------------------------------
    def _tile_path(self, ti: int, tj: int) -> str:
        return os.path.join(self.workdir, f"tile_{ti:04d}_{tj:04d}.npz")

    def grid(self, rows: int, cols: int):
        """Tile grid covering (rows, cols)."""
        for ti, r0 in enumerate(range(0, rows, self.tile_rows)):
            for tj, c0 in enumerate(range(0, cols, self.tile_cols)):
                yield ti, tj, r0, c0, min(self.tile_rows, rows - r0), min(
                    self.tile_cols, cols - c0
                )

    def pending(self, rows: int, cols: int):
        """Tiles without a checkpoint."""
        return [t for t in self.grid(rows, cols) if not os.path.exists(self._tile_path(t[0], t[1]))]

    # -- execution --------------------------------------------------------
    def _pipeline(self):
        if self._fn is None:
            self._fn = make_jitted_pipeline(**self.cfg)
        return self._fn

    def run(
        self,
        read_block: Callable[[int, int, int, int], Tuple[np.ndarray, np.ndarray]],
        rows: int,
        cols: int,
        max_failures: int = 0,
    ) -> Dict[str, int]:
        """Compute every pending tile.

        :param read_block: ``(r0, c0, nr, nc) -> (left, right)`` window
            reader (e.g. a partial of ``io.raster.read_raster`` with a
            window — the reference ROI read)
        :param max_failures: tiles allowed to fail before aborting; failed
            tiles stay pending for the next resume
        :return: counters {computed, skipped, failed}
        """
        import jax

        fn = self._pipeline()
        stats = {"computed": 0, "skipped": 0, "failed": 0}
        n_total = sum(1 for _ in self.grid(rows, cols))
        for ti, tj, r0, c0, nr, nc in self.grid(rows, cols):
            path = self._tile_path(ti, tj)
            if os.path.exists(path):
                stats["skipped"] += 1
                continue
            # read the halo-extended window, SLID inward at scene edges so
            # every block holds only real scene data and the scene border
            # coincides with the block border (reproducing the untiled
            # program's border semantics exactly); uniform block shape →
            # one XLA compilation serves every tile
            rh, ch = self.row_halo, self.col_halo
            ext_r = self.tile_rows + 2 * rh
            ext_c = self.tile_cols + 2 * ch
            rr0 = min(max(0, r0 - rh), max(0, rows - ext_r))
            cc0 = min(max(0, c0 - ch), max(0, cols - ext_c))
            try:
                left, right = read_block(
                    rr0, cc0, min(ext_r, rows - rr0), min(ext_c, cols - cc0)
                )
                # A scene smaller than the extended block in some dimension
                # is run at its true extent (the deficient dimension is the
                # same for every tile, so shapes stay uniform and one XLA
                # compilation still serves the whole grid).  Zero-padding
                # instead would move the real scene border into the block
                # interior and let census read fabricated pixels.
                disp, vmask = fn(left, right)
                pr, pc = r0 - rr0, c0 - cc0
                disp = np.asarray(disp)[pr : pr + nr, pc : pc + nc]
                vmask = np.asarray(vmask)[pr : pr + nr, pc : pc + nc]
                tmp = path + ".tmp.npz"
                np.savez(tmp, disp=disp, vmask=vmask, r0=r0, c0=c0)
                os.replace(tmp, path)  # atomic: a tile is done or absent
                stats["computed"] += 1
            except Exception:  # noqa: BLE001 - per-tile fault isolation
                logging.exception("tile (%d, %d) failed", ti, tj)
                stats["failed"] += 1
                if stats["failed"] > max_failures:
                    raise
        logging.info(
            "scene %dx%d: %d/%d tiles done (%d new, %d failed)",
            rows,
            cols,
            stats["computed"] + stats["skipped"],
            n_total,
            stats["computed"],
            stats["failed"],
        )
        return stats

    def stitch(self, rows: int, cols: int) -> Tuple[np.ndarray, np.ndarray]:
        """Assemble the full disparity map + validity mask from checkpoints.

        Raises if any tile is missing (run() first; resume fills gaps)."""
        disp = np.full((rows, cols), np.nan, np.float32)
        vmask = np.zeros((rows, cols), np.uint16)
        for ti, tj, r0, c0, nr, nc in self.grid(rows, cols):
            path = self._tile_path(ti, tj)
            if not os.path.exists(path):
                raise FileNotFoundError(f"tile ({ti}, {tj}) not checkpointed yet: {path}")
            with np.load(path) as blk:
                disp[r0 : r0 + nr, c0 : c0 + nc] = blk["disp"]
                vmask[r0 : r0 + nr, c0 : c0 + nc] = blk["vmask"]
        return disp, vmask
