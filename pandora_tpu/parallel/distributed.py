"""Multi-host (DCN) initialization for batch-of-pairs data parallelism.

The reference has no multi-process story (SURVEY §2.5/§5.8); here hosts
cooperate through ``jax.distributed`` + a global mesh: the ``data`` axis
spans hosts over DCN (independent stereo pairs — no cross-host traffic in
the pipeline itself), while ``tile``/``row``/``col`` axes stay inside a
slice on ICI.

Typical multi-host launch (same program on every host):

    from pandora_tpu.parallel import distributed, make_mesh, tiled_stereo_pipeline
    distributed.initialize()              # env-driven (TPU pods: automatic)
    mesh = make_mesh(n_data=jax.process_count(), n_tile=jax.local_device_count())
    fn = tiled_stereo_pipeline(mesh, ...)
    # feed each host its local shard of the pair batch via
    # jax.make_array_from_process_local_data(sharding, local_batch)
"""

from __future__ import annotations

import logging
import time
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    retries: int = 3,
    retry_delay_s: float = 5.0,
) -> None:
    """``jax.distributed.initialize`` with retry (SURVEY §5.3: the new
    framework needs init-retry where the reference has no failure story).

    With no arguments on Cloud TPU pods, everything is discovered from the
    environment; on CPU/GPU clusters pass coordinator/count/id explicitly.
    Safe to call when already initialized (no-op).
    """
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    last: Optional[Exception] = None
    for attempt in range(retries):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            return
        except RuntimeError as exc:
            if "already" in str(exc).lower():
                return
            last = exc
            logging.warning(
                "jax.distributed.initialize failed (attempt %d/%d): %s",
                attempt + 1,
                retries,
                exc,
            )
            time.sleep(retry_delay_s)
        except ValueError:
            # single-process run without coordinator env: nothing to do
            return
    raise RuntimeError(f"could not initialize jax.distributed: {last}")
