"""Device mesh construction for tensor/data-parallel inference.

The reference has no distributed anything (SURVEY.md §2.3-2.4: goroutine
fan-out only); this is the TPU-native replacement: a ``jax.sharding.Mesh``
with ``("dp", "tp")`` axes. XLA emits the collectives (psum after the
attention output and FFN down projections) from sharding annotations — the
ICI/DCN analogue of the reference's channel funnels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(tp: Optional[int] = None, dp: int = 1, sp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh with axes (dp, sp, tp). Defaults put all devices on tp; the sp
    (sequence-parallel) axis shards the prefill sequence dimension — specs
    that never mention "sp" are unaffected by its presence."""
    devs = list(devices) if devices is not None else jax.devices()
    if tp is None:
        tp = len(devs) // (dp * sp)
    total = dp * sp * tp
    if total > len(devs) or total == 0 or len(devs) % max(total, 1) != 0:
        raise ValueError(
            f"dp({dp}) * sp({sp}) * tp({tp}) incompatible with device count ({len(devs)})")
    arr = np.array(devs[:total]).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host process-group init (jax.distributed). No-op when the env
    provides no coordinator (single-host)."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
