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


def make_mesh(tp: Optional[int] = None, dp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh with axes (dp, tp). Default: all devices on the tp axis."""
    devs = list(devices) if devices is not None else jax.devices()
    if tp is None:
        tp = len(devs) // dp
    if dp * tp > len(devs) or dp * tp == 0 or len(devs) % (dp * tp) != 0:
        raise ValueError(f"dp({dp}) * tp({tp}) incompatible with device count ({len(devs)})")
    devs = devs[: dp * tp]
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


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
