"""Device-mesh helpers.

The reference has no distributed machinery (SURVEY.md section 2.3) — its
only fan-out is a host Pool fork and manual scene-range sharding across
process launches. Here scale-out is first-class: a ('data','points') mesh
where independent scene/frame streams ride 'data' (DCN-friendly) and the
accumulated point buffer shards over 'points' (ICI collectives combine
rasters).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ('data', 'points'),
              devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    Default: all devices on 'points' (single scene stream), i.e.
    (1, n_devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (1, n)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f'axis sizes {axis_sizes} != {n} devices')
    arr = np.array(devices).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up via jax.distributed (SURVEY.md section 5:
    communication backend is the JAX runtime, not NCCL/MPI). No-op when
    unconfigured single-process."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
