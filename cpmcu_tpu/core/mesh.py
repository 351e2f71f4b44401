"""Device mesh and distributed runtime.

The CUDA reference is strictly single-device (SURVEY.md §2.9) — this module
is the TPU-native addition: a ``jax.sharding.Mesh`` spanning ICI (intra-slice)
and DCN (inter-slice) with named axes, plus multi-host initialization.

Axis convention:
  * ``dp``  — data / request parallelism (continuous batching shards).
  * ``tp``  — tensor parallelism: attention heads and FFN intermediate dim.

Sequence parallelism for long-context prefill reuses ``tp`` (the sequence is
all-gathered for attention, sharded for the MLP), matching the usual
inference-time Megatron-SP layout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP = "dp"
AXIS_TP = "tp"


def create_mesh(
    tp_size: int = 1,
    dp_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (dp, tp) mesh.

    With one device this degenerates to a 1x1 mesh so all sharding
    annotations stay valid single-chip (they become no-ops).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tp_size * dp_size == 0:
        # auto: all devices to tp
        tp_size, dp_size = n, 1
    if tp_size * dp_size > n:
        raise ValueError(
            f"mesh {dp_size}x{tp_size} needs {dp_size * tp_size} devices, have {n}"
        )
    devs = np.asarray(devices[: dp_size * tp_size]).reshape(dp_size, tp_size)
    return Mesh(devs, (AXIS_DP, AXIS_TP))


def init_distributed(coordinator: Optional[str] = None, num_processes: int = 1, process_id: int = 0):
    """Multi-host bring-up (no-op single-process).

    TPU-native replacement for the communication backend the reference lacks
    (SURVEY.md §5.8): ``jax.distributed.initialize`` wires up the DCN-level
    coordination service so ``jax.devices()`` sees the full pod slice.
    """
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
