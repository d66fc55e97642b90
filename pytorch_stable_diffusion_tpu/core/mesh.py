"""Device-mesh helpers.

The reference is single-device (SURVEY §2.3 — no torch.distributed anywhere);
its only "device management" is the CPU-offload ``idle_device`` swap
(``/root/reference/sd/pipeline.py:80-85``).  TPU-natively we instead keep all
weights HBM-resident and scale out over an ICI mesh: ``data`` axis for batch
parallel generation, ``model`` axis for tensor-parallel matmuls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Default: all devices on the data axis (the BASELINE.json v5e-8 DP config).
    The model axis is laid out innermost so tensor-parallel collectives ride
    the fastest ICI hops.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dim ``axis`` of an ndim-array over the data mesh axis."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def local_batch(global_batch: int, mesh: Mesh) -> int:
    d = mesh.shape[DATA_AXIS]
    if global_batch % d:
        raise ValueError(f"batch {global_batch} not divisible by data axis {d}")
    return global_batch // d
