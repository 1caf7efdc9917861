"""Device mesh + sharding helpers.

The reference is single-process single-device (SURVEY §2.3 — no DP/TP/PP
anywhere; device picked by --device-id). The TPU-native framework adds:
  * data-parallel batch sharding over a ('data', 'sp') mesh for training and
    batched diverse-sample generation (64 samples/batch, BASELINE config 5)
  * optional spatial partitioning over H ('sp' axis): XLA's SPMD partitioner
    inserts the conv halo exchanges over ICI automatically — no hand-written
    collectives needed for this model family.
Params/optimizer state stay replicated (models are <=64-channel convs; TP
would be bandwidth-bound for no memory win).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              data_parallel: Optional[int] = None) -> Mesh:
    """('data', 'sp') mesh over the first n_devices devices.

    `data_parallel` fixes the data axis size; the remainder becomes the
    spatial axis. Defaults to all devices on the data axis.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    dp = data_parallel or n
    assert n % dp == 0, f"{n} devices not divisible by data={dp}"
    arr = np.asarray(devices).reshape(dp, n // dp)
    return Mesh(arr, ("data", "sp"))


def select_device(device_id: int) -> None:
    """Honor --device-id on multi-device hosts (reference:
    context.set_context(device_id=...), train_image.py:276): pin default
    placement to jax.devices()[device_id]."""
    if not device_id:
        return
    devices = jax.devices()
    if device_id >= len(devices):
        raise ValueError(
            f"--device-id {device_id} out of range ({len(devices)} devices)")
    jax.config.update("jax_default_device", devices[device_id])


def batch_sharding(mesh: Mesh, ndim: int, spatial_axis: Optional[int] = None):
    """NamedSharding: batch dim over 'data', optionally one spatial dim over
    'sp' (H for images: axis 1 of (B,H,W,C); axis 2 of (B,T,H,W,C))."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_axis is not None and mesh.shape["sp"] > 1:
        spec[spatial_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, spatial_axis: Optional[int] = None):
    return jax.device_put(x, batch_sharding(mesh, x.ndim, spatial_axis))
