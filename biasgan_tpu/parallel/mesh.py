"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def make_mesh(
    data: int = 1, spatial: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data, spatial) mesh. ``data`` shards the batch axis for
    training; ``spatial`` shards the width (longitude) axis for halo-exchange
    inference. Either can be 1."""
    devices = list(devices) if devices is not None else jax.devices()
    n = data * spatial
    if n > len(devices):
        raise ValueError(
            f"mesh requires {n} devices (data={data} x spatial={spatial}) "
            f"but only {len(devices)} are visible"
        )
    # Single-axis meshes when only one kind of parallelism is active: Pallas
    # remote DMA with LOGICAL device ids only supports one named mesh axis,
    # and a squeezed mesh is what the collectives ride anyway.
    if data > 1 and spatial == 1:
        shape, names = (data,), ("data",)
    elif spatial > 1 and data == 1:
        shape, names = (spatial,), ("spatial",)
    else:
        shape, names = (data, spatial), ("data", "spatial")
    dev = mesh_utils.create_device_mesh(shape, devices=devices[:n])
    return Mesh(dev, names)
