"""Device-mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_devices: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (all by default).

    On a pod slice this is the ICI axis; in tests it is the virtual
    8-device CPU mesh.
    """
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))
