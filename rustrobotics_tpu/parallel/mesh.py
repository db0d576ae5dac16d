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


def make_mesh_2d(blocks: int, replicas: int,
                 axes=("replica", "blocks"), devices=None) -> Mesh:
    """2-D (replica x blocks) mesh — SURVEY §5's explicit
    "graph-block axis x replica axis" layout.

    The BLOCKS axis is the fast (innermost) device dimension so ring
    ppermutes for halo exchange ride contiguous ICI neighbors; the
    REPLICA axis (data-parallel multi-start / batched graphs, only
    psum'd once at result selection) takes the slow dimension — across
    hosts it maps to DCN, which only ever carries replica-level traffic,
    never the per-CG-round separator exchanges.
    """
    if devices is None:
        devices = jax.devices()
    need = blocks * replicas
    if len(devices) < need:
        raise ValueError(
            f"requested {blocks}x{replicas} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:need]).reshape(replicas, blocks)
    return Mesh(grid, tuple(axes))
