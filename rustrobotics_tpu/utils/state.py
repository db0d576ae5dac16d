"""Gaussian state container (reference: src/utils/state.rs:4-12).

A pytree dataclass instead of a generic struct: ``x`` has shape (..., D) and
``cov`` (..., D, D) so a *batch of Gaussians* (particle clouds, per-device
shards, banks of filters) is the same type as a single one — leading batch
axes come from vmap/shard_map, not from container types.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class GaussianState:
    """Mean + covariance. x: (..., D), cov: (..., D, D)."""

    x: jnp.ndarray
    cov: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.x.shape[-1]
