"""Static landmark lookup table.

The reference keeps landmarks in a ``FxHashMap<u32, state>`` and filters
skip measurements whose id is missing (extended_kalman_filter.rs:144-159,
particle_filter.rs:200-211). Hash maps don't exist inside jit; instead we
store a sorted id array + a dense position array and resolve ids with
``searchsorted`` — O(log K) gather, fully vectorized, with a validity mask
replacing the reference's ``filter(...contains_key...)``.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class LandmarkTable:
    ids: jnp.ndarray  # (K,) sorted int32
    positions: jnp.ndarray  # (K, D)

    @classmethod
    def create(cls, ids, positions) -> "LandmarkTable":
        ids = np.asarray(ids, dtype=np.int32)
        positions = np.asarray(positions)
        order = np.argsort(ids)
        return cls(ids=jnp.asarray(ids[order]), positions=jnp.asarray(positions[order]))

    def lookup(self, query_ids):
        """query_ids (...,) -> (positions (..., D), valid (...,) bool)."""
        idx = jnp.searchsorted(self.ids, query_ids)
        idx = jnp.clip(idx, 0, self.ids.shape[0] - 1)
        valid = self.ids[idx] == query_ids
        return self.positions[idx], valid
