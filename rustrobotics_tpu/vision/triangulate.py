"""Linear (DLT) triangulation — reference README Todo "Triangulation".

Each observation (P_i, x_i) contributes two homogeneous constraints on
the 3D point X: x u_i p3_i - p1_i and y v_i p3_i - p2_i. Stacking all
views gives A X_h = 0, solved by the smallest right singular vector.

TPU shape: the per-point solve is a tiny SVD; whole point CLOUDS
triangulate as one vmapped batch (N, 2V, 4) — thousands of points per
dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _triangulate_one(ps, obs, mask):
    """ps (V, 3, 4) cameras, obs (V, 2) pixels, mask (V,) valid views."""
    a = jnp.concatenate([
        obs[:, 0:1] * ps[:, 2] - ps[:, 0],
        obs[:, 1:2] * ps[:, 2] - ps[:, 1],
    ], axis=0)  # (2V, 4)
    w = jnp.repeat(mask.astype(a.dtype), 2)
    a = a * w[:, None]
    with jax.default_matmul_precision("highest"):
        _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    xh = vt[-1]
    return xh[:3] / xh[3]


def triangulate(ps, obs, mask=None):
    """Batched DLT triangulation.

    ps (V, 3, 4): projection matrices; obs (N, V, 2): pixel observations
    of N points in V views; mask (N, V) optional visibility.
    Returns (N, 3) world points.
    """
    n, v = obs.shape[:2]
    if mask is None:
        mask = jnp.ones((n, v), bool)
    return jax.vmap(lambda o, m: _triangulate_one(ps, o, m))(obs, mask)


def triangulate_pair(p1, p2, x1, x2):
    """Two-view convenience: x1, x2 (N, 2) -> (N, 3)."""
    ps = jnp.stack([p1, p2])
    obs = jnp.stack([x1, x2], axis=1)
    return triangulate(ps, obs)
