"""SE(2) poses as (..., 3) arrays ``[x, y, theta]``.

Covers what the reference gets from nalgebra's ``Isometry2`` in the PGO
backend (src/mapping/pose_graph_optimization.rs:434-455): compose, inverse,
the residual chart ``v3`` (translation + wrapped angle), and the boxplus
retraction used by ``update_nodes`` (pose_graph_optimization.rs:233-237):
``t += dt, R *= exp(dtheta)``.

All functions operate on trailing dims and broadcast, so a whole pose array
is transformed in one fused XLA op — no per-node loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from rustrobotics_tpu.utils.angles import wrap_angle


def rotmat(theta) -> jnp.ndarray:
    """(...,) -> (..., 2, 2) rotation matrices."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def compose(a, b) -> jnp.ndarray:
    """a ∘ b for (..., 3) poses."""
    ra = rotmat(a[..., 2])
    t = a[..., :2] + jnp.einsum("...ij,...j->...i", ra, b[..., :2])
    theta = wrap_angle(a[..., 2] + b[..., 2])
    return jnp.concatenate([t, theta[..., None]], axis=-1)


def inverse(a) -> jnp.ndarray:
    """a^{-1} for (..., 3) poses."""
    ra_t = jnp.swapaxes(rotmat(a[..., 2]), -1, -2)
    t = -jnp.einsum("...ij,...j->...i", ra_t, a[..., :2])
    return jnp.concatenate([t, -a[..., 2:3]], axis=-1)


def transform(pose, points) -> jnp.ndarray:
    """Apply pose (..., 3) to points (..., 2)."""
    r = rotmat(pose[..., 2])
    return pose[..., :2] + jnp.einsum("...ij,...j->...i", r, points)


def retract(pose, delta) -> jnp.ndarray:
    """Boxplus of the reference's update_nodes: additive translation,
    rotation composed on the right (equivalent to additive wrapped angle)."""
    return jnp.concatenate(
        [pose[..., :2] + delta[..., :2], wrap_angle(pose[..., 2:3] + delta[..., 2:3])],
        axis=-1,
    )


def relative(a, b) -> jnp.ndarray:
    """a^{-1} ∘ b."""
    ra_t = jnp.swapaxes(rotmat(a[..., 2]), -1, -2)
    t = jnp.einsum("...ij,...j->...i", ra_t, b[..., :2] - a[..., :2])
    theta = wrap_angle(b[..., 2] - a[..., 2])
    return jnp.concatenate([t, theta[..., None]], axis=-1)
