"""SE(3) poses as (..., 7) arrays ``[tx, ty, tz, qw, qx, qy, qz]``.

The reference parses SE3 vertices/edges (src/mapping/g2o.rs:70-78,114-137)
and has the g2o-ported SO(3)-log Jacobian machinery
(src/mapping/se2_se3.rs:36-89) but every SE3 code path in its optimizer hits
``todo!()`` (pose_graph_optimization.rs:357-358,241-242) — 3D PGO never runs.
Here SE(3) is a first-class citizen: quaternion algebra, exp/log maps, and a
right-perturbation retraction, all batched array ops (vmap for batching,
jacfwd for linearization).

Note the reference's parser builds quaternions with nalgebra's (w,x,y,z)
constructor but passes (qx,qy,qz,qw) (g2o.rs:18-22) — a scrambled-rotation
bug we intentionally do not reproduce.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a, b):
    """Hamilton product for (..., 4) wxyz quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_mat(q):
    """(..., 4) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return r


def so3_exp(omega):
    """Rotation-vector (..., 3) -> quaternion (..., 4), safe at 0."""
    theta2 = jnp.sum(jnp.square(omega), axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + 1e-32)
    half = 0.5 * theta
    # sin(t/2)/t with a series fallback near 0
    small = theta2 < 1e-12
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * omega], axis=-1)


def so3_log(q):
    """Quaternion (..., 4) -> rotation vector (..., 3), safe at identity."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # take the w >= 0 cover
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn2 = jnp.sum(jnp.square(v), axis=-1, keepdims=True)
    vn = jnp.sqrt(vn2 + 1e-32)
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn2 < 1e-14
    k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), angle / vn)
    return k * v


def skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrices
    (capability of src/mapping/se2_se3.rs:70-78)."""
    zero = jnp.zeros_like(v[..., 0])
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def compose(a, b):
    """a ∘ b for (..., 7) poses."""
    t = a[..., :3] + quat_rotate(a[..., 3:], b[..., :3])
    q = quat_normalize(quat_mul(a[..., 3:], b[..., 3:]))
    return jnp.concatenate([t, q], axis=-1)


def inverse(a):
    qc = quat_conj(a[..., 3:])
    t = -quat_rotate(qc, a[..., :3])
    return jnp.concatenate([t, qc], axis=-1)


def relative(a, b):
    """a^{-1} ∘ b."""
    return compose(inverse(a), b)


def retract(pose, delta):
    """Boxplus: t += dt (global), q <- q ∘ exp(domega) (right/local
    rotation perturbation). delta: (..., 6) = [dt, domega]."""
    t = pose[..., :3] + delta[..., :3]
    q = quat_normalize(quat_mul(pose[..., 3:], so3_exp(delta[..., 3:])))
    return jnp.concatenate([t, q], axis=-1)


def log(pose):
    """Pose -> (..., 6) chart [t, so3_log(q)] (translation left as-is)."""
    return jnp.concatenate([pose[..., :3], so3_log(pose[..., 3:])], axis=-1)


def identity(shape=(), dtype=jnp.float32):
    out = jnp.zeros(tuple(shape) + (7,), dtype=dtype)
    return out.at[..., 3].set(1.0)


def transform(pose, points):
    """Apply a (..., 7) pose to (..., 3) points: R(q) p + t."""
    return pose[..., :3] + quat_rotate(pose[..., 3:], points)
