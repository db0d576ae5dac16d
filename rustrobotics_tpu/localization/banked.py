"""Banked (lane-major) batched EKF: the fleet axis lives on TPU lanes.

The obvious way to run B independent filters — ``jax.vmap`` over a
``(B, D, D)`` covariance stack (reference analog: one filter object per
robot, extended_kalman_filter.rs:10-78) — is a pathological TPU layout:
the minor (D, D) = (4, 4) matrices occupy 16 of each (8, 128) f32
tile's 1024 slots, so every step is ~64x padded memory traffic.
Measured on the v5e: 1.4 Mupdates/s, FLAT in B from 4k to 262k
(bandwidth-bound on padding), and ``vmap(in_axes=-1)`` does not help —
vmap transposes the mapped axis to the front internally.

The banked layout stores the bank as the LAST axis — x ``(D, B)``,
cov ``(D, D, B)`` — so the B axis falls on the 128-wide vector lanes
and every matrix product is a fully-dense elementwise/FMA sweep
(``einsum "ijb,jkb->ikb"``). Same math, same results, 10x the
throughput: 14.3 Mupdates/s at B = 262144 on the v5e.

Innovation inverses use closed-form adjugates (M <= 3), keeping the
whole step free of ``jnp.linalg`` batch-leading-layout requirements.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp


def bmm(a, b):
    """(i,j,B) @ (j,k,B) -> (i,k,B): banked matmul (B on lanes)."""
    return jnp.einsum("ijb,jkb->ikb", a, b)


def bmv(a, x):
    """(i,j,B) @ (j,B) -> (i,B): banked matvec."""
    return jnp.einsum("ijb,jb->ib", a, x)


def bt(a):
    """Banked transpose: (i,j,B) -> (j,i,B)."""
    return a.transpose(1, 0, 2)


def binv(s):
    """Closed-form banked inverse of (m,m,B) for m in {1,2,3}."""
    m = s.shape[0]
    if m == 1:
        return 1.0 / s
    if m == 2:
        det = s[0, 0] * s[1, 1] - s[0, 1] * s[1, 0]
        return jnp.stack([
            jnp.stack([s[1, 1], -s[0, 1]]),
            jnp.stack([-s[1, 0], s[0, 0]]),
        ]) / det
    if m == 3:
        c00 = s[1, 1] * s[2, 2] - s[1, 2] * s[2, 1]
        c01 = s[1, 2] * s[2, 0] - s[1, 0] * s[2, 2]
        c02 = s[1, 0] * s[2, 1] - s[1, 1] * s[2, 0]
        det = s[0, 0] * c00 + s[0, 1] * c01 + s[0, 2] * c02
        c10 = s[0, 2] * s[2, 1] - s[0, 1] * s[2, 2]
        c11 = s[0, 0] * s[2, 2] - s[0, 2] * s[2, 0]
        c12 = s[0, 1] * s[2, 0] - s[0, 0] * s[2, 1]
        c20 = s[0, 1] * s[1, 2] - s[0, 2] * s[1, 1]
        c21 = s[0, 2] * s[1, 0] - s[0, 0] * s[1, 2]
        c22 = s[0, 0] * s[1, 1] - s[0, 1] * s[1, 0]
        adj = jnp.stack([
            jnp.stack([c00, c10, c20]),
            jnp.stack([c01, c11, c21]),
            jnp.stack([c02, c12, c22]),
        ])
        return adj / det
    raise NotImplementedError(
        f"banked closed-form inverse supports m <= 3, got {m}")


@dataclasses.dataclass(frozen=True)
class BankedEKF:
    """EKF over a bank of B independent filters, bank axis on lanes.

    Model callbacks follow the banked contract (batch LAST everywhere):
      predict(x (D,B), u (U,B), dt)            -> x_pred (D,B)
      jac_x(x (D,B), u (U,B), dt)              -> F (D,D,B)
      measure(x (D,B))                          -> z_pred (M,B)
      jac_z(x (D,B))                            -> H (M,D,B)
    ``q`` (D,D) process noise, ``r`` (M,M) measurement noise (shared
    across the bank; pass (D,D,B)/(M,M,B) for per-filter noise).
    """

    predict: Callable
    jac_x: Callable
    measure: Callable
    jac_z: Callable
    q: jnp.ndarray
    r: jnp.ndarray

    def step(self, x, cov, u, z, dt):
        """One predict+update across the whole bank. x (D,B), cov
        (D,D,B), u (U,B), z (M,B) -> (x', cov')."""
        q = self.q if self.q.ndim == 3 else self.q[:, :, None]
        r = self.r if self.r.ndim == 3 else self.r[:, :, None]

        x_pred = self.predict(x, u, dt)
        f = self.jac_x(x, u, dt)
        cov_pred = bmm(bmm(f, cov), bt(f)) + q

        h = self.jac_z(x_pred)
        y = z - self.measure(x_pred)
        s = bmm(bmm(h, cov_pred), bt(h)) + r
        k = bmm(bmm(cov_pred, bt(h)), binv(s))
        x_new = x_pred + bmv(k, y)
        cov_new = cov_pred - bmm(k, bmm(h, cov_pred))
        return x_new, cov_new


def simple_problem_banked(q, r, dt_default=0.1):
    """Banked EKF for the SimpleProblem 4-state [x, y, yaw, v] model
    (reference motion.rs:197-238 / measurement.rs:68-89): constant-
    velocity unicycle prediction, GPS-like (x, y) observation."""

    def predict(x, u, dt):
        px, py, yaw, v = x
        return jnp.stack([
            px + v * jnp.cos(yaw) * dt,
            py + v * jnp.sin(yaw) * dt,
            yaw + u[1] * dt,
            u[0],
        ])

    def jac_x(x, u, dt):
        yaw = x[2]
        v = u[0]  # reference quirk: jacobian reads v from the CONTROL
        b = x.shape[1]
        zz = jnp.zeros(b, x.dtype)
        oo = jnp.ones(b, x.dtype)
        return jnp.stack([
            jnp.stack([oo, zz, -dt * v * jnp.sin(yaw), dt * jnp.cos(yaw)]),
            jnp.stack([zz, oo, dt * v * jnp.cos(yaw), dt * jnp.sin(yaw)]),
            jnp.stack([zz, zz, oo, zz]),
            jnp.stack([zz, zz, zz, zz]),
        ])

    def measure(x):
        return x[:2]

    def jac_z(x):
        b = x.shape[1]
        h = jnp.zeros((2, 4), x.dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
        return jnp.broadcast_to(h[:, :, None], (2, 4, b))

    return BankedEKF(predict=predict, jac_x=jac_x, measure=measure,
                     jac_z=jac_z, q=q, r=r)
