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

Innovation inverses use closed-form adjugates (M <= 3), and the UKF's
covariance square root is an unrolled lane-major Cholesky (``bchol``),
keeping the whole step free of ``jnp.linalg`` batch-leading-layout
requirements. Measured on the v5e (B = 128k-256k, 100-step scan):
banked EKF 14.3 Mupdates/s (vs 1.4 vmapped), banked UKF 5.5 Mupdates/s
(vs 0.64 vmapped) — 8-10x from layout alone, same math (parity pinned
in tests/test_banked.py).
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


def bchol(a):
    """Banked lower Cholesky of (D,D,B) SPD stacks, D small & static.

    Unrolled Cholesky-Crout: D(D+1)/2 elementwise sqrt/div/FMA sweeps
    over the lane axis — no ``jnp.linalg`` (which would force the bank
    to the leading axis and re-pad every (D, D) into an (8, 128) tile).
    """
    d = a.shape[0]
    l = [[None] * d for _ in range(d)]
    for j in range(d):
        s = a[j, j] - sum((l[j][k] * l[j][k] for k in range(j)),
                          jnp.zeros_like(a[0, 0]))
        l[j][j] = jnp.sqrt(s)
        inv_ljj = 1.0 / l[j][j]
        for i in range(j + 1, d):
            s = a[i, j] - sum((l[i][k] * l[j][k] for k in range(j)),
                              jnp.zeros_like(a[0, 0]))
            l[i][j] = s * inv_ljj
    zero = jnp.zeros_like(a[0, 0])
    return jnp.stack([
        jnp.stack([l[i][j] if j <= i else zero for j in range(d)])
        for i in range(d)
    ])


@dataclasses.dataclass(frozen=True)
class BankedUKF:
    """Scaled-sigma-point UKF over a bank of B filters, bank on lanes.

    Same math as ``localization.ukf.UnscentedKalmanFilter`` (reference
    unscented_kalman_filter.rs:11-186) — scaled sigma points via a
    banked unrolled Cholesky, fresh points around the prediction for
    the update (ukf.rs:144) — but every per-point model evaluation runs
    with the sigma axis FOLDED INTO THE BANK: the (2D+1, D, B) cloud is
    reshaped to (D, (2D+1)·B) so the model callbacks see one wide lane
    sweep, and the weighted moments are einsums over the sigma axis.

    Model callbacks follow the banked contract (batch LAST):
      predict(x (D,Bf), u (U,Bf), dt) -> (D,Bf)
      measure(x (D,Bf))               -> (M,Bf)
    """

    predict: Callable
    measure: Callable
    q: jnp.ndarray  # (D, D) process noise
    r: jnp.ndarray  # (M, M) measurement noise
    mw: jnp.ndarray  # (2D+1,) mean weights
    cw: jnp.ndarray  # (2D+1,) cov weights
    gamma: float

    @classmethod
    def create(cls, predict, measure, q, r,
               alpha=0.001, beta=2.0, kappa=0.0):
        from rustrobotics_tpu.localization.ukf import sigma_weights

        q = jnp.asarray(q)
        mw, cw, gamma = sigma_weights(q.shape[-1], alpha, beta, kappa)
        return cls(predict=predict, measure=measure, q=q, r=jnp.asarray(r),
                   mw=mw.astype(q.dtype), cw=cw.astype(q.dtype),
                   gamma=float(gamma))

    def _sigma(self, x, cov):
        """(D,B),(D,D,B) -> (2D+1, D, B): [x, x+gamma*L_j, x-gamma*L_j]."""
        cols = bt(bchol(cov)) * self.gamma  # row j = gamma * L[:, j]
        return jnp.concatenate(
            [x[None], x[None] + cols, x[None] - cols], axis=0)

    def step(self, x, cov, u, z, dt):
        """One predict+update across the bank. x (D,B), cov (D,D,B),
        u (U,B), z (M,B) -> (x', cov')."""
        d, b = x.shape
        k = 2 * d + 1
        q = self.q if self.q.ndim == 3 else self.q[:, :, None]
        r = self.r if self.r.ndim == 3 else self.r[:, :, None]

        def fold(sp):  # (K, D', B) -> (D', K*B): sigma axis into the bank
            return sp.transpose(1, 0, 2).reshape(sp.shape[1], k * b)

        def unfold(y):  # (D', K*B) -> (K, D', B)
            return y.reshape(y.shape[0], k, b).transpose(1, 0, 2)

        # predict
        sp = self._sigma(x, cov)
        uf = jnp.broadcast_to(u[:, None], (u.shape[0], k, b)).reshape(
            u.shape[0], k * b)
        sp_pred = unfold(self.predict(fold(sp), uf, dt))
        mean_pred = jnp.einsum("k,kib->ib", self.mw, sp_pred)
        dxp = sp_pred - mean_pred[None]
        cov_pred = jnp.einsum("k,kib,kjb->ijb", self.cw, dxp, dxp) + q

        # update (fresh sigma points around the prediction, ukf.rs:144)
        sp2 = self._sigma(mean_pred, cov_pred)
        sp_z = unfold(self.measure(fold(sp2)))
        mean_z = jnp.einsum("k,kib->ib", self.mw, sp_z)
        dz = sp_z - mean_z[None]
        cov_z = jnp.einsum("k,kib,kjb->ijb", self.cw, dz, dz) + r
        dx2 = sp2 - mean_pred[None]
        cross = jnp.einsum("k,kib,kjb->ijb", self.cw, dx2, dz)

        gain = bmm(cross, binv(cov_z))
        x_new = mean_pred + bmv(gain, z - mean_z)
        cov_new = cov_pred - bmm(gain, bmm(cov_z, bt(gain)))
        return x_new, cov_new


def _sp_predict(x, u, dt):
    """SimpleProblem banked prediction (reference motion.rs:197-238)."""
    px, py, yaw, v = x
    return jnp.stack([
        px + v * jnp.cos(yaw) * dt,
        py + v * jnp.sin(yaw) * dt,
        yaw + u[1] * dt,
        u[0],
    ])


def _sp_measure(x):
    """GPS-like (x, y) observation (reference measurement.rs:68-89)."""
    return x[:2]


def simple_problem_banked_ukf(q, r, alpha=0.001, beta=2.0, kappa=0.0):
    """Banked UKF for the SimpleProblem model — the lane-major analog of
    ``UnscentedKalmanFilter.create(...)`` on SimpleProblem models."""
    return BankedUKF.create(predict=_sp_predict, measure=_sp_measure,
                            q=q, r=r, alpha=alpha, beta=beta, kappa=kappa)


def simple_problem_banked(q, r, dt_default=0.1):
    """Banked EKF for the SimpleProblem 4-state [x, y, yaw, v] model
    (reference motion.rs:197-238 / measurement.rs:68-89): constant-
    velocity unicycle prediction, GPS-like (x, y) observation."""

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

    def jac_z(x):
        b = x.shape[1]
        h = jnp.zeros((2, 4), x.dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
        return jnp.broadcast_to(h[:, :, None], (2, 4, b))

    return BankedEKF(predict=_sp_predict, jac_x=jac_x, measure=_sp_measure,
                     jac_z=jac_z, q=q, r=r)
