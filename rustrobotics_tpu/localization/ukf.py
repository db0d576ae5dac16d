"""Unscented Kalman filter with scaled sigma points.

Capability parity with the reference UKF
(src/localization/unscented_kalman_filter.rs:11-186): weights from
(alpha, beta, kappa) (ukf.rs:55-70), 2n+1 sigma points via a Cholesky square
root scaled by gamma (ukf.rs:72-90), weighted-moment predict/update and the
cross-covariance gain (ukf.rs:108-181).

TPU-first: sigma points live on a single (2n+1, S) array axis — model
propagation and moment reductions are batched matmuls/means instead of the
reference's per-point Vec iteration.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.utils.state import GaussianState


def sigma_weights(dim: int, alpha: float, beta: float, kappa: float):
    """Scaled sigma-point weights (reference: ukf.rs:55-70)."""
    lam = alpha**2 * (dim + kappa) - dim
    v = 1.0 / (2.0 * (dim + lam))
    mw = np.full(2 * dim + 1, v)
    cw = np.full(2 * dim + 1, v)
    mw[0] = lam / (dim + lam)
    cw[0] = lam / (dim + lam) + 1.0 - alpha**2 + beta
    gamma = np.sqrt(dim + lam)
    return jnp.asarray(mw), jnp.asarray(cw), gamma


@flax.struct.dataclass
class UnscentedKalmanFilter:
    q: jnp.ndarray  # (S, S) process noise (reference calls it q, ukf.rs:15)
    r: jnp.ndarray  # (Z, Z) measurement noise
    gamma: jnp.ndarray  # scalar
    mw: jnp.ndarray  # (2S+1,) mean weights
    cw: jnp.ndarray  # (2S+1,) cov weights
    motion_model: Any
    measurement_model: Any

    @classmethod
    def create(cls, q, r, measurement_model, motion_model, alpha, beta, kappa):
        q = jnp.asarray(q)
        mw, cw, gamma = sigma_weights(q.shape[-1], alpha, beta, kappa)
        return cls(
            q=q,
            r=jnp.asarray(r),
            gamma=jnp.asarray(gamma, dtype=q.dtype),
            mw=mw.astype(q.dtype),
            cw=cw.astype(q.dtype),
            motion_model=motion_model,
            measurement_model=measurement_model,
        )

    def sigma_points(self, state: GaussianState) -> jnp.ndarray:
        """(2S+1, S) points: [x, x + gamma*L_i, x - gamma*L_i]
        (reference: ukf.rs:72-90, column-interleave order differs but the
        weighted moments are permutation-invariant)."""
        lower = jnp.linalg.cholesky(state.cov) * self.gamma
        cols = lower.T  # (S, S): row i is gamma * L[:, i]
        return jnp.concatenate(
            [state.x[None, :], state.x[None, :] + cols, state.x[None, :] - cols],
            axis=0,
        )

    def step(self, state: GaussianState, u, z, dt) -> GaussianState:
        # predict
        sp = self.sigma_points(state)
        sp_pred = self.motion_model.prediction(sp, u, dt)
        mean_pred = jnp.einsum("k,ki->i", self.mw, sp_pred)
        dxp = sp_pred - mean_pred
        cov_pred = jnp.einsum("k,ki,kj->ij", self.cw, dxp, dxp) + self.q

        # update (fresh sigma points around the prediction, ukf.rs:144)
        sp2 = self.sigma_points(GaussianState(x=mean_pred, cov=cov_pred))
        sp_z = self.measurement_model.prediction(sp2)
        mean_z = jnp.einsum("k,ki->i", self.mw, sp_z)
        dz = sp_z - mean_z
        cov_z = jnp.einsum("k,ki,kj->ij", self.cw, dz, dz) + self.r
        dx2 = sp2 - mean_pred
        cross = jnp.einsum("k,ki,kj->ij", self.cw, dx2, dz)

        gain = cross @ jnp.linalg.inv(cov_z)
        x = mean_pred + gain @ (z - mean_z)
        cov = cov_pred - gain @ cov_z @ gain.T
        return GaussianState(x=x, cov=cov)


@flax.struct.dataclass
class UnscentedKalmanFilterKnownCorrespondences:
    """UKF against a known landmark map — the variant the reference leaves
    as ``todo!()`` (examples/localization/localization_landmarks.rs:62).

    Predict: sigma points through the motion model, plus control-space
    noise mapped through the input Jacobian (V M V^T, the EKF-KC form,
    extended_kalman_filter.rs:134-141). Update: per-measurement sigma
    points through the landmark measurement model, applied sequentially
    over a padded masked block via ``lax.scan``.
    """

    q: jnp.ndarray  # (Z, Z) measurement noise
    gamma: jnp.ndarray
    mw: jnp.ndarray
    cw: jnp.ndarray
    landmarks: Any
    motion_model: Any
    measurement_model: Any

    @classmethod
    def create(cls, q, landmarks, measurement_model, motion_model,
               alpha=1.0, beta=2.0, kappa=0.0, state_dim=3, dtype=None):
        q = jnp.asarray(q)
        dtype = dtype or q.dtype
        mw, cw, gamma = sigma_weights(state_dim, alpha, beta, kappa)
        return cls(
            q=q, gamma=jnp.asarray(gamma, dtype), mw=mw.astype(dtype),
            cw=cw.astype(dtype), landmarks=landmarks,
            motion_model=motion_model, measurement_model=measurement_model,
        )

    def _sigma_points(self, state: GaussianState):
        lower = jnp.linalg.cholesky(state.cov) * self.gamma
        cols = lower.T
        return jnp.concatenate(
            [state.x[None, :], state.x[None, :] + cols,
             state.x[None, :] - cols], axis=0,
        )

    def predict(self, state: GaussianState, u, dt) -> GaussianState:
        sp = self._sigma_points(state)
        sp_pred = self.motion_model.prediction(sp, u, dt)
        mean = jnp.einsum("k,ki->i", self.mw, sp_pred)
        dx = sp_pred - mean
        v = self.motion_model.jacobian_wrt_input(mean, u, dt)
        m = self.motion_model.cov_noise_control_space(u)
        cov = jnp.einsum("k,ki,kj->ij", self.cw, dx, dx) + v @ m @ v.T
        return GaussianState(x=mean, cov=cov)

    def update(self, state: GaussianState, ids, z, mask) -> GaussianState:
        lms, valid = self.landmarks.lookup(ids)
        valid = jnp.logical_and(valid, mask)

        from rustrobotics_tpu.utils.angles import wrap_angle

        def body(st, inp):
            lm, zi, ok = inp
            sp = self._sigma_points(st)
            sp_z = jax.vmap(
                lambda x: self.measurement_model.prediction(x, lm)
            )(sp)
            # bearings are circular: re-center sigma bearings on the first
            # point's so a spread straddling +-pi doesn't corrupt the
            # weighted mean, and wrap the innovation
            b0 = sp_z[0, 1]
            sp_z = sp_z.at[:, 1].set(b0 + wrap_angle(sp_z[:, 1] - b0))
            mean_z = jnp.einsum("k,ki->i", self.mw, sp_z)
            dz = sp_z - mean_z
            cov_z = jnp.einsum("k,ki,kj->ij", self.cw, dz, dz) + self.q
            dx = sp - st.x
            cross = jnp.einsum("k,ki,kj->ij", self.cw, dx, dz)
            gain = cross @ jnp.linalg.inv(cov_z)
            innov = (zi - mean_z).at[1].set(wrap_angle(zi[1] - mean_z[1]))
            x_new = st.x + gain @ innov
            cov_new = st.cov - gain @ cov_z @ gain.T
            x = jnp.where(ok, x_new, st.x)
            cov = jnp.where(ok, cov_new, st.cov)
            return GaussianState(x=x, cov=cov), None

        state, _ = jax.lax.scan(body, state, (lms, z, valid))
        return state

    def step(self, state, u, has_control, ids, z, mask, dt) -> GaussianState:
        pred = self.predict(state, u, dt)
        state = jax.tree.map(
            lambda a, b: jnp.where(has_control, a, b), pred, state
        )
        return self.update(state, ids, z, mask)
