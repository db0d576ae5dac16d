"""Extended Information Filter (EIF) — the dual of the EKF.

The reference's README Todo names the information filter as unbuilt
(README.md:48-49). State is carried in information (canonical) form:
``lam = cov^-1`` (information matrix) and ``eta = lam @ x`` (information
vector). Measurement updates are ADDITIVE —

    lam += H^T Q^-1 H,   eta += H^T Q^-1 (z - z_pred + H x)

— which is what makes the information form the right representation when
many independent measurements arrive per step (each update is a cheap
rank-Z add; no gain/solve), and why fusing K sensors is associative: on
TPU the per-measurement contributions are computed BATCHED and summed,
with only the prediction step needing a matrix inverse pair.

API mirrors the EKF (predict/update/step on a state dataclass) and the
known-correspondence variant consumes the same padded, masked event
blocks. The EIF trajectory equals the EKF's to numerical precision — the
test suite pins that duality.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from rustrobotics_tpu.localization.landmark_table import LandmarkTable
from rustrobotics_tpu.utils.angles import wrap_angle
from rustrobotics_tpu.utils.state import GaussianState


@flax.struct.dataclass
class InformationState:
    """Canonical-form Gaussian: eta = lam x, lam = cov^-1."""

    eta: jnp.ndarray  # (S,)
    lam: jnp.ndarray  # (S, S)

    @classmethod
    def from_moments(cls, state: GaussianState) -> "InformationState":
        with jax.default_matmul_precision("highest"):
            lam = jnp.linalg.inv(state.cov)
            return cls(eta=lam @ state.x, lam=lam)

    def to_moments(self) -> GaussianState:
        with jax.default_matmul_precision("highest"):
            cov = jnp.linalg.inv(self.lam)
            return GaussianState(x=cov @ self.eta, cov=cov)

    @property
    def x(self):
        with jax.default_matmul_precision("highest"):
            return jnp.linalg.solve(self.lam, self.eta)


@flax.struct.dataclass
class ExtendedInformationFilter:
    """EIF with additive state noise R and measurement noise Q — the
    information-form dual of localization.ekf.ExtendedKalmanFilter."""

    r: jnp.ndarray  # (S, S) process noise
    q: jnp.ndarray  # (Z, Z) measurement noise
    motion_model: Any
    measurement_model: Any

    def predict(self, state: InformationState, u, dt) -> InformationState:
        """Prediction runs through moment form (the one place the
        information parameterization pays an inverse pair — duals of the
        EKF's cheap predict / expensive update)."""
        with jax.default_matmul_precision("highest"):
            cov = jnp.linalg.inv(state.lam)
            x = cov @ state.eta
            g = self.motion_model.jacobian_wrt_state(x, u, dt)
            x_new = self.motion_model.prediction(x, u, dt)
            cov_new = g @ cov @ g.T + self.r
            lam = jnp.linalg.inv(cov_new)
            return InformationState(eta=lam @ x_new, lam=lam)

    def update(self, state: InformationState, z) -> InformationState:
        with jax.default_matmul_precision("highest"):
            x = jnp.linalg.solve(state.lam, state.eta)
            h = self.measurement_model.jacobian(x)
            z_pred = self.measurement_model.prediction(x)
            q_inv = jnp.linalg.inv(self.q)
            ht_qi = h.T @ q_inv
            lam = state.lam + ht_qi @ h
            eta = state.eta + ht_qi @ (z - z_pred + h @ x)
            return InformationState(eta=eta, lam=lam)

    def step(self, state: InformationState, u, z, dt) -> InformationState:
        return self.update(self.predict(state, u, dt), z)


@flax.struct.dataclass
class ExtendedInformationFilterKnownCorrespondences:
    """EIF against a known landmark map — the information-form dual of
    ExtendedKalmanFilterKnownCorrespondences, with the payoff visible:
    the per-landmark updates are BATCHED rank-2 adds summed in one einsum
    (the EKF must scan them sequentially because each update changes the
    gain)."""

    q: jnp.ndarray  # (Z, Z)
    landmarks: LandmarkTable
    motion_model: Any
    measurement_model: Any

    def predict(self, state: InformationState, u, dt) -> InformationState:
        with jax.default_matmul_precision("highest"):
            cov = jnp.linalg.inv(state.lam)
            x = cov @ state.eta
            g = self.motion_model.jacobian_wrt_state(x, u, dt)
            v = self.motion_model.jacobian_wrt_input(x, u, dt)
            m = self.motion_model.cov_noise_control_space(u)
            x_new = self.motion_model.prediction(x, u, dt)
            cov_new = g @ cov @ g.T + v @ m @ v.T
            lam = jnp.linalg.inv(cov_new)
            return InformationState(eta=lam @ x_new, lam=lam)

    def update(self, state: InformationState, ids, z,
               mask) -> InformationState:
        lms, valid = self.landmarks.lookup(ids)
        valid = jnp.logical_and(valid, mask)

        with jax.default_matmul_precision("highest"):
            x = jnp.linalg.solve(state.lam, state.eta)
            # batched measurement contributions at the common predicted
            # state (the information-form associativity)
            z_pred = jax.vmap(
                lambda lm: self.measurement_model.prediction(x, lm))(lms)
            h = jax.vmap(
                lambda lm: self.measurement_model.jacobian(x, lm))(lms)
            innov = z - z_pred
            innov = innov.at[:, 1].set(wrap_angle(innov[:, 1]))
            q_inv = jnp.linalg.inv(self.q)
            w = valid.astype(x.dtype)
            ht_qi = jnp.einsum("mzi,zk->mik", h, q_inv)  # (M, S, Z)
            lam = state.lam + jnp.einsum(
                "mik,mkj,m->ij", ht_qi, h, w)
            rhs = innov + jnp.einsum("mzi,i->mz", h, x)
            eta = state.eta + jnp.einsum("mik,mk,m->i", ht_qi, rhs, w)
            return InformationState(eta=eta, lam=lam)

    def step(self, state, u, has_control, ids, z, mask,
             dt) -> InformationState:
        pred = self.predict(state, u, dt)
        state = jax.tree.map(
            lambda a, b: jnp.where(has_control, a, b), pred, state
        )
        return self.update(state, ids, z, mask)
