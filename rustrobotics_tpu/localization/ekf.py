"""Extended Kalman filters.

Textbook EKF matching the reference's update equations
(src/localization/extended_kalman_filter.rs:55-73): predict
``cov = G cov G^T + R``, gain ``K = cov H^T S^-1``, update
``cov = (I - K H) cov``. The known-correspondence variant predicts with the
input-Jacobian form ``G cov G^T + V M V^T`` (ekf.rs:134-141) and applies
per-landmark innovation updates *sequentially* (ekf.rs:144-159) — here a
``lax.scan`` over a padded, masked measurement block, so the irregular
event stream stays jittable.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from rustrobotics_tpu.localization.landmark_table import LandmarkTable
from rustrobotics_tpu.utils.state import GaussianState


def _kalman_update(x, cov, z, z_pred, h, q, wrap=None):
    """EKF innovation update in JOSEPH form.

    The reference uses the short form ``cov = (I - K H) cov`` (ekf.rs:72),
    which is fine in its f64 world but loses symmetry/PSD-ness fast in f32
    — on the UTIAS replay the f32 ATE degrades 17x. The Joseph form
    ``(I-KH) P (I-KH)^T + K Q K^T`` is algebraically identical and
    PSD-preserving; these are 3x3 matmuls, so the extra cost is nil (and
    they run at full-f32 precision — bf16 passes are not worth saving
    here).
    ``wrap``: optional per-component innovation wrap (angle components).
    """
    innov = z - z_pred
    if wrap is not None:
        innov = wrap(innov)
    with jax.default_matmul_precision("highest"):
        s = h @ cov @ h.T + q
        k = cov @ h.T @ jnp.linalg.inv(s)
        x_new = x + k @ innov
        ikh = jnp.eye(cov.shape[-1], dtype=cov.dtype) - k @ h
        cov_new = ikh @ cov @ ikh.T + k @ q @ k.T
    return x_new, cov_new


@flax.struct.dataclass
class ExtendedKalmanFilter:
    """EKF with additive state noise R and measurement noise Q
    (reference: extended_kalman_filter.rs:10-78)."""

    r: jnp.ndarray  # (S, S) process noise
    q: jnp.ndarray  # (Z, Z) measurement noise
    motion_model: Any
    measurement_model: Any

    def predict(self, state: GaussianState, u, dt) -> GaussianState:
        g = self.motion_model.jacobian_wrt_state(state.x, u, dt)
        x = self.motion_model.prediction(state.x, u, dt)
        cov = g @ state.cov @ g.T + self.r
        return GaussianState(x=x, cov=cov)

    def update(self, state: GaussianState, z) -> GaussianState:
        h = self.measurement_model.jacobian(state.x)
        z_pred = self.measurement_model.prediction(state.x)
        x, cov = _kalman_update(state.x, state.cov, z, z_pred, h, self.q)
        return GaussianState(x=x, cov=cov)

    def step(self, state: GaussianState, u, z, dt) -> GaussianState:
        return self.update(self.predict(state, u, dt), z)


@flax.struct.dataclass
class ExtendedKalmanFilterKnownCorrespondences:
    """EKF against a known landmark map
    (reference: extended_kalman_filter.rs:81-165).

    ``step`` consumes one merged event: optional control (``has_control``
    mask) and a padded measurement block (ids (M,), z (M, Z), mask (M,)).
    Measurements whose id is absent from the landmark table are masked out,
    and updates are applied sequentially via ``lax.scan`` to match the
    reference's in-loop covariance refinement.
    """

    q: jnp.ndarray  # (Z, Z)
    landmarks: LandmarkTable
    motion_model: Any
    measurement_model: Any

    def predict(self, state: GaussianState, u, dt) -> GaussianState:
        g = self.motion_model.jacobian_wrt_state(state.x, u, dt)
        v = self.motion_model.jacobian_wrt_input(state.x, u, dt)
        m = self.motion_model.cov_noise_control_space(u)
        x = self.motion_model.prediction(state.x, u, dt)
        cov = g @ state.cov @ g.T + v @ m @ v.T
        return GaussianState(x=x, cov=cov)

    def update(self, state: GaussianState, ids, z, mask) -> GaussianState:
        lms, valid = self.landmarks.lookup(ids)
        valid = jnp.logical_and(valid, mask)

        def wrap_innov(innov):
            # range-bearing: component 1 is an angle difference
            from rustrobotics_tpu.utils.angles import wrap_angle

            return innov.at[1].set(wrap_angle(innov[1]))

        def body(carry, inp):
            x, cov = carry
            lm, zi, ok = inp
            z_pred = self.measurement_model.prediction(x, lm)
            h = self.measurement_model.jacobian(x, lm)
            x_new, cov_new = _kalman_update(x, cov, zi, z_pred, h, self.q,
                                            wrap=wrap_innov)
            x = jnp.where(ok, x_new, x)
            cov = jnp.where(ok, cov_new, cov)
            return (x, cov), None

        (x, cov), _ = jax.lax.scan(body, (state.x, state.cov), (lms, z, valid))
        return GaussianState(x=x, cov=cov)

    def step(self, state, u, has_control, ids, z, mask, dt) -> GaussianState:
        pred = self.predict(state, u, dt)
        state = jax.tree.map(
            lambda a, b: jnp.where(has_control, a, b), pred, state
        )
        return self.update(state, ids, z, mask)
