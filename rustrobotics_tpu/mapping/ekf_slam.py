"""EKF-SLAM with known correspondences (Probabilistic Robotics ch. 10).

The reference ships only an EMPTY stub for this capability
(src/mapping/ekf_slam_known.rs:1). This is the real algorithm: a joint
state [robot pose (3) | landmark positions (2 each)] with full joint
covariance; prediction propagates the robot block and its cross terms;
each measurement of a known-id landmark initializes it on first sight and
then applies the standard EKF innovation over the sparse (robot, landmark)
Jacobian.

TPU design: landmark capacity is static (``max_landmarks``), the
measurement block per step is padded + masked, and the whole per-step
update is a ``lax.scan`` body — a full SLAM session jits as one program.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from rustrobotics_tpu.utils.angles import wrap_angle

_INIT_LM_VAR = 1e6  # covariance of a never-seen landmark slot


@flax.struct.dataclass
class EkfSlamState:
    x: jnp.ndarray  # (3 + 2L,) robot pose then landmarks
    cov: jnp.ndarray  # (3 + 2L, 3 + 2L)
    seen: jnp.ndarray  # (L,) bool

    @property
    def robot(self) -> jnp.ndarray:
        return self.x[:3]

    def landmark(self, k) -> jnp.ndarray:
        return jax.lax.dynamic_slice(self.x, (3 + 2 * k,), (2,))

    @property
    def landmarks(self) -> jnp.ndarray:
        return self.x[3:].reshape(-1, 2)


@flax.struct.dataclass
class EkfSlamKnownCorrespondences:
    """q: (2, 2) range-bearing measurement noise; motion noise enters via
    the control-space covariance of the motion model (V M V^T), as in the
    reference's EKF-KC predict (extended_kalman_filter.rs:134-141)."""

    q: jnp.ndarray
    motion_model: Any
    max_landmarks: int = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, q, motion_model, max_landmarks: int):
        return cls(q=jnp.asarray(q), motion_model=motion_model,
                   max_landmarks=max_landmarks)

    def init_state(self, robot_pose, robot_cov=None) -> EkfSlamState:
        robot_pose = jnp.asarray(robot_pose)
        dtype = robot_pose.dtype
        dim = 3 + 2 * self.max_landmarks
        x = jnp.zeros(dim, dtype).at[:3].set(robot_pose)
        cov = jnp.eye(dim, dtype=dtype) * _INIT_LM_VAR
        rc = robot_cov if robot_cov is not None else jnp.zeros((3, 3), dtype)
        cov = cov.at[:3, :3].set(jnp.asarray(rc, dtype))
        return EkfSlamState(
            x=x, cov=cov, seen=jnp.zeros(self.max_landmarks, bool)
        )

    def predict(self, state: EkfSlamState, u, dt) -> EkfSlamState:
        """Robot-block propagation; landmarks are static. Full-joint form:
        G_full = diag(G_r, I) so cov_rr <- G cov_rr G^T + V M V^T,
        cov_rm <- G cov_rm."""
        robot = state.x[:3]
        g = self.motion_model.jacobian_wrt_state(robot, u, dt)
        v = self.motion_model.jacobian_wrt_input(robot, u, dt)
        m = self.motion_model.cov_noise_control_space(u)
        new_robot = self.motion_model.prediction(robot, u, dt)
        x = state.x.at[:3].set(new_robot)
        cov = state.cov
        cov_rr = g @ cov[:3, :3] @ g.T + v @ m @ v.T
        cov_rm = g @ cov[:3, 3:]
        cov = cov.at[:3, :3].set(cov_rr)
        cov = cov.at[:3, 3:].set(cov_rm)
        cov = cov.at[3:, :3].set(cov_rm.T)
        return EkfSlamState(x=x, cov=cov, seen=state.seen)

    def _initialize_landmark(self, state: EkfSlamState, k, z):
        """First sighting: place the landmark at the inverse measurement
        (x + r cos(b + θ), y + r sin(b + θ)); its slot variance stays at
        the large prior so the first update dominates."""
        rng, bearing = z[0], z[1]
        theta = state.x[2]
        lx = state.x[0] + rng * jnp.cos(bearing + theta)
        ly = state.x[1] + rng * jnp.sin(bearing + theta)
        x = jax.lax.dynamic_update_slice(
            state.x, jnp.stack([lx, ly]), (3 + 2 * k,)
        )
        return EkfSlamState(x=x, cov=state.cov, seen=state.seen.at[k].set(True))

    def _measurement_jacobian(self, state: EkfSlamState, k):
        """Sparse H (2, 3+2L): nonzero on the robot and landmark-k blocks
        (range-bearing model, measurement.rs:45-65 with the sign fix)."""
        lm = state.landmark(k)
        dx = lm[0] - state.x[0]
        dy = lm[1] - state.x[1]
        q = dx * dx + dy * dy
        qs = jnp.sqrt(q)
        h_robot = jnp.asarray(
            [[-dx / qs, -dy / qs, 0.0], [dy / q, -dx / q, -1.0]],
            dtype=state.x.dtype,
        )
        h_lm = jnp.asarray(
            [[dx / qs, dy / qs], [-dy / q, dx / q]], dtype=state.x.dtype
        )
        h = jnp.zeros((2, state.x.shape[0]), dtype=state.x.dtype)
        h = jax.lax.dynamic_update_slice(h, h_robot, (0, 0))
        h = jax.lax.dynamic_update_slice(h, h_lm, (0, 3 + 2 * k))
        return h

    def _z_pred(self, state: EkfSlamState, k):
        lm = state.landmark(k)
        dx = lm[0] - state.x[0]
        dy = lm[1] - state.x[1]
        return jnp.stack(
            [jnp.sqrt(dx * dx + dy * dy),
             jnp.arctan2(dy, dx) - state.x[2]]
        )

    def update_one(self, state: EkfSlamState, k, z, valid) -> EkfSlamState:
        """One masked measurement of landmark slot k."""
        fresh = jnp.logical_and(valid, jnp.logical_not(state.seen[k]))
        init = self._initialize_landmark(state, k, z)
        state = jax.tree.map(
            lambda a, b: jnp.where(fresh, a, b), init, state
        )
        h = self._measurement_jacobian(state, k)
        z_pred = self._z_pred(state, k)
        innov = jnp.stack([z[0] - z_pred[0], wrap_angle(z[1] - z_pred[1])])
        s = h @ state.cov @ h.T + self.q
        gain = state.cov @ h.T @ jnp.linalg.inv(s)
        x_new = state.x + gain @ innov
        cov_new = (
            jnp.eye(state.x.shape[0], dtype=state.x.dtype) - gain @ h
        ) @ state.cov
        x = jnp.where(valid, x_new, state.x)
        cov = jnp.where(valid, cov_new, state.cov)
        return EkfSlamState(x=x, cov=cov, seen=state.seen)

    def step(self, state: EkfSlamState, u, has_control, lm_idx, z, mask,
             dt) -> EkfSlamState:
        """One merged event: optional control + padded measurement block
        (lm_idx (M,) slot indices, z (M, 2), mask (M,))."""
        pred = self.predict(state, u, dt)
        state = jax.tree.map(
            lambda a, b: jnp.where(has_control, a, b), pred, state
        )

        def body(st, inp):
            k, zi, ok = inp
            return self.update_one(st, k, zi, ok), None

        state, _ = jax.lax.scan(body, state, (lm_idx, z, mask))
        return state
