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
    # ML-association gates for step_unknown (two-threshold scheme):
    # match an existing track below alpha (chi^2(2) 95%), open a NEW track
    # only above beta, and DISCARD ambiguous measurements in between —
    # the standard guard against duplicate tracks from borderline
    # innovations (single-gate ML association is notoriously brittle).
    alpha: float = flax.struct.field(pytree_node=False, default=5.991)
    beta: float = flax.struct.field(pytree_node=False, default=25.0)

    @classmethod
    def create(cls, q, motion_model, max_landmarks: int,
               alpha: float = 5.991, beta: float = 25.0):
        return cls(q=jnp.asarray(q), motion_model=motion_model,
                   max_landmarks=max_landmarks, alpha=alpha, beta=beta)

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
        # full-f32 passes: TPU bf16 default corrupts the joint covariance
        # badly against the 1e6 unseen-landmark prior
        with jax.default_matmul_precision("highest"):
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
            state.x, jnp.stack([lx, ly]), (3 + 2 * jnp.asarray(k),)
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
        k = jnp.asarray(k)
        zero = jnp.zeros((), k.dtype)
        h = jax.lax.dynamic_update_slice(h, h_robot, (zero, zero))
        h = jax.lax.dynamic_update_slice(h, h_lm, (zero, 3 + 2 * k))
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
        with jax.default_matmul_precision("highest"):
            s = h @ state.cov @ h.T + self.q
            gain = state.cov @ h.T @ jnp.linalg.inv(s)
            x_new = state.x + gain @ innov
            # Joseph form: PSD/symmetry-preserving in f32 (the TPU dtype)
            ikh = (
                jnp.eye(state.x.shape[0], dtype=state.x.dtype) - gain @ h
            )
            cov_new = ikh @ state.cov @ ikh.T + gain @ self.q @ gain.T
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

    # ------------------------- unknown correspondences (PR Table 10.3)

    def associate(self, state: EkfSlamState, z):
        """Maximum-likelihood data association, vectorized over ALL
        landmark slots at once (no per-landmark loop — the TPU shape):
        Mahalanobis distance pi_l = nu^T S_l^-1 nu against every seen
        slot using only the sparse (robot, landmark) covariance blocks.

        Returns (slot k, is_new, usable). Beyond the reference, which has
        no data association at all (ekf_slam_known.rs is empty).
        """
        dtype = state.x.dtype
        big = self.max_landmarks
        lms = state.landmarks  # (L, 2)
        dx = lms[:, 0] - state.x[0]
        dy = lms[:, 1] - state.x[1]
        q = dx * dx + dy * dy
        qs = jnp.sqrt(jnp.clip(q, 1e-12, None))
        z_pred = jnp.stack([qs, jnp.arctan2(dy, dx) - state.x[2]], axis=-1)
        nu = jnp.stack(
            [z[0] - z_pred[:, 0], wrap_angle(z[1] - z_pred[:, 1])], axis=-1
        )  # (L, 2)

        # per-slot 2x3 / 2x2 measurement Jacobians
        zr = jnp.zeros_like(dx)
        h_r = jnp.stack([
            jnp.stack([-dx / qs, -dy / qs, zr], -1),
            jnp.stack([dy / q, -dx / q, -jnp.ones_like(dx)], -1),
        ], -2)  # (L, 2, 3)
        h_l = jnp.stack([
            jnp.stack([dx / qs, dy / qs], -1),
            jnp.stack([-dy / q, dx / q], -1),
        ], -2)  # (L, 2, 2)

        # sparse covariance blocks: robot-robot, robot-lm_l, lm_l-lm_l
        c_rr = state.cov[:3, :3]
        c_rl = state.cov[:3, 3:].reshape(3, big, 2).transpose(1, 0, 2)  # (L,3,2)
        c_full = state.cov[3:, 3:].reshape(big, 2, big, 2)
        idx = jnp.arange(big)
        c_ll = c_full[idx, :, idx, :]  # (L, 2, 2)

        s = (
            jnp.einsum("lij,jk,lmk->lim", h_r, c_rr, h_r)
            + jnp.einsum("lij,ljk,lmk->lim", h_r, c_rl, h_l)
            + jnp.einsum("lij,lkj,lmk->lim", h_l, c_rl, h_r)
            + jnp.einsum("lij,ljk,lmk->lim", h_l, c_ll, h_l)
            + self.q.astype(dtype)
        )  # (L, 2, 2)
        s_inv = jnp.linalg.inv(s)
        pi = jnp.einsum("li,lij,lj->l", nu, s_inv, nu)
        pi = jnp.where(state.seen, pi, jnp.inf)

        best = jnp.argmin(pi)
        best_pi = pi[best]
        is_match = best_pi < jnp.asarray(self.alpha, dtype)
        is_new = best_pi > jnp.asarray(self.beta, dtype)
        any_free = jnp.logical_not(state.seen.all())
        first_free = jnp.argmin(state.seen)  # first False
        k = jnp.where(is_match, best, first_free)
        usable = jnp.logical_or(
            is_match, jnp.logical_and(is_new, any_free)
        )
        return k, is_new, usable

    def step_unknown(self, state: EkfSlamState, u, has_control, z, mask,
                     dt) -> EkfSlamState:
        """Unknown-correspondence step: ML-associate each masked
        measurement (sequentially, so later associations see earlier
        updates), then reuse the known-correspondence update (which
        initializes fresh slots via the seen flag)."""
        pred = self.predict(state, u, dt)
        state = jax.tree.map(
            lambda a, b: jnp.where(has_control, a, b), pred, state
        )

        def body(st, inp):
            zi, ok = inp
            k, _, usable = self.associate(st, zi)
            return self.update_one(st, k, zi, jnp.logical_and(ok, usable)), None

        state, _ = jax.lax.scan(body, state, (z, mask))
        return state


# ----------------------------------------------------- Schmidt-EKF SLAM

def schmidt_update_one(slam: EkfSlamKnownCorrespondences,
                       state: EkfSlamState, k, z, valid, consider_lm):
    """Consider-state (Schmidt-EKF) measurement update.

    Landmarks flagged in ``consider_lm`` (L,) get ZERO Kalman gain: their
    estimates are frozen, but their cross-covariances with the active
    block keep being tracked, so the filter stays CONSISTENT (unlike
    simply deleting stale landmarks, which discards correlation and
    makes the filter overconfident). The covariance uses the
    general-gain (any-K-valid) form

        P <- P - K (H P) - (H P)^T K^T + K S K^T,

    which for a masked K is exactly Schmidt's update. The visual-inertial
    SLAM literature uses this to bound update cost while keeping old
    map points as consider states (e.g. Schmidt-EKF VI-SLAM,
    arxiv 1903.08636 — pattern reference).
    """
    fresh = jnp.logical_and(valid, jnp.logical_not(state.seen[k]))
    init = slam._initialize_landmark(state, k, z)
    state = jax.tree.map(lambda a, b: jnp.where(fresh, a, b), init, state)
    h = slam._measurement_jacobian(state, k)
    z_pred = slam._z_pred(state, k)
    innov = jnp.stack([z[0] - z_pred[0], wrap_angle(z[1] - z_pred[1])])

    n = state.x.shape[0]
    dtype = state.x.dtype
    # per-dim active mask: robot always active; a CONSIDER landmark
    # stays frozen even when observed — that is the point: its sighting
    # updates the robot through the cross-covariance without touching
    # the landmark. Only a fresh initialization overrides the freeze.
    lm_consider = jnp.asarray(consider_lm)
    lm_consider = lm_consider.at[k].set(
        jnp.logical_and(lm_consider[k], jnp.logical_not(fresh)))
    active = jnp.concatenate(
        [jnp.ones(3, bool),
         jnp.logical_not(jnp.repeat(lm_consider, 2))])

    with jax.default_matmul_precision("highest"):
        hp = h @ state.cov                      # (2, n)
        s = hp @ h.T + slam.q
        gain = (state.cov @ h.T) @ jnp.linalg.inv(s)
        gain = gain * active[:, None].astype(dtype)  # Schmidt: K_c = 0
        x_new = state.x + gain @ innov
        cov_new = (state.cov - gain @ hp - hp.T @ gain.T
                   + gain @ s @ gain.T)
        cov_new = 0.5 * (cov_new + cov_new.T)
    x = jnp.where(valid, x_new, state.x)
    cov = jnp.where(valid, cov_new, state.cov)
    return EkfSlamState(x=x, cov=cov, seen=state.seen)


def schmidt_step(slam: EkfSlamKnownCorrespondences, state: EkfSlamState,
                 u, has_control, lm_idx, z, mask, dt, consider_lm):
    """One merged event with consider-state updates (see
    schmidt_update_one). ``consider_lm`` (L,) bool selects the frozen
    landmark set — a recency/distance policy chosen by the caller."""
    pred = slam.predict(state, u, dt)
    state = jax.tree.map(
        lambda a, b: jnp.where(has_control, a, b), pred, state)

    def body(st, inp):
        k, zi, ok = inp
        return schmidt_update_one(slam, st, k, zi, ok, consider_lm), None

    state, _ = jax.lax.scan(body, state, (lm_idx, z, mask))
    return state
