"""Motion models.

Capability parity with the reference's MotionModel trait
(src/models/motion.rs:10-24): prediction, Jacobians w.r.t. state and input,
control-space noise covariance, and stochastic sampling — but as pure
functions over arrays (explicit PRNG keys, vmap for particle clouds).

Known reference bug NOT reproduced: ``Velocity::jacobian_wrt_input`` reads
the angular rate from the *state* (``w = x[1]``, motion.rs:98) instead of the
control; we use ``u[1]``.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from rustrobotics_tpu.utils.angles import wrap_angle

_OMEGA_EPS = 1e-10  # |omega| below this uses the straight-line branch


@flax.struct.dataclass
class VelocityMotionModel:
    """Unicycle velocity model, Probabilistic Robotics ch. 5
    (reference impl: src/models/motion.rs:26-176).

    State [x, y, theta], control [v, omega]. Exact-arc prediction with a
    straight-line branch for omega ~ 0, selected with ``jnp.where`` so the
    whole model stays branch-free under jit.
    """

    alpha: jnp.ndarray  # (6,) noise coefficients a0..a5

    @classmethod
    def create(cls, alpha):
        return cls(alpha=jnp.asarray(alpha))

    def prediction(self, x, u, dt):
        theta = x[..., 2]
        v, w = u[..., 0], u[..., 1]
        straight = jnp.abs(w) < _OMEGA_EPS
        ws = jnp.where(straight, 1.0, w)  # safe denominator
        arc_dx = v / ws * (-jnp.sin(theta) + jnp.sin(theta + w * dt))
        arc_dy = v / ws * (jnp.cos(theta) - jnp.cos(theta + w * dt))
        lin_dx = v * jnp.cos(theta) * dt
        lin_dy = v * jnp.sin(theta) * dt
        dx = jnp.where(straight, lin_dx, arc_dx)
        dy = jnp.where(straight, lin_dy, arc_dy)
        out = jnp.stack(
            [x[..., 0] + dx, x[..., 1] + dy, wrap_angle(theta + w * dt)], axis=-1
        )
        return out

    def jacobian_wrt_state(self, x, u, dt):
        """df/dx, (..., 3, 3) (reference: motion.rs:68-91)."""
        theta = x[..., 2]
        v, w = u[..., 0], u[..., 1]
        straight = jnp.abs(w) < _OMEGA_EPS
        ws = jnp.where(straight, 1.0, w)
        j02 = jnp.where(
            straight,
            -v * jnp.sin(theta) * dt,
            v / ws * (-jnp.cos(theta) + jnp.cos(theta + w * dt)),
        )
        # NOTE: the reference's straight branch uses -v*cos(theta)*dt for
        # dy/dtheta (motion.rs:86) — the correct derivative of
        # y + v*sin(theta)*dt is +v*cos(theta)*dt; we use the correct sign.
        j12 = jnp.where(
            straight,
            v * jnp.cos(theta) * dt,
            v / ws * (-jnp.sin(theta) + jnp.sin(theta + w * dt)),
        )
        eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), x.shape[:-1] + (3, 3))
        jac = eye.at[..., 0, 2].set(j02).at[..., 1, 2].set(j12)
        return jac

    def jacobian_wrt_input(self, x, u, dt):
        """df/du, (..., 3, 2) (reference: motion.rs:93-122, with the
        w-from-state bug fixed)."""
        theta = x[..., 2]
        v, w = u[..., 0], u[..., 1]
        straight = jnp.abs(w) < _OMEGA_EPS
        ws = jnp.where(straight, 1.0, w)
        sint, cost = jnp.sin(theta), jnp.cos(theta)
        sintdt, costdt = jnp.sin(theta + w * dt), jnp.cos(theta + w * dt)
        w2 = ws * ws
        j00 = jnp.where(straight, cost * dt, (-sint + sintdt) / ws)
        j10 = jnp.where(straight, sint * dt, (cost - costdt) / ws)
        j01 = jnp.where(
            straight, 0.0, v * ((sint - sintdt) / w2 + costdt * dt / ws)
        )
        j11 = jnp.where(
            straight, 0.0, v * (-(cost - costdt) / w2 + sintdt * dt / ws)
        )
        zeros = jnp.zeros_like(j00)
        dt_arr = jnp.broadcast_to(jnp.asarray(dt, dtype=x.dtype), j00.shape)
        return jnp.stack(
            [
                jnp.stack([j00, j01], axis=-1),
                jnp.stack([j10, j11], axis=-1),
                jnp.stack([zeros, dt_arr], axis=-1),
            ],
            axis=-2,
        )

    def cov_noise_control_space(self, u):
        """diag(a0 v^2 + a1 w^2 + eps, a2 v^2 + a3 w^2 + eps)
        (reference: motion.rs:124-134)."""
        v2 = jnp.square(u[..., 0])
        w2 = jnp.square(u[..., 1])
        eps = 1e-5
        a = self.alpha
        d0 = a[0] * v2 + a[1] * w2 + eps
        d1 = a[2] * v2 + a[3] * w2 + eps
        zeros = jnp.zeros_like(d0)
        return jnp.stack(
            [jnp.stack([d0, zeros], axis=-1), jnp.stack([zeros, d1], axis=-1)],
            axis=-2,
        )

    def pose_noise_cov(self, x, u, dt):
        """(3, 3) pose-space covariance of ONE ``sample`` step, matching
        sample()'s actual noise model: V M V^T for the (v, w) channels
        PLUS the gamma heading-diffusion term (variance
        (a4 v^2 + a5 w^2) dt^2 on theta) that the input Jacobian cannot
        express. Proposal distributions (FastSLAM 2.0) must use this —
        V M V^T alone is rank-2 and leaves the heading bias direction
        with no spread."""
        v_jac = self.jacobian_wrt_input(x, u, dt)
        m = self.cov_noise_control_space(u)
        cov = v_jac @ m @ jnp.swapaxes(v_jac, -1, -2)
        v2 = jnp.square(u[..., 0])
        w2 = jnp.square(u[..., 1])
        a = self.alpha
        a4 = a[4] if a.shape[-1] > 4 else a[-1]
        a5 = a[5] if a.shape[-1] > 5 else a[-1]
        g_var = (a4 * v2 + a5 * w2) * dt * dt
        return cov.at[..., 2, 2].add(g_var)

    def sample(self, key, x, u, dt):
        """Noisy propagation with the gamma heading term
        (reference: motion.rs:136-175). Accepts batched x for particle
        clouds; key is consumed for the whole batch at once."""
        theta = x[..., 2]
        v, w = u[..., 0], u[..., 1]
        v2, w2 = jnp.square(v), jnp.square(w)
        eps = 1e-5
        a = self.alpha
        kv, kw, kg = jax.random.split(key, 3)
        shape = x.shape[:-1]
        std_v = jnp.sqrt(a[0] * v2 + a[1] * w2 + eps)
        std_w = jnp.sqrt(a[2] * v2 + a[3] * w2 + eps)
        std_g = jnp.sqrt(a[4] * v2 + a[5] * w2)
        vn = v + std_v * jax.random.normal(kv, shape, dtype=x.dtype)
        wn = w + std_w * jax.random.normal(kw, shape, dtype=x.dtype)
        gn = std_g * jax.random.normal(kg, shape, dtype=x.dtype)
        straight = jnp.abs(wn) < _OMEGA_EPS
        wns = jnp.where(straight, 1.0, wn)
        dx = jnp.where(
            straight,
            vn * jnp.cos(theta) * dt,
            vn / wns * (-jnp.sin(theta) + jnp.sin(theta + wn * dt)),
        )
        dy = jnp.where(
            straight,
            vn * jnp.sin(theta) * dt,
            vn / wns * (jnp.cos(theta) - jnp.cos(theta + wn * dt)),
        )
        return jnp.stack(
            [
                x[..., 0] + dx,
                x[..., 1] + dy,
                wrap_angle(theta + wn * dt + gn * dt),
            ],
            axis=-1,
        )


@flax.struct.dataclass
class SimpleProblemMotionModel:
    """4-state [x, y, yaw, v] constant-velocity + yaw-rate demo model
    (reference: src/models/motion.rs:197-238). Control [v, omega]."""

    @classmethod
    def create(cls):
        return cls()

    def prediction(self, x, u, dt):
        yaw, v = x[..., 2], x[..., 3]
        return jnp.stack(
            [
                x[..., 0] + jnp.cos(yaw) * v * dt,
                x[..., 1] + jnp.sin(yaw) * v * dt,
                yaw + u[..., 1] * dt,
                u[..., 0] * jnp.ones_like(yaw),
            ],
            axis=-1,
        )

    def jacobian_wrt_state(self, x, u, dt):
        """(..., 4, 4) (reference: motion.rs:217-228 — note it reads
        v from the *control* u[0], matching its simulated usage)."""
        yaw = x[..., 2]
        v = u[..., 0]
        z = jnp.zeros_like(yaw)
        one = jnp.ones_like(yaw)
        dt_ = dt * one
        return jnp.stack(
            [
                jnp.stack([one, z, -dt_ * v * jnp.sin(yaw), dt_ * jnp.cos(yaw)], -1),
                jnp.stack([z, one, dt_ * v * jnp.cos(yaw), dt_ * jnp.sin(yaw)], -1),
                jnp.stack([z, z, one, z], -1),
                jnp.stack([z, z, z, z], -1),
            ],
            axis=-2,
        )

    def sample(self, key, x, u, dt):
        # The reference leaves this unimplemented (motion.rs:235-237); for
        # particle filters we propagate deterministically (noise is added by
        # the filter itself via its R covariance).
        del key
        return self.prediction(x, u, dt)


@flax.struct.dataclass
class OdometryMotionModel:
    """Odometry (rot1-trans-rot2) motion model (Probabilistic Robotics
    ch. 5.4) for datasets that log relative odometry instead of velocity
    commands — the slam_course sensor log's ODOMETRY records
    (reference loads them, src/data/slam_course.rs:36-97, but has no model
    to consume them). Control u = [rot1, trans, rot2]; dt is ignored.

    alphas = [a1..a4]: control-space noise
    var = [a1 r1^2 + a2 t^2, a3 t^2 + a4 (r1^2 + r2^2), a1 r2^2 + a2 t^2].
    """

    alphas: jnp.ndarray  # (4,)

    @classmethod
    def create(cls, alphas):
        return cls(alphas=jnp.asarray(alphas))

    def prediction(self, x, u, dt):
        del dt
        r1, t, r2 = u[..., 0], u[..., 1], u[..., 2]
        heading = x[..., 2] + r1
        return jnp.stack(
            [
                x[..., 0] + t * jnp.cos(heading),
                x[..., 1] + t * jnp.sin(heading),
                wrap_angle(x[..., 2] + r1 + r2),
            ],
            axis=-1,
        )

    def jacobian_wrt_state(self, x, u, dt):
        del dt
        r1, t = u[..., 0], u[..., 1]
        heading = x[..., 2] + r1
        z = jnp.zeros_like(heading)
        one = jnp.ones_like(heading)
        return jnp.stack(
            [
                jnp.stack([one, z, -t * jnp.sin(heading)], -1),
                jnp.stack([z, one, t * jnp.cos(heading)], -1),
                jnp.stack([z, z, one], -1),
            ],
            axis=-2,
        )

    def jacobian_wrt_input(self, x, u, dt):
        """(..., 3, 3) w.r.t. [rot1, trans, rot2]."""
        del dt
        r1, t = u[..., 0], u[..., 1]
        heading = x[..., 2] + r1
        z = jnp.zeros_like(heading)
        one = jnp.ones_like(heading)
        return jnp.stack(
            [
                jnp.stack([-t * jnp.sin(heading), jnp.cos(heading), z], -1),
                jnp.stack([t * jnp.cos(heading), jnp.sin(heading), z], -1),
                jnp.stack([one, z, one], -1),
            ],
            axis=-2,
        )

    def cov_noise_control_space(self, u):
        a1, a2, a3, a4 = (self.alphas[..., k] for k in range(4))
        r1, t, r2 = u[..., 0], u[..., 1], u[..., 2]
        v = jnp.stack(
            [
                a1 * r1**2 + a2 * t**2,
                a3 * t**2 + a4 * (r1**2 + r2**2),
                a1 * r2**2 + a2 * t**2,
            ],
            axis=-1,
        )
        return jax.vmap(jnp.diag)(v) if v.ndim > 1 else jnp.diag(v)

    def pose_noise_cov(self, x, u, dt):
        """(3, 3) pose-space covariance of one ``sample`` step
        (V M V^T; the 3-dim odometry noise space is full rank)."""
        v_jac = self.jacobian_wrt_input(x, u, dt)
        m = self.cov_noise_control_space(u)
        return v_jac @ m @ jnp.swapaxes(v_jac, -1, -2)

    def sample(self, key, x, u, dt):
        """Noisy odometry step for particle filters."""
        std = jnp.sqrt(
            jnp.clip(jnp.diagonal(self.cov_noise_control_space(u)), 1e-20,
                     None)
        )
        noise = jax.random.normal(key, u.shape, dtype=x.dtype) * std
        return self.prediction(x, u + noise, dt)
