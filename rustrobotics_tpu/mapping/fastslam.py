"""FastSLAM 1.0 with known correspondences (Probabilistic Robotics ch. 13).

Rao-Blackwellized particle filter: each particle carries a robot pose
hypothesis plus an independent EKF per landmark (conditioned on the
particle's trajectory, landmarks decouple). A third SLAM family beyond
EKF-SLAM and graph SLAM; the reference has none of the three.

TPU shape: the particle cloud is a single pytree of batched arrays —
poses (N, 3), landmark means (N, L, 2), covariances (N, L, 2, 2), seen
flags (N, L) — so propagation, every per-landmark EKF update, weighting,
and resampling are fused batched ops over the N axis (the reference-style
per-particle loop would be N sequential tiny filters). A full session jits
as one ``lax.scan``.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from rustrobotics_tpu.localization.pf import resample_systematic
from rustrobotics_tpu.utils.angles import wrap_angle

_INIT_LM_VAR = 1e6


@flax.struct.dataclass
class FastSlamParticles:
    poses: jnp.ndarray    # (N, 3)
    lm_mu: jnp.ndarray    # (N, L, 2)
    lm_cov: jnp.ndarray   # (N, L, 2, 2)
    seen: jnp.ndarray     # (N, L) bool
    logw: jnp.ndarray     # (N,) accumulated log-weights (ESS-gated resample)


@flax.struct.dataclass
class FastSlam:
    """q: (2, 2) range-bearing noise; motion_model must provide a noisy
    ``sample`` (control-space noise drives particle diversity)."""

    q: jnp.ndarray
    motion_model: Any
    max_landmarks: int = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, q, motion_model, max_landmarks):
        return cls(q=jnp.asarray(q), motion_model=motion_model,
                   max_landmarks=max_landmarks)

    def init_particles(self, key, pose0, num_particles,
                       init_sigma=(0.0, 0.0, 0.0)) -> FastSlamParticles:
        pose0 = jnp.asarray(pose0)
        dtype = pose0.dtype
        n, lmax = num_particles, self.max_landmarks
        noise = jax.random.normal(key, (n, 3), dtype) * jnp.asarray(
            init_sigma, dtype)
        return FastSlamParticles(
            poses=pose0 + noise,
            lm_mu=jnp.zeros((n, lmax, 2), dtype),
            lm_cov=jnp.broadcast_to(
                jnp.eye(2, dtype=dtype) * _INIT_LM_VAR, (n, lmax, 2, 2)
            ),
            seen=jnp.zeros((n, lmax), bool),
            logw=jnp.zeros(n, dtype),
        )

    # ------------------------------------------------------------ internals

    def _z_pred_jac(self, poses, mu):
        """Batched over particles: predicted range-bearing of landmark
        mean mu (N, 2) from poses (N, 3), plus the (N, 2, 2) Jacobian
        w.r.t. the LANDMARK position."""
        dx = mu[:, 0] - poses[:, 0]
        dy = mu[:, 1] - poses[:, 1]
        q = jnp.clip(dx * dx + dy * dy, 1e-12, None)
        qs = jnp.sqrt(q)
        z_pred = jnp.stack([qs, jnp.arctan2(dy, dx) - poses[:, 2]], -1)
        h = jnp.stack([
            jnp.stack([dx / qs, dy / qs], -1),
            jnp.stack([-dy / q, dx / q], -1),
        ], -2)  # (N, 2, 2)
        return z_pred, h

    def _update_one(self, particles: FastSlamParticles, k, z, valid):
        """One measurement of landmark slot k against EVERY particle:
        per-particle 2x2 EKF update + likelihood weight. Returns
        (particles, log-weights (N,))."""
        poses = particles.poses
        dtype = poses.dtype
        n = poses.shape[0]
        mu = particles.lm_mu[:, k]        # (N, 2)
        cov = particles.lm_cov[:, k]      # (N, 2, 2)
        seen = particles.seen[:, k]       # (N,)
        # valid may be a scalar (shared mask) or per-particle (N,)
        valid = jnp.broadcast_to(jnp.asarray(valid), (n,))

        # fresh init: inverse measurement from each particle's pose
        rng_m, bearing = z[0], z[1]
        theta = poses[:, 2]
        init_mu = jnp.stack(
            [poses[:, 0] + rng_m * jnp.cos(bearing + theta),
             poses[:, 1] + rng_m * jnp.sin(bearing + theta)], -1)
        fresh = jnp.logical_and(valid, jnp.logical_not(seen))
        mu = jnp.where(fresh[:, None], init_mu, mu)

        z_pred, h = self._z_pred_jac(poses, mu)
        innov = jnp.stack(
            [z[0] - z_pred[:, 0], wrap_angle(z[1] - z_pred[:, 1])], -1)
        with jax.default_matmul_precision("highest"):
            s = jnp.einsum("nij,njk,nlk->nil", h, cov, h) + self.q
            s_inv = jnp.linalg.inv(s)
            gain = jnp.einsum("nij,nkj,nkl->nil", cov, h, s_inv)
            mu_new = mu + jnp.einsum("nij,nj->ni", gain, innov)
            ikh = jnp.eye(2, dtype=dtype) - jnp.einsum(
                "nij,njk->nik", gain, h)
            cov_new = (
                jnp.einsum("nij,njk,nlk->nil", ikh, cov, ikh)
                + jnp.einsum("nij,jk,nlk->nil", gain, self.q, gain)
            )
            # measurement likelihood (log) per particle
            det = s[:, 0, 0] * s[:, 1, 1] - s[:, 0, 1] * s[:, 1, 0]
            maha = jnp.einsum("ni,nij,nj->n", innov, s_inv, innov)
            logw = -0.5 * (maha + jnp.log(jnp.clip(det, 1e-20, None))
                           + 2 * jnp.log(2 * jnp.pi))

        particles = particles.replace(
            lm_mu=particles.lm_mu.at[:, k].set(
                jnp.where(valid[:, None], mu_new, mu)),
            lm_cov=particles.lm_cov.at[:, k].set(
                jnp.where(valid[:, None, None], cov_new, cov)),
            seen=particles.seen.at[:, k].set(jnp.logical_or(seen, valid)),
        )
        logw = jnp.where(jnp.logical_and(valid, jnp.logical_not(fresh)),
                         logw, 0.0)
        return particles, logw

    # -------------------------------------------------------------- stepping

    def step(self, key, particles: FastSlamParticles, u, has_control,
             lm_idx, z, mask, dt) -> FastSlamParticles:
        """One merged event: noisy motion sample + masked measurement
        block (lm_idx (M,), z (M, 2), mask (M,)) + systematic resample."""
        k_prop, k_resample = jax.random.split(key)
        prop = self.motion_model.sample(k_prop, particles.poses, u, dt)
        poses = jnp.where(has_control, prop, particles.poses)
        particles = particles.replace(poses=poses)

        def body(carry, inp):
            parts, logw = carry
            ki, zi, ok = inp
            parts, lw = self._update_one(parts, ki, zi, ok)
            return (parts, logw + lw), None

        n = particles.poses.shape[0]
        (particles, logw_new), _ = jax.lax.scan(
            body, (particles, jnp.zeros(n, particles.poses.dtype)),
            (lm_idx, z, mask),
        )
        # accumulate weights; resample only when the effective sample
        # size drops below N/2 (per-step resampling depletes the cloud
        # on measurement-dense logs)
        logw = particles.logw + logw_new
        w = jnp.exp(logw - jnp.max(logw))
        wn = w / jnp.sum(w)
        ess = 1.0 / jnp.sum(wn * wn)
        do_resample = ess < 0.5 * n
        idx = resample_systematic(k_resample, w)
        idx = jnp.where(do_resample, idx, jnp.arange(n))
        particles = jax.tree.map(lambda a: a[idx], particles)
        return particles.replace(
            logw=jnp.where(do_resample, jnp.zeros_like(logw), logw)
        )

    def estimate(self, particles: FastSlamParticles):
        """Weighted mean pose (angle via circular mean) and landmark map —
        weights are the carried log-weights (uniform right after an
        ESS-triggered resample)."""
        poses = particles.poses
        w = jnp.exp(particles.logw - jnp.max(particles.logw))
        w = w / jnp.sum(w)
        xy = jnp.einsum("n,ni->i", w, poses[:, :2])
        th = jnp.arctan2(jnp.sum(w * jnp.sin(poses[:, 2])),
                         jnp.sum(w * jnp.cos(poses[:, 2])))
        seen_any = particles.seen.any(axis=0)
        wl = w[:, None] * particles.seen  # (N, L)
        norm = jnp.clip(wl.sum(axis=0), 1e-20, None)
        lm = jnp.einsum("nl,nli->li", wl, particles.lm_mu) / norm[:, None]
        return jnp.concatenate([xy, th[None]]), lm, seen_any


def _per_slot_likelihood(slam: FastSlam, particles: FastSlamParticles, z):
    """(N, L) log-likelihood of measurement z against EVERY landmark slot
    of EVERY particle, and the per-slot innovation stats. Fully batched:
    one (N, L, 2, 2) einsum chain, no loops."""
    poses = particles.poses
    n, lmax = particles.seen.shape
    mu = particles.lm_mu                      # (N, L, 2)
    dx = mu[..., 0] - poses[:, None, 0]
    dy = mu[..., 1] - poses[:, None, 1]
    q = jnp.clip(dx * dx + dy * dy, 1e-12, None)
    qs = jnp.sqrt(q)
    z_pred_r = qs
    z_pred_b = jnp.arctan2(dy, dx) - poses[:, None, 2]
    innov = jnp.stack(
        [z[0] - z_pred_r, wrap_angle(z[1] - z_pred_b)], -1)  # (N, L, 2)
    h = jnp.stack([
        jnp.stack([dx / qs, dy / qs], -1),
        jnp.stack([-dy / q, dx / q], -1),
    ], -2)  # (N, L, 2, 2)
    with jax.default_matmul_precision("highest"):
        s = (jnp.einsum("nlij,nljk,nlmk->nlim", h, particles.lm_cov, h)
             + slam.q)
        s_inv = jnp.linalg.inv(s)
        det = s[..., 0, 0] * s[..., 1, 1] - s[..., 0, 1] * s[..., 1, 0]
        maha = jnp.einsum("nli,nlij,nlj->nl", innov, s_inv, innov)
        logl = -0.5 * (maha + jnp.log(jnp.clip(det, 1e-20, None))
                       + 2 * jnp.log(2 * jnp.pi))
    return logl


def fastslam_step_unknown(slam: FastSlam, key, particles: FastSlamParticles,
                          u, has_control, z, mask, dt,
                          match_logl=-4.0,
                          new_track_logl=-10.0) -> FastSlamParticles:
    """Unknown-correspondence FastSLAM step: EVERY PARTICLE associates
    each measurement independently by maximum likelihood over its own map
    (the per-particle data association that makes FastSLAM robust where a
    single-hypothesis EKF association breaks). Two-threshold gating as in
    EKF-SLAM: match above ``match_logl``, open a new track below
    ``new_track_logl``, DISCARD the ambiguous band (single-gate ML
    association spawns duplicate tracks on borderline sightings)."""
    k_prop, k_resample = jax.random.split(key)
    prop = slam.motion_model.sample(k_prop, particles.poses, u, dt)
    poses = jnp.where(has_control, prop, particles.poses)
    particles = particles.replace(poses=poses)
    n, lmax = particles.seen.shape

    def assoc_update(parts, zi, ok):
        logl = _per_slot_likelihood(slam, parts, zi)          # (N, L)
        logl = jnp.where(parts.seen, logl, -jnp.inf)
        best = jnp.argmax(logl, axis=1)                       # (N,)
        best_logl = jnp.take_along_axis(logl, best[:, None], 1)[:, 0]
        first_free = jnp.argmin(parts.seen, axis=1)           # (N,)
        any_free = jnp.logical_not(parts.seen.all(axis=1))
        is_match = best_logl > match_logl
        is_new = best_logl < new_track_logl
        k = jnp.where(is_match, best, first_free)             # (N,) per particle!
        usable = jnp.logical_and(ok, jnp.logical_or(
            is_match, jnp.logical_and(is_new, any_free)))

        # per-particle slot update: gather slot k of each particle,
        # EKF-update it, scatter back
        rows = jnp.arange(n)
        mu = parts.lm_mu[rows, k]
        cov = parts.lm_cov[rows, k]
        seen = parts.seen[rows, k]
        sub = FastSlamParticles(
            poses=parts.poses,
            lm_mu=mu[:, None], lm_cov=cov[:, None], seen=seen[:, None],
            logw=parts.logw,
        )
        sub, logw = slam._update_one(sub, 0, zi, usable)
        parts = parts.replace(
            lm_mu=parts.lm_mu.at[rows, k].set(sub.lm_mu[:, 0]),
            lm_cov=parts.lm_cov.at[rows, k].set(sub.lm_cov[:, 0]),
            seen=parts.seen.at[rows, k].set(sub.seen[:, 0]),
        )
        return parts, logw

    def body(carry, inp):
        parts, logw = carry
        zi, ok = inp
        parts, lw = assoc_update(parts, zi, ok)
        return (parts, logw + lw), None

    (particles, logw_new), _ = jax.lax.scan(
        body, (particles, jnp.zeros(n, particles.poses.dtype)), (z, mask))

    logw = particles.logw + logw_new
    w = jnp.exp(logw - jnp.max(logw))
    wn = w / jnp.sum(w)
    ess = 1.0 / jnp.sum(wn * wn)
    do_resample = ess < 0.5 * n
    idx = jnp.where(do_resample, resample_systematic(k_resample, w),
                    jnp.arange(n))
    particles = jax.tree.map(lambda a: a[idx], particles)
    return particles.replace(
        logw=jnp.where(do_resample, jnp.zeros_like(logw), logw))


# --------------------------------------------------------- FastSLAM 2.0

def _pose_jacobian_rb(m, mu):
    """(N, 2, 3) Jacobian of the range-bearing measurement w.r.t. the
    POSE, batched over particles (m (N, 3) poses, mu (N, 2) landmarks)."""
    dx = mu[:, 0] - m[:, 0]
    dy = mu[:, 1] - m[:, 1]
    q = jnp.clip(dx * dx + dy * dy, 1e-12, None)
    qs = jnp.sqrt(q)
    zeros = jnp.zeros_like(dx)
    return jnp.stack([
        jnp.stack([-dx / qs, -dy / qs, zeros], -1),
        jnp.stack([dy / q, -dx / q, -jnp.ones_like(dx)], -1),
    ], -2)


def fastslam2_step(slam: FastSlam, key, particles: FastSlamParticles,
                   u, has_control, lm_idx, z, mask, dt,
                   pose_noise_eps=1e-6) -> FastSlamParticles:
    """FastSLAM 2.0 step (Probabilistic Robotics table 13.3): the pose
    PROPOSAL incorporates the current measurements — the key upgrade over
    1.0, whose proposal is the raw motion model and which therefore needs
    many more particles when the motion is noisy relative to the sensor
    (reference README.md Todo "FastSLAM 2.0", never implemented there).

    Per particle, fully batched over the cloud:
    1. deterministic motion predict x̂ = g(x, u) with pose-space noise
       R = V M V^T (motion_model control-space noise through the input
       Jacobian) + eps*I;
    2. condition the pose Gaussian (m, S) on every valid measurement of
       an already-seen landmark: L = Hx S Hx^T + Hm Σ_j Hm^T + Q,
       K = S Hx^T L^-1 — the importance weight accumulates
       logN(innov; 0, L) exactly at the proposal's prior, keeping the
       weights consistent with the improved proposal;
    3. sample the pose from N(m, S) (condition-then-sample-once variant
       of the per-measurement incremental sampler — same target
       distribution, one Cholesky);
    4. standard per-landmark EKF updates at the sampled pose (weights NOT
       double-counted), fresh landmarks initialized by inverse
       measurement, ESS-gated systematic resample.
    """
    k_prop, k_resample = jax.random.split(key)
    poses = particles.poses
    dtype = poses.dtype
    n = poses.shape[0]

    # 1. deterministic predict + pose-space motion noise. MUST match the
    # sample() noise model exactly (pose_noise_cov includes e.g. the
    # velocity model's gamma heading diffusion): a proposal prior
    # missing a noise dimension leaves dead-reckoning bias with zero
    # spread to correct along, and the filter diverges on blind
    # stretches with no visible landmarks.
    x_hat = slam.motion_model.prediction(poses, u, dt)
    if hasattr(slam.motion_model, "pose_noise_cov"):
        r_pose = jax.vmap(
            lambda p: slam.motion_model.pose_noise_cov(p, u, dt))(poses)
    else:
        v = jax.vmap(
            lambda p: slam.motion_model.jacobian_wrt_input(p, u, dt))(
                poses)
        mcov = slam.motion_model.cov_noise_control_space(u)
        r_pose = jnp.einsum("nij,jk,nlk->nil", v, mcov, v)
    r_pose = r_pose + jnp.eye(3, dtype=dtype) * pose_noise_eps

    m0 = jnp.where(has_control, x_hat, poses)
    s0 = jnp.where(has_control,
                   jnp.broadcast_to(r_pose, (n, 3, 3)),
                   jnp.eye(3, dtype=dtype) * pose_noise_eps)

    # 2. condition the pose Gaussian on each seen-landmark measurement
    def cond_body(carry, inp):
        m, s, logw = carry
        ki, zi, ok = inp
        seen = particles.seen[jnp.arange(n), ki]
        usable = jnp.logical_and(ok, seen)
        mu = particles.lm_mu[jnp.arange(n), ki]
        cov = particles.lm_cov[jnp.arange(n), ki]
        dxy = mu - m[:, :2]
        q = jnp.clip(jnp.sum(dxy * dxy, -1), 1e-12, None)
        qs = jnp.sqrt(q)
        z_pred = jnp.stack(
            [qs, jnp.arctan2(dxy[:, 1], dxy[:, 0]) - m[:, 2]], -1)
        innov = jnp.stack(
            [zi[0] - z_pred[:, 0], wrap_angle(zi[1] - z_pred[:, 1])], -1)
        hx = _pose_jacobian_rb(m, mu)                       # (N, 2, 3)
        hm = -hx[:, :, :2]                                  # (N, 2, 2)
        with jax.default_matmul_precision("highest"):
            big_l = (jnp.einsum("nij,njk,nlk->nil", hx, s, hx)
                     + jnp.einsum("nij,njk,nlk->nil", hm, cov, hm)
                     + slam.q)
            l_inv = jnp.linalg.inv(big_l)
            det = (big_l[:, 0, 0] * big_l[:, 1, 1]
                   - big_l[:, 0, 1] * big_l[:, 1, 0])
            maha = jnp.einsum("ni,nij,nj->n", innov, l_inv, innov)
            lw = -0.5 * (maha + jnp.log(jnp.clip(det, 1e-20, None))
                         + 2 * jnp.log(2 * jnp.pi))
            gain = jnp.einsum("nij,nkj,nkl->nil", s, hx, l_inv)
            m_new = m + jnp.einsum("nij,nj->ni", gain, innov)
            m_new = m_new.at[:, 2].set(wrap_angle(m_new[:, 2]))
            s_new = s - jnp.einsum("nij,njk,nkl->nil", gain, big_l,
                                   jnp.swapaxes(gain, -1, -2))
        m = jnp.where(usable[:, None], m_new, m)
        s = jnp.where(usable[:, None, None], s_new, s)
        logw = logw + jnp.where(usable, lw, 0.0)
        return (m, s, logw), None

    (m, s, logw_new), _ = jax.lax.scan(
        cond_body, (m0, s0, jnp.zeros(n, dtype)), (lm_idx, z, mask))

    # 3. sample the pose from the conditioned proposal
    with jax.default_matmul_precision("highest"):
        chol = jnp.linalg.cholesky(
            s + jnp.eye(3, dtype=dtype) * pose_noise_eps)
    eps = jax.random.normal(k_prop, (n, 3), dtype)
    sampled = m + jnp.einsum("nij,nj->ni", chol, eps)
    sampled = sampled.at[:, 2].set(wrap_angle(sampled[:, 2]))
    particles = particles.replace(poses=sampled)

    # 4. landmark EKF updates at the sampled pose (weights already
    # accounted by the proposal-consistent terms above)
    def body(carry, inp):
        parts, = carry
        ki, zi, ok = inp
        parts, _ = slam._update_one(parts, ki, zi, ok)
        return (parts,), None

    (particles,), _ = jax.lax.scan(
        body, (particles,), (lm_idx, z, mask))

    logw = particles.logw + logw_new
    w = jnp.exp(logw - jnp.max(logw))
    wn = w / jnp.sum(w)
    ess = 1.0 / jnp.sum(wn * wn)
    do_resample = ess < 0.5 * n
    idx = jnp.where(do_resample, resample_systematic(k_resample, w),
                    jnp.arange(n))
    particles = jax.tree.map(lambda a: a[idx], particles)
    return particles.replace(
        logw=jnp.where(do_resample, jnp.zeros_like(logw), logw))
