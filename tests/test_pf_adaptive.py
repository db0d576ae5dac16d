"""ESS-adaptive particle filter (AdaptiveParticleFilter).

The reference resamples unconditionally every step (particle_filter.rs:
96-118); the adaptive filter carries log-weights and resamples only when
ESS < ess_frac*N. With ess_frac >= 1 it must reproduce the plain SIR
filter bit-for-bit under the same keys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.localization import (
    AdaptiveParticleFilter,
    ParticleFilter,
    effective_sample_size,
    weighted_gaussian_estimate,
)
from rustrobotics_tpu.models import (
    SimpleProblemMeasurementModel,
    SimpleProblemMotionModel,
)


def _filters(resampling="systematic", ess_frac=0.5):
    r = jnp.diag(jnp.array([0.2, 0.2, jnp.deg2rad(3.0), 0.1])) ** 2
    q = jnp.diag(jnp.array([0.4, 0.4])) ** 2
    kw = dict(
        r=r, q=q,
        motion_model=SimpleProblemMotionModel.create(),
        measurement_model=SimpleProblemMeasurementModel.create(),
        resampling=resampling,
    )
    return ParticleFilter(**kw), AdaptiveParticleFilter(ess_frac=ess_frac, **kw)


def test_ess_bounds():
    n = 1000
    uniform = jnp.zeros(n)
    assert np.isclose(float(effective_sample_size(uniform)), n)
    concentrated = jnp.full(n, -1e8).at[3].set(0.0)
    assert np.isclose(float(effective_sample_size(concentrated)), 1.0)


@pytest.mark.slow
def test_always_resample_matches_plain_sir():
    """ess_frac >= 1 forces a resample every step -> the carried
    log-weights reset each step and the trajectory is IDENTICAL to
    ParticleFilter under the same key sequence."""
    plain, adaptive = _filters(ess_frac=2.0)
    particles = jax.random.normal(jax.random.key(0), (256, 4))
    p_plain, p_adapt = particles, particles
    logw = jnp.zeros(256)
    u = jnp.array([1.0, 0.1])
    z = jnp.array([0.3, 0.2])
    for i in range(5):
        k = jax.random.key(i + 1)
        p_plain = plain.step(k, p_plain, u, z, 0.1)
        p_adapt, logw, did = adaptive.step(k, p_adapt, logw, u, z, 0.1)
        assert int(did) == 1
        np.testing.assert_array_equal(np.asarray(p_plain), np.asarray(p_adapt))
        np.testing.assert_array_equal(np.asarray(logw), 0.0)


def test_never_resample_keeps_cloud_and_accumulates_weights():
    _, adaptive = _filters(ess_frac=0.0)
    particles = jax.random.normal(jax.random.key(0), (128, 4))
    logw = jnp.zeros(128)
    u = jnp.array([1.0, 0.1])
    z = jnp.array([0.3, 0.2])
    for i in range(3):
        particles, logw, did = adaptive.step(
            jax.random.key(i), particles, logw, u, z, 0.1)
        assert int(did) == 0
    assert float(jnp.max(logw)) == 0.0  # shifted
    assert float(jnp.min(logw)) < 0.0   # and genuinely accumulated
    est = weighted_gaussian_estimate(particles, logw)
    assert np.all(np.isfinite(np.asarray(est.x)))
    assert np.all(np.isfinite(np.asarray(est.cov)))


def test_adaptive_tracks_and_resamples_sparsely():
    """On the SimpleProblem scenario the adaptive filter (a) stays close
    to the plain SIR estimate and (b) resamples on a small fraction of
    steps -- the amortization that motivates it on TPU."""
    plain, adaptive = _filters(ess_frac=0.5)
    motion = SimpleProblemMotionModel.create()

    steps, n = 120, 512
    dt = 0.1
    u = jnp.array([1.0, 0.1])
    key = jax.random.key(7)
    k_init, k_traj, k_run_a, k_run_p = jax.random.split(key, 4)

    # ground truth rollout + GPS observations
    x_true = jnp.zeros(4)
    zs = []
    ks = jax.random.split(k_traj, steps)
    for i in range(steps):
        x_true = motion.prediction(x_true, u, dt)
        zs.append(x_true[:2] + 0.4 * jax.random.normal(ks[i], (2,)))
    zs = jnp.stack(zs)

    p0 = jax.random.normal(k_init, (n, 4)) * 0.1

    @jax.jit
    def run_adaptive(p0, zs):
        def body(carry, inp):
            p, lw = carry
            k, z = inp
            p, lw, did = adaptive.step(k, p, lw, u, z, dt)
            return (p, lw), did
        keys = jax.random.split(k_run_a, steps)
        (p, lw), dids = jax.lax.scan(body, (p0, jnp.zeros(n)), (keys, zs))
        return p, lw, jnp.sum(dids)

    @jax.jit
    def run_plain(p0, zs):
        def body(p, inp):
            k, z = inp
            return plain.step(k, p, u, z, dt), None
        keys = jax.random.split(k_run_p, steps)
        return jax.lax.scan(body, p0, (keys, zs))[0]

    p_a, lw, n_resamples = run_adaptive(p0, zs)
    p_p = run_plain(p0, zs)

    est_a = weighted_gaussian_estimate(p_a, lw)
    from rustrobotics_tpu.localization import gaussian_estimate
    est_p = gaussian_estimate(p_p)

    x_ref = np.asarray(zs[-1])  # last GPS fix is within ~0.4 of truth
    assert np.linalg.norm(np.asarray(est_a.x[:2]) - x_ref) < 1.5
    assert np.linalg.norm(np.asarray(est_p.x[:2]) - x_ref) < 1.5
    # the whole point: a meaningful fraction of steps skip the indexed
    # resampling ops entirely (63/120 resample in this scenario)
    assert 0 < int(n_resamples) < steps - steps // 4
