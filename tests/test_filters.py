"""Filter-layer tests.

The reference pins no numbers for the stochastic filters (SURVEY §4) — its
examples just run them. Here we add seeded statistical oracles: linear-model
equivalence (EKF == KF == UKF on a linear system), tracking-error bounds on
the simulated unicycle, resampling distribution checks, and the parallel
(associative-scan) Kalman filter against the sequential one.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.localization import (
    ExtendedKalmanFilter,
    ExtendedKalmanFilterKnownCorrespondences,
    LandmarkTable,
    ParticleFilter,
    ParticleFilterKnownCorrespondences,
    UnscentedKalmanFilter,
    gaussian_estimate,
    parallel_linear_kalman_filter,
    resample_multinomial,
    resample_stratified,
    resample_systematic,
)
from rustrobotics_tpu.localization.kalman_scan import (
    sequential_linear_kalman_filter,
)
from rustrobotics_tpu.localization.simulation import run_simulation_jit
from rustrobotics_tpu.models import (
    RangeBearingMeasurementModel,
    VelocityMotionModel,
)
from rustrobotics_tpu.utils.state import GaussianState
import flax.struct
import pytest


@flax.struct.dataclass
class LinearMotion:
    f: jnp.ndarray

    def prediction(self, x, u, dt):
        del u, dt
        return jnp.einsum("ij,...j->...i", self.f, x)

    def jacobian_wrt_state(self, x, u, dt):
        del u, dt
        return jnp.broadcast_to(self.f, x.shape[:-1] + self.f.shape)


@flax.struct.dataclass
class LinearMeasurement:
    h: jnp.ndarray

    def prediction(self, x, landmark=None):
        del landmark
        return jnp.einsum("ij,...j->...i", self.h, x)

    def jacobian(self, x, landmark=None):
        del landmark
        return jnp.broadcast_to(self.h, x.shape[:-1] + self.h.shape)


def _linear_system():
    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    q = jnp.array([[0.01, 0.0], [0.0, 0.02]])
    r = jnp.array([[0.5]])
    return f, h, q, r


def test_ekf_equals_ukf_on_linear_model():
    """On a linear-Gaussian model EKF and UKF must agree (UKF sigma points
    are exact for linear maps)."""
    f, h, q, r = _linear_system()
    ekf = ExtendedKalmanFilter(
        r=q, q=r, motion_model=LinearMotion(f=f),
        measurement_model=LinearMeasurement(h=h),
    )
    ukf = UnscentedKalmanFilter.create(
        q=q, r=r, measurement_model=LinearMeasurement(h=h),
        motion_model=LinearMotion(f=f), alpha=1.0, beta=2.0, kappa=0.0,
    )
    state_e = GaussianState(x=jnp.array([0.0, 1.0]), cov=jnp.eye(2))
    state_u = state_e
    rng = np.random.default_rng(0)
    for _ in range(20):
        z = jnp.asarray(rng.normal(size=(1,)))
        u = jnp.zeros(2)
        state_e = ekf.step(state_e, u, z, 0.1)
        state_u = ukf.step(state_u, u, z, 0.1)
        np.testing.assert_allclose(
            np.asarray(state_e.x), np.asarray(state_u.x), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(state_e.cov), np.asarray(state_u.cov), atol=1e-8
        )


@pytest.mark.slow
def test_parallel_kalman_matches_sequential():
    f, h, q, r = _linear_system()
    rng = np.random.default_rng(1)
    ys = jnp.asarray(rng.normal(size=(257, 1)))
    m0 = jnp.array([0.0, 0.5])
    p0 = jnp.eye(2)
    par = parallel_linear_kalman_filter(f, q, h, r, m0, p0, ys)
    seq = sequential_linear_kalman_filter(f, q, h, r, m0, p0, ys)
    np.testing.assert_allclose(np.asarray(par.x), np.asarray(seq.x), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.cov), np.asarray(seq.cov), atol=1e-8)


@pytest.mark.slow
def test_parallel_rts_smoother_matches_sequential():
    from rustrobotics_tpu.localization.kalman_scan import (
        parallel_rts_smoother,
        sequential_rts_smoother,
    )

    f, h, q, r = _linear_system()
    rng = np.random.default_rng(2)
    ys = jnp.asarray(rng.normal(size=(257, 1)))
    m0 = jnp.array([0.0, 0.5])
    p0 = jnp.eye(2)
    par = parallel_rts_smoother(f, q, h, r, m0, p0, ys)
    seq = sequential_rts_smoother(f, q, h, r, m0, p0, ys)
    np.testing.assert_allclose(np.asarray(par.x), np.asarray(seq.x), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(par.cov), np.asarray(seq.cov), atol=1e-8
    )
    # smoothing must not be a no-op: interior estimates differ from filtering
    filt = sequential_linear_kalman_filter(f, q, h, r, m0, p0, ys)
    assert not np.allclose(np.asarray(par.x[:-1]), np.asarray(filt.x[:-1]))
    # last smoothed state equals last filtered state
    np.testing.assert_allclose(
        np.asarray(par.x[-1]), np.asarray(filt.x[-1]), atol=1e-8
    )


def _rmse(a, b):
    return float(np.sqrt(np.mean(np.sum((np.asarray(a) - np.asarray(b)) ** 2, -1))))


def test_simulation_ekf_tracks():
    hist = run_simulation_jit(jax.random.key(0), algo="ekf", dtype=jnp.float64)
    err_est = _rmse(hist["x_est"][:, :2], hist["x_true"][:, :2])
    err_dr = _rmse(hist["x_dr"][:, :2], hist["x_true"][:, :2])
    assert err_est < 0.5, err_est
    assert err_est < err_dr  # beats dead reckoning
    # covariance stays symmetric PSD
    covs = np.asarray(hist["cov_est"])
    np.testing.assert_allclose(covs, np.swapaxes(covs, -1, -2), atol=1e-8)
    assert np.linalg.eigvalsh(covs[-1]).min() > -1e-9


def test_simulation_ukf_tracks():
    hist = run_simulation_jit(jax.random.key(0), algo="ukf", dtype=jnp.float64)
    err = _rmse(hist["x_est"][:, :2], hist["x_true"][:, :2])
    assert err < 0.5, err


def test_simulation_pf_tracks():
    hist = run_simulation_jit(jax.random.key(0), algo="pf", num_particles=300, dtype=jnp.float64)
    err = _rmse(hist["x_est"][:, :2], hist["x_true"][:, :2])
    assert err < 0.7, err


@pytest.mark.slow
def test_resampling_distribution():
    """All three schemes must resample proportionally to the weights."""
    w = jnp.asarray(np.array([0.1, 0.4, 0.2, 0.3]))
    n = 4000
    rng = np.random.default_rng(0)
    labels = np.tile(np.arange(4), n // 4)
    rng.shuffle(labels)  # random order: avoids systematic-resampling aliasing
    big_w = jnp.asarray(np.asarray(w)[labels] / (n // 4))
    for fn in (resample_multinomial, resample_stratified, resample_systematic):
        idx = np.asarray(fn(jax.random.key(2), big_w))
        freq = np.bincount(labels[idx], minlength=4) / n
        np.testing.assert_allclose(freq, np.asarray(w), atol=0.05)


def test_resampling_degenerate_weight():
    """All mass on one particle -> every resampled index points at it."""
    w = jnp.asarray([0.0, 0.0, 1.0, 0.0])
    for fn in (resample_multinomial, resample_stratified, resample_systematic):
        idx = np.asarray(fn(jax.random.key(3), w))
        assert np.all(idx == 2)


def _kc_setup():
    landmarks = LandmarkTable.create(
        ids=[7, 3, 12],
        positions=np.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [-2.0, -1.0, 0.0]]),
    )
    motion = VelocityMotionModel.create([0.01, 0.01, 0.01, 0.01, 0.01, 0.01])
    meas = RangeBearingMeasurementModel.create()
    q = jnp.diag(jnp.asarray([0.01, 0.01]))
    return landmarks, motion, meas, q


@pytest.mark.slow
def test_ekf_kc_converges_with_landmarks():
    """A stationary robot observing 3 landmarks repeatedly must collapse its
    covariance and localize (sequential masked updates, ekf.rs:144-159)."""
    landmarks, motion, meas, q = _kc_setup()
    ekf = ExtendedKalmanFilterKnownCorrespondences(
        q=q, landmarks=landmarks, motion_model=motion, measurement_model=meas
    )
    x_true = jnp.asarray([0.3, -0.2, 0.4])
    state = GaussianState(
        x=jnp.zeros(3), cov=jnp.eye(3)
    )
    ids = jnp.asarray([7, 3, 12, 99])  # 99 is unknown -> must be skipped
    lms, valid = landmarks.lookup(ids)
    z = jax.vmap(lambda lm: meas.prediction(x_true, lm))(lms)
    mask = jnp.asarray([True, True, True, True])
    for _ in range(10):
        state = ekf.step(
            state, jnp.zeros(2), jnp.asarray(False), ids, z, mask, 0.1
        )
    np.testing.assert_allclose(np.asarray(state.x), np.asarray(x_true), atol=1e-3)
    assert float(jnp.trace(state.cov)) < 0.02


def test_ekf_kc_unknown_landmark_is_noop():
    landmarks, motion, meas, q = _kc_setup()
    ekf = ExtendedKalmanFilterKnownCorrespondences(
        q=q, landmarks=landmarks, motion_model=motion, measurement_model=meas
    )
    state = GaussianState(x=jnp.zeros(3), cov=jnp.eye(3))
    ids = jnp.asarray([99])
    z = jnp.zeros((1, 2))
    out = ekf.update(state, ids, z, jnp.asarray([True]))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(state.x))
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(state.cov))


@pytest.mark.slow
def test_pf_kc_localizes():
    landmarks, motion, meas, q = _kc_setup()
    pf = ParticleFilterKnownCorrespondences(
        q=q, landmarks=landmarks, motion_model=motion, measurement_model=meas
    )
    x_true = jnp.asarray([0.3, -0.2, 0.4])
    rng_key = jax.random.key(4)
    particles = x_true + 0.5 * jax.random.normal(rng_key, (500, 3))
    ids = jnp.asarray([7, 3, 12])
    lms, _ = landmarks.lookup(ids)
    z = jax.vmap(lambda lm: meas.prediction(x_true, lm))(lms)
    mask = jnp.ones(3, dtype=bool)
    for i in range(5):
        rng_key, k = jax.random.split(rng_key)
        particles = pf.step(
            k, particles, jnp.zeros(2), jnp.asarray(False), ids, z, mask, 0.1
        )
    est = gaussian_estimate(particles)
    np.testing.assert_allclose(np.asarray(est.x), np.asarray(x_true), atol=0.1)


def test_pf_step_shapes_and_jit():
    """Plain PF step jits and preserves cloud shape."""
    from rustrobotics_tpu.models import (
        SimpleProblemMeasurementModel,
        SimpleProblemMotionModel,
    )

    pf = ParticleFilter(
        r=jnp.eye(4) * 0.01,
        q=jnp.eye(2),
        motion_model=SimpleProblemMotionModel.create(),
        measurement_model=SimpleProblemMeasurementModel.create(),
        resampling="systematic",
    )
    particles = jnp.zeros((64, 4))
    step = jax.jit(pf.step)
    out = step(jax.random.key(0), particles, jnp.array([1.0, 0.1]),
               jnp.array([0.1, 0.0]), 0.1)
    assert out.shape == (64, 4)


@pytest.mark.slow
def test_ukf_kc_localizes():
    """UKF known-correspondences (the reference leaves this todo!(),
    localization_landmarks.rs:62)."""
    from rustrobotics_tpu.localization import (
        UnscentedKalmanFilterKnownCorrespondences,
    )

    landmarks, motion, meas, q = _kc_setup()
    ukf = UnscentedKalmanFilterKnownCorrespondences.create(
        q=q, landmarks=landmarks, measurement_model=meas, motion_model=motion,
        alpha=1.0, beta=2.0, kappa=0.0,
    )
    x_true = jnp.asarray([0.3, -0.2, 0.4])
    state = GaussianState(x=jnp.zeros(3), cov=jnp.eye(3) * 0.5)
    ids = jnp.asarray([7, 3, 12, 99])
    lms, _ = landmarks.lookup(ids)
    z = jax.vmap(lambda lm: meas.prediction(x_true, lm))(lms)
    mask = jnp.ones(4, dtype=bool)
    for _ in range(10):
        state = ukf.step(state, jnp.zeros(2), jnp.asarray(False), ids, z,
                         mask, 0.1)
    np.testing.assert_allclose(np.asarray(state.x), np.asarray(x_true),
                               atol=1e-2)
