"""Model-layer tests: analytic Jacobians vs autodiff, noise covariances,
branch behavior (reference: src/models/motion.rs, src/models/measurement.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.models import (
    RangeBearingMeasurementModel,
    SimpleProblemMeasurementModel,
    SimpleProblemMotionModel,
    VelocityMotionModel,
)

VEL = VelocityMotionModel.create([1.0, 1.0, 30.0, 30.0, 10.0, 10.0])


def test_velocity_prediction_arc_vs_straight():
    x = jnp.array([1.0, 2.0, 0.3])
    dt = 0.1
    # straight-line: w = 0
    out = VEL.prediction(x, jnp.array([2.0, 0.0]), dt)
    np.testing.assert_allclose(
        np.asarray(out),
        [1.0 + 0.2 * np.cos(0.3), 2.0 + 0.2 * np.sin(0.3), 0.3],
        rtol=1e-12,
    )
    # arc limit: w -> 0 should approach the straight-line branch
    out_eps = VEL.prediction(x, jnp.array([2.0, 1e-7]), dt)
    np.testing.assert_allclose(np.asarray(out_eps), np.asarray(out), atol=1e-7)


def test_velocity_jacobians_match_autodiff():
    x = jnp.array([0.5, -1.0, 0.7])
    u = jnp.array([1.3, 0.4])
    dt = 0.1
    g_analytic = VEL.jacobian_wrt_state(x, u, dt)
    g_auto = jax.jacfwd(lambda xx: VEL.prediction(xx, u, dt))(x)
    np.testing.assert_allclose(np.asarray(g_analytic), np.asarray(g_auto), atol=1e-10)

    v_analytic = VEL.jacobian_wrt_input(x, u, dt)
    v_auto = jax.jacfwd(lambda uu: VEL.prediction(x, uu, dt))(u)
    np.testing.assert_allclose(np.asarray(v_analytic), np.asarray(v_auto), atol=1e-10)


def test_velocity_jacobians_straight_match_autodiff():
    x = jnp.array([0.5, -1.0, 0.7])
    u = jnp.array([1.3, 0.0])
    dt = 0.1
    g_analytic = VEL.jacobian_wrt_state(x, u, dt)
    # autodiff through the jnp.where branch is unreliable exactly at w=0;
    # compare against the hand straight-line form instead
    want = np.eye(3)
    want[0, 2] = -1.3 * np.sin(0.7) * 0.1
    want[1, 2] = 1.3 * np.cos(0.7) * 0.1
    np.testing.assert_allclose(np.asarray(g_analytic), want, atol=1e-12)


def test_velocity_noise_cov():
    u = jnp.array([2.0, 0.5])
    m = VEL.cov_noise_control_space(u)
    a = [1.0, 1.0, 30.0, 30.0]
    want = np.diag(
        [a[0] * 4.0 + a[1] * 0.25 + 1e-5, a[2] * 4.0 + a[3] * 0.25 + 1e-5]
    )
    np.testing.assert_allclose(np.asarray(m), want, rtol=1e-12)


def test_velocity_sample_statistics():
    """Sampled propagation should center on a near-deterministic prediction
    when noise coefficients are tiny."""
    model = VelocityMotionModel.create([1e-8] * 6)
    x = jnp.array([0.0, 0.0, 0.1])
    u = jnp.array([1.0, 0.2])
    xs = jnp.broadcast_to(x, (20000, 3))
    out = model.sample(jax.random.key(0), xs, u, 0.1)
    np.testing.assert_allclose(
        np.mean(np.asarray(out), axis=0), np.asarray(model.prediction(x, u, 0.1)),
        atol=1e-4,
    )


def test_simple_problem_motion():
    m = SimpleProblemMotionModel.create()
    x = jnp.array([0.0, 0.0, 0.5, 2.0])
    u = jnp.array([1.0, 0.1])
    out = m.prediction(x, u, 0.1)
    np.testing.assert_allclose(
        np.asarray(out),
        [0.2 * np.cos(0.5), 0.2 * np.sin(0.5), 0.51, 1.0],
        rtol=1e-12,
    )
    # jacobian matches the reference's convention (v taken from u[0],
    # motion.rs:219) — check shape + top-left structure
    g = m.jacobian_wrt_state(x, u, 0.1)
    assert g.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(g)[0, 2], -0.1 * 1.0 * np.sin(0.5))


def test_range_bearing_model():
    m = RangeBearingMeasurementModel.create()
    x = jnp.array([1.0, 1.0, 0.5])
    lm = jnp.array([4.0, 5.0, 0.0])
    z = m.prediction(x, lm)
    np.testing.assert_allclose(
        np.asarray(z), [5.0, np.arctan2(4.0, 3.0) - 0.5], rtol=1e-12
    )
    h_auto = jax.jacfwd(lambda xx: m.prediction(xx, lm))(x)
    np.testing.assert_allclose(np.asarray(m.jacobian(x, lm)), np.asarray(h_auto), atol=1e-12)


def test_simple_measurement_model():
    m = SimpleProblemMeasurementModel.create()
    x = jnp.array([3.0, -2.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(m.prediction(x)), [3.0, -2.0])
    h = m.jacobian(x)
    np.testing.assert_allclose(np.asarray(h), [[1, 0, 0, 0], [0, 1, 0, 0]])


def test_models_vmap_over_particles():
    """Batch axis = particle cloud: one fused call, no per-particle loop."""
    xs = jnp.asarray(np.random.default_rng(0).normal(size=(128, 3)))
    u = jnp.array([1.0, 0.3])
    out = VEL.prediction(xs, u, 0.1)
    assert out.shape == (128, 3)
    ref0 = VEL.prediction(xs[0], u, 0.1)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0), rtol=1e-12)


def test_odometry_motion_model_jacobians():
    """OdometryMotionModel (rot1-trans-rot2, PR ch. 5.4): analytic
    Jacobians match autodiff; noise covariance is PSD diagonal."""
    import jax

    from rustrobotics_tpu.models.motion import OdometryMotionModel

    m = OdometryMotionModel.create([0.05, 0.01, 0.02, 0.01])
    x = jnp.array([1.0, -2.0, 0.7])
    u = jnp.array([0.1, 1.5, -0.2])
    g = m.jacobian_wrt_state(x, u, 0.0)
    g_ad = jax.jacfwd(lambda xx: m.prediction(xx, u, 0.0))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-9)
    v = m.jacobian_wrt_input(x, u, 0.0)
    v_ad = jax.jacfwd(lambda uu: m.prediction(x, uu, 0.0))(u)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ad), atol=1e-9)
    cov = np.asarray(m.cov_noise_control_space(u))
    assert (np.diag(cov) > 0).all() and np.allclose(cov, np.diag(np.diag(cov)))
    # sample() stays near the deterministic prediction for tiny noise
    s = m.sample(jax.random.key(0), x, u, 0.0)
    assert np.linalg.norm(np.asarray(s - m.prediction(x, u, 0.0))) < 0.5
