"""LQR tests: DARE fixed point vs scipy's solve_discrete_are, closed-loop
stabilization of the inverted pendulum (reference: src/control/lqr.rs,
examples/control/inverted_pendulum.rs)."""

import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.control import (
    InvertedPendulumModel,
    LinearTimeInvariantModel,
    lqr,
    simulate_inverted_pendulum,
    solve_dare,
)


def _pendulum_lin(dt=0.01):
    return InvertedPendulumModel.create(dtype=jnp.float64).linearize(dt)


def test_dare_matches_scipy():
    from scipy.linalg import solve_discrete_are

    lin = _pendulum_lin()
    p = np.asarray(solve_dare(lin, max_iter=100000, epsilon=1e-10))
    p_ref = solve_discrete_are(
        np.asarray(lin.a), np.asarray(lin.b), np.asarray(lin.q), np.asarray(lin.r)
    )
    np.testing.assert_allclose(p, p_ref, rtol=1e-6)


def test_lqr_gain_stabilizes_closed_loop():
    lin = _pendulum_lin()
    k = np.asarray(lqr(lin, max_iter=500, epsilon=0.01))
    a_cl = np.asarray(lin.a) - np.asarray(lin.b) @ k
    eigs = np.abs(np.linalg.eigvals(a_cl))
    assert np.all(eigs < 1.0), eigs  # closed loop strictly stable


def test_inverted_pendulum_settles():
    """Role of the reference rollout (ip.rs:44-73): from theta=-0.2 the
    LQR brings the pendulum upright."""
    states, commands = simulate_inverted_pendulum(dtype=jnp.float64)
    final = np.asarray(states[-1])
    np.testing.assert_allclose(final, 0.0, atol=1e-3)
    # theta decays monotonically-ish: final 1s stays within 1e-2
    tail = np.asarray(states[-100:, 2])
    assert np.max(np.abs(tail)) < 1e-2
    assert commands.shape[0] == states.shape[0]


def test_lqr_scalar_system_analytic():
    """1-D sanity: a=1, b=1, q=1, r=1 -> P = (1+sqrt(5))/2 golden ratio
    fixed point; K = P/(1+P)."""
    lin = LinearTimeInvariantModel(
        a=jnp.ones((1, 1)), b=jnp.ones((1, 1)), q=jnp.ones((1, 1)),
        r=jnp.ones((1, 1)),
    )
    p = float(solve_dare(lin, max_iter=10000, epsilon=1e-12)[0, 0])
    golden = (1 + np.sqrt(5)) / 2
    assert abs(p - golden) < 1e-6
    k = float(lqr(lin, max_iter=10000, epsilon=1e-12)[0, 0])
    assert abs(k - golden / (1 + golden)) < 1e-6
