"""Fixed-lag smoother tests (no reference counterpart — its PGO is
batch-only over whole g2o files)."""

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.geometry import se2
from rustrobotics_tpu.mapping.fixed_lag import FixedLagSmoother
import pytest


def _circle_data(seed=0, n_circle=12, loops=4):
    rng = np.random.default_rng(seed)
    T = n_circle * loops
    step = np.array([1.0, 0.0, 2 * np.pi / n_circle])
    gt = [np.zeros(3)]
    for _ in range(T):
        gt.append(np.asarray(se2.compose(jnp.asarray(gt[-1]),
                                         jnp.asarray(step))))
    sig_odo = np.array([0.05, 0.05, 0.02])
    sig_clo = np.array([0.02, 0.02, 0.01])
    odom = step + rng.normal(0, sig_odo, (T, 3))
    return np.asarray(gt), odom, sig_odo, sig_clo, n_circle, rng


@pytest.mark.slow
def test_fixed_lag_matches_dead_reckoning_without_closures():
    """Pure odometry carries no extra information: the smoother must
    reproduce dead reckoning exactly (guards the window bookkeeping)."""
    _, odom, sig_odo, _, _, _ = _circle_data()
    fls = FixedLagSmoother.create(
        window=16, closure_capacity=4,
        chain_omega=jnp.diag(1.0 / jnp.asarray(sig_odo**2, jnp.float32)),
        clos_omega=jnp.eye(3, dtype=jnp.float32),
    )
    state = fls.init_state(jnp.zeros(3, jnp.float32))
    adv = jax.jit(fls.advance)
    dr = np.zeros(3)
    for t in range(30):
        state = adv(state, jnp.asarray(odom[t], jnp.float32))
        dr = np.asarray(se2.compose(jnp.asarray(dr), jnp.asarray(
            odom[t], dtype=jnp.float32)))
        cur = np.asarray(fls.current_pose(state))
        assert np.linalg.norm(cur[:2] - dr[:2]) < 1e-3, (t, cur, dr)


@pytest.mark.slow
def test_fixed_lag_closures_beat_dead_reckoning():
    """Revisiting a circle with loop closures: the sliding-window
    optimization + marginalized prior must clearly beat dead reckoning."""
    gt, odom, sig_odo, sig_clo, n_circle, rng = _circle_data()
    T = len(odom)
    W = 16
    fls = FixedLagSmoother.create(
        window=W, closure_capacity=8,
        chain_omega=jnp.diag(1.0 / jnp.asarray(sig_odo**2, jnp.float32)),
        clos_omega=jnp.diag(1.0 / jnp.asarray(sig_clo**2, jnp.float32)),
    )
    state = fls.init_state(jnp.zeros(3, jnp.float32))
    adv = jax.jit(fls.advance)
    addc = jax.jit(fls.add_closure)
    est, dr = [np.zeros(3)], [np.zeros(3)]
    for t in range(T):
        state = adv(state, jnp.asarray(odom[t], jnp.float32))
        dr.append(np.asarray(se2.compose(jnp.asarray(dr[-1]),
                                         jnp.asarray(odom[t]))))
        if t + 1 >= n_circle:
            j = min(int(state.steps), W) - 1
            i = j - n_circle
            if i >= 0:
                z = rng.normal(0, sig_clo, 3)
                state = addc(state, i, j, jnp.asarray(z, jnp.float32))
        est.append(np.asarray(fls.current_pose(state)))
    est, dr = np.asarray(est), np.asarray(dr)
    e_fls = np.sqrt(np.mean(np.sum((est[:, :2] - gt[:, :2]) ** 2, -1)))
    e_dr = np.sqrt(np.mean(np.sum((dr[:, :2] - gt[:, :2]) ** 2, -1)))
    assert e_fls < e_dr / 2.5, (e_fls, e_dr)
    # marginal prior stays finite and symmetric
    lam = np.asarray(state.prior_lambda)
    assert np.isfinite(lam).all()
    np.testing.assert_allclose(lam, lam.T, atol=1e-2 * abs(lam).max())
