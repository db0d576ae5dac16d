"""Banked (lane-major) EKF: numerical parity with the reference-layout
vmapped filter, across random banks of states/controls/measurements.
The banked layout is the TPU-fast path (fleet axis on vector lanes —
measured 10x the (B, D, D) vmap layout's throughput on the v5e); its
contract is bit-level agreement in f64 with the standard EKF.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.localization.banked import simple_problem_banked
from rustrobotics_tpu.utils.state import GaussianState


def _filters():
    from rustrobotics_tpu.benchmarks import _simple_problem_filters

    return _simple_problem_filters()


def test_banked_ekf_matches_vmapped_reference_layout():
    ekf, _ = _filters()
    q = jnp.diag(jnp.array([0.1, 0.1, jnp.deg2rad(1.0), 1.0])) ** 2
    r = jnp.diag(jnp.array([1.0, 1.0])) ** 2
    banked = simple_problem_banked(q=q, r=r)

    rng = np.random.default_rng(0)
    B = 64
    x0 = rng.standard_normal((B, 4))
    u = rng.standard_normal((B, 2)) * jnp.array([1.0, 0.3])
    z = rng.standard_normal((B, 2))
    cov0 = np.broadcast_to(np.eye(4), (B, 4, 4)) + 0.1 * np.einsum(
        "bi,bj->bij", x0, x0)
    dt = 0.1

    # reference layout: vmap over leading batch
    state = GaussianState(x=jnp.asarray(x0), cov=jnp.asarray(cov0))
    vstep = jax.vmap(ekf.step, in_axes=(0, 0, 0, None))
    ref = vstep(state, jnp.asarray(u), jnp.asarray(z), dt)

    # banked layout: batch on the last axis
    xb, covb = banked.step(
        jnp.asarray(x0.T), jnp.asarray(cov0.transpose(1, 2, 0)),
        jnp.asarray(u.T), jnp.asarray(z.T), dt)

    np.testing.assert_allclose(np.asarray(xb).T, np.asarray(ref.x),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(covb).transpose(2, 0, 1), np.asarray(ref.cov),
        rtol=1e-9, atol=1e-10)


def test_banked_chain_converges():
    """A banked chain of identical filters tracks the same trajectory as
    one scalar filter run (scan over steps, bank of 8)."""
    ekf, _ = _filters()
    q = jnp.diag(jnp.array([0.1, 0.1, jnp.deg2rad(1.0), 1.0])) ** 2
    r = jnp.diag(jnp.array([1.0, 1.0])) ** 2
    banked = simple_problem_banked(q=q, r=r)
    dt = 0.1
    B = 8
    u = jnp.broadcast_to(jnp.array([1.0, 0.1])[:, None], (2, B))
    z = jnp.broadcast_to(jnp.array([0.3, 0.2])[:, None], (2, B))

    def body(carry, _):
        x, cov = carry
        return banked.step(x, cov, u, z, dt), None

    x0 = jnp.zeros((4, B))
    cov0 = jnp.broadcast_to(jnp.eye(4)[:, :, None], (4, 4, B))
    (xn, covn), _ = jax.lax.scan(body, (x0, cov0), None, length=50)

    state = GaussianState(x=jnp.zeros(4), cov=jnp.eye(4))
    for _ in range(50):
        state = ekf.step(state, jnp.array([1.0, 0.1]),
                         jnp.array([0.3, 0.2]), dt)
    np.testing.assert_allclose(np.asarray(xn[:, 3]), np.asarray(state.x),
                               rtol=1e-8, atol=1e-8)
    assert bool(jnp.all(jnp.isfinite(covn)))


def test_banked_ukf_matches_vmapped_reference_layout():
    """Banked UKF == vmapped standard UKF (f64 parity). The banked step
    folds the sigma axis into the bank and runs an unrolled lane-major
    Cholesky; the contract is agreement with the reference-layout UKF
    (unscented_kalman_filter.rs:11-186 analog) to f64 roundoff."""
    from rustrobotics_tpu.localization.banked import simple_problem_banked_ukf

    _, ukf = _filters()
    q = jnp.diag(jnp.array([0.1, 0.1, jnp.deg2rad(1.0), 1.0])) ** 2
    r = jnp.diag(jnp.array([1.0, 1.0])) ** 2
    banked = simple_problem_banked_ukf(q=q, r=r,
                                       alpha=0.001, beta=2.0, kappa=0.0)

    rng = np.random.default_rng(1)
    B = 64
    x0 = rng.standard_normal((B, 4))
    u = rng.standard_normal((B, 2)) * jnp.array([1.0, 0.3])
    z = rng.standard_normal((B, 2))
    cov0 = np.broadcast_to(np.eye(4), (B, 4, 4)) + 0.1 * np.einsum(
        "bi,bj->bij", x0, x0)
    dt = 0.1

    state = GaussianState(x=jnp.asarray(x0), cov=jnp.asarray(cov0))
    vstep = jax.vmap(ukf.step, in_axes=(0, 0, 0, None))
    ref = vstep(state, jnp.asarray(u), jnp.asarray(z), dt)

    xb, covb = banked.step(
        jnp.asarray(x0.T), jnp.asarray(cov0.transpose(1, 2, 0)),
        jnp.asarray(u.T), jnp.asarray(z.T), dt)

    np.testing.assert_allclose(np.asarray(xb).T, np.asarray(ref.x),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(covb).transpose(2, 0, 1), np.asarray(ref.cov),
        rtol=1e-7, atol=1e-8)


def test_banked_chol_matches_linalg():
    from rustrobotics_tpu.localization.banked import bchol

    rng = np.random.default_rng(2)
    B, D = 32, 4
    a = rng.standard_normal((B, D, D))
    spd = np.einsum("bij,bkj->bik", a, a) + 4.0 * np.eye(D)
    ref = np.linalg.cholesky(spd)
    got = bchol(jnp.asarray(spd.transpose(1, 2, 0)))
    np.testing.assert_allclose(np.asarray(got).transpose(2, 0, 1), ref,
                               rtol=1e-10, atol=1e-12)


def test_banked_ekf_kc_matches_sequential_reference_layout():
    """Banked velocity-EKF-KC == the standard (per-filter) KC filter
    (reference extended_kalman_filter.rs:81-165 analog) in f64, across a
    bank of distinct states, over a multi-event stream with optional
    controls and masked/unknown landmark slots."""
    from rustrobotics_tpu.localization.banked import velocity_banked_ekf_kc
    from rustrobotics_tpu.localization.ekf import (
        ExtendedKalmanFilterKnownCorrespondences,
    )
    from rustrobotics_tpu.localization.landmark_table import LandmarkTable
    from rustrobotics_tpu.models import (
        RangeBearingMeasurementModel,
        VelocityMotionModel,
    )

    rng = np.random.default_rng(3)
    K = 5
    lm_ids = np.array([2, 5, 7, 11, 13], np.int32)
    lm_pos = rng.uniform(-4, 4, (K, 3))
    table = LandmarkTable.create(ids=lm_ids, positions=lm_pos)
    alpha = jnp.asarray([1.0, 1.0, 30.0, 30.0, 10.0, 10.0])
    q = jnp.diag(jnp.asarray([0.1, 0.2]))

    banked = velocity_banked_ekf_kc(alpha, q, table)
    ref_filt = ExtendedKalmanFilterKnownCorrespondences(
        q=q, landmarks=table,
        motion_model=VelocityMotionModel.create(alpha),
        measurement_model=RangeBearingMeasurementModel.create(),
    )

    B, T, M = 16, 20, 3
    x0 = rng.standard_normal((B, 3)) * 0.5
    cov0 = np.broadcast_to(np.eye(3) * 0.01, (B, 3, 3)).copy()
    us = rng.uniform(-1, 1, (T, 2)) * np.array([1.0, 0.5])
    hcs = rng.random(T) > 0.3
    ids = rng.choice([2, 5, 7, 11, 99], (T, M)).astype(np.int32)  # 99 unknown
    zs = np.stack([rng.uniform(0.5, 5.0, (T, M)),
                   rng.uniform(-3, 3, (T, M))], axis=-1)  # (T, M, 2)
    masks = rng.random((T, M)) > 0.4
    dts = rng.uniform(0.05, 0.2, T)

    ev = (jnp.asarray(us), jnp.asarray(hcs), jnp.asarray(ids),
          jnp.asarray(zs), jnp.asarray(masks), jnp.asarray(dts))

    # banked fleet pass: one jitted scan over the event stream
    @jax.jit
    def run_banked(x, cov):
        def step(carry, e):
            u, hc, idsi, zi, mi, dti = e
            ub = jnp.broadcast_to(u[:, None], (2, B))
            return banked.step(carry[0], carry[1], ub, hc, idsi, zi, mi,
                               dti), None

        return jax.lax.scan(step, (x, cov), ev)[0]

    xb, covb = run_banked(jnp.asarray(x0.T),
                          jnp.asarray(cov0.transpose(1, 2, 0)))

    # reference-layout pass: vmapped over the bank, same scan
    from rustrobotics_tpu.utils.state import GaussianState

    @jax.jit
    def run_ref(x, cov):
        def one(x1, c1):
            def step(st, e):
                u, hc, idsi, zi, mi, dti = e
                return ref_filt.step(st, u, hc, idsi, zi, mi, dti), None

            return jax.lax.scan(step, GaussianState(x=x1, cov=c1), ev)[0]

        return jax.vmap(one)(x, cov)

    ref = run_ref(jnp.asarray(x0), jnp.asarray(cov0))
    np.testing.assert_allclose(np.asarray(xb).T, np.asarray(ref.x),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(covb).transpose(2, 0, 1), np.asarray(ref.cov),
        rtol=1e-7, atol=1e-9)


def test_banked_ukf_kc_matches_sequential_reference_layout():
    """Banked velocity-UKF-KC == the standard (per-filter) UKF-KC (a
    filter the reference leaves todo!()) in f64, over a multi-event
    stream with optional controls and masked/unknown landmark slots —
    including the circular-bearing recentering."""
    from rustrobotics_tpu.localization.banked import velocity_banked_ukf_kc
    from rustrobotics_tpu.localization.landmark_table import LandmarkTable
    from rustrobotics_tpu.localization.ukf import (
        UnscentedKalmanFilterKnownCorrespondences,
    )
    from rustrobotics_tpu.models import (
        RangeBearingMeasurementModel,
        VelocityMotionModel,
    )
    from rustrobotics_tpu.utils.state import GaussianState

    rng = np.random.default_rng(5)
    lm_ids = np.array([2, 5, 7, 11, 13], np.int32)
    lm_pos = rng.uniform(-4, 4, (5, 3))
    table = LandmarkTable.create(ids=lm_ids, positions=lm_pos)
    alpha = jnp.asarray([1.0, 1.0, 30.0, 30.0, 10.0, 10.0])
    q = jnp.diag(jnp.asarray([0.1, 0.2]))

    banked = velocity_banked_ukf_kc(alpha, q, table, ukf_alpha=1.0,
                                    beta=2.0, kappa=0.0)
    ref_filt = UnscentedKalmanFilterKnownCorrespondences.create(
        q=q, landmarks=table,
        motion_model=VelocityMotionModel.create(alpha),
        measurement_model=RangeBearingMeasurementModel.create(),
        alpha=1.0, beta=2.0, kappa=0.0,
    )

    B, T, M = 8, 15, 3
    x0 = rng.standard_normal((B, 3)) * 0.5
    cov0 = np.broadcast_to(np.eye(3) * 0.01, (B, 3, 3)).copy()
    us = rng.uniform(-1, 1, (T, 2)) * np.array([1.0, 0.5])
    hcs = rng.random(T) > 0.3
    ids = rng.choice([2, 5, 7, 11, 99], (T, M)).astype(np.int32)
    zs = np.stack([rng.uniform(0.5, 5.0, (T, M)),
                   rng.uniform(-3, 3, (T, M))], axis=-1)
    masks = rng.random((T, M)) > 0.4
    dts = rng.uniform(0.05, 0.2, T)
    ev = (jnp.asarray(us), jnp.asarray(hcs), jnp.asarray(ids),
          jnp.asarray(zs), jnp.asarray(masks), jnp.asarray(dts))

    @jax.jit
    def run_banked(x, cov):
        def step(carry, e):
            u, hc, idsi, zi, mi, dti = e
            ub = jnp.broadcast_to(u[:, None], (2, B))
            return banked.step(carry[0], carry[1], ub, hc, idsi, zi, mi,
                               dti), None

        return jax.lax.scan(step, (x, cov), ev)[0]

    xb, covb = run_banked(jnp.asarray(x0.T),
                          jnp.asarray(cov0.transpose(1, 2, 0)))

    @jax.jit
    def run_ref(x, cov):
        def one(x1, c1):
            def step(st, e):
                u, hc, idsi, zi, mi, dti = e
                return ref_filt.step(st, u, hc, idsi, zi, mi, dti), None

            return jax.lax.scan(step, GaussianState(x=x1, cov=c1), ev)[0]

        return jax.vmap(one)(x, cov)

    ref = run_ref(jnp.asarray(x0), jnp.asarray(cov0))
    np.testing.assert_allclose(np.asarray(xb).T, np.asarray(ref.x),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(covb).transpose(2, 0, 1), np.asarray(ref.cov),
        rtol=1e-6, atol=1e-8)
