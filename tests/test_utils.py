"""L0 tests: angles, GaussianState, MVN (golden values from
src/utils/mvn.rs:92-109)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.utils import GaussianState, deg2rad, rad2deg, wrap_angle
from rustrobotics_tpu.utils.mvn import (
    CovarianceNotPositiveDefinite,
    MultiVariateNormal,
)


def test_deg2rad_roundtrip():
    assert np.isclose(deg2rad(180.0), np.pi)
    assert np.isclose(rad2deg(np.pi / 2), 90.0)
    assert np.isclose(rad2deg(deg2rad(37.3)), 37.3)


def test_wrap_angle():
    th = jnp.asarray([0.0, np.pi - 1e-6, -np.pi + 1e-6, 3.5 * np.pi, -7.1 * np.pi])
    w = wrap_angle(th)
    assert np.all(np.asarray(w) >= -np.pi)
    assert np.all(np.asarray(w) < np.pi)
    np.testing.assert_allclose(np.sin(np.asarray(th)), np.sin(np.asarray(w)), atol=1e-9)
    np.testing.assert_allclose(np.cos(np.asarray(th)), np.cos(np.asarray(w)), atol=1e-9)


def test_mvn_standard_normal_golden():
    """Spot values pinned by the reference (mvn.rs:103-108)."""
    mvn = MultiVariateNormal.create(jnp.zeros(2), jnp.eye(2))
    assert np.isclose(float(mvn.pdf(jnp.array([0.0, 0.0]))), 0.15915494, atol=1e-5)
    assert np.isclose(float(mvn.pdf(jnp.array([1.0, 0.0]))), 0.09653235, atol=1e-5)
    assert np.isclose(float(mvn.pdf(jnp.array([0.0, 1.0]))), 0.09653235, atol=1e-5)


@pytest.mark.slow
def test_mvn_batched_pdf_matches_scipy():
    from scipy.stats import multivariate_normal

    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 3))
    cov = a @ a.T + 3 * np.eye(3)
    mean = rng.normal(size=3)
    mvn = MultiVariateNormal.create(mean, cov)
    xs = rng.normal(size=(32, 3))
    got = np.asarray(mvn.pdf(xs))
    want = multivariate_normal(mean=mean, cov=cov).pdf(xs)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_mvn_sample_moments():
    mean = jnp.array([1.0, -2.0])
    cov = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    mvn = MultiVariateNormal.create(mean, cov)
    xs = mvn.sample(jax.random.key(0), (200_000,))
    np.testing.assert_allclose(np.mean(np.asarray(xs), axis=0), mean, atol=2e-2)
    np.testing.assert_allclose(np.cov(np.asarray(xs).T), cov, atol=4e-2)


def test_mvn_rejects_non_spd():
    with pytest.raises(CovarianceNotPositiveDefinite):
        MultiVariateNormal.create(jnp.zeros(2), -jnp.eye(2))


def test_gaussian_state_is_pytree():
    gs = GaussianState(x=jnp.zeros(3), cov=jnp.eye(3))
    leaves = jax.tree.leaves(gs)
    assert len(leaves) == 2
    assert gs.dim == 3
    batched = jax.vmap(lambda s: GaussianState(x=s, cov=jnp.eye(3)))(jnp.zeros((5, 3)))
    assert batched.x.shape == (5, 3)
