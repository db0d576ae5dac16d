"""Lie-group helper tests (se2/se3 algebra, skew golden value from
src/mapping/se2_se3.rs:137-150)."""

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.geometry import se2, se3


def rand_se2(rng, shape=()):
    xy = rng.normal(size=shape + (2,))
    th = rng.uniform(-np.pi, np.pi, size=shape + (1,))
    return jnp.asarray(np.concatenate([xy, th], axis=-1))


def rand_se3(rng, shape=()):
    t = rng.normal(size=shape + (3,))
    q = rng.normal(size=shape + (4,))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate([t, q], axis=-1))


def test_se2_compose_inverse():
    rng = np.random.default_rng(1)
    a, b = rand_se2(rng, (16,)), rand_se2(rng, (16,))
    ident = se2.compose(a, se2.inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-12)
    # relative == inverse(a) ∘ b
    np.testing.assert_allclose(
        np.asarray(se2.relative(a, b)),
        np.asarray(se2.compose(se2.inverse(a), b)),
        atol=1e-12,
    )


def test_se2_transform_matches_compose():
    rng = np.random.default_rng(2)
    a = rand_se2(rng)
    p = jnp.asarray(rng.normal(size=(2,)))
    via_pose = se2.compose(a, jnp.concatenate([p, jnp.zeros(1)]))[:2]
    np.testing.assert_allclose(np.asarray(se2.transform(a, p)), np.asarray(via_pose))


def test_se3_skew_golden():
    """Golden value from the reference's skew_correct test
    (se2_se3.rs:137-150): skew(2t)^T for t = [-0.0199389, 2.43871, -0.14102]."""
    t = jnp.array([-0.0199389, 2.43871, -0.14102])
    expected = np.array(
        [
            [0.0, -0.282041, -4.87743],
            [0.282041, 0.0, -0.0398779],
            [4.87743, 0.0398779, 0.0],
        ]
    )
    got = np.asarray(se3.skew(2.0 * t)).T
    np.testing.assert_allclose(got, expected, atol=1e-2)


def test_se3_quat_roundtrips():
    rng = np.random.default_rng(3)
    q = np.asarray(rand_se3(rng, (32,)))[:, 3:]
    omega = np.asarray(jax.vmap(se3.so3_log)(jnp.asarray(q)))
    q2 = np.asarray(jax.vmap(se3.so3_exp)(jnp.asarray(omega)))
    # q and -q are the same rotation
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-9)


def test_se3_exp_log_small_angle():
    w = jnp.array([1e-9, -2e-9, 3e-10])
    q = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(se3.so3_log(q)), np.asarray(w), atol=1e-15)
    assert np.isclose(float(jnp.linalg.norm(q)), 1.0)


def test_se3_compose_inverse_identity():
    rng = np.random.default_rng(4)
    a = rand_se3(rng, (8,))
    ident = se3.compose(a, se3.inverse(a))
    np.testing.assert_allclose(np.asarray(ident[..., :3]), 0.0, atol=1e-12)
    np.testing.assert_allclose(
        np.abs(np.asarray(ident[..., 3])), 1.0, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(ident[..., 4:]), 0.0, atol=1e-12)


def test_se3_rotate_matches_matrix():
    rng = np.random.default_rng(5)
    a = rand_se3(rng, (8,))
    v = jnp.asarray(rng.normal(size=(8, 3)))
    r = se3.quat_to_mat(a[..., 3:])
    np.testing.assert_allclose(
        np.asarray(se3.quat_rotate(a[..., 3:], v)),
        np.asarray(jnp.einsum("...ij,...j->...i", r, v)),
        atol=1e-12,
    )


def test_se3_retract_consistency():
    """retract(x, delta) ≈ compose with small delta applied on the right."""
    rng = np.random.default_rng(6)
    x = rand_se3(rng)
    delta = jnp.asarray(rng.normal(size=(6,)) * 1e-3)
    got = se3.retract(x, delta)
    # right-perturbation: rotation q∘exp(dw); translation additive global
    q = se3.quat_mul(x[3:], se3.so3_exp(delta[3:]))
    want = jnp.concatenate([x[:3] + delta[:3], q])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
