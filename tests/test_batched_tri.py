"""tril_inv (matmul-only batched triangular inverse) vs triangular_solve.

CPU tests pass blocked=True explicitly: the production functions
dispatch to the LAPACK-backed natives on CPU (where they are faster)
and to the blocked forms on TPU — these tests pin the blocked forms.

The TPU fleet path needs triangular inverses WITHOUT XLA's
triangular_solve (which serializes over batch dims on TPU — measured
12.9 ms for 8x11 (512,512) factors vs 1.3 ms unbatched). tril_inv must
match it to tight tolerance on realistic inputs: Cholesky factors of
Jacobi-scaled SPD band blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.ops.batched_tri import tril_inv


@pytest.mark.parametrize("n", [8, 64, 128, 256, 512])
def test_tril_inv_matches_triangular_solve_f64(n):
    rng = np.random.default_rng(n)
    a = rng.standard_normal((3, n, n))
    spd = np.einsum("bij,bkj->bik", a, a) / n + np.eye(n)
    # Jacobi-scale like _prepare_blocks does
    d = np.sqrt(np.diagonal(spd, axis1=1, axis2=2))
    spd = spd / d[:, :, None] / d[:, None, :]
    l = np.linalg.cholesky(spd)
    got = np.asarray(tril_inv(jnp.asarray(l), blocked=True))
    ref = np.linalg.inv(l)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)


def test_tril_inv_f32_accuracy_on_factor_blocks():
    """f32 path: reconstruction error ||L @ Linv - I|| stays near eps."""
    rng = np.random.default_rng(0)
    n = 512
    a = rng.standard_normal((2, n, n)).astype(np.float32)
    spd = np.einsum("bij,bkj->bik", a, a) / n + np.eye(n, dtype=np.float32)
    d = np.sqrt(np.diagonal(spd, axis1=1, axis2=2))
    spd = spd / d[:, :, None] / d[:, None, :]
    l = np.linalg.cholesky(spd.astype(np.float64)).astype(np.float32)
    inv = np.asarray(tril_inv(jnp.asarray(l), blocked=True))
    err = np.abs(np.einsum("bij,bjk->bik", l, inv) - np.eye(n))
    assert err.max() < 5e-5, err.max()


def test_tril_inv_vmaps():
    rng = np.random.default_rng(1)
    l = np.tril(rng.standard_normal((4, 2, 64, 64))) + 8 * np.eye(64)
    got = np.asarray(jax.vmap(lambda x: tril_inv(x, blocked=True))(jnp.asarray(l)))
    ref = np.linalg.inv(l)
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("n", [32, 64, 128, 512])
def test_chol_blocked_matches_linalg_f64(n):
    from rustrobotics_tpu.ops.batched_tri import chol_blocked

    rng = np.random.default_rng(n + 7)
    a = rng.standard_normal((3, n, n))
    spd = np.einsum("bij,bkj->bik", a, a) / n + np.eye(n)
    d = np.sqrt(np.diagonal(spd, axis1=1, axis2=2))
    spd = spd / d[:, :, None] / d[:, None, :]
    got = np.asarray(chol_blocked(jnp.asarray(spd), blocked=True))
    ref = np.linalg.cholesky(spd)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)


def test_chol_blocked_f32_reconstruction():
    from rustrobotics_tpu.ops.batched_tri import chol_blocked

    rng = np.random.default_rng(9)
    n = 512
    a = rng.standard_normal((2, n, n)).astype(np.float32)
    spd = np.einsum("bij,bkj->bik", a, a) / n + np.eye(n, dtype=np.float32)
    d = np.sqrt(np.diagonal(spd, axis1=1, axis2=2))
    spd = (spd / d[:, :, None] / d[:, None, :]).astype(np.float32)
    l = np.asarray(chol_blocked(jnp.asarray(spd), blocked=True))
    err = np.abs(np.einsum("bij,bkj->bik", l, l) - spd)
    assert err.max() < 5e-6, err.max()
    assert np.allclose(np.triu(l, 1), 0.0)
