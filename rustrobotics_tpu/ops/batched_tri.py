"""Batched triangular inversion with ONLY batched matmuls (TPU).

Why this exists: XLA's ``triangular_solve`` on TPU serializes over batch
dimensions — measured on the v5e (tools/tpu_batch_dissect.py, honest
scalar-fetch timing): inverting the 11 (512, 512) Cholesky factors of
intel.g2o's banded system costs 1.3 ms at B=1 but **12.9 ms at B=8**
(~linear in B), which made the vmapped fleet optimizer's solve stage its
single largest cost. The reference hits no such issue because it has no
batch axis at all (one UMFPACK factorization at a time,
pose_graph_optimization.rs:124-144).

``tril_inv`` computes L^-1 for lower-triangular L with a blocked Schur
recursion whose leaves use the nilpotent-series product:

    L = D (I + K),  K = D^-1 L - I  strictly lower  =>  K^n = 0
    (I + K)^-1 = sum_i (-K)^i = prod_j (I + M^(2^j)),  M = -K

— ceil(log2 n) squarings + products, all dense batched matmuls that
vmap/batch onto the MXU at matmul rates (no sequential scalar recursion
anywhere). ~6x the FLOPs of a trsm, at ~100x the batched throughput.

Exact in exact arithmetic; in floating point the series product is
well-behaved for the Jacobi-scaled Cholesky factors this repo feeds it
(validated against triangular_solve in tests/test_batched_tri.py, and
end-to-end by the golden-chi2 suite).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BASE = 128  # leaf size for the nilpotent-series product


def _use_blocked():
    """The blocked matmul formulations trade ~3-6x FLOPs for batch
    parallelism — the right trade exactly where XLA's native
    cholesky/triangular_solve serialize per batch item (TPU). On CPU
    the natives are LAPACK-backed and strictly faster (the virtual-mesh
    scaling proxy regressed ~2x when the blocked forms ran there), so
    dispatch on the backend at trace time."""
    return jax.default_backend() != "cpu"


def _tril_inv_base(l):
    """(..., n, n) lower-triangular inverse via nilpotent squaring."""
    n = l.shape[-1]
    d = jnp.diagonal(l, axis1=-2, axis2=-1)  # (..., n)
    dinv = 1.0 / d
    eye = jnp.eye(n, dtype=l.dtype)
    with jax.default_matmul_precision("highest"):
        k = l * dinv[..., :, None] - eye  # strictly lower
        m = -k
        res = eye + m
        p = m
        steps = max((n - 1).bit_length() - 1, 0)
        for _ in range(steps):
            p = p @ p
            res = res @ (eye + p)
    return res * dinv[..., None, :]


CHOL_BASE = 64  # leaf size where XLA's per-item cholesky cost is small


def chol_blocked(a, base: int = CHOL_BASE, blocked: bool | None = None):
    """Batched Cholesky via Schur recursion — batch-parallel on TPU.

    XLA's ``cholesky`` serializes over batch dims on TPU exactly like
    ``triangular_solve`` (measured n=512: 84 us at B=1 but ~90 us PER
    ITEM at B=8/32 — tools/ measurements 2026-08-20). This routine
    keeps the batch on the MXU: it recurses

        A = [[A11, .], [A21, A22]]
        L11 = chol(A11)
        L21 = A21 @ tril_inv(L11)^T          (batched matmuls)
        L22 = chol(A22 - L21 @ L21^T)

    down to ``base``-sized leaves, where XLA's per-item cost is a few
    microseconds. n must be a multiple of base (or <= base). Only the
    lower triangle of ``a`` is read.
    """
    n = a.shape[-1]
    if blocked is None:
        blocked = _use_blocked()
    if n <= base or not blocked:
        return jnp.linalg.cholesky(_sym(a))
    h = n // 2
    a11 = a[..., :h, :h]
    a21 = a[..., h:, :h]
    a22 = a[..., h:, h:]
    l11 = chol_blocked(a11, base, blocked)
    with jax.default_matmul_precision("highest"):
        l21 = a21 @ jnp.swapaxes(tril_inv(l11, blocked), -1, -2)
        l22 = chol_blocked(a22 - l21 @ jnp.swapaxes(l21, -1, -2),
                           base, blocked)
    top = jnp.concatenate(
        [l11, jnp.zeros(a.shape[:-2] + (h, n - h), a.dtype)], axis=-1)
    bot = jnp.concatenate([l21, l22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _sym(a):
    """Mirror the lower triangle (callers may fill only that half)."""
    lo = jnp.tril(a)
    return lo + jnp.swapaxes(jnp.tril(a, -1), -1, -2)


def tril_inv(l, blocked: bool | None = None):
    """Batched lower-triangular inverse, matmuls only.

    l: (..., n, n), n a multiple of BASE or < BASE. Returns L^-1 with
    the same leading batch shape. Use instead of
    ``triangular_solve(l, eye)`` whenever a batch axis is present (or
    may be added by vmap): that path serializes per batch element on
    TPU.
    """
    if blocked is None:
        blocked = _use_blocked()
    if not blocked:
        eye = jnp.broadcast_to(
            jnp.eye(l.shape[-1], dtype=l.dtype), l.shape)
        return jax.lax.linalg.triangular_solve(
            l, eye, left_side=True, lower=True)
    n = l.shape[-1]
    if n <= BASE:
        return _tril_inv_base(l)
    h = n // 2
    l11 = l[..., :h, :h]
    l21 = l[..., h:, :h]
    l22 = l[..., h:, h:]
    i11 = tril_inv(l11, blocked)
    i22 = tril_inv(l22, blocked)
    with jax.default_matmul_precision("highest"):
        i21 = -(i22 @ (l21 @ i11))
    top = jnp.concatenate(
        [i11, jnp.zeros(l.shape[:-2] + (h, n - h), l.dtype)], axis=-1)
    bot = jnp.concatenate([i21, i22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
