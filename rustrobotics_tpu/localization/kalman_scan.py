"""Parallel (associative-scan) Kalman filtering.

The reference scans trajectories strictly sequentially (one
``update_estimate`` per event, examples/localization/bayesian_filter.rs:119-133).
On TPU, a linear-Gaussian trajectory of length T can instead be filtered in
O(log T) depth with ``jax.lax.associative_scan`` using the five-tuple
filtering elements of Särkkä & García-Fernández, "Temporal Parallelization
of Bayesian Smoothers" (2020). This is the sequence-parallel analog called
for in SURVEY §5 — there is no counterpart in the reference.

Model: x_k = F x_{k-1} + q,  q ~ N(0, Q);   y_k = H x_k + r,  r ~ N(0, R),
with prior x_0 ~ N(m0, P0). Returns all filtered means/covs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rustrobotics_tpu.utils.state import GaussianState


def _combine(elem_a, elem_b):
    """Associative combination of filtering elements (paper eq. 10-11)."""
    a1, b1, c1, j1, e1 = elem_a
    a2, b2, c2, j2, e2 = elem_b
    dim = c1.shape[-1]
    eye = jnp.eye(dim, dtype=c1.dtype)
    d = eye + c1 @ j2
    d_inv = jnp.linalg.inv(d)
    a = a2 @ d_inv @ a1
    b = (a2 @ d_inv @ (b1[..., None] + c1 @ e2[..., None]))[..., 0] + b2
    c = a2 @ d_inv @ c1 @ jnp.swapaxes(a2, -1, -2) + c2
    dt_inv = jnp.swapaxes(d_inv, -1, -2)  # (I + J2 C1)^-1 for symmetric C, J
    e = (
        jnp.swapaxes(a1, -1, -2)
        @ dt_inv
        @ (e2[..., None] - j2 @ b1[..., None])
    )[..., 0] + e1
    j = jnp.swapaxes(a1, -1, -2) @ dt_inv @ j2 @ a1 + j1
    return (a, b, c, j, e)


def parallel_linear_kalman_filter(f, q, h, r, m0, p0, ys) -> GaussianState:
    """Filter T observations ys: (T, Z) in parallel.

    Returns GaussianState with x: (T, S), cov: (T, S, S) — the filtered
    posterior after each observation.
    """
    f, q, h, r = map(jnp.asarray, (f, q, h, r))
    m0, p0, ys = map(jnp.asarray, (m0, p0, ys))
    t_len = ys.shape[0]
    s_dim = f.shape[-1]
    eye = jnp.eye(s_dim, dtype=f.dtype)

    # Generic element (k >= 2): prior-independent.
    s_mat = h @ q @ h.T + r
    s_inv = jnp.linalg.inv(s_mat)
    k_gain = q @ h.T @ s_inv
    a_gen = (eye - k_gain @ h) @ f
    c_gen = (eye - k_gain @ h) @ q
    ht_sinv = f.T @ h.T @ s_inv
    j_gen = ht_sinv @ h @ f

    def make_generic(y):
        return (a_gen, k_gain @ y, c_gen, j_gen, ht_sinv @ y)

    elems = jax.vmap(make_generic)(ys)

    # First element folds in the prior N(m0, P0).
    p_pred = f @ p0 @ f.T + q
    s1 = h @ p_pred @ h.T + r
    k1 = p_pred @ h.T @ jnp.linalg.inv(s1)
    m_pred = f @ m0
    a1 = jnp.zeros_like(f)
    b1 = m_pred + k1 @ (ys[0] - h @ m_pred)
    c1 = (eye - k1 @ h) @ p_pred
    j1 = jnp.zeros_like(f)
    e1 = jnp.zeros(s_dim, dtype=f.dtype)

    def set_first(full, first):
        return full.at[0].set(first)

    elems = jax.tree.map(set_first, elems, (a1, b1, c1, j1, e1))
    scanned = jax.lax.associative_scan(_combine, elems)
    _, means, covs, _, _ = scanned
    del t_len
    return GaussianState(x=means, cov=covs)


def _combine_smooth(elem_a, elem_b):
    """Associative combination of smoothing elements (paper §3): the
    smoothing pass is affine-function composition m^s_k = E_k m^s_{k+1}
    + g_k with covariance L accumulated under the same map. Under
    ``associative_scan(..., reverse=True)`` the first operand is the
    accumulated suffix (later in time), the second the new earlier
    element, so the earlier element's map is applied outermost."""
    e2, g2, l2 = elem_a  # suffix (k+1 .. T)
    e1, g1, l1 = elem_b  # earlier element k
    e = e1 @ e2
    g = (e1 @ g2[..., None])[..., 0] + g1
    ll = e1 @ l2 @ jnp.swapaxes(e1, -1, -2) + l1
    return (e, g, ll)


def parallel_rts_smoother(f, q, h, r, m0, p0, ys) -> GaussianState:
    """Rauch-Tung-Striebel smoother over all T steps in O(log T) depth.

    Runs the parallel filter, builds per-step smoothing elements
    (E_k = P_k F^T P_pred^{-1}, g_k = m_k - E_k F m_k,
    L_k = P_k - E_k P_pred E_k^T), and reduces them with a reverse
    ``associative_scan``. No counterpart in the reference (it has no
    smoother at all); this is the SURVEY §5 sequence-parallel component.
    """
    f, q = jnp.asarray(f), jnp.asarray(q)
    filt = parallel_linear_kalman_filter(f, q, h, r, m0, p0, ys)
    ms, ps = filt.x, filt.cov

    def make_elem(m, p):
        p_pred = f @ p @ f.T + q
        gain = jnp.linalg.solve(p_pred.T, (p @ f.T).T).T  # P F^T P_pred^-1
        g = m - gain @ (f @ m)
        ll = p - gain @ p_pred @ gain.T
        return gain, g, ll

    elems = jax.vmap(make_elem)(ms, ps)
    # last element is the identity-on-the-filtered-posterior
    last = (jnp.zeros_like(elems[0][-1]), ms[-1], ps[-1])
    elems = jax.tree.map(lambda full, l: full.at[-1].set(l), elems, last)
    _, means, covs = jax.lax.associative_scan(
        _combine_smooth, elems, reverse=True
    )
    return GaussianState(x=means, cov=covs)


def sequential_rts_smoother(f, q, h, r, m0, p0, ys) -> GaussianState:
    """Reference-semantics sequential RTS (oracle for the parallel one)."""
    f, q = jnp.asarray(f), jnp.asarray(q)
    filt = sequential_linear_kalman_filter(f, q, h, r, m0, p0, ys)
    ms, ps = filt.x, filt.cov

    def body(carry, mp):
        ms_next, ps_next = carry
        m, p = mp
        p_pred = f @ p @ f.T + q
        gain = jnp.linalg.solve(p_pred.T, (p @ f.T).T).T
        m_s = m + gain @ (ms_next - f @ m)
        p_s = p + gain @ (ps_next - p_pred) @ gain.T
        return (m_s, p_s), (m_s, p_s)

    _, (sm, sp) = jax.lax.scan(
        body, (ms[-1], ps[-1]), (ms[:-1], ps[:-1]), reverse=True
    )
    sm = jnp.concatenate([sm, ms[-1:]], axis=0)
    sp = jnp.concatenate([sp, ps[-1:]], axis=0)
    return GaussianState(x=sm, cov=sp)


def sequential_linear_kalman_filter(f, q, h, r, m0, p0, ys) -> GaussianState:
    """Reference-semantics sequential filter (oracle for the parallel one)."""
    f, q, h, r = map(jnp.asarray, (f, q, h, r))
    eye = jnp.eye(f.shape[-1], dtype=f.dtype)

    def body(carry, y):
        m, p = carry
        m_pred = f @ m
        p_pred = f @ p @ f.T + q
        s = h @ p_pred @ h.T + r
        k = p_pred @ h.T @ jnp.linalg.inv(s)
        m_new = m_pred + k @ (y - h @ m_pred)
        p_new = (eye - k @ h) @ p_pred
        return (m_new, p_new), (m_new, p_new)

    _, (ms, ps) = jax.lax.scan(body, (jnp.asarray(m0), jnp.asarray(p0)), ys)
    return GaussianState(x=ms, cov=ps)
