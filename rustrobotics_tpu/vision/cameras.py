"""Pinhole camera model helpers (homogeneous geometry)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def projection_matrix(k, r, t):
    """P = K [R | t], (3, 4)."""
    return k @ jnp.concatenate([r, t[:, None]], axis=1)


def project(p, points):
    """Project (N, 3) world points through (3, 4) P -> (N, 2) pixels."""
    ph = jnp.concatenate(
        [points, jnp.ones((*points.shape[:-1], 1), points.dtype)], -1)
    uvw = ph @ p.T
    return uvw[..., :2] / uvw[..., 2:3]


def decompose_projection(p):
    """P -> (K, R, t) with K upper-triangular (positive diagonal) and R a
    proper rotation — the RQ decomposition, built from QR on the flipped
    matrix (jittable; no scipy.rq)."""
    m = p[:, :3]
    # RQ(M): reverse rows/cols, QR, reverse back
    rev = jnp.asarray([[0.0, 0, 1], [0, 1, 0], [1, 0, 0]], p.dtype)
    q_, r_ = jnp.linalg.qr((rev @ m).T)
    k = rev @ r_.T @ rev
    r = rev @ q_.T
    # fix signs: K = K̂ D (column scale), R = D R̂, D = diag(sign(diag K̂))
    s = jnp.sign(jnp.diagonal(k))
    s = jnp.where(s == 0, 1.0, s)
    k = k * s[None, :]
    r = s[:, None] * r
    # improper R means P carried a negative overall scale: flip P
    det = jnp.linalg.det(r)
    r = r * det
    with jax.default_matmul_precision("highest"):
        t = jnp.linalg.solve(k, p[:, 3] * det)
    scale = k[2, 2]
    return k / scale, r, t
