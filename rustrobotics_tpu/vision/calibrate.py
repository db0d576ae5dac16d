"""Camera calibration: DLT and Zhang's method — reference README Todo
"Camera Calibration (DLT, Zhang's Method)".

All solvers are normalized homogeneous linear systems closed by SVD —
batched-friendly, no iterative minimization required for the closed-form
stages (a GN polish can be layered with jax.grad if needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rustrobotics_tpu.vision.cameras import decompose_projection


def _normalize_2d(x):
    """Hartley normalization: zero-mean, sqrt(2) RMS. Returns (xn, T)."""
    mu = jnp.mean(x, axis=0)
    d = jnp.sqrt(jnp.mean(jnp.sum((x - mu) ** 2, -1)))
    s = jnp.sqrt(2.0) / jnp.clip(d, 1e-12, None)
    t = jnp.asarray([[1.0, 0, 0], [0, 1, 0], [0, 0, 1]], x.dtype)
    t = t.at[0, 0].set(s).at[1, 1].set(s)
    t = t.at[0, 2].set(-s * mu[0]).at[1, 2].set(-s * mu[1])
    return (x - mu) * s, t


def _normalize_3d(x):
    mu = jnp.mean(x, axis=0)
    d = jnp.sqrt(jnp.mean(jnp.sum((x - mu) ** 2, -1)))
    s = jnp.sqrt(3.0) / jnp.clip(d, 1e-12, None)
    u = jnp.eye(4, dtype=x.dtype) * s
    u = u.at[3, 3].set(1.0)
    u = u.at[:3, 3].set(-s * mu)
    return (x - mu) * s, u


def dlt_camera(points3d, points2d):
    """Direct Linear Transform: (3, 4) projection matrix from >= 6
    2D-3D correspondences, plus its (K, R, t) decomposition.
    Normalized DLT (Hartley) for conditioning."""
    x2, t2 = _normalize_2d(points2d)
    x3, t3 = _normalize_3d(points3d)
    n = points3d.shape[0]
    xh = jnp.concatenate([x3, jnp.ones((n, 1), x3.dtype)], -1)  # (N, 4)
    zero = jnp.zeros_like(xh)
    rows_u = jnp.concatenate(
        [xh, zero, -x2[:, 0:1] * xh], axis=1)  # (N, 12)
    rows_v = jnp.concatenate(
        [zero, xh, -x2[:, 1:2] * xh], axis=1)
    a = jnp.concatenate([rows_u, rows_v], axis=0)  # (2N, 12)
    with jax.default_matmul_precision("highest"):
        _, _, vt = jnp.linalg.svd(a, full_matrices=True)
        p_n = vt[-1].reshape(3, 4)
        # denormalize: x2 = T2 x  =>  P = T2^-1 P_n T3
        p = jnp.linalg.solve(t2, p_n) @ t3
    k, r, t = decompose_projection(p)
    return p / p[2, 3], (k, r, t)


def homography(src, dst):
    """(3, 3) homography mapping src (N, 2) -> dst (N, 2), normalized
    DLT, N >= 4."""
    xs, ts = _normalize_2d(src)
    xd, td = _normalize_2d(dst)
    n = src.shape[0]
    xh = jnp.concatenate([xs, jnp.ones((n, 1), xs.dtype)], -1)
    zero = jnp.zeros_like(xh)
    rows_u = jnp.concatenate([xh, zero, -xd[:, 0:1] * xh], 1)
    rows_v = jnp.concatenate([zero, xh, -xd[:, 1:2] * xh], 1)
    a = jnp.concatenate([rows_u, rows_v], 0)
    with jax.default_matmul_precision("highest"):
        _, _, vt = jnp.linalg.svd(a, full_matrices=True)
        h_n = vt[-1].reshape(3, 3)
        h = jnp.linalg.solve(td, h_n) @ ts
    return h / h[2, 2]


def _vij(h, i, j):
    """Zhang's absolute-conic constraint row from homography columns."""
    return jnp.asarray([
        h[0, i] * h[0, j],
        h[0, i] * h[1, j] + h[1, i] * h[0, j],
        h[1, i] * h[1, j],
        h[2, i] * h[0, j] + h[0, i] * h[2, j],
        h[2, i] * h[1, j] + h[1, i] * h[2, j],
        h[2, i] * h[2, j],
    ])


def zhang_calibrate(object_points, image_points):
    """Zhang's method: intrinsics K (+ per-view extrinsics) from >= 3
    views of a PLANAR target.

    object_points (N, 2): target-plane coordinates (z = 0);
    image_points (V, N, 2): their pixels in each view.
    Returns (K, rs (V, 3, 3), ts (V, 3), hs (V, 3, 3)).
    """
    hs = jax.vmap(lambda img: homography(object_points, img))(image_points)

    v = jnp.concatenate([
        jax.vmap(lambda h: _vij(h, 0, 1))(hs),
        jax.vmap(lambda h: _vij(h, 0, 0) - _vij(h, 1, 1))(hs),
    ], axis=0)  # (2V, 6)
    with jax.default_matmul_precision("highest"):
        _, _, vt = jnp.linalg.svd(v, full_matrices=True)
    b11, b12, b22, b13, b23, b33 = vt[-1]

    # closed-form intrinsics from B = K^-T K^-1 (Zhang eq. in appendix)
    v0 = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + v0 * (b12 * b13 - b11 * b23)) / b11
    alpha = jnp.sqrt(jnp.clip(lam / b11, 1e-12, None))
    beta = jnp.sqrt(jnp.clip(
        lam * b11 / (b11 * b22 - b12 * b12), 1e-12, None))
    gamma = -b12 * alpha * alpha * beta / lam
    u0 = gamma * v0 / beta - b13 * alpha * alpha / lam
    k = jnp.asarray([[alpha, gamma, u0], [0.0, beta, v0], [0.0, 0.0, 1.0]])

    # extrinsics per view: [r1 r2 t] = lam K^-1 H
    def extrinsics(h):
        with jax.default_matmul_precision("highest"):
            kin_h = jnp.linalg.solve(k, h)
        s = 1.0 / jnp.clip(jnp.linalg.norm(kin_h[:, 0]), 1e-12, None)
        # the homography sign is arbitrary: pick the one that puts the
        # target in front of the camera (t_z > 0)
        s = s * jnp.sign(kin_h[2, 2])
        r1 = kin_h[:, 0] * s
        r2 = kin_h[:, 1] * s
        t = kin_h[:, 2] * s
        r3 = jnp.cross(r1, r2)
        r_approx = jnp.stack([r1, r2, r3], axis=1)
        # project onto SO(3)
        u, _, vt_ = jnp.linalg.svd(r_approx)
        r = u @ vt_
        return r, t

    rs, ts = jax.vmap(extrinsics)(hs)
    return k, rs, ts, hs


def estimate_radial_distortion(k, rs, ts, object_points, image_points):
    """Zhang's second stage: (k1, k2) radial distortion by linear least
    squares, given the closed-form intrinsics/extrinsics.

    The distorted pixel obeys u_d = u + (u - u0)(k1 r^2 + k2 r^4) with
    r^2 the squared NORMALIZED radius of the ideal projection — linear
    in (k1, k2), so all views' constraints stack into one (2VN, 2) LS
    solve (batched einsums, one lstsq).
    """
    u0, v0 = k[0, 2], k[1, 2]
    obj3 = jnp.concatenate(
        [object_points,
         jnp.zeros((*object_points.shape[:-1], 1), object_points.dtype)],
        -1)

    def one_view(r, t, img):
        cam = obj3 @ r.T + t                       # (N, 3)
        xn = cam[:, 0] / cam[:, 2]
        yn = cam[:, 1] / cam[:, 2]
        r2 = xn * xn + yn * yn
        uvw = (k @ jnp.stack([xn, yn, jnp.ones_like(xn)])).T
        u = uvw[:, 0] / uvw[:, 2]
        v = uvw[:, 1] / uvw[:, 2]
        a_rows = jnp.concatenate([
            jnp.stack([(u - u0) * r2, (u - u0) * r2 * r2], -1),
            jnp.stack([(v - v0) * r2, (v - v0) * r2 * r2], -1),
        ])
        b_rows = jnp.concatenate([img[:, 0] - u, img[:, 1] - v])
        return a_rows, b_rows

    a, b = jax.vmap(one_view)(rs, ts, image_points)
    a = a.reshape(-1, 2)
    b = b.reshape(-1)
    with jax.default_matmul_precision("highest"):
        sol, *_ = jnp.linalg.lstsq(a, b)
    return sol  # (k1, k2)


def distort_points(k, k1, k2, uv):
    """Apply the radial model to ideal pixels uv (N, 2)."""
    u0 = jnp.asarray([k[0, 2], k[1, 2]])
    # normalized radius of the ideal point
    with jax.default_matmul_precision("highest"):
        xy1 = jnp.concatenate(
            [uv, jnp.ones((*uv.shape[:-1], 1), uv.dtype)], -1)
        xn = jnp.linalg.solve(k, xy1.T).T
    r2 = jnp.sum(xn[:, :2] ** 2, -1, keepdims=True)
    return uv + (uv - u0) * (k1 * r2 + k2 * r2 * r2)
