"""Perspective-3-Point pose (Grunert) — reference README Todo "P3P".

Given three 3D points and their bearing rays, the camera pose follows
from the distances along each ray, which satisfy Grunert's quartic in
the ratio v = s3/s1. Everything is REAL closed-form arithmetic
(trigonometric cubic + Ferrari factorization into two quadratics) —
deliberately no companion-matrix eigensolver, which XLA:TPU does not
provide for nonsymmetric matrices. Invalid/complex branches carry a
False mask instead of NaNs, so batches of P3P problems vmap cleanly
(multi-hypothesis RANSAC scoring stays one dispatch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rustrobotics_tpu.mapping.icp import rigid_align


def _real_cubic_roots(b, c, d):
    """All real roots of z^3 + b z^2 + c z + d (trig/Cardano), returned
    as (3,) with a validity mask (single-real case repeats the root)."""
    p = c - b * b / 3.0
    q = 2.0 * b**3 / 27.0 - b * c / 3.0 + d
    shift = -b / 3.0
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # three-real branch (disc <= 0): trigonometric method
    mp = jnp.clip(-p / 3.0, 1e-18, None)
    acos_arg = jnp.clip(
        3.0 * q / (2.0 * p) * jax.lax.rsqrt(mp), -1.0, 1.0)
    phi = jnp.arccos(acos_arg) / 3.0
    amp = 2.0 * jnp.sqrt(mp)
    trig = shift + amp * jnp.cos(
        phi - 2.0 * jnp.pi * jnp.arange(3) / 3.0)

    # one-real branch (disc > 0): Cardano
    sq = jnp.sqrt(jnp.clip(disc, 0.0, None))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    single = shift + u + v

    three = disc <= 0
    roots = jnp.where(three, trig, jnp.broadcast_to(single, (3,)))
    return roots


def _quartic_roots(a4, a3, a2, a1, a0):
    """Real roots of a4 x^4 + ... + a0, as (4,) values + (4,) mask.
    Ferrari: depressed quartic -> resolvent cubic -> two quadratics."""
    a4 = jnp.where(jnp.abs(a4) < 1e-14, 1e-14, a4)
    b = a3 / a4
    c = a2 / a4
    d = a1 / a4
    e = a0 / a4
    p = c - 3.0 * b * b / 8.0
    q = d - b * c / 2.0 + b**3 / 8.0
    r = e - b * d / 4.0 + b * b * c / 16.0 - 3.0 * b**4 / 256.0

    # resolvent z^3 - (p/2) z^2 - r z + (4 p r - q^2)/8 = 0; pick the
    # root giving the largest s^2 = 2z - p (real factorization exists
    # whenever the quartic has real roots)
    zs = _real_cubic_roots(-p / 2.0, -r, (4.0 * p * r - q * q) / 8.0)
    s2 = 2.0 * zs - p
    pick = jnp.argmax(s2)
    z0 = zs[pick]
    s2 = jnp.clip(s2[pick], 0.0, None)
    s = jnp.sqrt(s2)
    safe_s = jnp.where(s < 1e-12, 1.0, s)
    t1 = jnp.where(s < 1e-12, z0 - jnp.sqrt(jnp.clip(
        z0 * z0 - r, 0.0, None)), z0 - q / (2.0 * safe_s))
    t2 = jnp.where(s < 1e-12, z0 + jnp.sqrt(jnp.clip(
        z0 * z0 - r, 0.0, None)), z0 + q / (2.0 * safe_s))

    def quad(sgn, t):
        # y^2 + sgn*s y + t = 0
        disc = s2 / 4.0 - t
        ok = disc >= 0
        root = jnp.sqrt(jnp.clip(disc, 0.0, None))
        return (jnp.stack([-sgn * s / 2.0 + root, -sgn * s / 2.0 - root]),
                jnp.stack([ok, ok]))

    y12, m12 = quad(1.0, t1)
    y34, m34 = quad(-1.0, t2)
    y = jnp.concatenate([y12, y34])
    mask = jnp.concatenate([m12, m34])
    return y - b / 4.0, mask


def p3p(world_pts, bearings):
    """Grunert P3P: world_pts (3, 3), bearings (3, 3) unit rays in the
    camera frame. Returns (rs (4, 3, 3), ts (4, 3), mask (4,)) — up to
    four pose candidates X_cam = R X_world + t."""
    f1, f2, f3 = bearings[0], bearings[1], bearings[2]
    p1, p2, p3_ = world_pts[0], world_pts[1], world_pts[2]
    a2 = jnp.sum((p2 - p3_) ** 2)
    b2 = jnp.sum((p1 - p3_) ** 2)
    c2 = jnp.sum((p1 - p2) ** 2)
    ca = jnp.dot(f2, f3)   # cos alpha (opposite side a)
    cb = jnp.dot(f1, f3)   # cos beta
    cg = jnp.dot(f1, f2)   # cos gamma

    amc = (a2 - c2) / b2
    apc = (a2 + c2) / b2
    a4 = (amc - 1.0) ** 2 - 4.0 * c2 / b2 * ca * ca
    a3 = 4.0 * (amc * (1.0 - amc) * cb
                - (1.0 - apc) * ca * cg
                + 2.0 * c2 / b2 * ca * ca * cb)
    a2c = 2.0 * (amc * amc - 1.0
                 + 2.0 * amc * amc * cb * cb
                 + 2.0 * (b2 - c2) / b2 * ca * ca
                 - 4.0 * apc * ca * cb * cg
                 + 2.0 * (b2 - a2) / b2 * cg * cg)
    a1 = 4.0 * (-amc * (1.0 + amc) * cb
                + 2.0 * a2 / b2 * cg * cg * cb
                - (1.0 - apc) * ca * cg)
    a0 = (1.0 + amc) ** 2 - 4.0 * a2 / b2 * cg * cg

    vs, mask = _quartic_roots(a4, a3, a2c, a1, a0)

    def pose_from_v(v, ok):
        denom = 1.0 + v * v - 2.0 * v * cb
        ok = jnp.logical_and(ok, denom > 1e-12)
        s1 = jnp.sqrt(b2 / jnp.clip(denom, 1e-12, None))
        s3 = v * s1
        # s2 from side c: s2^2 - 2 s1 cg s2 + (s1^2 - c2) = 0
        disc = s1 * s1 * cg * cg - (s1 * s1 - c2)
        ok = jnp.logical_and(ok, disc >= 0.0)
        rootd = jnp.sqrt(jnp.clip(disc, 0.0, None))
        cands = jnp.stack([s1 * cg + rootd, s1 * cg - rootd])
        # disambiguate with side a: s2^2 + s3^2 - 2 s2 s3 ca = a2
        resid = jnp.abs(cands**2 + s3 * s3 - 2.0 * cands * s3 * ca - a2)
        s2 = cands[jnp.argmin(resid)]
        ok = jnp.logical_and(ok, jnp.min(resid) < 1e-4 * a2 + 1e-9)
        ok = jnp.logical_and(
            ok, jnp.logical_and(s1 > 0, jnp.logical_and(s2 > 0, s3 > 0)))
        cam_pts = jnp.stack([s1 * f1, s2 * f2, s3 * f3])
        r, t = rigid_align(world_pts, cam_pts)
        return r, t, ok

    rs, ts, oks = jax.vmap(pose_from_v)(vs, mask)
    return rs, ts, oks


def p3p_best(world_pts, bearings, extra_pt, extra_bearing):
    """Disambiguate the P3P candidates with a 4th correspondence: pick
    the pose minimizing the angular error of the extra ray. Returns
    (R, t)."""
    rs, ts, oks = p3p(world_pts, bearings)

    def score(r, t, ok):
        pc = r @ extra_pt + t
        pc = pc / jnp.clip(jnp.linalg.norm(pc), 1e-12, None)
        err = 1.0 - jnp.dot(pc, extra_bearing)
        return jnp.where(ok, err, jnp.inf)

    errs = jax.vmap(score)(rs, ts, oks)
    best = jnp.argmin(errs)
    return rs[best], ts[best]


def pnp_ransac(world_pts, bearings, key, num_hypotheses: int = 256,
               inlier_cos: float = 0.9998):
    """Robust PnP: batched-RANSAC over P3P minimal samples.

    TPU shape: a FIXED batch of ``num_hypotheses`` random 3-point
    samples, each solved by (vmapped) closed-form P3P, every candidate
    pose scored against ALL points in one einsum — no data-dependent
    loops, the whole estimator is one jittable program. The best pose by
    inlier count (angular gate ``inlier_cos`` on the bearing agreement)
    is refined by an SVD alignment on its inliers.

    world_pts (N, 3), bearings (N, 3) unit camera-frame rays.
    Returns (R, t, inlier_mask (N,)).
    """
    n = world_pts.shape[0]
    ks, _ = jax.random.split(key)
    # random distinct-ish triples (collisions merely waste a hypothesis)
    idx = jax.random.randint(ks, (num_hypotheses, 3), 0, n)

    def solve_one(tri):
        rs, ts, oks = p3p(world_pts[tri], bearings[tri])
        pc = jnp.einsum("hij,nj->hni", rs, world_pts) + ts[:, None, :]
        pc = pc / jnp.clip(
            jnp.linalg.norm(pc, axis=-1, keepdims=True), 1e-12, None)
        agree = jnp.einsum("hni,ni->hn", pc, bearings)
        inl = (agree > inlier_cos) & (pc[..., 2] > 0)
        counts = jnp.where(oks, jnp.sum(inl, axis=1), -1)
        best = jnp.argmax(counts)
        return rs[best], ts[best], counts[best], inl[best]

    rs, ts, counts, inls = jax.vmap(solve_one)(idx)
    best = jnp.argmax(counts)
    r, t, inl = rs[best], ts[best], inls[best]

    # refinement: weighted absolute orientation on the inliers, using
    # each inlier's depth along its measured ray as the camera point
    depth = jnp.einsum("ni,ni->n", world_pts @ r.T + t, bearings)
    cam_pts = bearings * depth[:, None]
    w = inl.astype(world_pts.dtype)
    r2, t2 = rigid_align(world_pts, cam_pts, w)
    return r2, t2, inl
