"""Bundle adjustment — reference README Todo "Bundle Adjustement".

Joint refinement of SE(3) camera poses and 3D points minimizing
reprojection error. The classic SfM structure is exploited the classic
way, but TPU-first:

- residuals and BOTH Jacobians (pose tangent (2, 6), point (2, 3)) for
  every observation come from one vmapped jacfwd through the projection
  + se3 retraction — no per-observation loops;
- the point block Hpp is (P, 3, 3) block-diagonal, inverted batched;
- the SCHUR COMPLEMENT on cameras S = Hcc - W Hpp^-1 W^T is assembled by
  scatter-adds over a HOST-precomputed list of observation pairs sharing
  a point (static per problem, like mapping.assemble's layouts), then
  solved by Jacobi-scaled dense Cholesky on (6C, 6C) — cameras number
  10-10^3, so the MXU eats it;
- Levenberg-Marquardt accept/reject mirrors mapping.pgo.

Gauge freedom: the first camera carries a +1e7 prior (the pose-graph's
gauge trick), which pins 6 of the 7 similarity dofs; the remaining
global-scale direction is left soft — LM damping keeps the solution at
the initialization's scale (pin a point range explicitly if a metric
scale is required).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.geometry import se3

PRIOR_WEIGHT = 1e7


def project_point(k, cam, pt):
    """Pixel of world point ``pt`` in camera ``cam`` ([t(3), q_wxyz(4)]:
    the WORLD->CAMERA transform, matching PoseGraphData's se3 layout)."""
    pc = se3.transform(cam, pt)
    uvw = k @ pc
    return uvw[:2] / uvw[2]


def _residual(k, cam, pt, uv):
    return project_point(k, cam, pt) - uv


@dataclasses.dataclass(frozen=True)
class _PairIndex:
    """Host-side static index lists for the Schur products."""

    pair_i: np.ndarray  # (Q,) obs index
    pair_j: np.ndarray  # (Q,) obs index, same point as pair_i


def _build_pairs(obs_pt, num_points):
    by_pt = [[] for _ in range(num_points)]
    for o, p in enumerate(np.asarray(obs_pt)):
        by_pt[int(p)].append(o)
    pi, pj = [], []
    for lst in by_pt:
        arr = np.asarray(lst)
        if len(arr) == 0:
            continue
        gi, gj = np.meshgrid(arr, arr, indexing="ij")
        pi.append(gi.ravel())
        pj.append(gj.ravel())
    return _PairIndex(
        pair_i=np.concatenate(pi) if pi else np.zeros(0, np.int64),
        pair_j=np.concatenate(pj) if pj else np.zeros(0, np.int64),
    )


def bundle_adjust(
    k,
    cam_poses,
    points,
    obs_cam,
    obs_pt,
    obs_uv,
    num_iterations: int = 20,
    solver: str = "lm",
    prior_weight: float = PRIOR_WEIGHT,
):
    """Returns (cam_poses', points', errors list).

    k (3, 3) shared intrinsics; cam_poses (C, 7) [t, q_wxyz]
    world->camera; points (P, 3); obs_cam/obs_pt (O,) int; obs_uv (O, 2).
    """
    k = jnp.asarray(k)
    cam_poses = jnp.asarray(cam_poses)
    points = jnp.asarray(points)
    obs_cam = jnp.asarray(obs_cam, jnp.int32)
    obs_pt = jnp.asarray(obs_pt, jnp.int32)
    obs_uv = jnp.asarray(obs_uv)
    dtype = points.dtype
    c = cam_poses.shape[0]
    p = points.shape[0]
    pairs = _build_pairs(obs_pt, p)
    pair_i = jnp.asarray(pairs.pair_i, jnp.int32)
    pair_j = jnp.asarray(pairs.pair_j, jnp.int32)
    lm = solver in ("lm", "levenberg_marquardt")

    def res_jacs(cams, pts):
        def one(cam, pt, uv):
            def f(delta_cam, delta_pt):
                return _residual(k, se3.retract(cam, delta_cam),
                                 pt + delta_pt, uv)

            r = f(jnp.zeros(6, dtype), jnp.zeros(3, dtype))
            jc = jax.jacfwd(f, argnums=0)(jnp.zeros(6, dtype),
                                          jnp.zeros(3, dtype))
            jp = jax.jacfwd(f, argnums=1)(jnp.zeros(6, dtype),
                                          jnp.zeros(3, dtype))
            return r, jc, jp

        return jax.vmap(one)(cams[obs_cam], pts[obs_pt], obs_uv)

    def chi2_of(cams, pts):
        r = jax.vmap(lambda cam, pt, uv: _residual(k, cam, pt, uv))(
            cams[obs_cam], pts[obs_pt], obs_uv)
        return jnp.sum(r * r)

    def gn_step(cams, pts, lam):
        r, jc, jp = res_jacs(cams, pts)  # (O,2) (O,2,6) (O,2,3)
        with jax.default_matmul_precision("highest"):
            hcc_o = jnp.einsum("oki,okj->oij", jc, jc)   # (O, 6, 6)
            hpp_o = jnp.einsum("oki,okj->oij", jp, jp)   # (O, 3, 3)
            w_o = jnp.einsum("oki,okj->oij", jc, jp)     # (O, 6, 3)
            bc_o = jnp.einsum("oki,ok->oi", jc, r)       # (O, 6)
            bp_o = jnp.einsum("oki,ok->oi", jp, r)       # (O, 3)

            hpp = jnp.zeros((p, 3, 3), dtype).at[obs_pt].add(hpp_o)
            hpp = hpp + jnp.eye(3, dtype=dtype) * lam \
                + jnp.eye(3, dtype=dtype) * 1e-9
            bp = jnp.zeros((p, 3), dtype).at[obs_pt].add(bp_o)
            hpp_inv = jnp.linalg.inv(hpp)

            # S = Hcc + damping + prior - sum_{obs pairs sharing a point}
            #     W_i Hpp^-1 W_j^T  at block (cam_i, cam_j)
            hcc = jnp.zeros((c, c, 6, 6), dtype)
            hcc = hcc.at[obs_cam, obs_cam].add(hcc_o)
            a_o = jnp.einsum("oij,ojk->oik", w_o, hpp_inv[obs_pt])
            uu = jnp.einsum("qik,qjk->qij", a_o[pair_i], w_o[pair_j])
            hcc = hcc.at[obs_cam[pair_i], obs_cam[pair_j]].add(-uu)
            s = hcc.transpose(0, 2, 1, 3).reshape(6 * c, 6 * c)
            diag_add = jnp.full(6 * c, lam, dtype)
            diag_add = diag_add.at[:6].add(prior_weight)  # gauge: cam 0
            s = s + jnp.diag(diag_add)

            bc = jnp.zeros((c, 6), dtype).at[obs_cam].add(bc_o)
            rhs = bc - jnp.zeros((c, 6), dtype).at[obs_cam].add(
                jnp.einsum("oik,ok->oi", a_o, bp[obs_pt]))
            rhs = -rhs.reshape(-1)

            d = jnp.sqrt(jnp.clip(jnp.diagonal(s), 1e-12, None))
            ss = s / (d[:, None] * d[None, :])
            cf = jax.scipy.linalg.cho_factor(ss)
            dxc = (jax.scipy.linalg.cho_solve(cf, rhs / d) / d).reshape(
                c, 6)

            # back-substitute points: dx_p = Hpp^-1 (-bp - W^T dx_c)
            wt_dxc = jnp.zeros((p, 3), dtype).at[obs_pt].add(
                jnp.einsum("oij,oi->oj", w_o, dxc[obs_cam]))
            dxp = jnp.einsum("pij,pj->pi", hpp_inv, -bp - wt_dxc)

        new_cams = se3.retract(cams, dxc)
        new_pts = pts + dxp
        return new_cams, new_pts

    errors = [float(chi2_of(cam_poses, points))]
    lam = 1e-3 if lm else 0.0
    step = jax.jit(gn_step)
    for _ in range(num_iterations):
        new_cams, new_pts = step(cam_poses, points,
                                 jnp.asarray(lam, dtype))
        err = float(chi2_of(new_cams, new_pts))
        if lm and not (err <= errors[-1]):
            lam *= 4.0
            errors.append(errors[-1])
            continue
        if lm:
            lam = max(lam / 4.0, 1e-12)
        cam_poses, points = new_cams, new_pts
        errors.append(err)
    return cam_poses, points, errors
