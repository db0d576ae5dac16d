"""Chordal initialization for pose graphs.

Gauss-Newton/LM converge only locally; from a bad initial guess (e.g.
zeroed poses) they stall in local minima (intel.g2o: chi2 stalls at ~15k
vs the global 360). The standard fix is a two-stage linear bootstrap:

1. **Rotation averaging (chordal relaxation)**: drop the unit-norm
   constraint and solve the LINEAR least squares
   ``min sum_e | r_to - R(z_e) r_from |^2`` over per-node rotation
   vectors (2-vector cos/sin for SE2, the 3x3 matrix rows for SE3), with
   the first pose's rotation fixed; then project back onto SO(2)/SO(3).
2. **Translation recovery**: with rotations fixed, positions solve the
   linear least squares ``t_to - t_from = R_from z_t``.

Both stages are sparse SPD solves on the same graph; they run once on the
host (scipy sparse, like parsing/RCM — static preprocessing), and the
optimizer then refines on device. No counterpart in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.mapping.g2o import PoseGraphData


def _solve_anchored(rows, cols, vals, b, n, anchor_dofs):
    """Solve the normal equations with anchor dofs pinned (weight 1e6)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    h = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsc()
    h = h + sp.diags(np.isin(np.arange(n), anchor_dofs) * 1e6)
    return spla.spsolve(h, b)


def chordal_init_se2(graph: PoseGraphData) -> PoseGraphData:
    """Chordal initialization of the SE2 poses (landmarks re-initialized
    from their first sighting afterwards)."""
    n = int(graph.poses2.shape[0])
    frm = np.asarray(graph.pp_from, np.int64)
    to = np.asarray(graph.pp_to, np.int64)
    z = np.asarray(graph.pp_z, np.float64)
    dtype = graph.poses2.dtype

    # ---- stage 1: rotation vectors r_i = (cos, sin), residual
    #      r_to - R(z_theta) r_from; unknowns x = [r_0 | r_1 | ...] (2n)
    c, s = np.cos(z[:, 2]), np.sin(z[:, 2])
    rows, cols, vals = [], [], []
    b = np.zeros(2 * n)

    def add(r_, c_, v_):
        rows.append(r_), cols.append(c_), vals.append(v_)

    # normal equations of each 2-row residual block:
    # J_from = -R, J_to = I  ->  H_ff += R^T R = I, H_tt += I,
    # H_ft += -R^T, H_tf += -R
    for e in range(len(frm)):
        f2, t2 = 2 * frm[e], 2 * to[e]
        r_mat = np.array([[c[e], -s[e]], [s[e], c[e]]])
        for a in range(2):
            add(f2 + a, f2 + a, 1.0)
            add(t2 + a, t2 + a, 1.0)
            for d in range(2):
                add(f2 + a, t2 + d, -r_mat[d, a])  # -R^T
                add(t2 + a, f2 + d, -r_mat[a, d])  # -R
    # anchor r_0 = (1, 0) through the rhs of the pinning weight
    b[0] = 1e6
    x = _solve_anchored(
        np.concatenate([np.asarray(rows)]),
        np.concatenate([np.asarray(cols)]),
        np.concatenate([np.asarray(vals)]),
        b, 2 * n, np.array([0, 1]),
    )
    thetas = np.arctan2(x[1::2], x[0::2])  # SO(2) projection

    # ---- stage 2: translations with rotations fixed:
    #      t_to - t_from = R(theta_from) z_t
    cf, sf = np.cos(thetas[frm]), np.sin(thetas[frm])
    dx = cf * z[:, 0] - sf * z[:, 1]
    dy = sf * z[:, 0] + cf * z[:, 1]
    rows, cols, vals = [], [], []
    b = np.zeros(2 * n)
    for e in range(len(frm)):
        f2, t2 = 2 * frm[e], 2 * to[e]
        for a, d in [(0, dx[e]), (1, dy[e])]:
            add(f2 + a, f2 + a, 1.0)
            add(t2 + a, t2 + a, 1.0)
            add(f2 + a, t2 + a, -1.0)
            add(t2 + a, f2 + a, -1.0)
            b[t2 + a] += d
            b[f2 + a] -= d
    t = _solve_anchored(
        np.asarray(rows), np.asarray(cols), np.asarray(vals),
        b, 2 * n, np.array([0, 1]),
    )
    poses = np.stack([t[0::2], t[1::2], thetas], axis=-1)

    updates = {"poses2": jnp.asarray(poses, dtype)}
    # landmarks: first-sighting inverse measurement from the new poses
    if graph.landmarks2.shape[0]:
        lm = np.zeros((graph.landmarks2.shape[0], 2))
        seen = np.zeros(lm.shape[0], bool)
        pl_pose = np.asarray(graph.pl_pose)
        pl_lm = np.asarray(graph.pl_lm)
        pl_z = np.asarray(graph.pl_z, np.float64)
        for e in range(len(pl_pose)):
            k = pl_lm[e]
            if not seen[k]:
                p = poses[pl_pose[e]]
                ce, se = np.cos(p[2]), np.sin(p[2])
                lm[k] = p[:2] + [ce * pl_z[e, 0] - se * pl_z[e, 1],
                                 se * pl_z[e, 0] + ce * pl_z[e, 1]]
                seen[k] = True
        updates["landmarks2"] = jnp.asarray(lm, dtype)
    return graph.replace(**updates)
