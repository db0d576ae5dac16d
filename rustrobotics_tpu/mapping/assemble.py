"""Normal-equation assembly for pose-graph optimization.

Role of the reference's build_linear_system + update_linear_system
(pose_graph_optimization.rs:305-369, rs:165-212): accumulate per-edge
``A^T Ω A`` blocks into H and ``A^T Ω e`` into b, add the gauge prior
(+1e7 on the first SE2 edge's from-pose diagonal, rs:330-336), negate b
(rs:361), and add the LM damping λ to every diagonal (rs:362-366).

TPU-first split:
- the *sparsity pattern* (triplet row/col indices in the reference's dof
  layout) is precomputed once per graph on the host (``SystemLayout``) —
  it never changes across GN iterations;
- the *values* (per-edge blocks) are one jitted, vmapped computation
  (``system_values``) producing a flat value vector aligned with the
  layout, plus the dense RHS;
- backends consume the same triplets: dense scatter-add (TPU Cholesky),
  scipy CSC (host direct solve — the UMFPACK role), or a matrix-free
  operator for CG.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.mapping import linearize
from rustrobotics_tpu.mapping.g2o import PoseGraphData

PRIOR_WEIGHT = 1e7  # gauge prior (rs:331)


def _block_indices(off_row, off_col, nr, nc):
    """Triplet indices for per-edge (nr, nc) blocks, in ENTRY-MAJOR order
    (nr, nc, E): all edges' (0,0) entries first, then (0,1), ... The
    matching value array is ``jnp.transpose(blocks, (1, 2, 0)).ravel()``.

    Entry-major matters on TPU: the batched (E, nr, nc) einsum outputs get
    an E-minor layout from XLA, so flattening edge-major forces a relayout
    of a heavily padded (nr, nc -> tile 8x128) buffer — profiled at ~2 ms
    per GN iteration on intel.g2o. Entry-major flattening is a bitcast.
    """
    e = off_row.shape[0]
    r = np.broadcast_to(
        off_row[None, None, :] + np.arange(nr)[:, None, None], (nr, nc, e)
    )
    c = np.broadcast_to(
        off_col[None, None, :] + np.arange(nc)[None, :, None], (nr, nc, e)
    )
    return r.ravel(), c.ravel()


@dataclasses.dataclass(frozen=True)
class SystemLayout:
    """Host-side triplet layout; value order must match system_values.

    Besides the raw COO triplets, carries two precomputed static
    structures for the TPU CG path:
    - ELL: duplicate-summed CSR pattern padded to ``ell_width`` per row so
      the SpMV is a *gather* + rowwise reduction (TPU scatters are slow);
    - block maps: dof -> (node block, within-block position) with identity
      padding, for the block-Jacobi preconditioner.
    """

    rows: np.ndarray  # (nnz,) int32
    cols: np.ndarray  # (nnz,) int32
    n: int  # total dof
    prior_slice: slice  # where the prior diagonal values live
    lam_slice: slice  # where the λ diagonal values live
    # ELL structure (duplicates summed)
    ell_order: np.ndarray  # (nnz,) permutation sorting triplets by (r, c)
    ell_seg: np.ndarray  # (nnz,) segment id of each sorted triplet
    ell_nnz: int  # number of deduped entries
    ell_pos: np.ndarray  # (ell_nnz,) flat position row*width+slot
    ell_nbr: np.ndarray  # (n, width) column index per slot (0-padded)
    ell_width: int
    # block-Jacobi maps
    dof_block: np.ndarray  # (n,)
    dof_pos: np.ndarray  # (n,)
    pad_eye: np.ndarray  # (n_blocks, 6, 6)
    n_blocks: int
    # Schur split: pose dofs vs 2D-landmark dofs
    dof_is_lm: np.ndarray  # (n,) bool
    pose_dofs: np.ndarray  # (n_pose_dof,) reference-layout indices
    lm_dofs: np.ndarray  # (n_lm_dof,) reference-layout indices
    dof_compact: np.ndarray  # (n,) index within its own group


def build_layout(graph: PoseGraphData) -> SystemLayout:
    p2 = np.asarray(graph.pose2_offsets)
    l2 = np.asarray(graph.lm2_offsets)
    p3 = np.asarray(graph.pose3_offsets)
    pp_i = p2[np.asarray(graph.pp_from)] if p2.size else np.zeros(0, np.int32)
    pp_j = p2[np.asarray(graph.pp_to)] if p2.size else np.zeros(0, np.int32)
    pl_i = p2[np.asarray(graph.pl_pose)] if p2.size else np.zeros(0, np.int32)
    pl_j = l2[np.asarray(graph.pl_lm)] if l2.size else np.zeros(0, np.int32)
    qq_i = p3[np.asarray(graph.qq_from)] if p3.size else np.zeros(0, np.int32)
    qq_j = p3[np.asarray(graph.qq_to)] if p3.size else np.zeros(0, np.int32)

    rows, cols = [], []
    for off_r, off_c, nr, nc in [
        (pp_i, pp_i, 3, 3), (pp_i, pp_j, 3, 3),
        (pp_j, pp_i, 3, 3), (pp_j, pp_j, 3, 3),
        (pl_i, pl_i, 3, 3), (pl_i, pl_j, 3, 2),
        (pl_j, pl_i, 2, 3), (pl_j, pl_j, 2, 2),
        (qq_i, qq_i, 6, 6), (qq_i, qq_j, 6, 6),
        (qq_j, qq_i, 6, 6), (qq_j, qq_j, 6, 6),
    ]:
        r, c = _block_indices(off_r, off_c, nr, nc)
        rows.append(r)
        cols.append(c)

    nnz_edges = sum(r.size for r in rows)

    # gauge prior diagonal (first SE2 edge's from pose; for pure-3D graphs
    # the first SE3 edge's from pose — our own convention, the reference
    # never ran 3D)
    if graph.prior2 >= 0:
        pr = p2[graph.prior2] + np.arange(3)
    elif graph.prior3 >= 0:
        pr = p3[graph.prior3] + np.arange(6)
    else:
        pr = np.zeros(0, np.int64)
    rows.append(pr)
    cols.append(pr)
    prior_slice = slice(nnz_edges, nnz_edges + pr.size)

    # λ damping on every diagonal (rs:362-366); always present, 0 for GN
    diag = np.arange(graph.total_dof)
    rows.append(diag)
    cols.append(diag)
    lam_slice = slice(prior_slice.stop, prior_slice.stop + diag.size)

    rows_all = np.concatenate(rows).astype(np.int32)
    cols_all = np.concatenate(cols).astype(np.int32)
    n = graph.total_dof

    # ELL structure: sort by (row, col), group duplicates
    order = np.lexsort((cols_all, rows_all))
    rs, cs = rows_all[order], cols_all[order]
    new_group = np.ones(len(rs), bool)
    new_group[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
    seg = np.cumsum(new_group) - 1
    uniq_r, uniq_c = rs[new_group], cs[new_group]
    # slot within row (uniq entries are row-sorted)
    row_start = np.searchsorted(uniq_r, np.arange(n), side="left")
    slot = np.arange(len(uniq_r)) - row_start[uniq_r]
    width = int(slot.max()) + 1 if len(slot) else 1
    nbr = np.zeros((n, width), np.int32)
    nbr[uniq_r, slot] = uniq_c
    ell_pos = (uniq_r.astype(np.int64) * width + slot).astype(np.int64)

    # block-Jacobi maps
    dof_block = np.zeros(n, np.int32)
    dof_pos = np.zeros(n, np.int32)
    sizes = []
    bid = 0
    for offs, size in [(p2, 3), (l2, 2), (p3, 6)]:
        for o in offs:
            dof_block[o:o + size] = bid
            dof_pos[o:o + size] = np.arange(size)
            sizes.append(size)
            bid += 1
    n_blocks = max(bid, 1)
    pad_eye = np.zeros((n_blocks, 6, 6))
    for k, s in enumerate(sizes):
        for i in range(s, 6):
            pad_eye[k, i, i] = 1.0

    # Schur split maps
    dof_is_lm = np.zeros(n, bool)
    for o in l2:
        dof_is_lm[o:o + 2] = True
    pose_dofs = np.where(~dof_is_lm)[0].astype(np.int32)
    lm_dofs = np.where(dof_is_lm)[0].astype(np.int32)
    dof_compact = np.zeros(n, np.int32)
    dof_compact[pose_dofs] = np.arange(len(pose_dofs))
    dof_compact[lm_dofs] = np.arange(len(lm_dofs))

    return SystemLayout(
        rows=rows_all,
        cols=cols_all,
        n=n,
        prior_slice=prior_slice,
        lam_slice=lam_slice,
        ell_order=order,
        ell_seg=seg.astype(np.int32),
        ell_nnz=int(len(uniq_r)),
        ell_pos=ell_pos,
        ell_nbr=nbr,
        ell_width=width,
        dof_block=dof_block,
        dof_pos=dof_pos,
        pad_eye=pad_eye,
        n_blocks=n_blocks,
        dof_is_lm=dof_is_lm,
        pose_dofs=pose_dofs,
        lm_dofs=lm_dofs,
        dof_compact=dof_compact,
    )


def _quad_blocks(e, a, b, omega):
    """(H_ii, H_ij, H_ji, H_jj, b_i, b_j) for a batch of edges.

    Full-f32 einsum passes (see linearize._precise): default TPU bf16
    matmuls make H indefinite on ill-conditioned graphs.
    """
    at_om = jnp.einsum("eki,ekl->eil", a, omega,
                       precision=jax.lax.Precision.HIGHEST)
    bt_om = jnp.einsum("eki,ekl->eil", b, omega, precision=jax.lax.Precision.HIGHEST)
    h_ii = jnp.einsum("eil,elj->eij", at_om, a, precision=jax.lax.Precision.HIGHEST)
    h_ij = jnp.einsum("eil,elj->eij", at_om, b, precision=jax.lax.Precision.HIGHEST)
    h_jj = jnp.einsum("eil,elj->eij", bt_om, b, precision=jax.lax.Precision.HIGHEST)
    h_ji = jnp.swapaxes(h_ij, -1, -2)
    b_i = jnp.einsum("eil,el->ei", at_om, e)
    b_j = jnp.einsum("eil,el->ei", bt_om, e)
    return h_ii, h_ij, h_ji, h_jj, b_i, b_j


def _scale_c(hxx, w):
    """Scale a component (SoA) matrix by a per-edge weight."""
    return [[hxx[k][l] * w for l in range(len(hxx[0]))]
            for k in range(len(hxx))]


def _em(blocks):
    """Entry-major flatten of (E, nr, nc) blocks — see _block_indices."""
    return jnp.transpose(blocks, (1, 2, 0)).ravel()


ROBUST_KERNELS = {
    # weight(chi2) for iteratively-reweighted least squares; chi2 is the
    # edge's squared Mahalanobis error
    "huber": lambda c2, d: jnp.minimum(1.0, d / jnp.sqrt(jnp.clip(c2, 1e-20, None))),
    "cauchy": lambda c2, d: 1.0 / (1.0 + c2 / (d * d)),
}

# Adaptive kernels (reference README.md:50-51 Todo "Robust Kernels /
# Adaptive Kernels" — unimplemented there). Two families:
#
# - "barron": Barron's general robust loss rho(r; alpha, c) (CVPR'19):
#   one alpha parameter sweeps L2 (alpha=2) -> Charbonnier (1) ->
#   Cauchy (0) -> Geman-McClure (-2) -> Welsch (-inf). IRLS weight
#   w = rho'(r)/r normalized to w(0)=1:
#       w = ( (r/c)^2 / |alpha-2| + 1 ) ^ (alpha/2 - 1)
# - "gnc-gm": graduated non-convexity over Geman-McClure (Yang et al.,
#   RA-L'20): weight w = ( mu c^2 / (r^2 + mu c^2) )^2 with a
#   continuation parameter mu annealed mu0 -> 1 by the OPTIMIZER loop
#   (mu0 from the worst initial residual makes the first surrogate
#   convex; mu=1 recovers plain Geman-McClure). The schedule lives in
#   mapping.pgo; assembly only evaluates the weight at the given mu.
ADAPTIVE_KERNELS = ("barron", "gnc-gm")
# mu0 ceiling for the GNC continuation: the textbook mu0 = 2 r_max^2/c^2
# can reach 1e6+ under gross outliers, wasting the whole annealing budget
# fighting a hopeless near-L2 phase (and cutting true closures on the way
# down). Capping keeps the first surrogate smooth-but-informative; swept
# empirically (tests/test_robust_adaptive.py ramp): the cap is what takes
# GNC from erratic to exact on 16-128 injected outliers.
GNC_MU0_CAP = 1e3


def robust_weight(robust, c2, delta, alpha=-2.0, mu=None):
    """Per-edge IRLS weight for the given kernel at squared error c2.

    ``robust`` in {None, "huber", "cauchy", "barron", "gnc-gm"};
    ``delta`` is the kernel scale c, ``alpha`` the Barron shape (static),
    ``mu`` the GNC continuation parameter (traced scalar; None -> 1).
    """
    if robust is None:
        return jnp.ones_like(c2)
    if robust in ROBUST_KERNELS:
        return ROBUST_KERNELS[robust](c2, delta)
    if robust == "barron":
        alpha = float(alpha)
        if alpha >= 2.0:
            return jnp.ones_like(c2)
        base = c2 / (delta * delta) / (2.0 - alpha) + 1.0
        return base ** (alpha / 2.0 - 1.0)
    if robust == "gnc-gm":
        m = jnp.asarray(1.0 if mu is None else mu, c2.dtype)
        s = m * delta * delta
        return (s / (c2 + s)) ** 2
    raise ValueError(f"unknown robust kernel {robust!r}")


def robust_rho(robust, c2, delta, alpha=-2.0, mu=None):
    """Per-edge robust LOSS rho(c2) matching ``robust_weight`` (the IRLS
    weights are 2*d rho/d c2 normalized to 1 at 0). Used as the LM
    accept/reject objective for robust runs: comparing RAW chi2 would
    reject every step that sacrifices outlier fit."""
    if robust is None:
        return c2
    d2 = delta * delta
    if robust == "huber":
        r = jnp.sqrt(jnp.clip(c2, 1e-20, None))
        return jnp.where(c2 <= d2, c2, 2.0 * delta * r - d2)
    if robust == "cauchy":
        return d2 * jnp.log1p(c2 / d2)
    if robust == "barron":
        alpha = float(alpha)
        if alpha >= 2.0:
            return c2
        if alpha == 0.0:
            return 2.0 * d2 * jnp.log1p(c2 / (2.0 * d2))
        b = 2.0 - alpha
        return (2.0 * d2 * b / alpha) * (
            (c2 / (d2 * b) + 1.0) ** (alpha / 2.0) - 1.0)
    if robust == "gnc-gm":
        m = jnp.asarray(1.0 if mu is None else mu, c2.dtype)
        s = m * d2
        return s * c2 / (s + c2)
    raise ValueError(f"unknown robust kernel {robust!r}")


def system_values(graph: PoseGraphData, lam, prior_weight=PRIOR_WEIGHT,
                  robust=None, robust_delta=1.0, robust_alpha=-2.0,
                  mu=None, robust_edges="closures"):
    """Jittable: flat triplet values (aligned with build_layout) + RHS b
    (already negated, rs:361) + total chi2 error.

    ``robust``: optional M-estimator ("huber"/"cauchy"/"barron"/
    "gnc-gm") — every edge's normal-equation contribution is scaled by
    the IRLS weight of its current squared error, so gross outlier
    constraints (wrong loop closures) stop dominating the solve.
    ``robust_alpha`` is the Barron shape, ``mu`` the (traced) GNC
    continuation parameter. ``robust_edges="closures"`` (default) keeps
    ODOMETRY pose-pose edges (to == from + 1) at L2: rejecting a
    sequential edge fragments the graph into mutually-drifting pieces
    that no later iteration can pull back (the IRLS gradient of a cut
    edge is ~0) — robustify only what can actually be an outlier.
    "all" robustifies every edge. The returned chi2 stays the RAW
    quadratic error for trace comparability. No reference counterpart
    (its Todo, README.md:50-51).
    """
    dtype = graph.poses2.dtype if graph.poses2.size else graph.poses3.dtype
    n = graph.total_dof
    bvec = jnp.zeros(n, dtype=dtype)
    vals = []
    chi2 = jnp.zeros((), dtype=dtype)
    rw = (lambda c2: robust_weight(robust, c2, robust_delta,
                                   alpha=robust_alpha, mu=mu)) if robust \
        else (lambda c2: jnp.ones_like(c2))

    def rw_pose(c2, fr, to):
        # pose-pose families: sequential (odometry) edges stay L2 under
        # the default robust_edges="closures"
        w = rw(c2)
        if robust and robust_edges == "closures":
            w = jnp.where(jnp.abs(to - fr) == 1, jnp.ones_like(w), w)
        return w

    def flat(hxx):
        # entry-major flatten of a component matrix (matches _block_indices)
        return [hxx[k][l] for k in range(len(hxx)) for l in range(len(hxx[0]))]

    def transpose_c(hxx):
        return [[hxx[k][l] for k in range(len(hxx))] for l in range(len(hxx[0]))]

    # SE2-SE2 edges — component (SoA) linearization: no (E,3,3) buffers
    with jax.default_matmul_precision("highest"):
        _, hii, hij, hjj, b_i, b_j, c2 = linearize.edge_terms_pp_soa(
            graph.poses2, graph.pp_from, graph.pp_to, graph.pp_z,
            graph.pp_omega,
        )
    w = rw_pose(c2, graph.pp_from, graph.pp_to)
    hii, hij, hjj = _scale_c(hii, w), _scale_c(hij, w), _scale_c(hjj, w)
    b_i = [bi * w for bi in b_i]
    b_j = [bj * w for bj in b_j]
    vals += flat(hii) + flat(hij) + flat(transpose_c(hij)) + flat(hjj)
    off_i = graph.pose2_offsets[graph.pp_from]
    off_j = graph.pose2_offsets[graph.pp_to]
    for k in range(3):
        bvec = bvec.at[off_i + k].add(b_i[k]).at[off_j + k].add(b_j[k])
    chi2 = chi2 + jnp.sum(c2)

    # SE2-XY edges
    with jax.default_matmul_precision("highest"):
        _, hii, hij, hjj, b_i, b_j, c2 = linearize.edge_terms_pl_soa(
            graph.poses2, graph.landmarks2,
            graph.pl_pose, graph.pl_lm, graph.pl_z, graph.pl_omega,
        )
    w = rw(c2)
    hii, hij, hjj = _scale_c(hii, w), _scale_c(hij, w), _scale_c(hjj, w)
    b_i = [bi * w for bi in b_i]
    b_j = [bj * w for bj in b_j]
    vals += flat(hii) + flat(hij) + flat(transpose_c(hij)) + flat(hjj)
    off_i = graph.pose2_offsets[graph.pl_pose]
    off_j = graph.lm2_offsets[graph.pl_lm]
    for k in range(3):
        bvec = bvec.at[off_i + k].add(b_i[k])
    for k in range(2):
        bvec = bvec.at[off_j + k].add(b_j[k])
    chi2 = chi2 + jnp.sum(c2)

    e, a, b, c2 = linearize.edge_terms_qq(
        graph.poses3, graph.qq_from, graph.qq_to, graph.qq_z, graph.qq_omega
    )
    h_ii, h_ij, h_ji, h_jj, b_i, b_j = _quad_blocks(e, a, b, graph.qq_omega)
    w = rw_pose(c2, graph.qq_from, graph.qq_to)[:, None, None]
    h_ii, h_ij, h_ji, h_jj = (h_ii * w, h_ij * w, h_ji * w, h_jj * w)
    b_i = b_i * w[:, :, 0]
    b_j = b_j * w[:, :, 0]
    vals += [_em(h_ii), _em(h_ij), _em(h_ji), _em(h_jj)]
    off_i = graph.pose3_offsets[graph.qq_from]
    off_j = graph.pose3_offsets[graph.qq_to]
    idx_i = (off_i[:, None] + jnp.arange(6)[None, :]).ravel()
    idx_j = (off_j[:, None] + jnp.arange(6)[None, :]).ravel()
    bvec = bvec.at[idx_i].add(b_i.ravel()).at[idx_j].add(b_j.ravel())
    chi2 = chi2 + jnp.sum(c2)

    # prior values
    if graph.prior2 >= 0:
        prior_vals = jnp.full(3, prior_weight, dtype=dtype)
    elif graph.prior3 >= 0:
        prior_vals = jnp.full(6, prior_weight, dtype=dtype)
    else:
        prior_vals = jnp.zeros(0, dtype=dtype)
    vals.append(prior_vals)

    # λ diagonal
    vals.append(jnp.full(n, lam, dtype=dtype))

    return jnp.concatenate(vals), -bvec, chi2


system_values_jit = jax.jit(
    system_values,
    static_argnames=("prior_weight", "robust", "robust_delta",
                     "robust_alpha", "robust_edges"),
)


def dense_hessian(layout: SystemLayout, vals, dtype=None):
    """Scatter triplets into a dense (n, n) H (jittable)."""
    h = jnp.zeros((layout.n, layout.n), dtype=dtype or vals.dtype)
    return h.at[jnp.asarray(layout.rows), jnp.asarray(layout.cols)].add(vals)


def apply_update(graph: PoseGraphData, dx) -> PoseGraphData:
    """Manifold retraction of all nodes from a reference-layout dx
    (role of update_nodes, rs:229-245 — one fused gather + retract
    instead of a rayon parallel loop)."""
    from rustrobotics_tpu.geometry import se2, se3

    updates = {}
    if graph.poses2.shape[0]:
        dp = dx[graph.pose2_offsets[:, None] + jnp.arange(3)[None, :]]
        updates["poses2"] = se2.retract(graph.poses2, dp)
    if graph.landmarks2.shape[0]:
        dl = dx[graph.lm2_offsets[:, None] + jnp.arange(2)[None, :]]
        updates["landmarks2"] = graph.landmarks2 + dl
    if graph.poses3.shape[0]:
        dp3 = dx[graph.pose3_offsets[:, None] + jnp.arange(6)[None, :]]
        updates["poses3"] = se3.retract(graph.poses3, dp3)
    return graph.replace(**updates)


apply_update_jit = jax.jit(apply_update)
