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
    """Triplet indices for (E, nr, nc) blocks at row/col dof offsets."""
    r = off_row[:, None, None] + np.arange(nr)[None, :, None]
    c = off_col[:, None, None] + np.arange(nc)[None, None, :]
    r = np.broadcast_to(r, (off_row.shape[0], nr, nc))
    c = np.broadcast_to(c, (off_col.shape[0], nr, nc))
    return r.ravel(), c.ravel()


@dataclasses.dataclass(frozen=True)
class SystemLayout:
    """Host-side triplet layout; value order must match system_values."""

    rows: np.ndarray  # (nnz,) int32
    cols: np.ndarray  # (nnz,) int32
    n: int  # total dof
    prior_slice: slice  # where the prior diagonal values live
    lam_slice: slice  # where the λ diagonal values live


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

    return SystemLayout(
        rows=np.concatenate(rows).astype(np.int32),
        cols=np.concatenate(cols).astype(np.int32),
        n=graph.total_dof,
        prior_slice=prior_slice,
        lam_slice=lam_slice,
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


def system_values(graph: PoseGraphData, lam, prior_weight=PRIOR_WEIGHT):
    """Jittable: flat triplet values (aligned with build_layout) + RHS b
    (already negated, rs:361) + total chi2 error."""
    dtype = graph.poses2.dtype if graph.poses2.size else graph.poses3.dtype
    n = graph.total_dof
    bvec = jnp.zeros(n, dtype=dtype)
    vals = []
    chi2 = jnp.zeros((), dtype=dtype)

    e, a, b, c2 = linearize.edge_terms_pp(
        graph.poses2, graph.pp_from, graph.pp_to, graph.pp_z, graph.pp_omega
    )
    h_ii, h_ij, h_ji, h_jj, b_i, b_j = _quad_blocks(e, a, b, graph.pp_omega)
    vals += [h_ii.ravel(), h_ij.ravel(), h_ji.ravel(), h_jj.ravel()]
    off_i = graph.pose2_offsets[graph.pp_from]
    off_j = graph.pose2_offsets[graph.pp_to]
    idx_i = (off_i[:, None] + jnp.arange(3)[None, :]).ravel()
    idx_j = (off_j[:, None] + jnp.arange(3)[None, :]).ravel()
    bvec = bvec.at[idx_i].add(b_i.ravel()).at[idx_j].add(b_j.ravel())
    chi2 = chi2 + jnp.sum(c2)

    e, a, b, c2 = linearize.edge_terms_pl(
        graph.poses2, graph.landmarks2,
        graph.pl_pose, graph.pl_lm, graph.pl_z, graph.pl_omega,
    )
    h_ii, h_ij, h_ji, h_jj, b_i, b_j = _quad_blocks(e, a, b, graph.pl_omega)
    vals += [h_ii.ravel(), h_ij.ravel(), h_ji.ravel(), h_jj.ravel()]
    off_i = graph.pose2_offsets[graph.pl_pose]
    off_j = graph.lm2_offsets[graph.pl_lm]
    idx_i = (off_i[:, None] + jnp.arange(3)[None, :]).ravel()
    idx_j = (off_j[:, None] + jnp.arange(2)[None, :]).ravel()
    bvec = bvec.at[idx_i].add(b_i.ravel()).at[idx_j].add(b_j.ravel())
    chi2 = chi2 + jnp.sum(c2)

    e, a, b, c2 = linearize.edge_terms_qq(
        graph.poses3, graph.qq_from, graph.qq_to, graph.qq_z, graph.qq_omega
    )
    h_ii, h_ij, h_ji, h_jj, b_i, b_j = _quad_blocks(e, a, b, graph.qq_omega)
    vals += [h_ii.ravel(), h_ij.ravel(), h_ji.ravel(), h_jj.ravel()]
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


system_values_jit = jax.jit(system_values, static_argnames=("prior_weight",))


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
