"""Device-side triplet generation (rows, cols, vals) for the normal
equations — the traced twin of assemble.build_layout/system_values.

Used by the matrix-free CG paths: single-device and edge-sharded
(shard_map), where row/col indices must be computed *inside* the traced
program from whatever edge shard a device holds.
"""

from __future__ import annotations

import jax.numpy as jnp

from rustrobotics_tpu.mapping import linearize
from rustrobotics_tpu.mapping.assemble import _quad_blocks


def _block_idx(off_r, off_c, nr, nc):
    r = off_r[:, None, None] + jnp.arange(nr)[None, :, None]
    c = off_c[:, None, None] + jnp.arange(nc)[None, None, :]
    shape = (off_r.shape[0], nr, nc)
    return (
        jnp.broadcast_to(r, shape).ravel(),
        jnp.broadcast_to(c, shape).ravel(),
    )


def edge_triplets(
    poses2, landmarks2, poses3,
    pose2_offsets, lm2_offsets, pose3_offsets,
    pp_from, pp_to, pp_z, pp_omega,
    pl_pose, pl_lm, pl_z, pl_omega,
    qq_from, qq_to, qq_z, qq_omega,
    n,
):
    """Returns (rows, cols, vals, b, chi2) for the given edge set.

    b is the *un-negated* gradient accumulation Σ A^T Ω e scattered to
    length n; no gauge prior, no λ — callers add those (they are diagonal
    and replicated). Padded edges with Ω = 0 contribute nothing, so shards
    may be zero-padded freely.
    """
    dtype = poses2.dtype if poses2.size else poses3.dtype
    rows, cols, vals = [], [], []
    b = jnp.zeros(n, dtype=dtype)
    chi2 = jnp.zeros((), dtype=dtype)

    # SE2-SE2
    e, a, bb, c2 = linearize.edge_terms_pp(poses2, pp_from, pp_to, pp_z, pp_omega)
    h_ii, h_ij, h_ji, h_jj, b_i, b_j = _quad_blocks(e, a, bb, pp_omega)
    off_i, off_j = pose2_offsets[pp_from], pose2_offsets[pp_to]
    for (orow, ocol, block, nr, nc) in [
        (off_i, off_i, h_ii, 3, 3), (off_i, off_j, h_ij, 3, 3),
        (off_j, off_i, h_ji, 3, 3), (off_j, off_j, h_jj, 3, 3),
    ]:
        r, c = _block_idx(orow, ocol, nr, nc)
        rows.append(r); cols.append(c); vals.append(block.ravel())
    b = b.at[(off_i[:, None] + jnp.arange(3)).ravel()].add(b_i.ravel())
    b = b.at[(off_j[:, None] + jnp.arange(3)).ravel()].add(b_j.ravel())
    chi2 = chi2 + jnp.sum(c2)

    # SE2-XY
    e, a, bb, c2 = linearize.edge_terms_pl(
        poses2, landmarks2, pl_pose, pl_lm, pl_z, pl_omega
    )
    h_ii, h_ij, h_ji, h_jj, b_i, b_j = _quad_blocks(e, a, bb, pl_omega)
    off_i, off_j = pose2_offsets[pl_pose], lm2_offsets[pl_lm]
    for (orow, ocol, block, nr, nc) in [
        (off_i, off_i, h_ii, 3, 3), (off_i, off_j, h_ij, 3, 2),
        (off_j, off_i, h_ji, 2, 3), (off_j, off_j, h_jj, 2, 2),
    ]:
        r, c = _block_idx(orow, ocol, nr, nc)
        rows.append(r); cols.append(c); vals.append(block.ravel())
    b = b.at[(off_i[:, None] + jnp.arange(3)).ravel()].add(b_i.ravel())
    b = b.at[(off_j[:, None] + jnp.arange(2)).ravel()].add(b_j.ravel())
    chi2 = chi2 + jnp.sum(c2)

    # SE3-SE3
    e, a, bb, c2 = linearize.edge_terms_qq(poses3, qq_from, qq_to, qq_z, qq_omega)
    h_ii, h_ij, h_ji, h_jj, b_i, b_j = _quad_blocks(e, a, bb, qq_omega)
    off_i, off_j = pose3_offsets[qq_from], pose3_offsets[qq_to]
    for (orow, ocol, block, nr, nc) in [
        (off_i, off_i, h_ii, 6, 6), (off_i, off_j, h_ij, 6, 6),
        (off_j, off_i, h_ji, 6, 6), (off_j, off_j, h_jj, 6, 6),
    ]:
        r, c = _block_idx(orow, ocol, nr, nc)
        rows.append(r); cols.append(c); vals.append(block.ravel())
    b = b.at[(off_i[:, None] + jnp.arange(6)).ravel()].add(b_i.ravel())
    b = b.at[(off_j[:, None] + jnp.arange(6)).ravel()].add(b_j.ravel())
    chi2 = chi2 + jnp.sum(c2)

    return (
        jnp.concatenate(rows),
        jnp.concatenate(cols),
        jnp.concatenate(vals),
        b,
        chi2,
    )


def graph_edge_triplets(graph):
    """Convenience: edge_triplets from a PoseGraphData."""
    return edge_triplets(
        graph.poses2, graph.landmarks2, graph.poses3,
        graph.pose2_offsets, graph.lm2_offsets, graph.pose3_offsets,
        graph.pp_from, graph.pp_to, graph.pp_z, graph.pp_omega,
        graph.pl_pose, graph.pl_lm, graph.pl_z, graph.pl_omega,
        graph.qq_from, graph.qq_to, graph.qq_z, graph.qq_omega,
        graph.total_dof,
    )
