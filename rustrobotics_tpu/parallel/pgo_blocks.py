"""Map-block distributed pose-graph optimization (shard_map kernels).

The TPU-native replacement for the reference's whole-graph-in-RAM batch
optimizer (pose_graph_optimization.rs:247-303) at pod-slice scale: nodes
AND edges are partitioned over the device mesh by the static
``block_layout`` (node-RCM contiguous dof chunks), and every per-iteration
collective moves only SEPARATOR-sized data:

- assembly: each device linearizes its own edges and scatters local ELL
  values; exactly ``h`` boundary rows (h = RCM band, independent of n)
  are ppermute-reduced to the right neighbor(s) once per GN iteration;
- solve: preconditioned CG whose matvec exchanges ``h`` halo values of x
  via ppermute and whose dot products psum scalars. The matvec is
  OVERLAPPED: the interior product runs on owned values while the halo
  ppermutes are in flight; only 2h boundary rows take corrections after
  they land. Three preconditioners behind a D-aware ``auto`` default:
  ``jacobi`` (per-node 6x6 blocks, negligible setup — right on one
  device where CG rounds are cheap), ``schwarz`` (additive Schwarz:
  each device cyclic-reduction-factors its owned banded diagonal block
  once per GN iteration, ops/band_chol.cr_factorize, and applies it
  comm-free in log depth), and ``schwarz2`` (two-level: Schwarz plus a
  Galerkin coarse correction over per-block translation/rotation rigid
  modes — one (D, nc) psum per round). Schwarz cuts CG round counts
  roughly an order of magnitude, which is what matters on a real pod
  slice where each CG round costs two sequential ICI collectives —
  ``auto`` picks it whenever D > 1. The coarse level measured
  round-NEUTRAL on the bundled graphs (their conditioning is interface
  coupling, not global rigid modes), so ``auto`` does not pay its extra
  psum; it stays available for weakly-coupled many-block partitions;
- update: dx halo exchange (h values) + fully local manifold retraction
  of owned and halo node copies (identical arithmetic on both sides, so
  replicas never drift).

The entire GN/LM loop runs as ONE ``lax.while_loop`` inside the
shard_map'd program — a single XLA executable with zero host round-trips
between iterations (the distributed twin of mapping.pgo.make_optimize_jit).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from rustrobotics_tpu.geometry import se2, se3
from rustrobotics_tpu.mapping import linearize
from rustrobotics_tpu.mapping.assemble import PRIOR_WEIGHT, _quad_blocks
from rustrobotics_tpu.ops.band_chol import (
    cr_factorize,
    cr_invert,
    cr_substitute_inv,
)
from rustrobotics_tpu.parallel.block_layout import (
    BlockLayout,
    build_block_layout,
)


# ----------------------------------------------------------------- halos

def _halo_exchange(x, axis, D, ndof, h):
    """Owned (ndof,) vector -> ext (ndof + 2h,) with neighbor halos.

    Ring ppermutes move exactly h values per side, split into
    ceil(h/ndof) hops when the halo spans several chunks (tiny graphs on
    big meshes). Devices at the ring ends receive zeros — those ext slots
    correspond to dofs outside [0, n_pad) and are never referenced.
    """
    return _halo_only(x, axis, D, ndof, h).at[h:h + ndof].set(x)


def _halo_only(x, axis, D, ndof, h):
    """Like ``_halo_exchange`` but the OWNED slots stay zero: returns the
    (ndof + 2h,) vector holding only the neighbor-halo values. Used by
    the overlapped matvec — the interior product runs on the owned
    values while these ppermutes are in flight."""
    x_ext = jnp.zeros(ndof + 2 * h, x.dtype)
    if h == 0 or D == 1:
        return x_ext
    k_hops = -(-h // ndof)
    for k in range(1, k_hops + 1):
        lo = max(0, k * ndof - h)
        ln = ndof - lo
        if ln > 0:  # left halo, from device d-k
            recv = jax.lax.ppermute(
                x[lo:lo + ln], axis, [(i, i + k) for i in range(D - k)]
            )
            dst = h - k * ndof + lo
            x_ext = x_ext.at[dst:dst + ln].set(recv)
        rn = min(ndof, h - (k - 1) * ndof)
        if rn > 0:  # right halo, from device d+k
            recv = jax.lax.ppermute(
                x[:rn], axis, [(i + k, i) for i in range(D - k)]
            )
            dst = h + k * ndof
            x_ext = x_ext.at[dst:dst + rn].set(recv)
    return x_ext


def _halo_reduce(buf, axis, D, ndof, h, two_sided=False):
    """Ext-row buffer (ndof + 2h, ...) -> owned (ndof, ...) with the
    bottom-halo contributions ppermute-added to their owning device.
    Min-endpoint edge assignment writes only rows >= h, so the default
    reduction is one-sided; schur mode (pl edges assigned to the
    landmark's owner + clique fill) also writes TOP-halo rows owned by
    left neighbors — ``two_sided`` adds the mirrored reduction."""
    owned = buf[h:h + ndof]
    if h == 0 or D == 1:
        return owned
    k_hops = -(-h // ndof)
    for k in range(1, k_hops + 1):
        ln = min(ndof, h - (k - 1) * ndof)
        if ln <= 0:
            break
        chunk = buf[h + k * ndof: h + k * ndof + ln]
        recv = jax.lax.ppermute(
            chunk, axis, [(i, i + k) for i in range(D - k)]
        )
        owned = owned.at[:ln].add(recv)
        if two_sided:
            # my ext rows [lo_e, hi_e) belong to device d-k; it adds
            # them at the TAIL of its owned range
            lo_e = max(0, h - k * ndof)
            hi_e = max(0, h - (k - 1) * ndof)
            if hi_e > lo_e:
                chunk_t = buf[lo_e:hi_e]
                recv_t = jax.lax.ppermute(
                    chunk_t, axis, [(i + k, i) for i in range(D - k)]
                )
                dst = k * ndof - h + lo_e
                owned = owned.at[dst:dst + (hi_e - lo_e)].add(recv_t)
    return owned


# ------------------------------------------------------- local assembly

def _flat(hxx):
    """Entry-major flatten of a component (SoA) matrix: list of (E,)."""
    return [hxx[k][l] for k in range(len(hxx)) for l in range(len(hxx[0]))]


def _transpose_c(hxx):
    return [[hxx[k][l] for k in range(len(hxx))] for l in range(len(hxx[0]))]


def _em(blocks):
    """Entry-major flatten of (E, nr, nc) dense blocks."""
    return jnp.transpose(blocks, (1, 2, 0)).ravel()


def _local_values(st, ed, ndof, h, dtype, lam=0.0,
                  schur_pairs=None):
    """Per-device linearization: (vals (T,), b_ext (ndof+2h,), chi2,
    schur_state).

    Emission order MUST match block_layout's triplet construction:
    families [pp, pl, qq] (quadrants [ii, ij, ji, jj], entries k-major),
    plus — in schur mode — the landmark-clique fill products appended
    last (pl emits only its pose-diagonal ii quadrant there). Mirrors
    assemble.system_values (the single-device oracle).

    ``schur_pairs``: (pair_a, pair_b) observation-pair index lists
    enabling per-device Schur elimination of the 2D landmark blocks;
    ``lam`` enters the eliminated Hll (LM damping must be applied BEFORE
    the complement). schur_state = (w_dense (E,3,2), hll_inv (NL,2,2),
    gl (NL,2), off_i (E,), pl_lm (E,)) for back-substitution.
    """
    p2, l2, p3 = st
    (p2_dof, l2_dof, p3_dof,
     pp_from, pp_to, pp_z, pp_omega,
     pl_pose, pl_lm, pl_z, pl_omega,
     qq_from, qq_to, qq_z, qq_omega) = ed
    schur = schur_pairs is not None
    bvec = jnp.zeros(ndof + 2 * h, dtype)
    vals = []
    pair_vals = []
    chi2 = jnp.zeros((), dtype)
    schur_state = None

    # SE2-SE2
    with jax.default_matmul_precision("highest"):
        _, hii, hij, hjj, b_i, b_j, c2 = linearize.edge_terms_pp_soa(
            p2, pp_from, pp_to, pp_z, pp_omega
        )
    vals += (_flat(hii) + _flat(hij) + _flat(_transpose_c(hij))
             + _flat(hjj))
    off_i = p2_dof[pp_from]
    off_j = p2_dof[pp_to]
    for k in range(3):
        bvec = bvec.at[off_i + k].add(b_i[k]).at[off_j + k].add(b_j[k])
    chi2 = chi2 + jnp.sum(c2)

    # SE2-XY
    with jax.default_matmul_precision("highest"):
        _, hii, hij, hjj, b_i, b_j, c2 = linearize.edge_terms_pl_soa(
            p2, l2, pl_pose, pl_lm, pl_z, pl_omega
        )
    off_i = p2_dof[pl_pose]
    off_j = l2_dof[pl_lm]
    for k in range(3):
        bvec = bvec.at[off_i + k].add(b_i[k])
    chi2 = chi2 + jnp.sum(c2)
    if not schur:
        vals += (_flat(hii) + _flat(hij) + _flat(_transpose_c(hij))
                 + _flat(hjj))
        for k in range(2):
            bvec = bvec.at[off_j + k].add(b_j[k])
    else:
        # per-device Schur elimination of the 2D landmark blocks: only
        # the pose-diagonal ii quadrant enters H directly; the landmark
        # coupling returns as clique-fill products below
        vals += _flat(hii)
        nl = l2.shape[0]
        with jax.default_matmul_precision("highest"):
            w_dense = jnp.stack(
                [jnp.stack([hij[k][l] for l in range(2)], -1)
                 for k in range(3)], -2)                       # (E, 3, 2)
            hjj_dense = jnp.stack(
                [jnp.stack([hjj[k][l] for l in range(2)], -1)
                 for k in range(2)], -2)                       # (E, 2, 2)
            bj_dense = jnp.stack([b_j[0], b_j[1]], -1)         # (E, 2)
            hll = jnp.zeros((nl, 2, 2), dtype).at[pl_lm].add(hjj_dense)
            hll = hll + jnp.eye(2, dtype=dtype) * (lam + 1e-10)
            gl = jnp.zeros((nl, 2), dtype).at[pl_lm].add(bj_dense)
            hll_inv = jnp.linalg.inv(hll)
            a_e = jnp.einsum("eik,ekl->eil", w_dense, hll_inv[pl_lm])
            # reduced gradient: gp' = gp - sum_o A_o gl_l(o)
            corr = jnp.einsum("eik,ek->ei", a_e, gl[pl_lm])
            for k in range(3):
                bvec = bvec.at[off_i + k].add(-corr[:, k])
            pair_a, pair_b = schur_pairs
            prod = -jnp.einsum("qik,qjk->qij", a_e[pair_a],
                               w_dense[pair_b])                # (Q, 3, 3)
        pair_vals = [_em(prod)]
        schur_state = (w_dense, hll_inv, gl, off_i, pl_lm)

    # SE3-SE3
    e, a, b, c2 = linearize.edge_terms_qq(p3, qq_from, qq_to, qq_z, qq_omega)
    h_ii, h_ij, h_ji, h_jj, b_i, b_j = _quad_blocks(e, a, b, qq_omega)
    vals += [_em(h_ii), _em(h_ij), _em(h_ji), _em(h_jj)]
    off_i3 = p3_dof[qq_from]
    off_j3 = p3_dof[qq_to]
    idx_i = (off_i3[:, None] + jnp.arange(6)[None, :]).ravel()
    idx_j = (off_j3[:, None] + jnp.arange(6)[None, :]).ravel()
    bvec = bvec.at[idx_i].add(b_i.ravel()).at[idx_j].add(b_j.ravel())
    chi2 = chi2 + jnp.sum(c2)

    vals += pair_vals  # schur fill LAST (matches block_layout order)
    flat_vals = [v.ravel() for v in vals]
    return jnp.concatenate(flat_vals) if flat_vals else jnp.zeros(0, dtype), \
        bvec, chi2, schur_state


def _local_chi2(st, ed, dtype):
    """Residual-only chi2 of the local edge shard (for LM accept/reject)."""
    p2, l2, p3 = st
    (_, _, _, pp_from, pp_to, pp_z, pp_omega,
     pl_pose, pl_lm, pl_z, pl_omega,
     qq_from, qq_to, qq_z, qq_omega) = ed
    chi2 = jnp.zeros((), dtype)
    e = jax.vmap(linearize.residual_pp)(p2[pp_from], p2[pp_to], pp_z)
    chi2 = chi2 + jnp.einsum("ei,eij,ej->", e, pp_omega, e)
    e = jax.vmap(linearize.residual_pl)(p2[pl_pose], l2[pl_lm], pl_z)
    chi2 = chi2 + jnp.einsum("ei,eij,ej->", e, pl_omega, e)
    e = jax.vmap(linearize.residual_qq)(p3[qq_from], p3[qq_to], qq_z)
    chi2 = chi2 + jnp.einsum("ei,eij,ej->", e, qq_omega, e)
    return chi2


def _retract(st, dx_ext, p2_dof, l2_dof, p3_dof):
    """Manifold retraction of ALL local node copies (owned + halo) from
    the halo-exchanged dx. Halo copies see the same dx values as their
    owners, so replicas stay bit-identical."""
    p2, l2, p3 = st
    if p2.shape[0]:
        dp = dx_ext[p2_dof[:, None] + jnp.arange(3)[None, :]]
        p2 = se2.retract(p2, dp)
    if l2.shape[0]:
        dl = dx_ext[l2_dof[:, None] + jnp.arange(2)[None, :]]
        l2 = l2 + dl
    if p3.shape[0]:
        dp3 = dx_ext[p3_dof[:, None] + jnp.arange(6)[None, :]]
        p3 = se3.retract(p3, dp3)
    return (p2, l2, p3)


# ------------------------------------------------------------ optimizer

_STATE_FIELDS = ("p2_state0", "l2_state0", "p3_state0")
_EDGE_FIELDS = (
    "p2_dof", "l2_dof", "p3_dof",
    "pp_from", "pp_to", "pp_z", "pp_omega",
    "pl_pose", "pl_lm", "pl_z", "pl_omega",
    "qq_from", "qq_to", "qq_z", "qq_omega",
)
_MAP_FIELDS = (
    "ell_order", "ell_seg", "ell_pos", "nbr", "diag_pos",
    "pad_diag", "prior_diag", "dof_block", "dof_pos",
    "blk_idx", "blk_mask", "pad_eye", "band_idx", "band_mask",
    "pair_a", "pair_b", "lm_ind",
)


@dataclasses.dataclass(frozen=True)
class _Dims:
    """Static kernel dimensions shared by the per-device functions."""
    axis: str
    D: int
    ndof: int
    h: int
    W: int
    nseg: int
    nb: int         # block-Jacobi blocks
    kb_loc: int     # Schwarz local band
    nb_loc: int
    precond: str
    prior_weight: float
    cg_tol: float
    maxiter: int
    dtype: object
    band_pad: object  # (nb_loc, kb_loc, 2kb_loc) np identity pad rows
    schur: bool = False
    rep: str | None = None  # replica axis name on a 2-D mesh
    nc: int = 3  # coarse-space columns per block (schwarz2): max node dof
    cg_variant: str = "single"  # "single" (1 psum/round) | "classic" (2)


def _dims_from(layout, precond, prior_weight, cg_tol, cg_maxiter, dtype,
               mesh, cg_variant: str = "auto"):
    if precond == "auto":
        # Schwarz on a real multi-device mesh: each CG round costs two
        # sequential collectives, and the local banded factor cuts round
        # counts ~10x (docs/PERFORMANCE.md). Jacobi on one device, where
        # rounds are cheap and the factorization isn't amortized.
        # NOT schwarz2: the rigid-mode coarse correction measured
        # round-neutral on the bundled graphs (intel D=8: 534 -> 531
        # rounds/GN) — their bottleneck is interface coupling, not
        # global modes — so the extra psum/round isn't paid by default.
        precond = "schwarz" if layout.num_devices > 1 else "jacobi"
    if precond == "schwarz2" and (layout.h > layout.ndof
                                  or layout.num_devices == 1):
        # the Galerkin coarse build splits each block's halo coupling
        # into exactly one left + one right neighbor; a halo wider than
        # the owned chunk (k_hops > 1) reaches d±2 blocks and would
        # scatter couplings into the wrong A_c entries. Tiny/narrow
        # partitions don't need a coarse space — drop to plain Schwarz.
        precond = "schwarz"
    if cg_variant == "auto":
        # single-reduction (Chronopoulos-Gear) CG: the two per-round dot
        # psums fuse into ONE, cutting the sequential collective chain
        # per CG round from 3 to 2 (halo ppermute + 1 psum). On a
        # latency-bound ICI ring that is a third of the round's wire
        # time for the cost of one extra AXPY per round. Golden parity
        # tests pin both variants; "classic" stays for A/B measurement.
        cg_variant = "single"
    assert cg_variant in ("single", "classic"), cg_variant
    # on a 2-D (replica x blocks) mesh every collective stays on the
    # LAST (blocks) axis; the replica axis never sees per-CG traffic
    return _Dims(
        axis=mesh.axis_names[-1], D=layout.num_devices, ndof=layout.ndof,
        h=layout.h, W=layout.ell_width, nseg=layout.n_segments,
        nb=layout.n_blocks, kb_loc=layout.kb_loc, nb_loc=layout.nb_loc,
        precond=precond, prior_weight=prior_weight, cg_tol=cg_tol,
        maxiter=(cg_maxiter if cg_maxiter is not None
                 else 2 * layout.n_pad),
        dtype=dtype, band_pad=layout.band_pad, schur=layout.schur,
        rep=(mesh.axis_names[0] if len(mesh.axis_names) == 2 else None),
        nc=(int(layout.dof_pos.max()) + 1 if layout.dof_pos.size else 3),
        cg_variant=cg_variant,
    )


def _uniform_over_replicas(dm: _Dims, go):
    """Loop-continuation flag made identical ACROSS replica rows.

    Data-dependent while_loops (CG rounds, GN convergence) execute
    collectives on the blocks axis; if replica rows disagreed on trip
    counts, one row would stop issuing collectives while another
    continues — a cross-row rendezvous deadlock on backends whose
    collective runtime synchronizes all local devices. A pmax over the
    replica axis makes every row run until the LAST row converges
    (converged rows burn a few harmless extra rounds)."""
    if dm.rep is None:
        return go
    return jax.lax.pmax(go.astype(jnp.int32), dm.rep) > 0


def _assemble(dm: _Dims, maps, edges, st, lam):
    """Linearize + scatter + halo-reduce + diag adds + preconditioner.

    Returns (tbl (ndof, W), b (ndof,), chi2_global, precond_state,
    schur_state).
    """
    (ell_order, ell_seg, ell_pos, nbr, diag_pos, pad_diag,
     prior_diag, dof_block, dof_pos, blk_idx, blk_mask,
     pad_eye, band_idx, band_mask, pair_a, pair_b, lm_ind) = maps
    ndof, h, W, dtype = dm.ndof, dm.h, dm.W, dm.dtype

    vals, b_ext, chi2_loc, schur_state = _local_values(
        st, edges, ndof, h, dtype, lam=lam,
        schur_pairs=(pair_a, pair_b) if dm.schur else None)
    seg_vals = jax.ops.segment_sum(
        vals[ell_order], ell_seg, num_segments=dm.nseg)
    flat = jnp.zeros((ndof + 2 * h) * W + 1, dtype)
    flat = flat.at[ell_pos].add(seg_vals)
    tbl_ext = flat[:-1].reshape(ndof + 2 * h, W)
    tbl = _halo_reduce(tbl_ext, dm.axis, dm.D, ndof, h,
                       two_sided=dm.schur)
    b = _halo_reduce(b_ext[:, None], dm.axis, dm.D, ndof, h,
                     two_sided=dm.schur)[:, 0]
    # diagonal additions: LM damping + unit pad + gauge prior; schur
    # mode gives eliminated landmark rows an identity diagonal instead
    # of damping (their dx comes from back-substitution, CG keeps 0)
    extra = (lam * (1.0 - lm_ind) + lm_ind + pad_diag
             + dm.prior_weight * prior_diag)
    tbl_flat = tbl.reshape(-1).at[diag_pos].add(extra)
    tbl = tbl_flat.reshape(ndof, W)
    chi2 = jax.lax.psum(chi2_loc, dm.axis)

    if dm.precond == "jacobi":
        blocks = jnp.where(blk_mask, tbl_flat[blk_idx], 0.0) + pad_eye
        with jax.default_matmul_precision("highest"):
            binv = jnp.linalg.inv(blocks)
        pstate = (binv,)
    else:  # additive Schwarz: local banded Cholesky of the owned block
        kb, nbl = dm.kb_loc, dm.nb_loc
        npad_loc = nbl * kb
        d_own = tbl_flat[diag_pos]
        dinv = jax.lax.rsqrt(jnp.clip(d_own, 1e-12, None))
        dinv_pad = jnp.concatenate(
            [dinv, jnp.ones(npad_loc - ndof, dtype)])
        r_blocks = jnp.where(band_mask, tbl_flat[band_idx], 0.0) \
            + jnp.asarray(dm.band_pad, dtype)
        row_scale = dinv_pad.reshape(nbl, kb)
        dinv_ext = jnp.concatenate([jnp.zeros(kb, dtype), dinv_pad])
        col_scale = jnp.concatenate(
            [dinv_ext[:npad_loc].reshape(nbl, kb),
             dinv_ext[kb:].reshape(nbl, kb)], axis=1)
        r_blocks = r_blocks * row_scale[:, :, None] * col_scale[:, None, :]
        # cyclic-reduction local factorization: log-depth batched MXU
        # stages instead of an nb_loc-long sequential chain. The factors
        # are inverted ONCE here (cr_invert) so every per-CG-round
        # application is pure batched GEMMs — no triangular solves on
        # the round's critical path (preconditioner-grade rounding).
        with jax.default_matmul_precision("highest"):
            levels, f_root = cr_factorize(r_blocks)
            inv_levels, root_inv = cr_invert(levels, f_root)
        pstate = (inv_levels, root_inv, dinv)
        if dm.precond == "schwarz2":
            pstate = pstate + _coarse_state(dm, maps, tbl, st, edges)
    return tbl, b, chi2, pstate, schur_state


def _coarse_basis(dm: _Dims, maps, st, edges):
    """Per-device coarse basis R (ndof, nc [+1]): column c is the
    indicator of component c (dof_pos) on this block's REAL dofs —
    the per-block translation / per-component constant modes — plus,
    on SE2 graphs, the block's RIGID-ROTATION mode about its centroid
    evaluated at the current linearization point (x-dof: -(py - cy),
    y-dof: px - cx, th-dof: 1; same for landmarks without th). Rotations
    are the dominant slow modes of SLAM graphs; block-local solves
    cannot damp either family. Padded dofs and (in Schur mode)
    eliminated landmark rows are masked out so the correction never
    writes rows CG holds at zero. Columns are locally normalized for
    A_c conditioning (span unchanged)."""
    pad_diag, dof_pos, lm_ind = maps[5], maps[8], maps[16]
    real = 1.0 - pad_diag
    if dm.schur:
        real = real * (1.0 - lm_ind)
    real = real.astype(dm.dtype)
    comp = (jnp.arange(dm.nc, dtype=jnp.int32)[None, :]
            == dof_pos[:, None])
    r = comp.astype(dm.dtype) * real[:, None]
    if dm.nc == 3:  # SE2-only graph: append the rigid-rotation column
        p2, l2, _ = st
        p2_dof, l2_dof = edges[0], edges[1]
        ndof, h = dm.ndof, dm.h
        col = jnp.zeros(ndof + 1, dm.dtype)   # extra slot: halo dump
        nodes = jnp.zeros(ndof + 1, dm.dtype)

        def scat(col, nodes, dof_ext, xy, nd):
            off = dof_ext - h                  # ext -> owned indexing
            ok = (off >= 0) & (off < ndof)     # nodes live wholly in/out
            base = jnp.where(ok, off, ndof)    # halo nodes -> dump slot
            val = jnp.where(ok, 1.0, 0.0).astype(dm.dtype)
            nodes = nodes.at[base].add(val)
            col = col.at[base].add(jnp.where(ok, -xy[:, 1], 0.0))
            col = col.at[jnp.minimum(base + 1, ndof)].add(
                jnp.where(ok, xy[:, 0], 0.0))
            if nd == 3:
                col = col.at[jnp.minimum(base + 2, ndof)].add(val)
            return col, nodes

        if p2.shape[0]:
            col, nodes = scat(col, nodes, p2_dof, p2[:, :2], 3)
        if l2.shape[0]:
            col, nodes = scat(col, nodes, l2_dof, l2[:, :2], 2)
        col, cnt = col[:ndof], jnp.maximum(nodes[:ndof].sum(), 1.0)
        # subtract the block centroid: rot col = (-(py-cy), px-cx, 1);
        # x rows of col hold -py and y rows hold px, so the centroid is
        # recoverable from the masked constant columns already in r
        cy = -jnp.sum(col * r[:, 0]) / cnt
        cx = jnp.sum(col * r[:, 1]) / cnt
        col = (col + cy * r[:, 0] - cx * r[:, 1]) * real
        norm = jnp.maximum(jnp.linalg.norm(col), 1.0)
        r = jnp.concatenate([r, (col / norm)[:, None]], axis=1)
    return r


def _coarse_state(dm: _Dims, maps, tbl, st, edges):
    """Galerkin coarse operator A_c = Rᵀ A R over the (D, nc) block-
    diagonal basis, built from the assembled band table: for each basis
    column, one halo exchange + three masked band matvecs split the
    row's contribution by source block (own / left / right neighbor), so
    the (D·nc)² matrix keeps its block-tridiagonal structure exactly.
    psum'd to every device and inverted once per GN iteration (≤ 48²
    at D=8) — per CG round the correction costs one (D, nc)-float psum
    and two small GEMVs."""
    nbr = maps[3]
    ndof, h, dtype = dm.ndof, dm.h, dm.dtype
    R = _coarse_basis(dm, maps, st, edges)
    nc = R.shape[1]
    d = jax.lax.axis_index(dm.axis)

    def mv(x_ext):
        return jnp.sum(tbl * x_ext[nbr], axis=1)

    ent = []  # nc' columns x (left, own, right) x (nc,) row dots
    with jax.default_matmul_precision("highest"):
        for c in range(nc):
            halo = _halo_only(R[:, c], dm.axis, dm.D, ndof, h)
            own_ext = jnp.zeros(ndof + 2 * h, dtype).at[
                h:h + ndof].set(R[:, c])
            left_ext = halo.at[h:].set(0.0)
            right_ext = halo.at[:h + ndof].set(0.0)
            ent.append(jnp.stack(
                [R.T @ mv(left_ext), R.T @ mv(own_ext),
                 R.T @ mv(right_ext)], axis=0))  # (3, nc rows)
    # ent[c'][which, c] -> A_c[(d, c), (d + which - 1, c')]
    blocks = jnp.stack(ent, axis=-1)  # (3, nc rows c, nc cols c')
    rows = d * nc + jnp.arange(nc)
    ac = jnp.zeros((dm.D * nc, dm.D * nc), dtype)
    for which in range(3):
        cols = ((d + which - 1) % dm.D) * nc + jnp.arange(nc)
        ac = ac.at[rows[:, None], cols[None, :]].add(blocks[which])
    ac = jax.lax.psum(ac, dm.axis)
    # ridge keeps absent components (zero columns) harmlessly invertible
    eye = jnp.eye(dm.D * nc, dtype=dtype)
    ridge = 1e-8 * jnp.trace(ac) / (dm.D * nc) + 1e-30
    with jax.default_matmul_precision("highest"):
        ac_inv = jnp.linalg.inv(ac + ridge * eye)
    return (R, ac_inv)


def _make_precond(dm: _Dims, maps, pstate):
    dof_block, dof_pos = maps[7], maps[8]
    if dm.precond == "jacobi":
        (binv,) = pstate

        def precond(r):
            rb = jnp.zeros((dm.nb, 6), dm.dtype).at[
                dof_block, dof_pos].set(r)
            yb = jnp.einsum("kij,kj->ki", binv, rb,
                            precision=jax.lax.Precision.HIGHEST)
            return yb[dof_block, dof_pos]
    else:
        inv_levels, root_inv, dinv = pstate[:3]
        coarse = pstate[3:] if dm.precond == "schwarz2" else None
        kb, nbl = dm.kb_loc, dm.nb_loc
        npad_loc = nbl * kb

        def local_solve(r):
            rp = (r * dinv)
            rp = jnp.concatenate(
                [rp, jnp.zeros(npad_loc - dm.ndof, dm.dtype)]
            ).reshape(nbl, kb)
            with jax.default_matmul_precision("highest"):
                xs = cr_substitute_inv(inv_levels, root_inv, rp)
            return xs.reshape(-1)[:dm.ndof] * dinv

        if coarse is None:
            precond = local_solve
        else:
            R, ac_inv = coarse
            nc = R.shape[1]

            def precond(r):
                # additive two-level: local subdomain solve + Galerkin
                # coarse correction (one (D, nc) psum + two small GEMVs)
                z = local_solve(r)
                d = jax.lax.axis_index(dm.axis)
                with jax.default_matmul_precision("highest"):
                    rc = R.T @ r
                    rc_all = jax.lax.psum(
                        jnp.zeros((dm.D, nc), dm.dtype).at[d].set(rc),
                        dm.axis).reshape(-1)
                    y = ac_inv @ rc_all
                    yd = jax.lax.dynamic_slice(y, (d * nc,), (nc,))
                    return z + R @ yd
    return precond


def _schur_backsub(dm: _Dims, sstate, l2_dof, dx, dx_ext):
    """Local landmark back-substitution: dx_l = -Hll^-1 (gl + W^T dx_p).

    Landmark dofs are device-owned, so the recovered dx_l is ADDED into
    the owned dx (CG left those slots at 0) and into this device's ext
    view; no second halo exchange is needed (no other device reads a
    foreign landmark's dx). Halo/pad landmark rows have gl = 0 and no
    edges, hence dx_l = 0 — scatter-add keeps them harmless."""
    w_dense, hll_inv, gl, off_i, pl_lm = sstate
    dxp_e = dx_ext[off_i[:, None] + jnp.arange(3)[None, :]]  # (E, 3)
    with jax.default_matmul_precision("highest"):
        wt_dx = jnp.zeros_like(gl).at[pl_lm].add(
            jnp.einsum("eik,ei->ek", w_dense, dxp_e))
        dx_l = -jnp.einsum("lij,lj->li", hll_inv, gl + wt_dx)  # (NL, 2)
    own_pos = jnp.clip(l2_dof - dm.h, 0, dm.ndof - 2)
    # halo lm rows resolve to clipped positions with dx_l = 0: no-ops
    for k in range(2):
        dx = dx.at[own_pos + k].add(dx_l[:, k])
        dx_ext = dx_ext.at[l2_dof + k].add(dx_l[:, k])
    return dx, dx_ext


def _pcg(dm: _Dims, tbl, nbr, precond, b, eta=None, bb=None):
    """Distributed preconditioned CG: halo-exchange matvec + psum dots.

    ``eta`` (optional traced scalar) overrides the static relative
    tolerance — the hook for Eisenstat-Walker adaptive forcing; ``bb``
    passes a pre-computed psum of |b|^2 so the forcing caller pays no
    second reduction.

    When the halo is SMALL relative to the owned chunk (2h <= ndof/4)
    the matvec is OVERLAPPED: the full product runs on the owned values
    (zeroed halos) while the halo ppermutes are in flight; only the
    2h boundary rows then receive halo corrections. The interior compute
    and the collectives have no data dependence, so XLA's scheduler can
    run them concurrently — on a real pod slice this hides most of the
    per-round ICI latency at a (2h/ndof) extra-work cost. When the halo
    is wide (dlr at D=8: 2h ~ 0.9 ndof) the corrections would nearly
    DOUBLE every CG round — measured 2.8x per-GN-iteration on the CPU
    mesh — so the plain exchange-then-multiply matvec is used instead.
    """
    ndof, h = dm.ndof, dm.h
    overlap = dm.D > 1 and h > 0 and 8 * h <= ndof

    def matvec(x):
        if not overlap:
            x_ext = _halo_exchange(x, dm.axis, dm.D, ndof, h)
            return jnp.sum(tbl * x_ext[nbr], axis=1)
        x_own = jnp.zeros(ndof + 2 * h, x.dtype).at[h:h + ndof].set(x)
        x_halo = _halo_only(x, dm.axis, dm.D, ndof, h)   # in flight ...
        y = jnp.sum(tbl * x_own[nbr], axis=1)            # ... meanwhile
        corr_lo = jnp.sum(tbl[:h] * x_halo[nbr[:h]], axis=1)
        corr_hi = jnp.sum(tbl[ndof - h:] * x_halo[nbr[ndof - h:]], axis=1)
        return y.at[:h].add(corr_lo).at[ndof - h:].add(corr_hi)

    x0 = jnp.zeros_like(b)
    z0 = precond(b)
    if dm.cg_variant == "single":
        return _pcg_single(dm, matvec, precond, b, x0, z0, eta, bb)

    if bb is None:
        d0 = jax.lax.psum(jnp.stack([jnp.vdot(b, z0), jnp.vdot(b, b)]),
                          dm.axis)
        rz0, bb = d0[0], d0[1]
    else:  # caller already psum'd |b|^2 (adaptive forcing)
        rz0 = jax.lax.psum(jnp.vdot(b, z0), dm.axis)
    tol = dm.cg_tol if eta is None else eta
    atol2 = (tol * tol) * bb

    def cond(s):
        return _uniform_over_replicas(
            dm, jnp.logical_and(s[6] < dm.maxiter, s[5] > atol2))

    def step(s):
        x, r, z, p, rz, rr, k = s
        # on a replicated mesh, rows that already converged keep looping
        # (uniform trip counts) but FREEZE their state: the collectives
        # still execute, the results are discarded
        done = rr <= atol2
        ap = matvec(p)
        pap = jax.lax.psum(jnp.vdot(p, ap), dm.axis)
        alpha = rz / pap
        x2 = x + alpha * p
        r2 = r - alpha * ap
        z2 = precond(r2)
        d = jax.lax.psum(jnp.stack([jnp.vdot(r2, z2), jnp.vdot(r2, r2)]),
                         dm.axis)
        beta = d[0] / rz
        p2 = z2 + beta * p
        if dm.rep is not None:
            keep = lambda new, old: jnp.where(done, old, new)  # noqa: E731
            x2, r2, z2, p2 = (keep(x2, x), keep(r2, r), keep(z2, z),
                              keep(p2, p))
            rz2, rr2 = keep(d[0], rz), keep(d[1], rr)
            return (x2, r2, z2, p2, rz2, rr2, k + 1)
        return (x2, r2, z2, p2, d[0], d[1], k + 1)

    s0 = (x0, b, z0, z0, rz0, bb, jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, step, s0)
    return out[0], out[6]


def _pcg_single(dm: _Dims, matvec, precond, b, x0, z0, eta, bb):
    """Single-reduction PCG (Chronopoulos & Gear 1989).

    Classic PCG pays two sequentially-dependent scalar reductions per
    round — (p, Ap) before the state update and (r, z) after — so a CG
    round on a pod slice is a 3-deep collective chain (halo ppermute,
    psum, psum). Recurring s_k = A p_k alongside p_k moves the matvec to
    the preconditioned residual z and lets ALL three dots of a round —
    (r, z), (Az, z), (r, r) — ride ONE fused psum:

        x+ = x + alpha p        r+ = r - alpha s
        z+ = M^-1 r+            w+ = A z+
        [gamma+, delta+, rr+] = psum([(r+,z+), (w+,z+), (r+,r+)])
        beta+  = gamma+ / gamma
        alpha+ = gamma+ / (delta+ - beta+ gamma+ / alpha)
        p+ = z+ + beta+ p       s+ = w+ + beta+ s

    Mathematically identical to classic CG in exact arithmetic (same
    Krylov iterates); the recurrences trade one extra AXPY per round for
    a collective. f64 drift over the round counts the preconditioners
    produce (tens with Schwarz, thousands with Jacobi) stays below the
    golden-parity tolerance — pinned by tests/test_blocks.py both ways.
    """
    w0 = matvec(z0)
    if bb is None:
        d0 = jax.lax.psum(
            jnp.stack([jnp.vdot(b, z0), jnp.vdot(w0, z0),
                       jnp.vdot(b, b)]), dm.axis)
        rz0, wz0, bb = d0[0], d0[1], d0[2]
    else:  # caller already psum'd |b|^2 (adaptive forcing)
        d0 = jax.lax.psum(
            jnp.stack([jnp.vdot(b, z0), jnp.vdot(w0, z0)]), dm.axis)
        rz0, wz0 = d0[0], d0[1]
    tol = dm.cg_tol if eta is None else eta
    atol2 = (tol * tol) * bb
    alpha0 = rz0 / wz0

    def cond(s):
        return _uniform_over_replicas(
            dm, jnp.logical_and(s[8] < dm.maxiter, s[7] > atol2))

    def step(s):
        x, r, z, p, sv, rz, alpha, rr, k = s
        done = rr <= atol2
        x2 = x + alpha * p
        r2 = r - alpha * sv
        z2 = precond(r2)
        w2 = matvec(z2)
        d = jax.lax.psum(
            jnp.stack([jnp.vdot(r2, z2), jnp.vdot(w2, z2),
                       jnp.vdot(r2, r2)]), dm.axis)
        beta = d[0] / rz
        alpha2 = d[0] / (d[1] - beta * d[0] / alpha)
        p2 = z2 + beta * p
        s2 = w2 + beta * sv
        if dm.rep is not None:
            keep = lambda new, old: jnp.where(done, old, new)  # noqa: E731
            x2, r2, z2, p2, s2 = (keep(x2, x), keep(r2, r), keep(z2, z),
                                  keep(p2, p), keep(s2, sv))
            rz2, al2, rr2 = keep(d[0], rz), keep(alpha2, alpha), keep(d[2], rr)
            return (x2, r2, z2, p2, s2, rz2, al2, rr2, k + 1)
        return (x2, r2, z2, p2, s2, d[0], alpha2, d[2], k + 1)

    s0 = (x0, b, z0, z0, w0, rz0, alpha0, bb, jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, step, s0)
    return out[0], out[8]


def layout_device_arrays(layout: BlockLayout, dtype):
    """The stacked (D, ...) arrays consumed by the kernels, as jnp with
    float fields cast to ``dtype``: (state, edges, maps) tuples."""
    f = np.float64

    def cast(name):
        arr = getattr(layout, name)
        return jnp.asarray(arr.astype(dtype) if arr.dtype == f else arr)

    state = tuple(cast(n) for n in _STATE_FIELDS)
    edges = tuple(cast(n) for n in _EDGE_FIELDS)
    maps = tuple(cast(n) for n in _MAP_FIELDS)
    return state, edges, maps


def make_block_optimize(
    mesh,
    layout: BlockLayout,
    num_iterations: int = 50,
    solver: str = "gauss_newton",
    tolerance: float = 1e-4,
    prior_weight: float = PRIOR_WEIGHT,
    cg_tol: float = 1e-10,
    cg_maxiter: int | None = None,
    precond: str = "auto",
    dtype=jnp.float64,
    cg_forcing: str = "fixed",
    cg_variant: str = "auto",
):
    """Build the fully-jitted distributed optimizer.

    ``cg_forcing`` selects the inexact-Newton forcing policy (cg_tol
    becomes the tolerance FLOOR in the adaptive modes); measured on
    intel at D=8 / schwarz / 12 GN iterations (docs/PERFORMANCE.md):

    - ``"fixed"`` (default): the static cg_tol every round — what the
      golden parity tests pin. 534 rounds/GN.
    - ``"ew"``: Eisenstat-Walker choice 2 — per-iteration tolerance
      0.9·(|b_k|/|b_{k-1}|)², capped by (|b_k|/|b_0|)^(1/2) so the
      trace still reaches the exact optimum. 2545 rounds total (2.5x
      fewer collectives), final χ² bit-comparable to fixed.
    - ``"ew-fast"``: no absolute cap — 475 rounds total (11x fewer),
      converges into the reference's ±1 golden band (intel: 360.41 vs
      360.00) but plateaus at the loose-solve resolution.

    The adaptive modes assume a trustworthy linearization (odometry or
    chordal initialization, online refinement): on a strongly nonlinear
    cold start the loose early directions wander (simulation-pose-pose
    raw init: ew still descending after 40 iterations). With chordal
    init that graph gives ew-fast 1083 vs fixed 4853 rounds, both in
    the golden band — pair the forcing with an initializer.

    ``cg_variant`` picks the CG communication pattern: ``"single"``
    (default via ``"auto"``) is Chronopoulos-Gear single-reduction CG —
    one fused psum per round instead of classic CG's two sequential
    ones, shrinking the per-round collective chain from 3 to 2 on the
    blocks axis; ``"classic"`` keeps the textbook two-reduction loop
    for A/B measurement. Same Krylov iterates in exact arithmetic.

    Returns ``run(state, edges, maps) -> (state', errors, iters,
    cg_rounds)`` where the tuples come from ``layout_device_arrays``.
    ``errors`` follows the reference trace layout
    (mapping.pgo.make_optimize_jit semantics).

    On a 2-D ``make_mesh_2d`` (replica x blocks) mesh the state tuple
    carries a leading replica axis (R, D, ...): R independent
    optimizations (multi-start initializations) run simultaneously, each
    sharded over the blocks axis; edges/maps stay (D, ...) and replicate
    across replicas. Outputs gain a leading R axis.
    """
    axes = mesh.axis_names
    replicated = len(axes) == 2
    if replicated:
        assert mesh.devices.shape[-1] == layout.num_devices
    else:
        assert mesh.devices.size == layout.num_devices
    dm = _dims_from(layout, precond, prior_weight, cg_tol, cg_maxiter,
                    dtype, mesh, cg_variant=cg_variant)
    lm = solver in ("lm", "levenberg_marquardt")
    ew = cg_forcing in ("ew", "adaptive", "ew-fast")
    ew_cap = cg_forcing != "ew-fast"

    def unstack(tree):
        return jax.tree.map(lambda a: a[0], tree)

    def unstack_state(tree):
        return jax.tree.map(lambda a: a[0][0] if replicated else a[0],
                            tree)

    def body(state, edges, maps):
        st0 = unstack_state(state)
        edges_l = unstack(edges)
        maps_l = unstack(maps)
        nbr = maps_l[3]
        p2_dof, l2_dof, p3_dof = edges_l[0], edges_l[1], edges_l[2]

        def do_step(st, lam, bb_prev, bb0):
            tbl, b, chi2, pstate, sstate = _assemble(
                dm, maps_l, edges_l, st, lam)
            precond_fn = _make_precond(dm, maps_l, pstate)
            if ew:
                bb = jax.lax.psum(jnp.vdot(b, b), dm.axis)
                bb0 = jnp.where(jnp.isfinite(bb0), bb0, bb)
                # Eisenstat-Walker choice 2 (gamma=0.9, alpha=2): the
                # CG tolerance tracks GN progress — loose while far
                # from the optimum (where an exact Newton direction is
                # wasted), tightening as the gradient norm falls. The
                # squared-norm ratio IS the alpha=2 forcing term. A
                # second cap — the gradient norm relative to ITS INITIAL
                # value — breaks the loose-solve limit cycle near the
                # optimum (ratio ~1 there, but |b|/|b_0| is tiny), so
                # the trace still converges to the exact optimum.
                tiny = jnp.asarray(1e-300, dtype)
                ratio = jnp.where(
                    jnp.isfinite(bb_prev),
                    bb / jnp.maximum(bb_prev, tiny),
                    jnp.asarray(1.0, dtype))
                eta = 0.9 * ratio
                if ew_cap:  # "ew": (|b|/|b0|)^(1/2) on norms, exponent
                    # 1/4 on bb — gentle enough to keep the early savings
                    eta = jnp.minimum(
                        eta, jnp.sqrt(jnp.sqrt(
                            bb / jnp.maximum(bb0, tiny))))
                eta = jnp.clip(eta, dm.cg_tol, 0.1)
                dx, cg_k = _pcg(dm, tbl, nbr, precond_fn, -b,
                                eta=eta, bb=bb)  # rhs neg (rs:361)
            else:
                bb = bb_prev
                dx, cg_k = _pcg(dm, tbl, nbr, precond_fn, -b)  # (rs:361)
            dx_ext = _halo_exchange(dx, dm.axis, dm.D, dm.ndof, dm.h)
            if dm.schur:
                dx, dx_ext = _schur_backsub(dm, sstate, l2_dof, dx,
                                            dx_ext)
            new_st = _retract(st, dx_ext, p2_dof, l2_dof, p3_dof)
            norm2 = jax.lax.psum(jnp.vdot(dx, dx), dm.axis)
            return new_st, norm2, chi2, cg_k, bb, bb0

        def chi2_of(st):
            return jax.lax.psum(_local_chi2(st, edges_l, dtype), dm.axis)

        def cond_loop(s):
            _, _, _, it, norm_dx, _, _, _, _ = s
            return _uniform_over_replicas(dm, jnp.logical_and(
                it < num_iterations,
                jnp.logical_not(norm_dx < tolerance)))

        def step_gn(s):
            st, lam, last, it, _, errors, cg_total, bb_prev, bb0 = s
            new_st, norm2, chi2, cg_k, bb, bb0 = do_step(
                st, jnp.asarray(0.0, dtype), bb_prev, bb0)
            errors = errors.at[it].set(chi2)
            return (new_st, lam, chi2, it + 1, jnp.sqrt(norm2), errors,
                    cg_total + cg_k, bb, bb0)

        def step_lm(s):
            st, lam, last, it, _, errors, cg_total, bb_prev, bb0 = s
            new_st, norm2, chi2, cg_k, bb, bb0 = do_step(
                st, lam, bb_prev, bb0)
            error = chi2_of(new_st)
            reject = jnp.logical_not(error <= last)
            kept = jax.tree.map(
                lambda a, b_: jnp.where(reject, a, b_), st, new_st)
            lam = jnp.where(reject, lam * 2.0, lam / 2.0)
            errors = errors.at[it + 1].set(error)
            new_last = jnp.where(jnp.isnan(error), last, error)
            return (kept, lam, new_last, it + 1, jnp.sqrt(norm2), errors,
                    cg_total + cg_k, bb, bb0)

        errors = jnp.full(num_iterations + 1, jnp.nan, dtype)
        if lm:
            errors = errors.at[0].set(chi2_of(st0))
        s0 = (
            st0,
            jnp.asarray(0.01, dtype),
            errors[0] if lm else jnp.asarray(jnp.inf, dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(jnp.inf, dtype),
            errors,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(jnp.inf, dtype),  # bb_prev (adaptive forcing)
            jnp.asarray(jnp.inf, dtype),  # bb0 (forcing absolute cap)
        )
        st, _, _, it, _, errors, cg_total, _, _ = jax.lax.while_loop(
            cond_loop, step_lm if lm else step_gn, s0)
        if not lm:
            errors = errors.at[it].set(chi2_of(st))
        # restack the leading device (and replica) axes for the out_specs
        if replicated:
            st = jax.tree.map(lambda a: a[None, None], st)
            return (st, errors[None], it[None], cg_total[None])
        st = jax.tree.map(lambda a: a[None], st)
        return st, errors, it, cg_total

    axis = dm.axis
    if replicated:
        rep = axes[0]
        spec_state = tuple(P(rep, axis) for _ in _STATE_FIELDS)
        spec_edges = tuple(P(axis) for _ in _EDGE_FIELDS)
        spec_maps = tuple(P(axis) for _ in _MAP_FIELDS)
        out_specs = (spec_state[:3], P(rep), P(rep), P(rep))
    else:
        spec_state = tuple(P(axis) for _ in _STATE_FIELDS)
        spec_edges = tuple(P(axis) for _ in _EDGE_FIELDS)
        spec_maps = tuple(P(axis) for _ in _MAP_FIELDS)
        out_specs = (spec_state[:3], P(), P(), P())
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(spec_state, spec_edges, spec_maps),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)


def make_block_step(
    mesh,
    layout: BlockLayout,
    prior_weight: float = PRIOR_WEIGHT,
    cg_tol: float = 1e-12,
    cg_maxiter: int | None = None,
    precond: str = "auto",
    dtype=jnp.float64,
    cg_variant: str = "auto",
):
    """One distributed GN step for oracle tests: returns jitted
    ``solve(state, edges, maps, lam) -> (dx (D, ndof), chi2)`` with dx in
    the PADDED global layout (use layout.padded_to_ref to compare)."""
    dm = _dims_from(layout, precond, prior_weight, cg_tol, cg_maxiter,
                    dtype, mesh, cg_variant=cg_variant)

    def unstack(tree):
        return jax.tree.map(lambda a: a[0], tree)

    def body(state, edges, maps, lam):
        st = unstack(state)
        edges_l = unstack(edges)
        maps_l = unstack(maps)
        nbr = maps_l[3]
        tbl, b, chi2, pstate, sstate = _assemble(
            dm, maps_l, edges_l, st, lam)
        precond_fn = _make_precond(dm, maps_l, pstate)
        dx, _ = _pcg(dm, tbl, nbr, precond_fn, -b)
        if dm.schur:
            dx_ext = _halo_exchange(dx, dm.axis, dm.D, dm.ndof, dm.h)
            dx, _ = _schur_backsub(dm, sstate, edges_l[1], dx, dx_ext)
        return dx[None], chi2

    axis = dm.axis
    spec_state = tuple(P(axis) for _ in _STATE_FIELDS)
    spec_edges = tuple(P(axis) for _ in _EDGE_FIELDS)
    spec_maps = tuple(P(axis) for _ in _MAP_FIELDS)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(spec_state, spec_edges, spec_maps, P()),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


# -------------------------------------------------------- conveniences

def extract_graph(layout: BlockLayout, graph, state):
    """Owned node rows (stacked (D, ...)) -> PoseGraphData in the
    original node order."""
    p2, l2, p3 = (np.asarray(s) for s in state)
    poses2 = np.asarray(graph.poses2).copy()
    landmarks2 = np.asarray(graph.landmarks2).copy()
    poses3 = np.asarray(graph.poses3).copy()
    m = layout.p2_owned
    poses2[layout.p2_orig[m]] = p2[m]
    m = layout.l2_owned
    landmarks2[layout.l2_orig[m]] = l2[m]
    m = layout.p3_owned
    poses3[layout.p3_orig[m]] = p3[m]
    return graph.replace(
        poses2=jnp.asarray(poses2.astype(p2.dtype)),
        landmarks2=jnp.asarray(landmarks2.astype(l2.dtype)),
        poses3=jnp.asarray(poses3.astype(p3.dtype)),
    )


def dx_to_reference(layout: BlockLayout, dx_stacked):
    """(D, ndof) padded dx -> (ref_n,) reference-layout dx."""
    flat = np.asarray(dx_stacked).reshape(-1)
    ref = layout.padded_to_ref
    out = np.zeros(int(ref.max()) + 1, flat.dtype)
    m = ref >= 0
    out[ref[m]] = flat[m]
    return out


def block_optimize(
    mesh,
    graph,
    num_iterations: int = 50,
    solver: str = "gauss_newton",
    tolerance: float = 1e-4,
    prior_weight: float = PRIOR_WEIGHT,
    cg_tol: float = 1e-10,
    cg_maxiter: int | None = None,
    precond: str = "auto",
    schur: bool = False,
    return_stats: bool = False,
    cg_forcing: str = "fixed",
    cg_variant: str = "auto",
    slice_size: int | None = None,
):
    """End-to-end convenience: build layout, run the one-program
    distributed optimization, return (graph', errors list, iterations).
    ``schur=True`` eliminates 2D landmark blocks per-device before the
    distributed CG (see build_block_layout). ``return_stats=True``
    appends a dict with the measured communication budget: total CG
    rounds, collectives and exchanged bytes per GN iteration."""
    dtype = (graph.poses2.dtype if graph.poses2.size else graph.poses3.dtype)
    layout = build_block_layout(graph, mesh.devices.size, schur=schur)
    state, edges, maps = layout_device_arrays(layout, dtype)
    run = make_block_optimize(
        mesh, layout, num_iterations=num_iterations, solver=solver,
        tolerance=tolerance, prior_weight=prior_weight, cg_tol=cg_tol,
        cg_maxiter=cg_maxiter, precond=precond, dtype=dtype,
        cg_forcing=cg_forcing, cg_variant=cg_variant,
    )
    out_state, errors, it, cg_total = run(state, edges, maps)
    new_graph = extract_graph(layout, graph, out_state)
    errs = [float(e) for e in np.asarray(errors) if not np.isnan(e)]
    if not return_stats:
        return new_graph, errs, int(it)
    stats = comm_budget(layout, dtype, int(it), int(cg_total),
                        cg_variant=cg_variant, slice_size=slice_size)
    return new_graph, errs, int(it), stats


def block_optimize_multistart(
    mesh,
    graph,
    num_iterations: int = 50,
    jitter: float = 0.1,
    seed: int = 0,
    solver: str = "gauss_newton",
    tolerance: float = 1e-4,
    prior_weight: float = PRIOR_WEIGHT,
    cg_tol: float = 1e-10,
    cg_maxiter: int | None = None,
    precond: str = "auto",
    cg_forcing: str = "fixed",
    cg_variant: str = "auto",
):
    """Data-parallel MULTI-START on a 2-D (replica x blocks) mesh: R
    independent optimizations from jittered initializations run
    simultaneously (replica 0 keeps the unperturbed init), each sharded
    over the blocks axis; the best final chi2 wins. PGO is non-convex —
    restarts escape the local minima a single descent can land in — and
    the replica axis makes them free in wall-clock on a pod slice.

    Node jitter is drawn per ORIGINAL node id and scattered through the
    layout's owned/halo copies, so replicas of the same node never
    desynchronize. Returns (best graph', per-replica errors list-of-
    lists, best replica index).
    """
    replicas, blocks = mesh.devices.shape
    dtype = (graph.poses2.dtype if graph.poses2.size else graph.poses3.dtype)
    layout = build_block_layout(graph, blocks)
    state, edges, maps = layout_device_arrays(layout, dtype)
    rng = np.random.default_rng(seed)

    def jittered(arr, orig, n_orig, comps):
        # (D, rows, c) -> (R, D, rows, c); noise keyed by original node
        # id so owned and halo copies of a node move together
        a = np.asarray(arr)
        noise = rng.normal(size=(replicas, max(n_orig, 1), a.shape[-1]))
        noise[0] = 0.0
        noise[..., comps:] = 0.0
        if n_orig == 0 or a.size == 0:
            return jnp.asarray(
                np.broadcast_to(a, (replicas,) + a.shape).copy())
        per = noise[:, np.asarray(orig), :]  # (R, D, rows, c)
        return jnp.asarray((a[None] + jitter * per).astype(a.dtype))

    p2, l2, p3 = state
    state_r = (
        jittered(p2, layout.p2_orig, graph.poses2.shape[0], 2),
        jittered(l2, layout.l2_orig, graph.landmarks2.shape[0], 2),
        jittered(p3, layout.p3_orig, graph.poses3.shape[0], 3),
    )
    run = make_block_optimize(
        mesh, layout, num_iterations=num_iterations, solver=solver,
        tolerance=tolerance, prior_weight=prior_weight, cg_tol=cg_tol,
        cg_maxiter=cg_maxiter, precond=precond, dtype=dtype,
        cg_forcing=cg_forcing, cg_variant=cg_variant,
    )
    out_state, errors, its, _ = run(state_r, edges, maps)
    errors = np.asarray(errors)
    its = np.asarray(its)
    finals = np.asarray([
        e[~np.isnan(e)][-1] if np.any(~np.isnan(e)) else np.inf
        for e in errors
    ])
    best = int(np.argmin(finals))
    best_state = jax.tree.map(lambda a: a[best], out_state)
    new_graph = extract_graph(layout, graph, best_state)
    traces = [[float(v) for v in e[~np.isnan(e)]] for e in errors]
    return new_graph, traces, best


def comm_budget(layout: BlockLayout, dtype, gn_iters: int, cg_total: int,
                cg_variant: str = "auto", slice_size: int | None = None):
    """Analytic per-iteration communication budget of the block program
    (measured CG round counts x static per-round volumes). ``bytes``
    figures are per device per GN iteration.

    Per CG round: one halo exchange of the search direction (2 ppermute
    hops x h values) + 1 fused scalar psum ("single" variant; "classic"
    pays 2 sequential psums). Per GN iteration: the table halo reduce
    (h rows x (W+1) values) + dx exchange + chi2/norm psums.

    ``slice_size`` (devices per ICI pod slice) adds the multi-slice DCN
    budget (SURVEY §5: "ICI within a pod slice, DCN across slices").
    Block ranks are an RCM-ordered 1-D chain, so map contiguous ranks to
    slices (the default `jax.devices()` order on a multislice deployment)
    and ALL halo ppermutes are nearest-neighbor: only the ``slices - 1``
    chain boundaries at slice edges cross DCN, each carrying 2 messages
    of h values per CG round — the halo traffic is boundary-local by
    construction. The scalar dot psum, by contrast, spans every slice:
    any all-reduce over >1 slice pays >=1 DCN traversal per round
    REGARDLESS of D or payload (8-24 B). DCN latency (~10s of us) is
    therefore paid ``cg_rounds x psums_per_round`` times per GN
    iteration on the critical path — which is why the round-count levers
    (Schwarz preconditioning, Eisenstat-Walker forcing, single-reduction
    CG) are exactly the multi-slice scaling levers.
    """
    itemsize = np.dtype(np.float32 if dtype == jnp.float32
                        else np.float64).itemsize
    h, W = layout.h, layout.ell_width
    gn = max(gn_iters, 1)
    cg_per_gn = cg_total / gn
    halo_bytes = h * itemsize
    psums_per_round = 2 if cg_variant == "classic" else 1
    out = {
        "gn_iters": gn_iters,
        "cg_rounds_total": cg_total,
        "cg_rounds_per_gn": round(cg_per_gn, 1),
        "halo_dofs_h": int(h),
        "collectives_per_gn": round(
            cg_per_gn * (2 + psums_per_round) + 6, 1),
        "ppermute_bytes_per_gn": int(
            cg_per_gn * 2 * halo_bytes            # CG halo exchanges
            + h * (W + 1) * itemsize              # assembly halo reduce
            + 2 * halo_bytes),                    # dx exchange
        "note": "per device per GN iteration; psums are scalar",
    }
    if slice_size:
        D = layout.num_devices
        slices = -(-D // slice_size)  # ceil
        dcn_boundaries = max(slices - 1, 0)
        # bytes crossing EACH DCN boundary per GN iteration (both
        # directions): CG halo exchanges + assembly halo reduce + dx
        per_boundary = int(
            cg_per_gn * 2 * halo_bytes
            + h * (W + 1) * itemsize
            + 2 * halo_bytes) if dcn_boundaries else 0
        out["dcn"] = {
            "slice_size": int(slice_size),
            "slices": int(slices),
            "dcn_boundaries": int(dcn_boundaries),
            "ici_boundaries": int(max(D - 1 - dcn_boundaries, 0)),
            "dcn_bytes_per_boundary_per_gn": per_boundary,
            # sequential DCN traversals on the critical path per GN:
            # every scalar psum spans the slices; a halo ppermute only
            # crosses DCN at the (slices-1) edge boundaries, and those
            # crossings happen in parallel -> at most 1 per round
            "dcn_traversals_per_gn": round(
                cg_per_gn * (psums_per_round
                             + (1 if dcn_boundaries else 0)) + 6, 1),
            "note": "halo traffic is boundary-local (RCM chain -> "
                    "contiguous ranks per slice); psum latency x "
                    "round count dominates DCN cost",
        }
    return out


def block_optimize_elastic(
    mesh,
    graph,
    num_iterations: int = 50,
    segment: int = 10,
    checkpoint_dir=None,
    resume: bool = True,
    solver: str = "gauss_newton",
    tolerance: float = 1e-4,
    prior_weight: float = PRIOR_WEIGHT,
    cg_tol: float = 1e-10,
    cg_maxiter: int | None = None,
    precond: str = "auto",
    cg_forcing: str = "fixed",
    cg_variant: str = "auto",
):
    """Preemption-safe distributed optimization (SURVEY §5 failure
    detection / elastic recovery — the reference has nothing, its PGO
    state lives in RAM for the whole optimize call).

    The optimization runs as jitted SEGMENTS of ``segment`` iterations;
    between segments the sharded node state + error trace snapshot to
    ``checkpoint_dir`` (utils.checkpoint npz pytrees). After a crash or
    preemption, calling again with ``resume=True`` restores the newest
    snapshot and continues — the fault-injection test pins that the
    resumed trajectory reaches the same optimum as an uninterrupted run.
    (In LM mode the damping λ re-adapts at each segment boundary from
    λ0 = 0.01; LM's accept/reject makes that safe, costing at most a few
    rejected trials per resume.)

    Returns (graph', errors list, iterations_done).
    """
    import pathlib

    from rustrobotics_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    dtype = (graph.poses2.dtype if graph.poses2.size else graph.poses3.dtype)
    layout = build_block_layout(graph, mesh.devices.size)
    state, edges, maps = layout_device_arrays(layout, dtype)
    run = make_block_optimize(
        mesh, layout, num_iterations=segment, solver=solver,
        tolerance=tolerance, prior_weight=prior_weight, cg_tol=cg_tol,
        cg_maxiter=cg_maxiter, precond=precond, dtype=dtype,
        cg_forcing=cg_forcing, cg_variant=cg_variant,
    )

    start = 0
    errors: list = []
    ckdir = pathlib.Path(checkpoint_dir) if checkpoint_dir else None
    if ckdir is not None and resume and ckdir.exists():
        snaps = sorted(ckdir.glob("block_*.npz"))
        if snaps:
            template = (state, np.zeros(0))
            (state, errs), step = restore_checkpoint(snaps[-1], template)
            errors = [float(e) for e in np.asarray(errs)]
            start = int(step or 0)

    while start < num_iterations:
        out_state, errs_seg, it_seg, _ = run(state, edges, maps)
        state = out_state
        it_seg = int(it_seg)
        seg = [float(e) for e in np.asarray(errs_seg) if not np.isnan(e)]
        # the segment's first recorded chi2 equals the previous
        # segment's final one — drop the duplicate when stitching
        errors.extend(seg if not errors else seg[1:])
        start += it_seg
        if ckdir is not None:
            save_checkpoint(
                ckdir / f"block_{start:06d}.npz",
                (state, np.asarray(errors)), step=start,
            )
        if it_seg < segment:
            break  # |dx| < tolerance inside the segment
    return extract_graph(layout, graph, state), errors, start
