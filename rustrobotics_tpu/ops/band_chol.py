"""Banded blocked Cholesky direct solver (TPU).

The role of the reference's UMFPACK factorize+solve
(pose_graph_optimization.rs:124-144) for the jitted device path, exploiting
that RCM-reordered pose graphs have small scalar bandwidth (256-768 on every
bundled g2o dataset) while a dense Cholesky of the same system is O(n^3):
on sphere2500 (n=15000) the dense factorization alone is ~48 ms/iteration at
the f32 MXU roofline, the banded one touches ~500x fewer FLOPs.

Design (TPU-first):
- RCM permutation + symmetric Jacobi scaling are *static* per graph; the
  triplet -> block-row scatter indices are precomputed on the host.
- H_perm is stored as block rows R[j] = H[jK:(j+1)K, (j-1)K:(j+1)K] of
  static shape (K, 2K), K = bandwidth rounded up to the 128 lane tile.
  With K >= bandwidth the subdiagonal panel of block j lives entirely in
  block row j+1 -- the factorization is a strict chain.
- The unrolled factorization carries only the running (K, K) diagonal
  block, never updating a large buffer in place (XLA copy-on-write on big
  .at[] updates is what makes a naive blocked Cholesky slow):
      Ld_j   = chol(D_j)
      Lp_j+1 = R[j+1][:, :K] Ld_j^{-T}
      D_j+1  = R[j+1][:, K:] - Lp_j+1 Lp_j+1^T
- Forward/backward substitution are the matching unrolled block chains.

Everything is jittable; the builder returns a host-side layout reused
across GN/LM iterations.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BandCholLayout:
    n: int          # original dof count
    kb: int         # block size (>= scalar bandwidth, multiple of 128)
    nb: int         # number of block rows (npad = nb * kb)
    q: int          # scalar half-bandwidth after RCM
    perm: np.ndarray       # H_perm[a, b] = H[perm[a], perm[b]]
    inv_perm: np.ndarray   # x = y[inv_perm]
    sel: np.ndarray        # triplet indices kept (lower triangle incl diag)
    sel_rows: np.ndarray   # original row ids of kept triplets
    sel_cols: np.ndarray   # original col ids of kept triplets
    flat_idx: np.ndarray   # destination into the (nb*kb*2kb,) block-row buf
    diag_sel: np.ndarray   # triplet indices on the diagonal (original order)
    diag_rows: np.ndarray  # their (original) row ids
    pad_rows: np.ndarray   # padded row ids in [n, nb*kb)


def build_band_chol(layout, max_bandwidth: int = 2048) -> BandCholLayout | None:
    """Precompute the banded layout, or None if the RCM bandwidth is too
    large for the banded path to win (caller falls back to dense)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = layout.n
    rows = layout.rows.astype(np.int64)
    cols = layout.cols.astype(np.int64)
    pattern = sp.coo_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(n, n)
    ).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(pattern, symmetric_mode=True))
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)

    rp = inv[rows]
    cp = inv[cols]
    q = int(np.abs(rp - cp).max()) if len(rp) else 0
    kb = max(256, int(-(-q // 128)) * 128)
    if kb > max_bandwidth:
        return None
    nb = int(-(-n // kb))

    # lower triangle only; the symmetric triplet list carries each
    # off-diagonal entry twice ((r,c) and (c,r)) -- keep the lower copy
    sel = np.where(rp >= cp)[0]
    rs, cs = rp[sel], cp[sel]
    j = rs // kb
    local_col = cs - (j - 1) * kb
    flat_idx = (rs * 2 * kb + local_col).astype(np.int64)

    diag_sel = np.where(rows == cols)[0]
    pad_rows = np.arange(n, nb * kb, dtype=np.int64)

    return BandCholLayout(
        n=n, kb=kb, nb=nb, q=q,
        perm=perm.astype(np.int32), inv_perm=inv.astype(np.int32),
        sel=sel.astype(np.int64),
        sel_rows=rows[sel], sel_cols=cols[sel],
        flat_idx=flat_idx,
        diag_sel=diag_sel.astype(np.int64),
        diag_rows=rows[diag_sel].astype(np.int64),
        pad_rows=pad_rows,
    )


def solve_band_chol(bl: BandCholLayout, vals, b):
    """Jittable: symmetric-Jacobi-scaled banded Cholesky solve of the
    triplet system (vals aligned with the SystemLayout that built ``bl``)."""
    dtype = vals.dtype
    n, kb, nb = bl.n, bl.kb, bl.nb
    npad = nb * kb

    # scatter RAW kept values; scaling happens on the block-row buffer
    # (per-triplet dinv gathers cost ~2 ms/iteration on intel — the
    # broadcastable row/column scale below is 3 reads of a 23 MB buffer)
    flat = jnp.zeros(npad * 2 * kb, dtype).at[jnp.asarray(bl.flat_idx)].add(
        vals[jnp.asarray(bl.sel)]
    )
    r_blocks = flat.reshape(nb, kb, 2 * kb)
    # unit diagonal on padded rows so the last block stays SPD
    if len(bl.pad_rows):
        pad = np.zeros((nb, kb, 2 * kb), np.float32)
        pr = np.asarray(bl.pad_rows)
        pad[pr // kb, pr % kb, kb + pr % kb] = 1.0
        r_blocks = r_blocks + jnp.asarray(pad, dtype)

    # Jacobi scale straight off the block-row diagonal (permuted order)
    d_p = jnp.diagonal(r_blocks[:, :, kb:], axis1=1, axis2=2)  # (nb, kb)
    dinv_p = jax.lax.rsqrt(jnp.clip(d_p.reshape(-1), 1e-12, None))  # (npad,)
    row_scale = dinv_p.reshape(nb, kb)
    # block j holds columns (j-1)*kb .. (j+1)*kb: static windows of dinv_p
    dinv_ext = jnp.concatenate([jnp.zeros(kb, dtype), dinv_p])
    col_scale = jnp.stack(
        [jax.lax.dynamic_slice(dinv_ext, (j * kb,), (2 * kb,))
         for j in range(nb)]
    )  # (nb, 2kb)
    r_blocks = r_blocks * row_scale[:, :, None] * col_scale[:, None, :]

    bp = b[jnp.asarray(bl.perm)]
    bp = jnp.concatenate([bp, jnp.zeros(npad - n, dtype)])
    bp = (bp * dinv_p).reshape(nb, kb)

    with jax.default_matmul_precision("highest"):
        # ---- factorization: carry only the running diagonal block
        lds, lps = [], []
        dcur = r_blocks[0, :, kb:]
        for j in range(nb):
            # the scatter fills the LOWER triangle only; mirror it (the
            # lax cholesky symmetrizes its input, which would otherwise
            # halve the off-diagonals)
            dsym = jnp.tril(dcur) + jnp.tril(dcur, -1).T
            ld = jnp.linalg.cholesky(dsym)
            lds.append(ld)
            if j + 1 < nb:
                p = r_blocks[j + 1, :, :kb]
                lp = jax.scipy.linalg.solve_triangular(
                    ld, p.T, lower=True
                ).T
                lps.append(lp)
                dcur = r_blocks[j + 1, :, kb:] - lp @ lp.T

        # ---- forward substitution: L y = bp
        ys = []
        for j in range(nb):
            rhs = bp[j]
            if j > 0:
                rhs = rhs - lps[j - 1] @ ys[j - 1]
            ys.append(jax.scipy.linalg.solve_triangular(
                lds[j], rhs, lower=True
            ))

        # ---- backward substitution: L^T x = y
        xs = [None] * nb
        for j in range(nb - 1, -1, -1):
            rhs = ys[j]
            if j + 1 < nb:
                rhs = rhs - lps[j].T @ xs[j + 1]
            xs[j] = jax.scipy.linalg.solve_triangular(
                lds[j], rhs, lower=True, trans=1
            )

    y = jnp.concatenate(xs)[:npad] * dinv_p
    return y[jnp.asarray(bl.inv_perm)]


def marginal_covariances(bl: BandCholLayout, vals):
    """Selected inverse: the (kb, kb) DIAGONAL blocks of H^-1 in the
    permuted order, i.e. every dof's marginal (co)variance with its
    block neighbors — the uncertainty output a SLAM system reports.

    Uses the classic backward recursion for a block-bidiagonal Cholesky
    factor L (diag Ld_j, subdiag S_j): with G_j = Ld_j^-T Ld_j^-1,

        C_NN = G_N
        C_jj = G_j + Ld_j^-T S_j^T C_{j+1,j+1} S_j Ld_j^-1

    O(nb * kb^3) — same cost class as one factorization; no dense n^2
    inverse is ever formed. Returns (n,) marginal VARIANCES in the
    ORIGINAL dof order (the full diagonal blocks are internal because
    their unscaling/permutation is row-specific).
    """
    dtype = vals.dtype
    n, kb, nb = bl.n, bl.kb, bl.nb
    npad = nb * kb

    flat = jnp.zeros(npad * 2 * kb, dtype).at[jnp.asarray(bl.flat_idx)].add(
        vals[jnp.asarray(bl.sel)]
    )
    r_blocks = flat.reshape(nb, kb, 2 * kb)
    if len(bl.pad_rows):
        pad = np.zeros((nb, kb, 2 * kb), np.float32)
        pr = np.asarray(bl.pad_rows)
        pad[pr // kb, pr % kb, kb + pr % kb] = 1.0
        r_blocks = r_blocks + jnp.asarray(pad, dtype)

    d_p = jnp.diagonal(r_blocks[:, :, kb:], axis1=1, axis2=2)
    dinv_p = jax.lax.rsqrt(jnp.clip(d_p.reshape(-1), 1e-12, None))
    row_scale = dinv_p.reshape(nb, kb)
    dinv_ext = jnp.concatenate([jnp.zeros(kb, dtype), dinv_p])
    col_scale = jnp.stack(
        [jax.lax.dynamic_slice(dinv_ext, (j * kb,), (2 * kb,))
         for j in range(nb)]
    )
    r_blocks = r_blocks * row_scale[:, :, None] * col_scale[:, None, :]

    eye = jnp.eye(kb, dtype=dtype)
    with jax.default_matmul_precision("highest"):
        # factorization (same chain as solve_band_chol)
        lds, lps = [], []
        dcur = r_blocks[0, :, kb:]
        for j in range(nb):
            dsym = jnp.tril(dcur) + jnp.tril(dcur, -1).T
            ld = jnp.linalg.cholesky(dsym)
            lds.append(ld)
            if j + 1 < nb:
                p = r_blocks[j + 1, :, :kb]
                lp = jax.scipy.linalg.solve_triangular(ld, p.T,
                                                       lower=True).T
                lps.append(lp)
                dcur = r_blocks[j + 1, :, kb:] - lp @ lp.T

        # backward selected-inverse recursion on the scaled system
        covs = [None] * nb
        for j in range(nb - 1, -1, -1):
            ld_inv = jax.scipy.linalg.solve_triangular(lds[j], eye,
                                                       lower=True)
            g = ld_inv.T @ ld_inv
            if j + 1 < nb:
                s_ld_inv = lps[j] @ ld_inv  # S_j Ld_j^-1
                g = g + s_ld_inv.T @ covs[j + 1] @ s_ld_inv
            covs[j] = g

    cov_blocks = jnp.stack(covs)  # (nb, kb, kb), scaled system
    var_scaled = jnp.diagonal(cov_blocks, axis1=1, axis2=2).reshape(-1)
    var_p = var_scaled * dinv_p**2  # undo Jacobi scaling
    return var_p[jnp.asarray(bl.inv_perm)]


def marginal_node_blocks(bl: BandCholLayout, vals, node_offsets, node_sizes,
                         pad_size=6):
    """Per-node marginal covariance BLOCKS of H^-1 (pose uncertainty
    ellipses). Extends the selected inversion with the off-diagonal
    recursion C_{j+1,j} = -C_{j+1,j+1} S_j Ld_j^-1: any dof pair within
    the band straddles at most ADJACENT kb-blocks (|perm distance| <= q
    <= kb), so every within-node entry is available from the diagonal or
    first-off-diagonal block covariances.

    node_offsets/node_sizes: (B,) original dof start and size per node.
    Returns (B, pad_size, pad_size) with identity padding beyond each
    node's size.
    """
    dtype = vals.dtype
    n, kb, nb = bl.n, bl.kb, bl.nb
    npad = nb * kb

    flat = jnp.zeros(npad * 2 * kb, dtype).at[jnp.asarray(bl.flat_idx)].add(
        vals[jnp.asarray(bl.sel)]
    )
    r_blocks = flat.reshape(nb, kb, 2 * kb)
    if len(bl.pad_rows):
        pad = np.zeros((nb, kb, 2 * kb), np.float32)
        pr = np.asarray(bl.pad_rows)
        pad[pr // kb, pr % kb, kb + pr % kb] = 1.0
        r_blocks = r_blocks + jnp.asarray(pad, dtype)

    d_p = jnp.diagonal(r_blocks[:, :, kb:], axis1=1, axis2=2)
    dinv_p = jax.lax.rsqrt(jnp.clip(d_p.reshape(-1), 1e-12, None))
    row_scale = dinv_p.reshape(nb, kb)
    dinv_ext = jnp.concatenate([jnp.zeros(kb, dtype), dinv_p])
    col_scale = jnp.stack(
        [jax.lax.dynamic_slice(dinv_ext, (j * kb,), (2 * kb,))
         for j in range(nb)]
    )
    r_blocks = r_blocks * row_scale[:, :, None] * col_scale[:, None, :]

    eye = jnp.eye(kb, dtype=dtype)
    with jax.default_matmul_precision("highest"):
        lds, lps = [], []
        dcur = r_blocks[0, :, kb:]
        for j in range(nb):
            dsym = jnp.tril(dcur) + jnp.tril(dcur, -1).T
            ld = jnp.linalg.cholesky(dsym)
            lds.append(ld)
            if j + 1 < nb:
                p = r_blocks[j + 1, :, :kb]
                lp = jax.scipy.linalg.solve_triangular(ld, p.T,
                                                       lower=True).T
                lps.append(lp)
                dcur = r_blocks[j + 1, :, kb:] - lp @ lp.T

        covs = [None] * nb
        offs = [None] * max(nb - 1, 0)  # offs[j] = C_{j+1,j}
        for j in range(nb - 1, -1, -1):
            ld_inv = jax.scipy.linalg.solve_triangular(lds[j], eye,
                                                       lower=True)
            g = ld_inv.T @ ld_inv
            if j + 1 < nb:
                s_ld_inv = lps[j] @ ld_inv
                offs[j] = -covs[j + 1] @ s_ld_inv
                g = g + s_ld_inv.T @ covs[j + 1] @ s_ld_inv
            covs[j] = g

    diag_buf = jnp.stack(covs).reshape(-1)          # (nb*kb*kb,)
    off_buf = (jnp.stack(offs).reshape(-1) if nb > 1
               else jnp.zeros(1, dtype))

    # host-side index plan: entry (a, b) of node k -> buffer + flat index
    inv = np.asarray(bl.inv_perm, np.int64)
    offsets = np.asarray(node_offsets, np.int64)
    sizes = np.asarray(node_sizes, np.int64)
    n_nodes = len(offsets)
    sel_buf = np.zeros((n_nodes, pad_size, pad_size), np.int8)  # 0 diag,1 off,2 offT,3 pad
    idx = np.zeros((n_nodes, pad_size, pad_size), np.int64)
    for a in range(pad_size):
        for b_ in range(pad_size):
            in_node = (a < sizes) & (b_ < sizes)
            pa = inv[np.minimum(offsets + a, bl.n - 1)]
            pb = inv[np.minimum(offsets + b_, bl.n - 1)]
            ja, jb = pa // kb, pb // kb
            ra, rb = pa % kb, pb % kb
            same = ja == jb
            a_hi = ja == jb + 1   # entry in C_{ja, jb} = offs[jb]
            b_hi = jb == ja + 1
            sel = np.where(same, 0, np.where(a_hi, 1, 2)).astype(np.int8)
            flat_i = np.where(
                same, ja * kb * kb + ra * kb + rb,
                np.where(a_hi, jb * kb * kb + ra * kb + rb,
                         ja * kb * kb + rb * kb + ra))
            sel_buf[:, a, b_] = np.where(in_node, sel, 3)
            idx[:, a, b_] = np.where(in_node, flat_i, 0)

    sel_j = jnp.asarray(sel_buf)
    idx_j = jnp.asarray(idx)
    vals_diag = diag_buf[idx_j]
    vals_off = off_buf[jnp.clip(idx_j, 0, off_buf.shape[0] - 1)]
    scaled = jnp.where(sel_j == 0, vals_diag,
                       jnp.where(sel_j == 3, 0.0, vals_off))
    # undo Jacobi scaling: C = dinv_a * C_scaled * dinv_b
    dinv_orig = dinv_p[jnp.asarray(inv)]
    da = jnp.stack([dinv_orig[jnp.minimum(jnp.asarray(offsets) + a, n - 1)]
                    for a in range(pad_size)], axis=1)  # (B, pad)
    da = jnp.where(jnp.asarray(np.arange(pad_size)[None, :] <
                               sizes[:, None]), da, 1.0)
    blocks = scaled * da[:, :, None] * da[:, None, :]
    # identity padding
    pad_eye = jnp.asarray(
        (np.arange(pad_size)[None, :, None] == np.arange(pad_size)[None, None, :])
        & (np.arange(pad_size)[None, :, None] >= sizes[:, None, None]),
        dtype)
    return blocks + pad_eye
