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
- Factorization / substitution / selected inversion are ``lax.scan`` chains
  over block rows carrying only the running (K, K) block (never updating a
  large buffer in place — XLA copy-on-write on big .at[] updates is what
  makes a naive blocked Cholesky slow):
      Ld_j   = chol(D_j)
      Lp_j+1 = R[j+1][:, :K] Ld_j^{-T}
      D_j+1  = R[j+1][:, K:] - Lp_j+1 Lp_j+1^T
  Scanning (instead of a Python-unrolled chain) keeps compile time O(1) in
  the number of block rows — a 100k-dof graph compiles in seconds, not
  hundreds of unrolled Cholesky+triangular-solve stages.

Everything is jittable; the builder returns a host-side layout reused
across GN/LM iterations.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np


# Band-buffer scatter strategy, flippable after hardware measurement
# (tools/tpu_microbench.py times all; tools/tpu_dissect.py attributes
# device time): "add" = one scatter-add of all kept triplets; "sorted" =
# sorted segment_sum into unique destinations + a unique/sorted
# scatter-set; "strips" = node-block row strips — dedup contributions
# into (S, 3) strips with one sorted segment_sum, place them at their
# column offsets by iota-compare (pure VPU, no indexing), then a
# row-sorted segment_sum of 2kb-wide rows.
#
# Measured verdict (TPU v5e, device-side ablation 2026-08-19): "add"
# wins. The band assembly is bound by XLA's per-INDEX cost of any
# gather/scatter (~19 ns/scalar index, ~88 ns/36-wide row index,
# ~257 ns/1024-wide row — measured), not by memory bandwidth, and every
# reformulation (sorted segment_sum, strips, 3x3 block windows via
# lax.scatter_add [58 ms — serialized!], row-granular takes) pays that
# same toll on its own indexed op. Strips stage-1's T-element gather
# alone costs as much as the whole scatter-add. Kept selectable for
# other platforms and for the parity test.
BAND_SCATTER_MODE = os.environ.get("RUSTROBOTICS_BAND_SCATTER", "add")


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
    # sorted-scatter plan: triplets ordered by destination, duplicate
    # destinations segment-summed into the unique sorted target list
    sel_sorted: np.ndarray   # sel reordered by flat_idx
    seg_sorted: np.ndarray   # nondecreasing segment id per sorted triplet
    uniq_idx: np.ndarray     # unique destinations (sorted)
    # strip plan ("strips" scatter mode): one strip = (band row, 3
    # contiguous columns starting at a node block's first permuted
    # column). Scalar RCM keeps every node's dofs contiguous (verified
    # on all bundled graphs), so each (node_r, node_c) contribution
    # block decomposes into <=3 such strips; duplicate contributions
    # (several edges hitting the same pose pair / diagonal block) merge
    # in a sorted segment_sum over 3*S slots.
    strip_src: np.ndarray    # kept-triplet indices sorted by slot id
    strip_seg: np.ndarray    # nondecreasing slot id (strip*3 + offset)
    strip_count: int         # S (0 when strips_ok is False)
    strip_row: np.ndarray    # (S,) destination row in permuted order
    strip_c0: np.ndarray     # (S,) local column start within the 2kb panel
    strips_ok: bool          # grouped order adopted; strip plan usable


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

    # Node-grouped variant of the scalar-RCM order: pull each node's
    # dofs together at the node's first permuted position. The strip
    # assembly plan needs node-contiguous columns; scalar RCM usually
    # already provides this (intel/dlr/sphere2500/torus3D) but not
    # always (simulation-pose-pose). Adopt the grouped order only when
    # it does not widen the padded bandwidth.
    db_all = np.asarray(layout.dof_block, dtype=np.int64)
    node_min = np.full(int(db_all.max()) + 1, n, dtype=np.int64)
    np.minimum.at(node_min, db_all, inv)
    key_g = node_min[db_all] * np.int64(n) + inv
    inv_g = np.empty(n, np.int64)
    inv_g[np.argsort(key_g, kind="stable")] = np.arange(n)
    q_g = int(np.abs(inv_g[rows] - inv_g[cols]).max()) if len(rows) else 0
    strips_ok = -(-q_g // 128) <= max(2, -(-q // 128))
    if strips_ok:
        q, inv = q_g, inv_g
        perm = np.empty(n, np.int64)
        perm[inv] = np.arange(n)
        rp, cp = inv[rows], inv[cols]

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

    order = np.argsort(flat_idx, kind="stable")
    uniq_idx, inv_u = np.unique(flat_idx, return_inverse=True)
    seg_sorted = inv_u[order].astype(np.int32)

    # ---- strip plan: group kept triplets by (row, col-node start)
    if strips_ok:
        node_start = np.full(int(db_all.max()) + 1, n, dtype=np.int64)
        np.minimum.at(node_start, db_all, inv)
        ns = node_start[db_all[cols[sel]]]   # permuted col start of node
        off = cs - ns                        # 0..dim-1 within the node
        assert off.min() >= 0, "node dofs not contiguous"
        # chunk wide nodes (SE3: 6 dof) into 3-wide sub-strips
        s_c = ns + 3 * (off // 3)
        slot = off % 3
        key = rs * np.int64(n) + s_c         # lexicographic (row, c0)
        uniq_key, strip_of = np.unique(key, return_inverse=True)
        slot_id = strip_of.astype(np.int64) * 3 + slot
        sorder = np.argsort(slot_id, kind="stable")
        strip_src = sel[sorder].astype(np.int64)
        strip_seg = slot_id[sorder].astype(np.int32)
        strip_count = len(uniq_key)
        strip_row = (uniq_key // n).astype(np.int32)
        strip_c0 = (uniq_key % n
                    - (strip_row.astype(np.int64) // kb - 1) * kb
                    ).astype(np.int32)
    else:
        strip_src = np.zeros(0, np.int64)
        strip_seg = np.zeros(0, np.int32)
        strip_count = 0
        strip_row = np.zeros(0, np.int32)
        strip_c0 = np.zeros(0, np.int32)

    return BandCholLayout(
        n=n, kb=kb, nb=nb, q=q,
        perm=perm.astype(np.int32), inv_perm=inv.astype(np.int32),
        sel=sel.astype(np.int64),
        sel_rows=rows[sel], sel_cols=cols[sel],
        flat_idx=flat_idx,
        diag_sel=diag_sel.astype(np.int64),
        diag_rows=rows[diag_sel].astype(np.int64),
        pad_rows=pad_rows,
        sel_sorted=sel[order].astype(np.int64),
        seg_sorted=seg_sorted,
        uniq_idx=uniq_idx.astype(np.int64),
        strip_src=strip_src,
        strip_seg=strip_seg,
        strip_count=strip_count,
        strip_row=strip_row,
        strip_c0=strip_c0,
        strips_ok=strips_ok,
    )


def _prepare_blocks(bl: BandCholLayout, vals):
    """Scatter triplets into scaled block rows. Returns
    (r_blocks (nb, kb, 2kb), dinv_p (npad,)) — the Jacobi-scaled banded
    matrix and the scaling vector (permuted order)."""
    dtype = vals.dtype
    kb, nb = bl.kb, bl.nb
    npad = nb * kb

    # scatter RAW kept values; scaling happens on the block-row buffer
    # (per-triplet dinv gathers cost ~2 ms/iteration on intel — the
    # broadcastable row/column scale below is 3 reads of a 23 MB buffer)
    if BAND_SCATTER_MODE == "strips" and bl.strips_ok:
        # 1) merge duplicate contributions per (strip, slot): sorted
        #    segment reduce, no random writes
        sv = jax.ops.segment_sum(
            vals[jnp.asarray(bl.strip_src)], jnp.asarray(bl.strip_seg),
            num_segments=3 * bl.strip_count, indices_are_sorted=True,
        ).reshape(bl.strip_count, 3)
        # 2) place each strip's 3 values at its column offset: three
        #    fused iota-compare selects over (S, 2kb) — pure VPU
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (bl.strip_count, 2 * kb), 1)
        c0 = jnp.asarray(bl.strip_c0)[:, None]
        strips = (jnp.where(iota == c0, sv[:, 0:1], 0)
                  + jnp.where(iota == c0 + 1, sv[:, 1:2], 0)
                  + jnp.where(iota == c0 + 2, sv[:, 2:3], 0))
        # 3) sum strips into their band rows: row-sorted segment_sum of
        #    2kb-wide rows (updates are whole rows, not scalars)
        flat = jax.ops.segment_sum(
            strips, jnp.asarray(bl.strip_row), num_segments=npad,
            indices_are_sorted=True,
        ).reshape(-1)
    elif BAND_SCATTER_MODE == "sorted":
        u = jax.ops.segment_sum(
            vals[jnp.asarray(bl.sel_sorted)], jnp.asarray(bl.seg_sorted),
            num_segments=len(bl.uniq_idx), indices_are_sorted=True,
        )
        flat = jnp.zeros(npad * 2 * kb, dtype).at[
            jnp.asarray(bl.uniq_idx)
        ].set(u, unique_indices=True, indices_are_sorted=True)
    else:
        flat = jnp.zeros(npad * 2 * kb, dtype).at[
            jnp.asarray(bl.flat_idx)
        ].add(vals[jnp.asarray(bl.sel)])
    r_blocks = flat.reshape(nb, kb, 2 * kb)
    # unit diagonal on padded rows so the last block stays SPD
    if len(bl.pad_rows):
        pr = jnp.asarray(bl.pad_rows)
        r_blocks = r_blocks.at[pr // kb, pr % kb, kb + pr % kb].add(1.0)

    # Jacobi scale straight off the block-row diagonal (permuted order)
    d_p = jnp.diagonal(r_blocks[:, :, kb:], axis1=1, axis2=2)  # (nb, kb)
    dinv_p = jax.lax.rsqrt(jnp.clip(d_p.reshape(-1), 1e-12, None))  # (npad,)
    row_scale = dinv_p.reshape(nb, kb)
    # block j holds columns (j-1)*kb .. (j+1)*kb: two shifted reshapes of
    # the zero-extended scale vector give the (nb, 2kb) sliding windows
    dinv_ext = jnp.concatenate([jnp.zeros(kb, dtype), dinv_p])
    col_scale = jnp.concatenate(
        [dinv_ext[:npad].reshape(nb, kb), dinv_ext[kb:].reshape(nb, kb)],
        axis=1,
    )  # (nb, 2kb)
    r_blocks = r_blocks * row_scale[:, :, None] * col_scale[:, None, :]
    return r_blocks, dinv_p


# Below this many block rows, the factorization/substitution chains are
# unrolled as Python loops over per-block values: the scan variant
# materializes its stacked (nb, kb, kb) carries between passes, measured
# at ~1 ms/GN-iteration slower on intel (TPU). Above it, the scan keeps
# compile time O(1) in nb (a 100k-dof graph has ~400 block rows).
UNROLL_MAX_NB = 64


def _sym_chol(dcur):
    # the scatter fills the LOWER triangle only; mirror before
    # factorization (lax cholesky symmetrizes its input, which would
    # otherwise halve the off-diagonals)
    dsym = jnp.tril(dcur) + jnp.tril(dcur, -1).T
    return jnp.linalg.cholesky(dsym)


def _factorize_inv_unrolled(r_blocks):
    """Chain factorization that carries explicit inverse factors.

    The TPU-native variant of ``_factorize_unrolled``: the (kb, kb)
    diagonal Cholesky uses the blocked matmul recursion
    (ops/batched_tri.chol_blocked) and each factor's inverse is
    computed inline (tril_inv), so the subdiagonal panel is a plain
    matmul ``Lp = P Ld^-T`` instead of a 512-RHS triangular solve.
    Matters because XLA's cholesky AND triangular_solve serialize over
    batch dims on TPU (measured ~90 us PER batch item at kb=512): under
    vmap (the fleet optimizer) this path keeps the whole factorization
    at batched-matmul rates. Returns (lds, ldinvs, lps)."""
    from rustrobotics_tpu.ops.batched_tri import chol_blocked, tril_inv

    nb, kb = r_blocks.shape[0], r_blocks.shape[1]
    lds, ldinvs, lps = [], [], []
    dcur = r_blocks[0, :, kb:]
    for j in range(nb):
        ld = chol_blocked(dcur)
        ldinv = tril_inv(ld)
        lds.append(ld)
        ldinvs.append(ldinv)
        if j + 1 < nb:
            p = r_blocks[j + 1, :, :kb]
            lp = p @ ldinv.T
            lps.append(lp)
            dcur = r_blocks[j + 1, :, kb:] - lp @ lp.T
    return lds, ldinvs, lps


def _factorize_inv(r_blocks):
    """Scan variant of ``_factorize_inv_unrolled`` (compile-time O(1)
    in nb). Returns (lds, ldinvs, lps) as stacked arrays."""
    from rustrobotics_tpu.ops.batched_tri import chol_blocked, tril_inv

    nb, kb = r_blocks.shape[0], r_blocks.shape[1]
    if nb == 1:
        ld = chol_blocked(r_blocks[0, :, kb:])
        return ld[None], tril_inv(ld)[None], \
            jnp.zeros((0, kb, kb), r_blocks.dtype)

    def step(dcur, r_next):
        ld = chol_blocked(dcur)
        ldinv = tril_inv(ld)
        lp = r_next[:, :kb] @ ldinv.T
        dnew = r_next[:, kb:] - lp @ lp.T
        return dnew, (ld, ldinv, lp)

    d_last, (lds_head, ldinvs_head, lps) = jax.lax.scan(
        step, r_blocks[0, :, kb:], r_blocks[1:]
    )
    ld_last = chol_blocked(d_last)
    lds = jnp.concatenate([lds_head, ld_last[None]])
    ldinvs = jnp.concatenate([ldinvs_head, tril_inv(ld_last)[None]])
    return lds, ldinvs, lps


def _factorize_unrolled(r_blocks):
    """Python-unrolled chain: returns ([ld_j], [lp_j]) as lists."""
    nb, kb = r_blocks.shape[0], r_blocks.shape[1]
    lds, lps = [], []
    dcur = r_blocks[0, :, kb:]
    for j in range(nb):
        ld = _sym_chol(dcur)
        lds.append(ld)
        if j + 1 < nb:
            p = r_blocks[j + 1, :, :kb]
            lp = jax.scipy.linalg.solve_triangular(ld, p.T, lower=True).T
            lps.append(lp)
            dcur = r_blocks[j + 1, :, kb:] - lp @ lp.T
    return lds, lps


def _substitute_unrolled(lds, lps, bp):
    """Forward + backward substitution over per-block lists."""
    nb = len(lds)
    ys = []
    for j in range(nb):
        rhs = bp[j]
        if j > 0:
            rhs = rhs - lps[j - 1] @ ys[j - 1]
        ys.append(jax.scipy.linalg.solve_triangular(lds[j], rhs,
                                                    lower=True))
    xs = [None] * nb
    for j in range(nb - 1, -1, -1):
        rhs = ys[j]
        if j + 1 < nb:
            rhs = rhs - lps[j].T @ xs[j + 1]
        xs[j] = jax.scipy.linalg.solve_triangular(
            lds[j], rhs, lower=True, trans=1)
    return jnp.stack(xs)


def _factorize(r_blocks):
    """Blocked banded Cholesky as a lax.scan chain.

    Returns (lds (nb, kb, kb), lps (nb-1, kb, kb)): diagonal Cholesky
    factors and subdiagonal panels.
    """
    nb, kb = r_blocks.shape[0], r_blocks.shape[1]

    if nb == 1:
        return _sym_chol(r_blocks[0, :, kb:])[None], \
            jnp.zeros((0, kb, kb), r_blocks.dtype)

    def step(dcur, r_next):
        ld = _sym_chol(dcur)
        lp = jax.scipy.linalg.solve_triangular(
            ld, r_next[:, :kb].T, lower=True
        ).T
        dnew = r_next[:, kb:] - lp @ lp.T
        return dnew, (ld, lp)

    d_last, (lds_head, lps) = jax.lax.scan(
        step, r_blocks[0, :, kb:], r_blocks[1:]
    )
    lds = jnp.concatenate([lds_head, _sym_chol(d_last)[None]])
    return lds, lps


def band_substitute(lds, lps, bp):
    """Forward + backward substitution through the blocked banded factor
    (lax.scan chains): solves L L^T x = bp for bp of shape (nb, kb)."""
    nb = bp.shape[0]

    # ---- forward substitution: L y = bp
    y0 = jax.scipy.linalg.solve_triangular(lds[0], bp[0], lower=True)
    if nb > 1:
        def fwd(y_prev, inp):
            ld, lp_prev, rhs = inp
            y = jax.scipy.linalg.solve_triangular(
                ld, rhs - lp_prev @ y_prev, lower=True
            )
            return y, y

        _, ys_tail = jax.lax.scan(fwd, y0, (lds[1:], lps, bp[1:]))
        ys = jnp.concatenate([y0[None], ys_tail])
    else:
        ys = y0[None]

    # ---- backward substitution: L^T x = y
    x_last = jax.scipy.linalg.solve_triangular(
        lds[-1], ys[-1], lower=True, trans=1
    )
    if nb > 1:
        def bwd(x_next, inp):
            ld, lp, y = inp
            x = jax.scipy.linalg.solve_triangular(
                ld, y - lp.T @ x_next, lower=True, trans=1
            )
            return x, x

        _, xs_head = jax.lax.scan(
            bwd, x_last, (lds[:-1], lps, ys[:-1]), reverse=True
        )
        xs = jnp.concatenate([xs_head, x_last[None]])
    else:
        xs = x_last[None]
    return xs


def _invert_factors_unrolled(lds):
    """Explicit triangular inverses of the per-block Cholesky factors.

    Substitution with precomputed inverses is a pure-GEMV chain (the
    1-RHS trsm chain it replaced was ~45% of the GN iteration: 2.0 ms
    on intel, 5.0 on dlr). The inversion itself uses the matmul-only
    blocked routine (ops/batched_tri.tril_inv), NOT triangular_solve:
    XLA's trsm serializes over batch dims on TPU, which made the
    vmapped FLEET optimizer's inversion cost ~linear in B (12.9 ms at
    B=8 on intel — tools/tpu_batch_dissect.py, 2026-08-20). tril_inv
    vmaps at matmul rates."""
    from rustrobotics_tpu.ops.batched_tri import tril_inv

    return [tril_inv(ld) for ld in lds]


def _substitute_inv_unrolled(ldinvs, lps, bp):
    """Forward + backward substitution with precomputed Ld^{-1}: every
    step is a (kb, kb) @ (kb,) matvec — no triangular-solve latency."""
    nb = len(ldinvs)
    ys = []
    for j in range(nb):
        rhs = bp[j]
        if j > 0:
            rhs = rhs - lps[j - 1] @ ys[j - 1]
        ys.append(ldinvs[j] @ rhs)
    xs = [None] * nb
    for j in range(nb - 1, -1, -1):
        rhs = ys[j]
        if j + 1 < nb:
            rhs = rhs - lps[j].T @ xs[j + 1]
        xs[j] = ldinvs[j].T @ rhs
    return jnp.stack(xs)


def _invert_factors(lds):
    """Batched variant of `_invert_factors_unrolled` for the scan chain
    (matmul-only: see the batch-serialization note there)."""
    from rustrobotics_tpu.ops.batched_tri import tril_inv

    return tril_inv(lds)


def band_substitute_inv(ldinvs, lps, bp):
    """`band_substitute` with precomputed inverse factors: scan of GEMVs."""
    nb = bp.shape[0]
    y0 = ldinvs[0] @ bp[0]
    if nb > 1:
        def fwd(y_prev, inp):
            ldinv, lp_prev, rhs = inp
            y = ldinv @ (rhs - lp_prev @ y_prev)
            return y, y

        _, ys_tail = jax.lax.scan(fwd, y0, (ldinvs[1:], lps, bp[1:]))
        ys = jnp.concatenate([y0[None], ys_tail])
    else:
        ys = y0[None]
    x_last = ldinvs[-1].T @ ys[-1]
    if nb > 1:
        def bwd(x_next, inp):
            ldinv, lp, y = inp
            x = ldinv.T @ (y - lp.T @ x_next)
            return x, x

        _, xs_head = jax.lax.scan(
            bwd, x_last, (ldinvs[:-1], lps, ys[:-1]), reverse=True
        )
        xs = jnp.concatenate([xs_head, x_last[None]])
    else:
        xs = x_last[None]
    return xs


# Substitution strategy: "inv" (default) multiplies by precomputed
# triangular inverses — the TPU-native choice (trsm with one RHS is a
# latency-bound scalar recursion; the inversion itself is one MXU-wide
# trsm inside the factorization). "trsm" keeps the classic
# triangular-solve chain for verification.
SUBSTITUTE_MODE = "inv"


def solve_band_chol(bl: BandCholLayout, vals, b):
    """Jittable: symmetric-Jacobi-scaled banded Cholesky solve of the
    triplet system (vals aligned with the SystemLayout that built ``bl``)."""
    dtype = vals.dtype
    n, kb, nb = bl.n, bl.kb, bl.nb
    npad = nb * kb

    with jax.default_matmul_precision("highest"):
        r_blocks, dinv_p = _prepare_blocks(bl, vals)

        bp = b[jnp.asarray(bl.perm)]
        bp = jnp.concatenate([bp, jnp.zeros(npad - n, dtype)])
        bp = (bp * dinv_p).reshape(nb, kb)

        inv = SUBSTITUTE_MODE == "inv"
        if nb <= UNROLL_MAX_NB:
            if inv:
                _, ldinvs, lps = _factorize_inv_unrolled(r_blocks)
                xs = _substitute_inv_unrolled(ldinvs, lps, bp)
            else:
                lds, lps = _factorize_unrolled(r_blocks)
                xs = _substitute_unrolled(lds, lps, bp)
        else:
            if inv:
                _, ldinvs, lps = _factorize_inv(r_blocks)
                xs = band_substitute_inv(ldinvs, lps, bp)
            else:
                lds, lps = _factorize(r_blocks)
                xs = band_substitute(lds, lps, bp)

    y = xs.reshape(-1)[:npad] * dinv_p
    return y[jnp.asarray(bl.inv_perm)]


# ------------------------------------------------------------------
# Block cyclic reduction (CR): the parallel factorization.
#
# The banded system in kb-block form is block TRIDIAGONAL: diagonal
# blocks D_j = r_blocks[j, :, kb:], subdiagonal L_j = r_blocks[j, :, :kb]
# (coupling block j to j-1; L_0 = 0). The lax.scan factorization above is
# a chain of nb sequential 256-wide stages — measured at ~1.4% of the
# f32 MXU peak on intel.g2o because nothing overlaps. CR instead
# eliminates the ODD-indexed blocks of the chain in one shot per level:
#
#   D'_t = D_2t - B_{t-1}^T B_{t-1} - A_t^T A_t
#   L'_t = -B_{t-1}^T A_{t-1}
#   b'_t = b_2t - B_{t-1}^T u_{t-1} - A_t^T u_t
#
# with, per odd block 2t+1 (F_t = chol(D_{2t+1})):
#   A_t = F_t^{-1} L_{2t+1}      B_t = F_t^{-1} L_{2t+2}^T
#   u_t = F_t^{-1} b_{2t+1}
#
# The reduced system on the even blocks is the Schur complement of the
# SPD matrix onto those indices — again SPD block tridiagonal — so the
# recursion is unconditionally well-defined. Every level is BATCHED
# Cholesky/trsm/gemm over nb/2 blocks (vmapped onto the MXU), and there
# are only ceil(log2(nb)) levels instead of nb stages. ~4x the FLOPs of
# the sequential chain, but those FLOPs run at matmul rates: the
# partitioned-factorization attack on the latency-bound solve
# (UMFPACK-role boundary, pose_graph_optimization.rs:124-144).
#
# The per-level (F, A, B) tensors are kept, so substitution for a new
# RHS (reduce b down the levels, solve the root, back-substitute
# x_{2t+1} = F_t^{-T}(u_t - A_t x_2t - B_t x_{2t+2})) costs only batched
# kb^2 matvecs per level — the factor-once / apply-many shape the
# Schwarz preconditioner needs.
# ------------------------------------------------------------------

def _btsolve(f, rhs):
    """Batched lower-triangular solve F^{-1} rhs over leading axis."""
    return jax.lax.linalg.triangular_solve(
        f, rhs, left_side=True, lower=True, transpose_a=False)


def _btsolve_t(f, rhs):
    """Batched F^{-T} rhs over leading axis."""
    return jax.lax.linalg.triangular_solve(
        f, rhs, left_side=True, lower=True, transpose_a=True)


def _bsym(d):
    """Mirror batched lower-triangle blocks before factorization."""
    lo = jnp.tril(d)
    return lo + jnp.swapaxes(jnp.tril(d, -1), -1, -2)


def cr_factorize(r_blocks):
    """Cyclic-reduction factorization of the block-tridiagonal system.

    r_blocks: (nb, kb, 2kb) block rows from ``_prepare_blocks``.
    Returns (levels, f_root): levels is a list of (F, A, B) batched
    (h, kb, kb) tensors per reduction level, f_root the (kb, kb)
    Cholesky factor of the fully reduced root block.

    The chain is reduced at its NATIVE length — a level of m blocks
    eliminates its floor(m/2) odd-indexed blocks and leaves the
    ceil(m/2) even ones (shapes are static per level, which is all XLA
    needs). An earlier variant padded to the next power of two with
    identity blocks; that wasted 33-45% of the factorization FLOPs on
    every bundled graph (intel nb=11 -> 16, dlr 18 -> 32, torus 40 ->
    64 padded eliminations).
    """
    nb, kb = r_blocks.shape[0], r_blocks.shape[1]
    dtype = r_blocks.dtype
    # the scatter fills lower triangles only: mirror ONCE here — every
    # later level's diagonal is a Schur complement and stays symmetric
    d = _bsym(r_blocks[:, :, kb:])
    lo = r_blocks[:, :, :kb]

    from rustrobotics_tpu.ops.batched_tri import chol_blocked, tril_inv

    m = nb
    levels = []
    zero1 = jnp.zeros((1, kb, kb), dtype)
    while m > 1:
        h = m // 2              # eliminated odd blocks 2t+1, t in [0, h)
        he = m - h              # surviving even blocks 2s,  s in [0, he)
        l_odd = lo[1::2]                       # L_{2t+1}  (h,)
        # L_{2t+2}: exists for 2t+2 <= m-1; zero-pad the tail when m even
        l_next = lo[2::2]
        if l_next.shape[0] < h:
            l_next = jnp.concatenate([l_next, zero1])
        # blocked-matmul cholesky + inverse-multiply instead of XLA's
        # cholesky/triangular_solve: both serialize over the (h,) batch
        # axis on TPU (~90 us/item at kb=512), which was most of CR's
        # level cost — the whole point of CR is that each level is ONE
        # batched MXU operation
        f = chol_blocked(d[1::2])
        finv = tril_inv(f)
        a = finv @ l_odd
        b = finv @ jnp.swapaxes(l_next, -1, -2)
        ata = jnp.einsum("tki,tkj->tij", a, a)      # hits even 2t
        btb = jnp.einsum("tki,tkj->tij", b, b)      # hits even 2t+2
        if h < he:  # m odd: last even has no odd above it
            ata = jnp.concatenate([ata, zero1])
        # even s takes btb from odd 2s-1 (t = s-1): shift down one
        btb_prev = jnp.concatenate([zero1, btb[: he - 1]])
        d = d[0::2] - ata - btb_prev
        c = jnp.einsum("tki,tkj->tij", b, a)        # B_t^T A_t
        lo = jnp.concatenate([zero1, -c[: he - 1]])
        levels.append((f, a, b))
        m = he
    f_root = jnp.linalg.cholesky(d[0])
    return levels, f_root


def _cr_interleave(x_even, x_odd):
    """Interleave (he, kb) evens with (h, kb) odds, he - h in {0, 1}."""
    h = x_odd.shape[0]
    kb = x_even.shape[1]
    pairs = jnp.stack([x_even[:h], x_odd], axis=1).reshape(2 * h, kb)
    return jnp.concatenate([pairs, x_even[h:]])


def cr_substitute(levels, f_root, bp):
    """Solve through a cyclic-reduction factor: bp (nb, kb) -> x (nb, kb)."""
    nb, kb = bp.shape
    dtype = bp.dtype
    b = bp

    us = []
    for f, a, bt in levels:
        he = b.shape[0] - b[1::2].shape[0]
        u = _btsolve(f, b[1::2][..., None])[..., 0]          # (h, kb)
        corr_a = jnp.einsum("tij,ti->tj", a, u)              # at even 2t
        if corr_a.shape[0] < he:                             # m odd
            corr_a = jnp.concatenate(
                [corr_a, jnp.zeros((1, kb), dtype)])
        corr_b = jnp.einsum("tij,ti->tj", bt, u)             # at even 2t+2
        corr_b = jnp.concatenate(
            [jnp.zeros((1, kb), dtype), corr_b[: he - 1]])
        b = b[0::2] - corr_a - corr_b
        us.append(u)

    x = _btsolve_t(f_root[None], _btsolve(
        f_root[None], b[0:1][..., None]))[..., 0]            # (1, kb)

    for (f, a, bt), u in zip(reversed(levels), reversed(us)):
        x_even = x                                            # (he, kb)
        h = u.shape[0]
        x_up = x_even[1: h + 1]
        if x_up.shape[0] < h:                                 # m even
            x_up = jnp.concatenate([x_up, jnp.zeros((1, kb), dtype)])
        rhs = (u - jnp.einsum("tij,tj->ti", a, x_even[:h])
               - jnp.einsum("tij,tj->ti", bt, x_up))
        x_odd = _btsolve_t(f, rhs[..., None])[..., 0]
        x = _cr_interleave(x_even, x_odd)
    return x[:nb]


def cr_invert(levels, f_root):
    """Precompute EXPLICIT inverses of every CR triangular factor so the
    substitution becomes pure batched GEMMs (MXU work) instead of
    latency-bound batched triangular solves — the right trade for a
    PRECONDITIONER apply that runs every CG round (inverse-multiply
    carries ~2x the rounding of a trsm, which a preconditioner
    tolerates but an exact solve should not).

    Returns (inv_levels, root_inv): per level (Finv, A, B) with
    Finv = F^-1 (h, kb, kb), plus the root's inverse factor."""
    from rustrobotics_tpu.ops.batched_tri import tril_inv

    inv_levels = []
    for f, a, b in levels:
        inv_levels.append((tril_inv(f), a, b))
    root_inv = tril_inv(f_root)
    return inv_levels, root_inv


def cr_substitute_inv(inv_levels, root_inv, bp):
    """``cr_substitute`` on precomputed inverse factors: every
    triangular solve becomes a batched (kb, kb) @ (kb,) einsum."""
    nb, kb = bp.shape
    dtype = bp.dtype
    b = bp

    us = []
    for finv, a, bt in inv_levels:
        he = b.shape[0] - b[1::2].shape[0]
        u = jnp.einsum("tij,tj->ti", finv, b[1::2])
        corr_a = jnp.einsum("tij,ti->tj", a, u)
        if corr_a.shape[0] < he:                             # m odd
            corr_a = jnp.concatenate(
                [corr_a, jnp.zeros((1, kb), dtype)])
        corr_b = jnp.einsum("tij,ti->tj", bt, u)
        corr_b = jnp.concatenate(
            [jnp.zeros((1, kb), dtype), corr_b[: he - 1]])
        b = b[0::2] - corr_a - corr_b
        us.append(u)

    x = root_inv.T @ (root_inv @ b[0])
    x = x[None]

    for (finv, a, bt), u in zip(reversed(inv_levels), reversed(us)):
        x_even = x
        h = u.shape[0]
        x_up = x_even[1: h + 1]
        if x_up.shape[0] < h:                                 # m even
            x_up = jnp.concatenate([x_up, jnp.zeros((1, kb), dtype)])
        rhs = (u - jnp.einsum("tij,tj->ti", a, x_even[:h])
               - jnp.einsum("tij,tj->ti", bt, x_up))
        x_odd = jnp.einsum("tji,tj->ti", finv, rhs)
        x = _cr_interleave(x_even, x_odd)
    return x[:nb]


def solve_band_cr(bl: BandCholLayout, vals, b):
    """Jittable banded solve via cyclic reduction (same contract as
    ``solve_band_chol``; log-depth batched factorization)."""
    dtype = vals.dtype
    n, kb, nb = bl.n, bl.kb, bl.nb
    npad = nb * kb

    with jax.default_matmul_precision("highest"):
        r_blocks, dinv_p = _prepare_blocks(bl, vals)
        bp = b[jnp.asarray(bl.perm)]
        bp = jnp.concatenate([bp, jnp.zeros(npad - n, dtype)])
        bp = (bp * dinv_p).reshape(nb, kb)
        levels, f_root = cr_factorize(r_blocks)
        xs = cr_substitute(levels, f_root, bp)

    y = xs.reshape(-1)[:npad] * dinv_p
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
    cov_blocks, _, dinv_p = _selected_inverse(bl, vals)
    var_scaled = jnp.diagonal(cov_blocks, axis1=1, axis2=2).reshape(-1)
    var_p = var_scaled * dinv_p**2  # undo Jacobi scaling
    return var_p[jnp.asarray(bl.inv_perm)]


def _selected_inverse(bl: BandCholLayout, vals):
    """Shared backward selected-inverse recursion (lax.scan, reverse).

    Returns (covs (nb, kb, kb), offs (nb-1 or 1, kb, kb), dinv_p) on the
    Jacobi-SCALED system: covs[j] = C_{jj}, offs[j] = C_{j+1,j}.
    """
    dtype = vals.dtype
    kb, nb = bl.kb, bl.nb

    with jax.default_matmul_precision("highest"):
        r_blocks, dinv_p = _prepare_blocks(bl, vals)
        # fused factorize-with-inverses (matmul-only — the trsm-per-step
        # variant serializes under any batch axis on TPU)
        lds, ldinvs, lps = _factorize_inv(r_blocks)

        cov_last = ldinvs[-1].T @ ldinvs[-1]
        if nb == 1:
            return cov_last[None], jnp.zeros((1, kb, kb), dtype), dinv_p

        def bwd(cov_next, inp):
            ld_inv, lp = inp
            g = ld_inv.T @ ld_inv
            s_ld_inv = lp @ ld_inv  # S_j Ld_j^-1
            off = -cov_next @ s_ld_inv  # C_{j+1,j}
            cov = g + s_ld_inv.T @ cov_next @ s_ld_inv
            return cov, (cov, off)

        _, (covs_head, offs) = jax.lax.scan(
            bwd, cov_last, (ldinvs[:-1], lps), reverse=True
        )
        covs = jnp.concatenate([covs_head, cov_last[None]])
    return covs, offs, dinv_p


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

    covs, offs, dinv_p = _selected_inverse(bl, vals)
    diag_buf = covs.reshape(-1)          # (nb*kb*kb,)
    off_buf = offs.reshape(-1)

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
