"""Fused Pallas banded-Cholesky factorization + substitution (TPU).

The third attack on the UMFPACK-role solve (pose_graph_optimization.rs:
124-144), alongside the XLA scan chain (``band_chol._factorize``) and
block cyclic reduction (``band_chol.cr_factorize``). The scan chain is
latency-bound: each of the nb stages is a separate XLA
cholesky/trsm/syrk whose internal column loops run at XLA-op dispatch
granularity, with the running (kb, kb) block bouncing through HBM
between stages. This kernel fuses the ENTIRE chain into one
``pallas_call``:

- grid = (nb,) — TPU grids run sequentially on a core, so the running
  block lives in a VMEM scratch buffer across block rows; block rows
  stream HBM->VMEM through the Pallas pipeline while the previous row
  computes.
- Per block row it computes the INVERSE Cholesky factor
  ``ldinv_j = chol(D_hat_j)^-1`` instead of the factor itself. That one
  choice makes everything downstream a plain MXU matmul: the coupling
  panel ``lp_j = L_j @ ldinv_{j-1}^T``, the Schur update
  ``D_hat = D - lp lp^T``, and BOTH substitution sweeps
  (``y_j = ldinv_j (b_j - lp_j y_{j-1})``,
  ``x_j = ldinv_j^T (y_j - lp_{j+1}^T x_{j+1})``) — no triangular
  solves ever leave the 128-wide base case.
- The base case factors one 128x128 panel per ``fori_loop`` pass,
  producing L and L^-1 rows TOGETHER (the inverse row is one masked
  (1,128)@(128,128) MXU matvec of rows already produced), so the
  sequential part of the whole factorization is exactly n scalar
  pivot steps — the Cholesky critical path — at Mosaic loop overhead
  instead of XLA op overhead.

Numerical contract: identical to ``solve_band_chol`` (same Jacobi
scaling, same symmetrization, f32 with HIGHEST-precision matmuls);
parity is pinned in tests/test_band_pallas.py. VMEM budget bounds the
block size: supported for kb <= 512 (intel kb=512, sphere2500 384,
parking-garage 256; dlr 640 / torus3D 768 fall back to the XLA chain
or CR).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

PANEL = 128
# double-buffered in/out blocks + three (kb, kb) scratch buffers must
# fit 16 MB VMEM: kb=512 totals ~11 MB, kb=640 ~18 MB (too big)
MAX_KB = 512

_HI = jax.lax.Precision.HIGHEST

try:  # pallas import kept lazy-safe: CPU-only images without Mosaic work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover - pallas ships with jax everywhere here
    _PALLAS_OK = False


def _dotg(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )


MICRO = 8


def _chol_inv_small(a, p):
    """(p, p) symmetric SPD tile -> inverse Cholesky factor, one
    fori_loop of p scalar-pivot steps.

    Builds L (transposed: row j = column j of L) and L^-1 row-by-row:
    row j of the inverse is ``s * (e_j - L[j, :j] @ Linv[:j, :])`` with
    ``s = 1/L[j,j]`` — rows >= j of Linv are still zero, so the masked
    matvec needs no upper bound. Row extraction/insertion is
    masked-select/reduce (value-level dynamic_slice does not lower
    through Mosaic TC). Used at p = MICRO, where every pass is a
    fraction of a vreg.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    lane2d = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    row2d = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)

    def body(j, carry):
        a_cur, lt, linv = carry
        arow = jnp.sum(jnp.where(row2d == j, a_cur, 0.0),
                       axis=0, keepdims=True)                    # row j
        d = jnp.sum(jnp.where(lane == j, arow, 0.0))
        s = jax.lax.rsqrt(d)
        lrow = jnp.where(lane >= j, arow, 0.0) * s              # L[:, j] as a row
        # column form via masked reduce (A symmetric: col j == row j,
        # but the reduce avoids a lane->sublane transpose)
        lcol = jnp.sum(jnp.where(lane2d == j, a_cur, 0.0),
                       axis=1, keepdims=True) * s               # (p, 1)
        lcol = jnp.where(row2d[:, :1] >= j, lcol, 0.0)
        a_cur = a_cur - lcol * lrow                              # rank-1 Schur
        lt = jnp.where(row2d == j, lrow, lt)                     # write row j
        # L[j, :j] as a row: column j of lt (rows > j still zero; the
        # k = j term multiplies the still-zero Linv row j)
        ljrow = jnp.sum(jnp.where(lane2d == j, lt, 0.0),
                        axis=1)[None, :]
        corr = _dotg(ljrow, linv, ((1,), (0,)))
        linv_row = s * (jnp.where(lane == j, 1.0, 0.0) - corr)
        linv = jnp.where(row2d == j, linv_row, linv)
        return a_cur, lt, linv

    zeros = jnp.zeros((p, p), jnp.float32)
    _, _, linv = jax.lax.fori_loop(0, p, body, (a, zeros, zeros))
    return linv


def _panel_chol_inv(a):
    """(PANEL, PANEL) symmetric SPD block -> inverse Cholesky factor.

    Right-looking over MICRO-row groups: the scalar recursion runs only
    inside the (MICRO, MICRO) pivot tiles (`_chol_inv_small`), while the
    group panel, rank-MICRO trailing update, and inverse-row
    construction are static-sliced matmuls. Per 128-panel this is 16
    groups x ~3 full-tile passes instead of 128 x ~4 — an ~8x cut of
    the VPU work on the factorization's critical path.

    The group rows of the panel product come for free:
    ``A[:, G] @ linv8^T`` restricted to rows in G equals
    ``A_GG linv8^T = L8 L8^T linv8^T = L8``, so one matmul yields both
    the sub-panel and the pivot factor rows.
    """
    p, m = PANEL, MICRO
    row_col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    lane2d = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    row2d = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (m, p), 1)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    linv = jnp.zeros((p, p), jnp.float32)
    for g in range(p // m):
        base = g * m
        sl = slice(base, base + m)
        # one-hot placement rows E_G (m, p): E_G[i, base+i] = 1 —
        # value-level .at[].set lowers to an unimplemented scatter in
        # Mosaic TC, so panel writes go through E_G matmuls + selects
        eg = jnp.where(lane_g == base + row_g, 1.0, 0.0)
        linv8 = _chol_inv_small(a[sl, sl], m)
        lsub = _dotg(a[:, sl], linv8, ((1,), (1,)))              # (p, m)
        lsub = jnp.where(row_col >= base, lsub, 0.0)
        placed = _dotg(lsub, eg, ((1,), (0,)))                   # cols at G
        in_g = (lane2d >= base) & (lane2d < base + m)
        a = jnp.where(in_g, placed, a)                           # L panel in place
        below = jnp.where(row_col >= base + m, lsub, 0.0)
        a = a - _dotg(below, below, ((1,), (1,)))                # rank-m Schur
        # inverse rows for the group:
        # Linv[G, :] = linv8 @ (E_G - L[G, :base] @ Linv[:base, :])
        lg = jnp.where(lane_g < base, a[sl, :], 0.0)             # (m, p)
        corr = _dotg(lg, linv, ((1,), (0,)))
        rows = _dotg(linv8, eg - corr, ((1,), (0,)))             # (m, p)
        rows_placed = _dotg(eg, rows, ((0,), (0,)))              # rows at G
        in_rows = (row2d >= base) & (row2d < base + m)
        linv = jnp.where(in_rows, rows_placed, linv)
    return linv


def _blocked_chol_inv(a_ref, ldinv_ref):
    """In-place blocked inverse-Cholesky of the (kb, kb) workspace
    ``a_ref``; writes the full lower-triangular inverse factor into
    ``ldinv_ref``. L's sub-diagonal panels overwrite the factored
    columns of ``a_ref`` (their Schur updates are complete)."""
    kb = a_ref.shape[-1]
    np_ = kb // PANEL

    def pslice(i):
        return slice(i * PANEL, (i + 1) * PANEL)

    for i in range(np_):
        linv_ii = _panel_chol_inv(a_ref[pslice(i), pslice(i)])
        ldinv_ref[pslice(i), pslice(i)] = linv_ii
        if i + 1 < np_:
            rest = slice((i + 1) * PANEL, kb)
            lsub = _dotg(a_ref[rest, pslice(i)], linv_ii, ((1,), (1,)))
            a_ref[rest, pslice(i)] = lsub
            a_ref[rest, rest] = a_ref[rest, rest] - _dotg(
                lsub, lsub, ((1,), (1,)))

    # off-diagonal inverse panels (block forward substitution):
    # Linv[k, i] = -Linv_kk @ sum_{m=i}^{k-1} L[k, m] @ Linv[m, i]
    for i in range(np_):
        for k in range(i + 1, np_):
            acc = _dotg(a_ref[pslice(k), pslice(i)],
                        ldinv_ref[pslice(i), pslice(i)], ((1,), (0,)))
            for m in range(i + 1, k):
                acc = acc + _dotg(a_ref[pslice(k), pslice(m)],
                                  ldinv_ref[pslice(m), pslice(i)],
                                  ((1,), (0,)))
            ldinv_ref[pslice(k), pslice(i)] = -_dotg(
                ldinv_ref[pslice(k), pslice(k)], acc, ((1,), (0,)))
    for i in range(np_):
        for k in range(i + 1, np_):
            ldinv_ref[pslice(i), pslice(k)] = jnp.zeros(
                (PANEL, PANEL), jnp.float32)


def _factor_kernel(dsym_ref, lcoup_ref, ldinv_ref, lp_ref, prev_ref, a_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        prev_ref[...] = jnp.zeros(prev_ref.shape, prev_ref.dtype)

    # lp_j = Lcoup_j @ ldinv_{j-1}^T ; running block D_hat = Dsym - lp lp^T
    lp = _dotg(lcoup_ref[0], prev_ref[...], ((1,), (1,)))
    lp_ref[0] = lp
    a_ref[...] = dsym_ref[0] - _dotg(lp, lp, ((1,), (1,)))

    _blocked_chol_inv(a_ref, ldinv_ref.at[0])
    prev_ref[...] = ldinv_ref[0]


def _fwd_kernel(ldinv_ref, lp_ref, b_ref, y_ref, yprev_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        yprev_ref[...] = jnp.zeros(yprev_ref.shape, yprev_ref.dtype)

    # y_j = ldinv_j @ (b_j - lp_j @ y_{j-1})   (row form)
    t = b_ref[0] - _dotg(yprev_ref[...], lp_ref[0], ((1,), (1,)))
    y = _dotg(t, ldinv_ref[0], ((1,), (1,)))
    y_ref[0] = y
    yprev_ref[...] = y


def _bwd_kernel(ldinv_ref, lp_ref, y_ref, x_ref, xnext_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        xnext_ref[...] = jnp.zeros(xnext_ref.shape, xnext_ref.dtype)

    # x_j = ldinv_j^T @ (y_j - lp_{j+1}^T @ x_{j+1})   (row form; at the
    # last block the clamped lp block is multiplied by the zero carry)
    t = y_ref[0] - _dotg(xnext_ref[...], lp_ref[0], ((1,), (0,)))
    x = _dotg(t, ldinv_ref[0], ((1,), (0,)))
    x_ref[0] = x
    xnext_ref[...] = x


def pallas_band_supported(bl) -> bool:
    """True when the fused kernel's VMEM budget admits this layout."""
    return _PALLAS_OK and bl is not None and bl.kb <= MAX_KB \
        and bl.kb % PANEL == 0


def _compiler_params():
    try:
        return pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    except Exception:  # pragma: no cover - older signature
        return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def factorize_pallas(r_blocks, interpret=False):
    """Fused factorization: (nb, kb, 2kb) block rows ->
    (ldinv (nb, kb, kb), lp (nb, kb, kb)); lp[0] == 0."""
    nb, kb = r_blocks.shape[0], r_blocks.shape[1]
    r32 = r_blocks.astype(jnp.float32)
    # symmetrize the (lower-triangle-scattered) diagonal blocks outside
    # the kernel — one cheap batched pass instead of an in-kernel
    # (kb, kb) transpose per block row
    d_raw = r32[:, :, kb:]
    lo = jnp.tril(d_raw)
    dsym = lo + jnp.swapaxes(jnp.tril(d_raw, -1), -1, -2)
    lcoup = r32[:, :, :kb]

    kw = {}
    cp = _compiler_params()
    if cp is not None and not interpret:
        kw["compiler_params"] = cp
    ldinv, lp = pl.pallas_call(
        _factor_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, kb, kb), lambda j: (j, 0, 0)),
            pl.BlockSpec((1, kb, kb), lambda j: (j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, kb, kb), lambda j: (j, 0, 0)),
            pl.BlockSpec((1, kb, kb), lambda j: (j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, kb, kb), jnp.float32),
            jax.ShapeDtypeStruct((nb, kb, kb), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((kb, kb), jnp.float32),
            pltpu.VMEM((kb, kb), jnp.float32),
        ],
        interpret=interpret,
        **kw,
    )(dsym, lcoup)
    return ldinv, lp


@functools.partial(jax.jit, static_argnames=("interpret",))
def substitute_pallas(ldinv, lp, bp, interpret=False):
    """Solve L L^T x = bp through the inverse factors: two fused
    matmul-only sweeps (forward then reverse grid)."""
    nb, kb = bp.shape
    b_rows = bp.astype(jnp.float32)[:, None, :]           # (nb, 1, kb)

    kw = {}
    cp = _compiler_params()
    if cp is not None and not interpret:
        kw["compiler_params"] = cp

    blk = lambda j: (j, 0, 0)  # noqa: E731
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, kb, kb), blk),
            pl.BlockSpec((1, kb, kb), blk),
            pl.BlockSpec((1, 1, kb), blk),
        ],
        out_specs=pl.BlockSpec((1, 1, kb), blk),
        out_shape=jax.ShapeDtypeStruct((nb, 1, kb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, kb), jnp.float32)],
        interpret=interpret,
        **kw,
    )(ldinv, lp, b_rows)

    rev = lambda s: (nb - 1 - s, 0, 0)  # noqa: E731
    # lp_{j+1} for j = nb-1-s, clamped at the last block (zero carry
    # kills the spurious term)
    rev_lp = lambda s: (jnp.minimum(nb - s, nb - 1), 0, 0)  # noqa: E731
    x = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, kb, kb), rev),
            pl.BlockSpec((1, kb, kb), rev_lp),
            pl.BlockSpec((1, 1, kb), rev),
        ],
        out_specs=pl.BlockSpec((1, 1, kb), rev),
        out_shape=jax.ShapeDtypeStruct((nb, 1, kb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, kb), jnp.float32)],
        interpret=interpret,
        **kw,
    )(ldinv, lp, y)
    return x[:, 0, :]


def solve_band_pallas(bl, vals, b, interpret=None):
    """Jittable banded solve through the fused Pallas kernels — same
    contract as ``solve_band_chol`` (band_chol.py): RCM + Jacobi
    scaling outside, factor + two sweeps inside Pallas."""
    from rustrobotics_tpu.ops.band_chol import _prepare_blocks

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = vals.dtype
    n, kb, nb = bl.n, bl.kb, bl.nb
    npad = nb * kb

    with jax.default_matmul_precision("highest"):
        r_blocks, dinv_p = _prepare_blocks(bl, vals.astype(jnp.float32))
        bp = b.astype(jnp.float32)[jnp.asarray(bl.perm)]
        bp = jnp.concatenate([bp, jnp.zeros(npad - n, jnp.float32)])
        bp = (bp * dinv_p).reshape(nb, kb)
        ldinv, lp = factorize_pallas(r_blocks, interpret=interpret)
        xs = substitute_pallas(ldinv, lp, bp, interpret=interpret)

    y = xs.reshape(-1)[:npad] * dinv_p
    return y[jnp.asarray(bl.inv_perm)].astype(dtype)
