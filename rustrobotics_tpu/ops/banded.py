"""Block-banded SpMV with a Pallas TPU kernel.

After RCM reordering, PGO normal-equation matrices are narrow-banded
(intel: bandwidth 455 of n=5184; dlr: 615 of 11043). We store P H P^T as a
*block-banded* tensor of 128x128 tiles — (block_rows, 2*half+1, 128, 128) —
so the SpMV is a batch of dense MXU matmuls over 128-aligned slices of x:
no gathers (Mosaic rejects them), no scatters (XLA serializes them), no
unaligned vector loads (Mosaic rejects those too — an earlier scalar-banded
variant failed on exactly that).

The Pallas kernel walks block rows on the sequential TPU grid with x
resident in VMEM; band tiles stream through the pallas pipeline. A jnp
reference implementation with the same block layout backs CPU execution.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128  # TPU tile edge


@dataclasses.dataclass(frozen=True)
class BandedLayout:
    """Host-side block-band structure of P H P^T for a fixed pattern."""

    n: int  # logical dimension
    nb: int  # number of 128-row blocks
    half: int  # block half-bandwidth: |I - J| <= half
    kb: int  # 2*half + 1 block diagonals
    perm: np.ndarray  # (n,) RCM permutation: band index -> dof index
    inv_perm: np.ndarray  # (n,)
    ell_to_block: np.ndarray  # (ell_nnz,) flat position into the band tensor


def build_banded(layout) -> BandedLayout:
    """Block-band structure from a SystemLayout's deduped ELL pattern."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = layout.n
    order = layout.ell_order
    rows_s = layout.rows[order]
    cols_s = layout.cols[order]
    first = np.ones(len(rows_s), bool)
    first[1:] = (rows_s[1:] != rows_s[:-1]) | (cols_s[1:] != cols_s[:-1])
    ur, uc = rows_s[first], cols_s[first]

    h = sp.coo_matrix((np.ones(len(ur)), (ur, uc)), shape=(n, n)).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(h, symmetric_mode=True))
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)

    bi = inv[ur]
    bj = inv[uc]
    blk_i = bi // LANE
    blk_j = bj // LANE
    half = int(np.abs(blk_i - blk_j).max()) if len(bi) else 0
    kb = 2 * half + 1
    nb = -(-n // LANE)
    dj = blk_j - blk_i + half
    flat = ((blk_i * kb + dj) * LANE + bi % LANE) * LANE + bj % LANE
    return BandedLayout(
        n=n, nb=int(nb), half=half, kb=kb,
        perm=perm.astype(np.int32), inv_perm=inv.astype(np.int32),
        ell_to_block=flat.astype(np.int64),
    )


def band_values(blayout: BandedLayout, layout, vals):
    """Jittable: triplet values -> (nb, kb, 128, 128) band tensor.
    One scatter per GN step, amortized over all CG iterations."""
    csr_vals = jax.ops.segment_sum(
        vals[jnp.asarray(layout.ell_order)],
        jnp.asarray(layout.ell_seg),
        num_segments=layout.ell_nnz,
    )
    flat = jnp.zeros(blayout.nb * blayout.kb * LANE * LANE, dtype=vals.dtype)
    flat = flat.at[jnp.asarray(blayout.ell_to_block)].set(csr_vals)
    return flat.reshape(blayout.nb, blayout.kb, LANE, LANE)


def _pad_x_blocks(blayout: BandedLayout, xb):
    """Band-space x (n,) -> (nb + 2*half, 128) zero-padded block stack."""
    n_pad = blayout.nb * LANE
    xq = jnp.zeros(n_pad, xb.dtype).at[jnp.arange(blayout.n)].set(xb)
    xq = xq.reshape(blayout.nb, LANE)
    zeros = jnp.zeros((blayout.half, LANE), xb.dtype)
    return jnp.concatenate([zeros, xq, zeros], axis=0)


def banded_matvec_jnp(blayout: BandedLayout, hb, xp_blocks):
    """Reference: y_I = sum_d hb[I, d] @ xp_blocks[I + d]."""
    idx = (jnp.arange(blayout.nb)[:, None]
           + jnp.arange(blayout.kb)[None, :])  # (nb, kb)
    windows = xp_blocks[idx]  # (nb, kb, LANE)
    return jnp.einsum(
        "ndij,ndj->ni", hb, windows,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1)


ROWS_PER_STEP = 8  # sublane tile: out blocks must be (8, 128)-aligned


def banded_matvec_pallas(blayout: BandedLayout, hb, xp_blocks, interpret=False):
    """Pallas TPU kernel: sequential grid over groups of 8 block rows; x
    resident in VMEM; 128-aligned dynamic slices; MXU matmuls."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, kb = blayout.nb, blayout.kb
    nb8 = -(-nb // ROWS_PER_STEP) * ROWS_PER_STEP
    if nb8 != nb:
        hb = jnp.pad(hb, ((0, nb8 - nb), (0, 0), (0, 0), (0, 0)))
        xp_blocks = jnp.pad(xp_blocks, ((0, nb8 - nb), (0, 0)))
    xp_flat = xp_blocks.reshape(1, -1)  # (1, (nb8 + 2*half) * LANE)

    def kernel(h_ref, x_ref, y_ref):
        g = pl.program_id(0)
        rows = []
        for r in range(ROWS_PER_STEP):
            start = pl.multiple_of((g * ROWS_PER_STEP + r) * LANE, LANE)
            xw = x_ref[0, pl.ds(start, kb * LANE)].reshape(kb, LANE)
            rows.append(
                jax.lax.dot_general(
                    h_ref[r], xw,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=hb.dtype,
                ).sum(axis=0)
            )
        y_ref[:] = jnp.stack(rows, axis=0)

    y = pl.pallas_call(
        kernel,
        grid=(nb8 // ROWS_PER_STEP,),
        in_specs=[
            pl.BlockSpec((ROWS_PER_STEP, kb, LANE, LANE),
                         lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xp_flat.shape[1]), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS_PER_STEP, LANE), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb8, LANE), hb.dtype),
        interpret=interpret,
    )(hb, xp_flat)
    return y.reshape(-1)[: nb * LANE]


def make_banded_matvec(blayout: BandedLayout, layout, vals, use_pallas=None,
                       interpret=False):
    """Closure mapping dof-space x -> dof-space H @ x through band space."""
    hb = band_values(blayout, layout, vals)
    perm = jnp.asarray(blayout.perm)
    inv = jnp.asarray(blayout.inv_perm)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def matvec(x):
        xp_blocks = _pad_x_blocks(blayout, x[perm])
        if use_pallas:
            yb = banded_matvec_pallas(blayout, hb, xp_blocks,
                                      interpret=interpret)
        else:
            yb = banded_matvec_jnp(blayout, hb, xp_blocks)
        return yb[inv]

    return matvec
