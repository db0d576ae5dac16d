"""Linear solvers for the Gauss-Newton normal equations H dx = b.

The reference's single solver is UMFPACK (SuiteSparse, C) behind an FFI
(pose_graph_optimization.rs:124-144), re-factorized from scratch every
iteration. Here the solver is a pluggable backend:

- ``dense``  : jitted Cholesky (jax.scipy cho_factor/cho_solve). On TPU the
               blocked Cholesky runs on the MXU; right choice up to ~10k dof.
- ``host``   : scipy SuperLU (sparse direct, f64 on host) — the UMFPACK
               role for oracle-parity runs and a CPU fallback. Swapped for
               the native C++ solver when built (rustrobotics_tpu.ops.native).
- ``cg``     : matrix-free preconditioned conjugate gradients on the block
               triplets — the TPU-native path that scales and shards
               (collectives supplied by the caller via matvec).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.mapping.assemble import SystemLayout, dense_hessian


def solve_dense(layout: SystemLayout, vals, b):
    """Jittable dense Cholesky solve with symmetric Jacobi scaling.

    The +1e7 gauge prior (rs:331) pushes the condition number past what
    f32 Cholesky tolerates; scaling by D^-1/2 (D = diag H) brings every
    diagonal to 1 and makes the f32 TPU path stable while leaving f64
    results unchanged to roundoff.
    """
    h = dense_hessian(layout, vals)
    d = jnp.sqrt(jnp.clip(jnp.diagonal(h), 1e-12, None))
    hs = h / (d[:, None] * d[None, :])
    # Full-f32 matmul passes for the factorization only: TPU default (bf16
    # passes) NaNs on this conditioning; the rest of the pipeline stays at
    # default precision for speed.
    with jax.default_matmul_precision("highest"):
        cf = jax.scipy.linalg.cho_factor(hs)
        out = jax.scipy.linalg.cho_solve(cf, b / d) / d
    return out


def solve_host(layout: SystemLayout, vals, b):
    """Host-side sparse direct solve (SuperLU; duplicates in the COO
    triplets are summed, matching UMFPACK's assembly of repeated put()s,
    rs:194-212)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    vals = np.asarray(vals, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    h = sp.coo_matrix((vals, (layout.rows, layout.cols)), shape=(layout.n, layout.n))
    lu = spla.splu(h.tocsc())
    return lu.solve(b)


def ell_values(layout: SystemLayout, vals):
    """Duplicate-summed triplet values scattered into the padded ELL
    value table (n, width). One scatter per GN step, amortized over all
    CG iterations (which are then pure gathers)."""
    csr_vals = jax.ops.segment_sum(
        vals[jnp.asarray(layout.ell_order)],
        jnp.asarray(layout.ell_seg),
        num_segments=layout.ell_nnz,
    )
    flat = jnp.zeros(layout.n * layout.ell_width, dtype=vals.dtype)
    flat = flat.at[jnp.asarray(layout.ell_pos)].set(csr_vals)
    return flat.reshape(layout.n, layout.ell_width)


def make_ell_matvec(layout: SystemLayout, vals):
    """Gather-based SpMV: y = sum_d ell_vals[:, d] * x[nbr[:, d]].

    No scatters in the CG inner loop — the TPU-friendly formulation
    (XLA scatters on TPU serialize; gathers vectorize).
    """
    ell_vals = ell_values(layout, vals)
    nbr = jnp.asarray(layout.ell_nbr)

    def matvec(x):
        return jnp.sum(ell_vals * x[nbr], axis=1)

    return matvec


def make_block_jacobi(layout: SystemLayout, vals):
    """Per-node block-Jacobi preconditioner: the 3x3/2x2/6x6 diagonal
    blocks of H, identity-padded to 6x6 and batch-inverted."""
    dof_block = jnp.asarray(layout.dof_block)
    dof_pos = jnp.asarray(layout.dof_pos)
    rows = jnp.asarray(layout.rows)
    cols = jnp.asarray(layout.cols)
    br, bc = dof_block[rows], dof_block[cols]
    blocks = jnp.zeros((layout.n_blocks, 6, 6), dtype=vals.dtype).at[
        br, dof_pos[rows], dof_pos[cols]
    ].add(jnp.where(br == bc, vals, 0.0))
    blocks = blocks + jnp.asarray(layout.pad_eye, dtype=vals.dtype)
    with jax.default_matmul_precision("highest"):
        binv = jnp.linalg.inv(blocks)

    def precond(r):
        rb = jnp.zeros((layout.n_blocks, 6), dtype=r.dtype).at[
            dof_block, dof_pos
        ].set(r)
        yb = jnp.einsum("kij,kj->ki", binv, rb,
                        precision=jax.lax.Precision.HIGHEST)
        return yb[dof_block, dof_pos]

    return precond


def solve_cg(layout: SystemLayout, vals, b, tol=1e-10, maxiter=None):
    """Block-Jacobi preconditioned CG on the gather-form ELL operator
    (jittable) — the scalable device solve."""
    matvec = make_ell_matvec(layout, vals)
    precond = make_block_jacobi(layout, vals)
    x, _ = jax.scipy.sparse.linalg.cg(
        matvec,
        b,
        tol=tol,
        maxiter=maxiter if maxiter is not None else 4 * layout.n,
        M=precond,
    )
    return x


def solve_schur(layout: SystemLayout, vals, b):
    """Schur-complement elimination of 2D landmark blocks (jittable).

    The classic SLAM reduction (SURVEY §2.2/§5): with H = [[Hpp, Hpl],
    [Hlp, Hll]] and Hll block-diagonal (2x2 per landmark — landmarks never
    connect to each other), solve the reduced pose system
    ``S dxp = bp - Hpl Hll^-1 bl`` with ``S = Hpp - Hpl Hll^-1 Hlp``
    (dense Cholesky, Jacobi-scaled), then back-substitute
    ``dxl = Hll^-1 (bl - Hlp dxp)``. Falls back to the plain dense solve on
    landmark-free graphs.
    """
    if len(layout.lm_dofs) == 0:
        return solve_dense(layout, vals, b)
    dtype = vals.dtype
    np_dof = len(layout.pose_dofs)
    nl_dof = len(layout.lm_dofs)
    n_lm = nl_dof // 2

    # Host-side (trace-time) partition of the triplets by Schur quadrant:
    # each scatter below touches only its own values. (A masked scatter
    # over ALL triplets per quadrant costs ~3x the triplet count in
    # sort-based scatter work — profiled at ~13 ms/iteration on dlr.g2o.)
    rows_np, cols_np = layout.rows, layout.cols
    lm_r = layout.dof_is_lm[rows_np]
    lm_c = layout.dof_is_lm[cols_np]
    compact_np = layout.dof_compact
    sel_pp = np.where(~lm_r & ~lm_c)[0]
    sel_pl = np.where(~lm_r & lm_c)[0]
    sel_ll = np.where(lm_r & lm_c)[0]

    h_pp = jnp.zeros((np_dof, np_dof), dtype=dtype).at[
        jnp.asarray(compact_np[rows_np[sel_pp]]),
        jnp.asarray(compact_np[cols_np[sel_pp]]),
    ].add(vals[jnp.asarray(sel_pp)])
    h_pl = jnp.zeros((np_dof, nl_dof), dtype=dtype).at[
        jnp.asarray(compact_np[rows_np[sel_pl]]),
        jnp.asarray(compact_np[cols_np[sel_pl]]),
    ].add(vals[jnp.asarray(sel_pl)])
    # Hll as (L, 2, 2) blocks
    ll_r = compact_np[rows_np[sel_ll]]
    ll_c = compact_np[cols_np[sel_ll]]
    h_ll = jnp.zeros((n_lm, 2, 2), dtype=dtype).at[
        jnp.asarray(ll_r // 2), jnp.asarray(ll_r % 2), jnp.asarray(ll_c % 2)
    ].add(vals[jnp.asarray(sel_ll)])

    bp = b[jnp.asarray(layout.pose_dofs)]
    bl = b[jnp.asarray(layout.lm_dofs)]

    with jax.default_matmul_precision("highest"):
        h_ll_inv = jnp.linalg.inv(h_ll)
        # W = Hll^-1 Hlp  -> (L, 2, np_dof)
        hlp_blocks = h_pl.T.reshape(n_lm, 2, np_dof)
        w = jnp.einsum("lij,ljp->lip", h_ll_inv, hlp_blocks)
        s = h_pp - h_pl @ w.reshape(nl_dof, np_dof)
        bl_blocks = bl.reshape(n_lm, 2)
        hll_inv_bl = jnp.einsum("lij,lj->li", h_ll_inv, bl_blocks).reshape(-1)
        rhs = bp - h_pl @ hll_inv_bl
        # Jacobi-scaled Cholesky on the reduced system
        d = jnp.sqrt(jnp.clip(jnp.diagonal(s), 1e-12, None))
        ss = s / (d[:, None] * d[None, :])
        cf = jax.scipy.linalg.cho_factor(ss)
        dxp = jax.scipy.linalg.cho_solve(cf, rhs / d) / d
        resid = (bl_blocks
                 - (h_pl.T @ dxp).reshape(n_lm, 2))
        dxl = jnp.einsum("lij,lj->li", h_ll_inv, resid).reshape(-1)

    dx = jnp.zeros(layout.n, dtype=dtype)
    dx = dx.at[jnp.asarray(layout.pose_dofs)].set(dxp)
    dx = dx.at[jnp.asarray(layout.lm_dofs)].set(dxl)
    return dx


def solve_cg_banded(layout: SystemLayout, blayout, vals, b, tol=1e-6,
                    maxiter=400, use_pallas=None):
    """Block-Jacobi PCG on the block-banded operator (Pallas SpMV on TPU,
    jnp reference elsewhere) — the fast device iterative solve."""
    from rustrobotics_tpu.ops.banded import make_banded_matvec

    matvec = make_banded_matvec(blayout, layout, vals, use_pallas=use_pallas)
    precond = make_block_jacobi(layout, vals)
    x, _ = jax.scipy.sparse.linalg.cg(
        matvec, b, tol=tol, maxiter=maxiter, M=precond
    )
    return x


def make_banded_direct(layout: SystemLayout):
    """Banded blocked Cholesky (RCM + block-row storage, ops/band_chol):
    the TPU-native direct factorization. Returns a jittable solve(vals, b)
    or None when the RCM bandwidth is too large for the banded path."""
    from rustrobotics_tpu.ops.band_chol import build_band_chol, solve_band_chol

    bl = build_band_chol(layout)
    if bl is None:
        return None
    return lambda vals, b: solve_band_chol(bl, vals, b)


def make_banded_cr(layout: SystemLayout):
    """Banded cyclic-reduction direct solve (ops/band_chol.cr_factorize):
    the log-depth BATCHED factorization — same numerical contract as
    ``make_banded_direct`` but each level runs nb/2-way batched
    Cholesky/trsm/gemm on the MXU instead of a sequential chain. Returns
    a jittable solve(vals, b) or None when the RCM bandwidth is too
    large."""
    from rustrobotics_tpu.ops.band_chol import build_band_chol, solve_band_cr

    bl = build_band_chol(layout)
    if bl is None:
        return None
    return lambda vals, b: solve_band_cr(bl, vals, b)


def make_banded_pallas(layout: SystemLayout):
    """Fused Pallas banded factorization+substitution
    (ops/band_chol_pallas): the whole chain in three kernel launches
    with the running block resident in VMEM. Returns a jittable
    solve(vals, b) or None when the bandwidth exceeds the kernel's
    VMEM budget (kb > 512) or the band fell back entirely."""
    from rustrobotics_tpu.ops.band_chol import build_band_chol
    from rustrobotics_tpu.ops.band_chol_pallas import (
        pallas_band_supported,
        solve_band_pallas,
    )

    bl = build_band_chol(layout)
    if not pallas_band_supported(bl):
        return None
    return lambda vals, b: solve_band_pallas(bl, vals, b)


def _pcg_counted(matvec, precond, b, tol, maxiter):
    """Preconditioned CG (jax.scipy.sparse.linalg.cg semantics: stop at
    ||r|| <= tol ||b||) as an explicit while_loop that ALSO returns the
    round count — the instrumentation the roofline/microbench need that
    the library solver hides."""
    z0 = precond(b)
    bb = jnp.vdot(b, b)
    atol2 = (tol * tol) * bb

    def cond(s):
        *_, rr, k = s
        return jnp.logical_and(k < maxiter, rr > atol2)

    def step(s):
        x, r, z, p, rz, _, k = s
        ap = matvec(p)
        alpha = rz / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new, jnp.vdot(r, r), k + 1)

    s0 = (jnp.zeros_like(b), b, z0, z0, jnp.vdot(b, z0), bb,
          jnp.asarray(0, jnp.int32))
    x, *_, rounds = jax.lax.while_loop(cond, step, s0)
    return x, rounds


def make_banded_mixed(layout: SystemLayout, tol=None, maxiter=256,
                      lp="high", lift=None, return_rounds=False):
    """Mixed-precision banded solve (HPL-AI / iterative-refinement style):

    factor the Jacobi-scaled band ONCE at LOW precision, then use that
    cheap factor as the preconditioner of full-precision CG on the EXACT
    scaled operator. Two low-precision modes:

    - ``lp="high"`` (default): the cyclic-reduction factorization runs
      under matmul precision HIGH (bf16_3x passes on TPU — half the
      MXU passes of the HIGHEST mode every exact backend needs for f32
      stability) with full f32 storage. Factor perturbation ~1e-6..1e-5
      relative, so the preconditioned CG converges in ~10-30 counted
      rounds (intel 9, dlr 27, torus3D 10 on CPU-f64 to 1e-10); a
      +2^-16 diagonal lift guards SPD against accumulated
      Schur-complement rounding across the log2(nb) CR levels.
    - ``lp="bf16"``: values truncated to bfloat16 storage and factored
      at platform-default precision (1-pass bf16 MXU, ~6x the HIGHEST
      matmul rate). The ~2^-8 relative perturbation times the scaled
      system's conditioning sets the round count — measured eager-PCG
      on CPU-f64 to 1e-10: intel 64, dlr 233, so the 6x-cheaper factor
      only wins on well-conditioned graphs. Kept for measurement;
      ``bench.py`` gates every variant on a sane chi2 trace and picks
      the fastest per graph.

    The WHOLE CG runs in the Jacobi-scaled band-permuted space: the
    operator is the block-tridiagonal ``r_blocks`` tensor itself
    (y_j = D_j x_j + L_j x_{j-1} + L_{j+1}^T x_{j+1}, three batched MXU
    matmuls) and the preconditioner is a CR substitution through
    PRECOMPUTED inverse factors (``cr_invert``) — pure batched GEMMs,
    zero gathers and zero triangular solves per round. An ELL gather
    matvec here would cost ~1 ms/round on TPU (measured 6-7 ns/element
    on ~100k-element gathers) vs ~30 us of streaming block matmuls;
    x permutes in once and out once.

    Solution accuracy equals the exact-f32 backends' (dlr f32: 0.048
    rel vs 0.035 banded-cr against the f64 host oracle — the 1e7 gauge
    prior's conditioning floor, not the method).

    Returns a jittable solve(vals, b) or None when the RCM bandwidth is
    too large for the banded path.
    """
    from rustrobotics_tpu.ops.band_chol import (
        _bsym,
        _prepare_blocks,
        build_band_chol,
        cr_factorize,
        cr_invert,
        cr_substitute_inv,
    )

    bl = build_band_chol(layout)
    if bl is None:
        return None
    n, kb, nb = bl.n, bl.kb, bl.nb
    npad = nb * kb
    perm = jnp.asarray(bl.perm)
    inv_perm = jnp.asarray(bl.inv_perm)
    hi = jax.lax.Precision.HIGHEST
    # lift calibration (CPU-f64 counted rounds to 1e-10; the lift is the
    # dominant perturbation whenever it exceeds the factor's matmul
    # rounding, so these transfer to TPU up to the bf16_3x eps ~1e-6):
    # intel 2^-14: 13, 2^-16: 9; dlr 2^-14: 44, 2^-16: 27. 2^-16 is
    # ~1.6x fewer rounds while staying an order of magnitude above the
    # TPU pass rounding it guards against.
    lift_v = lift if lift is not None else (
        2.0 ** -8 if lp == "bf16" else 2.0 ** -16)

    def solve(vals, b):
        dtype = vals.dtype
        if tol is None:
            cg_tol = 1e-6 if dtype == jnp.float32 else 1e-10
        else:
            cg_tol = tol
        r_blocks, dinv_p = _prepare_blocks(bl, vals)
        eye = jnp.eye(kb, dtype=dtype)
        if lp == "bf16":
            rb_lp = r_blocks.astype(jnp.bfloat16).astype(dtype)
            rb_lp = rb_lp.at[:, :, kb:].add(lift_v * eye)
            levels, f_root = cr_factorize(rb_lp)
        else:
            rb_lp = r_blocks.at[:, :, kb:].add(lift_v * eye)
            with jax.default_matmul_precision("high"):
                levels, f_root = cr_factorize(rb_lp)
        inv_levels, root_inv = cr_invert(levels, f_root)

        # exact scaled operator: the scatter fills lower triangles only,
        # mirror the diagonal blocks once at setup
        dsym = _bsym(r_blocks[:, :, kb:])            # (nb, kb, kb)
        lo = r_blocks[:, :, :kb]                     # L_j (L_0 = 0)
        lo_next = jnp.concatenate([lo[1:], jnp.zeros((1, kb, kb), dtype)])

        def matvec(xs):                              # xs (nb, kb)
            x_prev = jnp.concatenate([jnp.zeros((1, kb), dtype), xs[:-1]])
            x_next = jnp.concatenate([xs[1:], jnp.zeros((1, kb), dtype)])
            return (jnp.einsum("jab,jb->ja", dsym, xs, precision=hi)
                    + jnp.einsum("jab,jb->ja", lo, x_prev, precision=hi)
                    + jnp.einsum("jab,ja->jb", lo_next, x_next,
                                 precision=hi))

        def precond(r):
            return cr_substitute_inv(inv_levels, root_inv, r)

        bp = jnp.concatenate([b[perm], jnp.zeros(npad - n, dtype)]) * dinv_p
        xs, rounds = _pcg_counted(matvec, precond, bp.reshape(nb, kb),
                                  cg_tol, maxiter)
        y = xs.reshape(-1) * dinv_p
        x = y[inv_perm]
        return (x, rounds) if return_rounds else x

    return solve


def solve_native(layout: SystemLayout, vals, b):
    """Native C++ sparse LDL^T direct solve (RCM + elimination-tree
    up-looking factorization) — the framework's own UMFPACK-role solver.
    Falls back to scipy SuperLU when the toolchain is unavailable."""
    from rustrobotics_tpu.ops.native_solver import (
        native_available,
        solve_coo_native,
    )

    if not native_available():
        return solve_host(layout, vals, b)
    return solve_coo_native(
        layout.n, layout.rows, layout.cols,
        np.asarray(vals, dtype=np.float64), np.asarray(b, dtype=np.float64),
    )


SOLVERS = {
    "dense": solve_dense,
    "host": solve_host,
    "native": solve_native,
    "cg": solve_cg,
    "schur": solve_schur,
}
