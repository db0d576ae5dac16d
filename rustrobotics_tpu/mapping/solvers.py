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


def make_triplet_matvec(layout: SystemLayout):
    """Matrix-free H @ x from the triplets (jittable closure).

    y[r] += v * x[c] via segment-sum scatter — the SpMV that CG runs on.
    """
    rows = jnp.asarray(layout.rows)
    cols = jnp.asarray(layout.cols)

    def matvec(vals, x):
        contrib = vals * x[cols]
        return jnp.zeros_like(x).at[rows].add(contrib)

    return matvec


def block_jacobi_preconditioner(layout: SystemLayout, vals):
    """Diagonal (Jacobi) preconditioner extracted from the triplets.

    A full 3x3 block-Jacobi variant lives in the distributed path; plain
    diagonal is enough to anchor CG here and is layout-agnostic.
    """
    rows = jnp.asarray(layout.rows)
    cols = jnp.asarray(layout.cols)
    on_diag = rows == cols
    diag = jnp.zeros(layout.n, dtype=vals.dtype).at[rows].add(
        jnp.where(on_diag, vals, 0.0)
    )
    safe = jnp.where(diag > 0, diag, 1.0)
    return lambda r: r / safe


def solve_cg(layout: SystemLayout, vals, b, tol=1e-10, maxiter=None):
    """Preconditioned CG on the triplet operator (jittable)."""
    matvec = make_triplet_matvec(layout)
    precond = block_jacobi_preconditioner(layout, vals)
    x, _ = jax.scipy.sparse.linalg.cg(
        lambda v: matvec(vals, v),
        b,
        tol=tol,
        maxiter=maxiter if maxiter is not None else layout.n,
        M=precond,
    )
    return x


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
}
