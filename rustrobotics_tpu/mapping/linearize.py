"""Per-edge residuals and Jacobians for pose-graph optimization.

Math contract = the reference's constraint/linearization functions:
- SE2 pose-pose residual ``e = chart(z^-1 x1^-1 x2)``
  (pose_graph_optimization.rs:441-447 via v3, rs:434-440)
- SE2 pose-landmark residual ``R^T (l - t) - z`` (rs:449-455)
- closed-form 2D Jacobians (rs:457-486, rs:516-535)
- SE(3) pose-pose (the reference wrote rs:488-514 but never calls it —
  build_linear_system hits todo!() on SE3 edges, rs:357): here implemented
  with a log-map residual and ``jax.jacfwd`` through the retraction, which
  is exact, self-consistent with the SE(3) boxplus, and vmap-friendly.

Everything maps over a leading edge axis with ``jax.vmap`` — the whole
graph linearizes as one fused XLA computation (the TPU replacement for the
reference's serial per-edge loop, rs:309-360).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rustrobotics_tpu.geometry import se2, se3


def _precise(fn):
    """Trace with full-f32 matmul passes: TPU's default bf16 matmul
    precision corrupts the normal equations enough to break Cholesky
    (observed NaN on intel.g2o); these are tiny-dim einsums where the
    extra passes cost nothing."""

    def wrapped(*args, **kw):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kw)

    return wrapped


# ----------------------------------------------------------------- SE2


def residual_pp(x1, x2, z):
    """Pose-pose residual, (3,) (rs:441-447)."""
    return se2.compose(se2.inverse(z), se2.relative(x1, x2))


def linearize_pp(x1, x2, z):
    """Closed-form (A, B) = (de/dx1, de/dx2), each (3, 3) (rs:457-486)."""
    rz = se2.rotmat(z[2])
    r1 = se2.rotmat(x1[2])
    rz_r1_t = rz.T @ r1.T
    a11 = -rz_r1_t
    deriv = jnp.asarray([[0.0, -1.0], [1.0, 0.0]], dtype=x1.dtype)
    dr1 = deriv @ r1  # d R1 / d theta1
    a12 = rz.T @ dr1.T @ (x2[:2] - x1[:2])
    a = jnp.zeros((3, 3), dtype=x1.dtype)
    a = a.at[:2, :2].set(a11).at[:2, 2].set(a12).at[2, 2].set(-1.0)
    b = jnp.zeros((3, 3), dtype=x1.dtype)
    b = b.at[:2, :2].set(rz_r1_t).at[2, 2].set(1.0)
    return a, b


def residual_pl(x, landmark, z):
    """Pose-landmark residual, (2,) (rs:449-455)."""
    r = se2.rotmat(x[2])
    return r.T @ (landmark - x[:2]) - z


def linearize_pl(x, landmark):
    """(A, B) = (de/dpose (2,3), de/dlandmark (2,2)) (rs:516-535)."""
    r = se2.rotmat(x[2])
    deriv = jnp.asarray([[0.0, -1.0], [1.0, 0.0]], dtype=x.dtype)
    dr = deriv @ r
    a2 = dr.T @ (landmark - x[:2])
    a = jnp.concatenate([-r.T, a2[:, None]], axis=1)
    return a, r.T


# ----------------------------------------------------------------- SE3


def residual_qq(x1, x2, z):
    """SE(3) pose-pose residual, (6,): [translation part of z^-1 x1^-1 x2,
    so3_log of its rotation]. Zero iff the edge is satisfied."""
    err = se3.compose(se3.inverse(z), se3.relative(x1, x2))
    return jnp.concatenate([err[:3], se3.so3_log(err[3:])])


def linearize_qq(x1, x2, z):
    """(A, B) each (6, 6): derivative of residual_qq w.r.t. the boxplus
    perturbations of x1 and x2 (se3.retract), evaluated at 0 via jacfwd."""

    def f(delta1, delta2):
        return residual_qq(se3.retract(x1, delta1), se3.retract(x2, delta2), z)

    zero = jnp.zeros(6, dtype=x1.dtype)
    a = jax.jacfwd(f, argnums=0)(zero, zero)
    b = jax.jacfwd(f, argnums=1)(zero, zero)
    return a, b


# ------------------------------------------------------------- batched


@_precise
def edge_terms_pp(poses, pp_from, pp_to, pp_z, pp_omega):
    """Vmapped SE2-SE2 terms: residuals (E,3), A (E,3,3), B (E,3,3),
    chi2 contributions (E,)."""
    x1 = poses[pp_from]
    x2 = poses[pp_to]
    e = jax.vmap(residual_pp)(x1, x2, pp_z)
    a, b = jax.vmap(linearize_pp)(x1, x2, pp_z)
    chi2 = jnp.einsum("ei,eij,ej->e", e, pp_omega, e)
    return e, a, b, chi2


@_precise
def edge_terms_pl(poses, landmarks, pl_pose, pl_lm, pl_z, pl_omega):
    x = poses[pl_pose]
    lm = landmarks[pl_lm]
    e = jax.vmap(residual_pl)(x, lm, pl_z)
    a, b = jax.vmap(linearize_pl)(x, lm)
    chi2 = jnp.einsum("ei,eij,ej->e", e, pl_omega, e)
    return e, a, b, chi2


@_precise
def edge_terms_qq(poses3, qq_from, qq_to, qq_z, qq_omega):
    x1 = poses3[qq_from]
    x2 = poses3[qq_to]
    e = jax.vmap(residual_qq)(x1, x2, qq_z)
    a, b = jax.vmap(linearize_qq)(x1, x2, qq_z)
    chi2 = jnp.einsum("ei,eij,ej->e", e, qq_omega, e)
    return e, a, b, chi2
