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


# ------------------------------------------------- component (SoA) path
#
# TPU detail: materializing batched (E, 3, 3) Jacobians costs real time —
# XLA tiles the trailing (3, 3) to (4, 128) (14x padding) and lowers the
# vmapped .at[].set construction to dynamic-update-slices, profiled at
# ~2 ms per GN iteration on intel.g2o. The SoA path never builds (E,3,3)
# arrays: a "matrix" is a nested list of (E,) component arrays, matrix
# algebra unrolls at trace time into elementwise ops that XLA fuses with
# the trig of the linearization. Same math as linearize_pp/linearize_pl.


def _mat_tmul(a, b):
    """A^T @ B for component matrices: a (r x m), b (r x n) -> (m x n)."""
    rows, m = len(a), len(a[0])
    n = len(b[0])
    return [[sum(a[k][i] * b[k][j] for k in range(rows)) for j in range(n)]
            for i in range(m)]


def _mat_tvec(a, v):
    """A^T @ v for component matrix a (r x m), vector v (list of r)."""
    rows, m = len(a), len(a[0])
    return [sum(a[k][i] * v[k] for k in range(rows)) for i in range(m)]


def _omega_components(omega, d):
    """(E, d, d) -> d x d nested list of (E,) slices (cheap reads)."""
    return [[omega[:, k, l] for l in range(d)] for k in range(d)]


def edge_terms_pp_soa(poses, pp_from, pp_to, pp_z, pp_omega):
    """SE2-SE2 terms as components. Returns (hii, hij, hjj, bi, bj, chi2)
    where hxx are 3x3 nested lists of (E,) arrays, bi/bj are lists of 3
    (E,) arrays, chi2 is (E,). Same math as residual_pp/linearize_pp."""
    from rustrobotics_tpu.utils.angles import wrap_angle

    x1 = poses[pp_from]
    x2 = poses[pp_to]
    th1, thz = x1[:, 2], pp_z[:, 2]
    c1, s1 = jnp.cos(th1), jnp.sin(th1)
    cz, sz = jnp.cos(thz), jnp.sin(thz)
    dx = x2[:, 0] - x1[:, 0]
    dy = x2[:, 1] - x1[:, 1]
    # relative translation in x1's frame
    rel_x = c1 * dx + s1 * dy
    rel_y = -s1 * dx + c1 * dy
    zx, zy = pp_z[:, 0], pp_z[:, 1]
    # residual e = z^-1 * (x1^-1 x2)  (rs:441-447)
    e_x = cz * (rel_x - zx) + sz * (rel_y - zy)
    e_y = -sz * (rel_x - zx) + cz * (rel_y - zy)
    e_th = wrap_angle(x2[:, 2] - th1 - thz)
    e = [e_x, e_y, e_th]

    # A = de/dx1, B = de/dx2 (rs:457-486); cp/sp = cos/sin(th1 + thz)
    cp = jnp.cos(th1 + thz)
    sp = jnp.sin(th1 + thz)
    zero = jnp.zeros_like(cp)
    one = jnp.ones_like(cp)
    a12x = cz * rel_y - sz * rel_x
    a12y = -sz * rel_y - cz * rel_x
    a = [[-cp, -sp, a12x], [sp, -cp, a12y], [zero, zero, -one]]
    b = [[cp, sp, zero], [-sp, cp, zero], [zero, zero, one]]

    om = _omega_components(pp_omega, 3)
    om_a = _mat_tmul(om, a)  # Ω^T A = Ω A (Ω symmetric)
    om_b = _mat_tmul(om, b)
    hii = _mat_tmul(a, om_a)  # A^T Ω A
    hij = _mat_tmul(a, om_b)  # A^T Ω B
    hjj = _mat_tmul(b, om_b)  # B^T Ω B
    om_e = _mat_tvec(om, e)
    bi = _mat_tvec(a, om_e)  # A^T Ω e
    bj = _mat_tvec(b, om_e)
    chi2 = sum(e[k] * om_e[k] for k in range(3))
    return e, hii, hij, hjj, bi, bj, chi2


def edge_terms_pl_soa(poses, landmarks, pl_pose, pl_lm, pl_z, pl_omega):
    """SE2-XY terms as components: hii 3x3, hij 3x2, hjj 2x2, bi 3, bj 2,
    chi2 (E,). Same math as residual_pl/linearize_pl (rs:449-455,516-535)."""
    x = poses[pl_pose]
    lm = landmarks[pl_lm]
    th = x[:, 2]
    c, s = jnp.cos(th), jnp.sin(th)
    dx = lm[:, 0] - x[:, 0]
    dy = lm[:, 1] - x[:, 1]
    # e = R^T (l - t) - z
    e0 = c * dx + s * dy - pl_z[:, 0]
    e1 = -s * dx + c * dy - pl_z[:, 1]
    e = [e0, e1]
    # A (2x3) = [-R^T | dR^T (l - t)], B (2x2) = R^T
    a02 = -s * dx + c * dy
    a12 = -c * dx - s * dy
    a = [[-c, -s, a02], [s, -c, a12]]
    b = [[c, s], [-s, c]]
    om = _omega_components(pl_omega, 2)
    om_a = _mat_tmul(om, a)
    om_b = _mat_tmul(om, b)
    hii = _mat_tmul(a, om_a)  # 3x3
    hij = _mat_tmul(a, om_b)  # 3x2
    hjj = _mat_tmul(b, om_b)  # 2x2
    om_e = _mat_tvec(om, e)
    bi = _mat_tvec(a, om_e)
    bj = _mat_tvec(b, om_e)
    chi2 = sum(e[k] * om_e[k] for k in range(2))
    return e, hii, hij, hjj, bi, bj, chi2


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
