"""Histogram (discrete Bayes / grid) filter for 2D localization.

Reference README Todo item "Histogram filter" (never implemented there).
The belief is a dense (Gx, Gy, Gtheta) probability grid — the
non-parametric filter that survives multimodal posteriors (kidnapped
robot, symmetric corridors) where the EKF family collapses to one mode.

TPU shape: the motion update is, per theta-bin, a continuous bilinear
shift of the (Gx, Gy) slab (vmapped map_coordinates) followed by a small
separable blur (process noise); the measurement update is a pointwise
likelihood over all cells against the landmark map. Every step is dense
regular array math on a ~10^5-cell grid — exactly what the VPU wants;
a full replay jits as one ``lax.scan``.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from rustrobotics_tpu.utils.angles import wrap_angle


@flax.struct.dataclass
class GridBelief:
    """belief: (Gx, Gy, Gt), sums to 1. Cell centers:
    x = x0 + (i + 0.5) dx, theta spans [-pi, pi) circularly."""

    belief: jnp.ndarray
    x0: float = flax.struct.field(pytree_node=False)
    y0: float = flax.struct.field(pytree_node=False)
    dx: float = flax.struct.field(pytree_node=False)
    dy: float = flax.struct.field(pytree_node=False)

    @property
    def shape(self):
        return self.belief.shape

    def centers(self):
        gx, gy, gt = self.belief.shape
        xs = self.x0 + (jnp.arange(gx) + 0.5) * self.dx
        ys = self.y0 + (jnp.arange(gy) + 0.5) * self.dy
        ts = -jnp.pi + (jnp.arange(gt) + 0.5) * (2 * jnp.pi / gt)
        return xs, ys, ts

    def estimate(self):
        """Mean position + circular-mean heading of the belief."""
        xs, ys, ts = self.centers()
        b = self.belief
        px = jnp.einsum("xyt,x->", b, xs)
        py = jnp.einsum("xyt,y->", b, ys)
        ct = jnp.einsum("xyt,t->", b, jnp.cos(ts))
        st = jnp.einsum("xyt,t->", b, jnp.sin(ts))
        return jnp.stack([px, py, jnp.arctan2(st, ct)])


@flax.struct.dataclass
class HistogramFilter:
    """Velocity-model grid filter against a known landmark map.

    motion_sigma: (3,) std of the per-step pose diffusion in grid units
    of (x, y, theta) AFTER the deterministic shift; q: (2, 2)
    range-bearing measurement noise.
    """

    landmarks: jnp.ndarray  # (L, 2)
    q: jnp.ndarray          # (2, 2)
    motion_sigma: jnp.ndarray  # (3,)

    @classmethod
    def create(cls, landmarks, q, motion_sigma=(0.15, 0.15, 0.1)):
        return cls(
            landmarks=jnp.asarray(landmarks),
            q=jnp.asarray(q),
            motion_sigma=jnp.asarray(motion_sigma),
        )

    def init_uniform(self, shape, x0, y0, dx, dy) -> GridBelief:
        b = jnp.full(shape, 1.0 / (shape[0] * shape[1] * shape[2]))
        return GridBelief(belief=b, x0=x0, y0=y0, dx=dx, dy=dy)

    def init_at(self, shape, x0, y0, dx, dy, pose) -> GridBelief:
        g = self.init_uniform(shape, x0, y0, dx, dy)
        xs, ys, ts = g.centers()
        d2 = (
            ((xs[:, None, None] - pose[0]) / (2 * dx)) ** 2
            + ((ys[None, :, None] - pose[1]) / (2 * dy)) ** 2
            + (wrap_angle(ts[None, None, :] - pose[2]) / 0.3) ** 2
        )
        b = jnp.exp(-0.5 * d2)
        return g.replace(belief=b / jnp.sum(b))

    # ------------------------------------------------------------ motion

    def predict(self, g: GridBelief, u, dt) -> GridBelief:
        """Deterministic per-theta shift by the velocity model + separable
        Gaussian diffusion (process noise)."""
        gx, gy, gt = g.belief.shape
        _, _, ts = g.centers()
        v, w = u[0], u[1]
        dth = w * dt

        # continuous source coordinates: cell (i, j) of the NEW belief
        # pulls from (i - sx/dx, j - sy/dy) of the old, per theta bin
        ii = jnp.arange(gx, dtype=g.belief.dtype)
        jj = jnp.arange(gy, dtype=g.belief.dtype)

        def shift_slab(slab, theta):
            sx = v * dt * jnp.cos(theta) / g.dx
            sy = v * dt * jnp.sin(theta) / g.dy
            coords = jnp.meshgrid(ii - sx, jj - sy, indexing="ij")
            return jax.scipy.ndimage.map_coordinates(
                slab, coords, order=1, mode="constant", cval=0.0)

        shifted = jax.vmap(shift_slab, in_axes=(2, 0), out_axes=2)(
            g.belief, ts)

        # theta advance: circular continuous roll by dth (linear interp
        # between the two neighboring integer rolls)
        step = dth / (2 * jnp.pi / gt)
        lo = jnp.floor(step).astype(jnp.int32)
        frac = step - lo
        rolled = (1 - frac) * jnp.roll(shifted, lo, axis=2) \
            + frac * jnp.roll(shifted, lo + 1, axis=2)

        # separable diffusion; theta axis wraps
        def gauss_kernel(sigma, delta):
            radius = 3
            x = jnp.arange(-radius, radius + 1, dtype=g.belief.dtype)
            k = jnp.exp(-0.5 * (x * delta / jnp.clip(sigma, 1e-6, None)) ** 2)
            return k / jnp.sum(k)

        kx = gauss_kernel(self.motion_sigma[0], g.dx)
        ky = gauss_kernel(self.motion_sigma[1], g.dy)
        kt = gauss_kernel(self.motion_sigma[2], 2 * jnp.pi / gt)

        def conv_axis(b, k, axis, circular):
            r = (len(k) - 1) // 2
            out = jnp.zeros_like(b)
            for o in range(-r, r + 1):
                if circular:
                    out = out + k[o + r] * jnp.roll(b, -o, axis=axis)
                else:
                    out = out + k[o + r] * _shift_zero(b, -o, axis)
            return out

        b = conv_axis(rolled, kx, 0, False)
        b = conv_axis(b, ky, 1, False)
        b = conv_axis(b, kt, 2, True)
        b = b / jnp.clip(jnp.sum(b), 1e-30, None)
        return g.replace(belief=b)

    # ------------------------------------------------------- measurement

    def update(self, g: GridBelief, lm_idx, z, mask) -> GridBelief:
        """Multiply by the likelihood of a masked block of range-bearing
        measurements (lm_idx (M,), z (M, 2), mask (M,)) over every cell."""
        xs, ys, ts = g.centers()
        q_inv = jnp.linalg.inv(self.q)
        lms = self.landmarks[lm_idx]  # (M, 2)
        dxl = lms[:, 0][:, None, None] - xs[None, :, None]   # (M, Gx, 1)
        dyl = lms[:, 1][:, None, None] - ys[None, None, :]   # (M, 1, Gy)
        rng = jnp.sqrt(jnp.clip(dxl**2 + dyl**2, 1e-12, None))  # (M,Gx,Gy)
        bear = jnp.arctan2(dyl, dxl)                         # (M, Gx, Gy)
        dr = z[:, 0][:, None, None] - rng                    # (M, Gx, Gy)
        db = wrap_angle(
            z[:, 1][:, None, None, None] - bear[..., None]
            + ts[None, None, None, :]
        )  # (M, Gx, Gy, Gt) — bearing depends on heading
        loglik = -0.5 * (
            q_inv[0, 0] * (dr[..., None] ** 2)
            + q_inv[1, 1] * db**2
            + 2 * q_inv[0, 1] * dr[..., None] * db
        )
        loglik = jnp.einsum(
            "mxyt,m->xyt", loglik, mask.astype(loglik.dtype))
        b = g.belief * jnp.exp(loglik - jnp.max(loglik))
        return g.replace(belief=b / jnp.clip(jnp.sum(b), 1e-30, None))

    def step(self, g: GridBelief, u, has_control, lm_idx, z, mask,
             dt) -> GridBelief:
        pred = self.predict(g, u, dt)
        g = jax.tree.map(lambda a, b: jnp.where(has_control, a, b), pred, g)
        return self.update(g, lm_idx, z, mask)


def _shift_zero(b, o, axis):
    """Roll with zero fill (non-circular axis shift)."""
    rolled = jnp.roll(b, o, axis=axis)
    n = b.shape[axis]
    idx = jnp.arange(n)
    valid = (idx >= o) & (idx < n + o)
    shape = [1] * b.ndim
    shape[axis] = n
    return rolled * valid.reshape(shape)
