"""Infinite-horizon discrete LQR.

Capability parity with the reference (src/control/lqr.rs:17-52): DARE by
fixed-point iteration to a max-abs tolerance (lqr.rs:38-46), gain
``K = (R + B^T P B)^-1 B^T P A`` (lqr.rs:48). The iteration is a
``lax.while_loop`` so the whole solve jits (and batches under vmap for
banks of systems).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class LinearTimeInvariantModel:
    """x' = A x + B u with stage cost x^T Q x + u^T R u
    (reference: lqr.rs:6-15)."""

    a: jnp.ndarray  # (S, S)
    b: jnp.ndarray  # (S, U)
    q: jnp.ndarray  # (S, S)
    r: jnp.ndarray  # (U, U)


def solve_dare(model: LinearTimeInvariantModel, max_iter: int = 500,
               epsilon: float = 0.01) -> jnp.ndarray:
    """Fixed-point DARE iteration (lqr.rs:38-46)."""
    a, b, q, r = model.a, model.b, model.q, model.r
    at, bt = a.T, b.T

    def body(state):
        p, it, _ = state
        pn = at @ p @ a - at @ p @ b @ jnp.linalg.inv(
            r + bt @ p @ b
        ) @ bt @ p @ a + q
        delta = jnp.max(jnp.abs(pn - p))
        return pn, it + 1, delta

    def cond(state):
        _, it, delta = state
        return jnp.logical_and(it < max_iter, delta >= epsilon)

    p0 = q
    p, _, _ = jax.lax.while_loop(
        cond, body, (p0, jnp.asarray(0), jnp.asarray(jnp.inf, q.dtype))
    )
    return p


def lqr(model: LinearTimeInvariantModel, max_iter: int = 500,
        epsilon: float = 0.01) -> jnp.ndarray:
    """LQR gain K with u = -K x (lqr.rs:48)."""
    p = solve_dare(model, max_iter, epsilon)
    return jnp.linalg.inv(model.r + model.b.T @ p @ model.b) @ (
        model.b.T @ p @ model.a
    )
