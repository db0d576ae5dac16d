"""Linear-Quadratic-Gaussian control: LQR + Kalman estimator.

Reference README Todo item "LQG" (never implemented there). By the
separation principle the optimal controller for a linear system with
Gaussian process/measurement noise is the LQR state-feedback gain
applied to the Kalman-filter state estimate; both gains come from their
Riccati equations independently.

The steady-state Kalman gain reuses the SAME DARE solver as the LQR
(duality: filter DARE is the control DARE on the transposed system), so
the whole controller synthesis is two jitted while_loops, and a closed
-loop rollout is one ``lax.scan``.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from rustrobotics_tpu.control.lqr import (
    LinearTimeInvariantModel,
    lqr,
    solve_dare,
)


@flax.struct.dataclass
class LQGController:
    """u = -K x_hat; x_hat via the steady-state Kalman predictor."""

    k: jnp.ndarray       # (U, S) LQR gain
    l: jnp.ndarray       # (S, Z) steady-state Kalman gain
    a: jnp.ndarray       # (S, S)
    b: jnp.ndarray       # (S, U)
    c: jnp.ndarray       # (Z, S) observation matrix

    def control(self, x_hat):
        return -self.k @ x_hat

    def step(self, x_hat, z):
        """One closed-loop step: ``x_hat`` is the PREDICTED estimate
        x̂_{t|t-1}; the current measurement z_t corrects it, the control
        acts on the corrected (filtered) estimate, and the next
        prediction propagates through the model:

            x̂_{t|t}   = x̂_{t|t-1} + L (z_t - C x̂_{t|t-1})
            u_t        = -K x̂_{t|t}
            x̂_{t+1|t} = A x̂_{t|t} + B u_t

        Returns (u_t, x̂_{t+1|t}). Correcting with the CURRENT
        measurement before acting is the standard LQG timing — applying
        z_t to the t+1 prediction instead lags the filter one step.
        """
        corr = x_hat + self.l @ (z - self.c @ x_hat)
        u = -self.k @ corr
        return u, self.a @ corr + self.b @ u


def kalman_gain(a, c, w, v, max_iter: int = 500,
                epsilon: float = 1e-9) -> jnp.ndarray:
    """Steady-state (predictor-form) Kalman gain for x' = A x + w,
    z = C x + v, via the dual DARE: the filter Riccati equation is the
    control DARE with (A, B, Q, R) -> (A^T, C^T, W, V)."""
    dual = LinearTimeInvariantModel(a=a.T, b=c.T, q=jnp.asarray(w),
                                    r=jnp.asarray(v))
    p = solve_dare(dual, max_iter, epsilon)
    with jax.default_matmul_precision("highest"):
        return p @ c.T @ jnp.linalg.inv(c @ p @ c.T + jnp.asarray(v))


def lqg(model: LinearTimeInvariantModel, c, w, v,
        max_iter: int = 500, epsilon: float = 1e-9) -> LQGController:
    """Synthesize the LQG controller: LQR gain on (A, B, Q, R) +
    steady-state Kalman gain on (A, C, W, V)."""
    k = lqr(model, max_iter, epsilon=0.01)
    gain_l = kalman_gain(model.a, c, w, v, max_iter, epsilon)
    return LQGController(k=k, l=gain_l, a=model.a, b=model.b,
                         c=jnp.asarray(c))


def rollout(controller: LQGController, key, x0, num_steps: int,
            w_chol, v_chol):
    """Closed-loop stochastic rollout (one lax.scan): returns the state
    trajectory (T, S), estimates (T, S), and controls (T, U).
    w_chol/v_chol: Cholesky factors of the process/measurement noise."""
    s = x0.shape[0]
    z_dim = controller.c.shape[0]

    def body(carry, k):
        x, x_hat = carry
        kw, kv = jax.random.split(k)
        z = controller.c @ x + v_chol @ jax.random.normal(
            kv, (z_dim,), x.dtype)
        u, x_hat = controller.step(x_hat, z)
        x = controller.a @ x + controller.b @ u \
            + w_chol @ jax.random.normal(kw, (s,), x.dtype)
        return (x, x_hat), (x, x_hat, u)

    keys = jax.random.split(key, num_steps)
    _, (xs, xhs, us) = jax.lax.scan(body, (x0, jnp.zeros_like(x0)), keys)
    return xs, xhs, us
