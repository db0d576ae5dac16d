"""Inverted pendulum on a cart, LQR-stabilized.

Role of the reference's ``inverted_pendulum`` example
(examples/control/inverted_pendulum.rs:17-73): Euler-discretized cart-pole
linear model, LQR gain, closed-loop rollout — here the rollout is a
``lax.scan`` under jit.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from rustrobotics_tpu.control.lqr import LinearTimeInvariantModel, lqr


@flax.struct.dataclass
class InvertedPendulumModel:
    """State [x, x_dot, theta, theta_dot] (ip.rs:10,17-42)."""

    da: jnp.ndarray  # (4, 4) continuous-time A
    db: jnp.ndarray  # (4, 1) continuous-time B
    q: jnp.ndarray
    r: jnp.ndarray

    @classmethod
    def create(cls, l_bar=2.0, mass_cart=1.0, mass_ball=0.3, g=9.8,
               dtype=jnp.float32):
        da = jnp.asarray(
            [
                [0.0, 1.0, 0.0, 0.0],
                [0.0, 0.0, mass_ball * g / mass_cart, 0.0],
                [0.0, 0.0, 0.0, 1.0],
                [0.0, 0.0, g * (mass_cart + mass_ball) / (l_bar * mass_cart), 0.0],
            ],
            dtype=dtype,
        )
        db = jnp.asarray(
            [[0.0], [1.0 / mass_cart], [0.0], [1.0 / (l_bar * mass_cart)]],
            dtype=dtype,
        )
        q = jnp.diag(jnp.asarray([10.0, 1.0, 10.0, 1.0], dtype=dtype))
        r = jnp.asarray([[0.01]], dtype=dtype)
        return cls(da=da, db=db, q=q, r=r)

    def linearize(self, dt) -> LinearTimeInvariantModel:
        """Euler discretization (ip.rs:35-42)."""
        eye = jnp.eye(4, dtype=self.da.dtype)
        return LinearTimeInvariantModel(
            a=eye + dt * self.da, b=dt * self.db, q=self.q, r=self.r
        )


def simulate_inverted_pendulum(
    sim_time=5.0, dt=0.01, x0=(0.0, 0.0, -0.2, 0.0), max_iter=500,
    epsilon=0.01, dtype=jnp.float32,
):
    """Closed-loop LQR rollout (ip.rs:44-73). Returns (states (T+1, 4),
    commands (T+1,))."""
    model = InvertedPendulumModel.create(dtype=dtype)
    lin = model.linearize(dt)
    k_gain = lqr(lin, max_iter=max_iter, epsilon=epsilon)
    num_steps = int(sim_time / dt)
    x_init = jnp.asarray(x0, dtype=dtype)

    @jax.jit
    def rollout(x0_):
        def step(x, _):
            u = -(k_gain @ x)
            x_next = lin.a @ x + lin.b @ u
            return x_next, (x_next, u[0])

        _, (xs, us) = jax.lax.scan(step, x0_, None, length=num_steps)
        return (
            jnp.concatenate([x0_[None], xs]),
            jnp.concatenate([jnp.zeros(1, dtype=dtype), us]),
        )

    return rollout(x_init)
