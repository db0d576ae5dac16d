"""Trustworthy device timing over the axon TPU tunnel.

Measured 2026-08-20 on the tunnel: ``jax.block_until_ready`` returns in
~0.2 ms for a multi-second program — it does NOT wait for completion.
Only a value fetch (``float()`` / ``np.asarray``) drains the execution
queue, and large-array fetches are themselves slow (~seconds for 16 MB),
so every timing in this repo follows one recipe:

- the timed program reduces its result to a SCALAR on device;
- the program runs its body ``reps`` times inside one ``lax.scan``
  (data-dependent carry so nothing is elided);
- wall time of ``float(prog(x))`` = dispatch+fetch RTT + reps * t_body;
  subtracting the separately measured scalar-fetch RTT and dividing by
  ``reps`` yields the device-side per-body time.

On CPU (tests, fallback) the same recipe is simply exact.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def fetch(out):
    """Force completion of ``out`` and return it: fetches ONE scalar
    from the FIRST non-empty leaf (block_until_ready is a no-op over
    the tunnel; fetching a whole large leaf would time the tunnel's D2H
    bandwidth instead). One leaf suffices: all outputs of a single
    executable materialize together, so forcing any element drains the
    call — fetching every leaf was measured to add ~1 RTT PER LEAF
    (~200 ms on a 15-leaf pytree)."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
            float(leaf.ravel()[0])
            break
    return out


def scalar_fetch_rtt(samples: int = 5) -> float:
    """Seconds for one trivial dispatch + scalar fetch (tunnel RTT)."""
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    best = float("inf")
    for k in range(samples):
        t0 = time.perf_counter()
        float(f(jnp.float32(k)))
        best = min(best, time.perf_counter() - t0)
    return best


def time_scalar_program(prog, *args, reps: int = 1, calls: int = 3,
                        rtt: float | None = None) -> float:
    """Per-body seconds for ``prog`` (which must return a scalar and run
    its body ``reps`` times internally). Warm-compiles first; takes the
    best of ``calls`` timed executions; subtracts the scalar-fetch RTT."""
    float(prog(*args))
    if rtt is None:
        rtt = scalar_fetch_rtt()
    best = float("inf")
    for _ in range(calls):
        t0 = time.perf_counter()
        float(prog(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / reps
