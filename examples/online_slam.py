#!/usr/bin/env python
"""Online fixed-lag smoothing of a simulated odometry stream — the
streaming/serving deployment shape: `advance` jits ONCE (fixed window,
fixed closure capacity) and the whole session replays as one lax.scan.
No counterpart in the reference (its PGO is batch-only).

    python examples/online_slam.py --steps 400 --window 32 [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from rustrobotics_tpu.utils.devtime import fetch as __fetch  # real sync: block_until_ready is a no-op over the axon tunnel

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--window", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rustrobotics_tpu.mapping.fixed_lag import FixedLagSmoother

    # noisy unicycle odometry around a circle (ground truth closes it)
    rng = np.random.default_rng(args.seed)
    dtheta = 2 * np.pi / args.steps
    odo_true = np.tile([1.0 * dtheta * 8, 0.0, dtheta], (args.steps, 1))
    sig = np.array([0.02, 0.02, 0.005], np.float32)
    odos = jnp.asarray(
        (odo_true + rng.normal(0, sig, odo_true.shape)).astype(np.float32))

    fls = FixedLagSmoother.create(
        window=args.window, closure_capacity=16,
        chain_omega=jnp.diag(1.0 / jnp.asarray(sig**2)),
        clos_omega=jnp.eye(3) * 100.0,
    )
    state = fls.init_state(jnp.zeros(3, jnp.float32))

    @jax.jit
    def session(state, odos_):
        return jax.lax.scan(lambda s, u: (fls.advance(s, u), None),
                            state, odos_)[0]

    out = session(state, odos)  # compile + run
    __fetch(out)
    t0 = time.perf_counter()
    out = session(state, odos)
    __fetch(out)
    dt = time.perf_counter() - t0

    poses = np.asarray(out.poses)
    print(f"{args.steps} odometry steps through a W={args.window} "
          f"fixed-lag smoother on {jax.devices()[0].platform}: "
          f"{args.steps / dt:.0f} steps/s ({dt * 1e3:.1f} ms total)")
    print(f"window head pose: {np.round(poses[0], 3).tolist()}, "
          f"tail pose: {np.round(poses[-1], 3).tolist()}")


if __name__ == "__main__":
    main()
