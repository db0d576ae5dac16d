#!/usr/bin/env python
"""Fleet pose-graph optimization: B same-structure graphs (one map, many
robots' initializations) optimized by ONE vmapped XLA program
(mapping.make_optimize_batch) — a batch axis the reference's
one-graph-one-UMFPACK optimizer (pose_graph_optimization.rs:215-303)
cannot express.

    python examples/fleet_pgo.py --file intel --batch 8 --iterations 10
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from rustrobotics_tpu.utils.devtime import fetch as __fetch  # real sync: block_until_ready is a no-op over the axon tunnel
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.mapping import (
    global_error,
    load_g2o,
    make_optimize_batch,
    stack_graphs,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", default="intel")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--jitter", type=float, default=0.01)
    ap.add_argument(
        "--dataset", default=os.environ.get(
            "RUSTROBOTICS_DATASET", "/root/reference/dataset"))
    args = ap.parse_args()

    g = load_g2o(os.path.join(args.dataset, "g2o",
                              f"{args.file}.g2o")).astype(jnp.float32)
    graphs = [g]
    for i in range(1, args.batch):
        noise = args.jitter * jax.random.normal(
            jax.random.key(i), g.poses2.shape, g.poses2.dtype)
        graphs.append(dataclasses.replace(g, poses2=g.poses2 + noise))

    run = make_optimize_batch(g, num_iterations=args.iterations,
                              tolerance=0.0, backend="banded-direct")
    batched = stack_graphs(graphs)
    out = run(batched)  # compile + warmup
    __fetch(out)
    t0 = time.perf_counter()
    out, errs, _ = run(batched)
    __fetch(out)
    dt = time.perf_counter() - t0

    finals = [float(global_error(jax.tree.map(lambda a: a[i], out)))
              for i in range(args.batch)]
    print(f"{args.file} x{args.batch}: {dt * 1e3:.1f} ms "
          f"({args.batch / dt:.2f} graphs/s, "
          f"{args.batch * args.iterations / dt:.1f} GN iters/s aggregate)")
    print("final chi2 per robot:", np.round(finals, 2).tolist())


if __name__ == "__main__":
    main()
