"""Measure batched scatter/gather LAYOUT alternatives on the TPU.

The fleet optimizer's non-matmul stages pay XLA's per-index charge; how
it amortizes over a batch depends on where the batch axis lands:

- "vmap" layout: batch LEADING (what jax.vmap produces) — operand
  (B, n), updates (B, nnz), indices shared -> update_window_dims=(0,),
  each index writes a COLUMN (stride n) through the (B, n) buffer.
- "lanes" layout: batch LAST — operand (n, B), updates (nnz, B),
  update_window_dims=(1,): each index writes a CONTIGUOUS B-wide lane
  row.

Times one jitted scan of reps applications each (dispatch-immune), for
the band-scatter shape and the permutation-gather shape of intel.g2o.

    python tools/tpu_batch_layout_bench.py [--cpu] [--reps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--batches", default="1,8,32")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rustrobotics_tpu.mapping import load_g2o
    from rustrobotics_tpu.mapping.assemble import build_layout
    from rustrobotics_tpu.ops import band_chol as bc

    g = load_g2o("/root/reference/dataset/g2o/intel.g2o").astype(jnp.float32)
    lay = build_layout(g)
    bl = bc.build_band_chol(lay)
    sel = jnp.asarray(bl.sel)
    flat_idx = jnp.asarray(bl.flat_idx)
    nnz = len(lay.rows)
    nsel = len(bl.sel)
    npad = bl.nb * bl.kb
    bufsize = npad * 2 * bl.kb
    perm = jnp.asarray(bl.perm)
    n = bl.n

    from rustrobotics_tpu.utils.devtime import scalar_fetch_rtt

    rtt = scalar_fetch_rtt()

    def timed(prog, *xs):
        # programs return a scalar; block_until_ready is a NO-OP over
        # the axon tunnel, so completion is forced by the float() fetch
        # and the dispatch+fetch RTT subtracted
        float(prog(*xs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(*xs))
            best = min(best, time.perf_counter() - t0)
        return max(best - rtt, 0.0) / args.reps

    out = {"platform": jax.devices()[0].platform,
           "graph": "intel", "nnz": nnz, "nsel": nsel, "rows": []}

    for b in [int(x) for x in args.batches.split(",")]:
        key = jax.random.key(0)
        vals_lead = jax.random.normal(key, (b, nnz), jnp.float32)
        vals_last = jnp.asarray(vals_lead.T)
        bvec_lead = jax.random.normal(key, (b, n), jnp.float32)
        bvec_last = jnp.asarray(bvec_lead.T)

        @jax.jit
        def scat_lead(v):
            def body(c, _):
                buf = jnp.zeros((b, bufsize), jnp.float32)
                buf = buf.at[:, flat_idx].add(v[:, sel] + c)
                return buf[0, 0], ()
            return jax.lax.scan(body, jnp.float32(0), None,
                                length=args.reps)[0]

        @jax.jit
        def scat_last(v):
            def body(c, _):
                buf = jnp.zeros((bufsize, b), jnp.float32)
                buf = buf.at[flat_idx].add(v[sel] + c)
                return buf[0, 0], ()
            return jax.lax.scan(body, jnp.float32(0), None,
                                length=args.reps)[0]

        @jax.jit
        def gath_lead(x):
            def body(c, _):
                y = x[:, perm] + c
                return y[0, 0], ()
            return jax.lax.scan(body, jnp.float32(0), None,
                                length=args.reps)[0]

        @jax.jit
        def gath_last(x):
            def body(c, _):
                y = x[perm] + c
                return y[0, 0], ()
            return jax.lax.scan(body, jnp.float32(0), None,
                                length=args.reps)[0]

        # big-buffer transpose cost (the price of mixing layouts):
        # (bufsize/2kb, 2kb, b) -> (b, nb*kb, 2kb)
        big_last = jax.random.normal(key, (npad, 2 * bl.kb, b), jnp.float32)

        @jax.jit
        def transpose_big(x):
            def body(c, _):
                y = jnp.transpose(x, (2, 0, 1)) + c
                return y[0, 0, 0], ()
            return jax.lax.scan(body, jnp.float32(0), None,
                                length=args.reps)[0]

        row = {"B": b,
               "scatter_lead_ms": round(1e3 * timed(scat_lead, vals_lead), 3),
               "scatter_last_ms": round(1e3 * timed(scat_last, vals_last), 3),
               "gather_perm_lead_ms": round(
                   1e3 * timed(gath_lead, bvec_lead), 4),
               "gather_perm_last_ms": round(
                   1e3 * timed(gath_last, bvec_last), 4),
               "band_transpose_ms": round(
                   1e3 * timed(transpose_big, big_last), 3)}
        out["rows"].append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
