"""Device-side ablation of the GN iteration: dispatch-immune attribution.

The axon tunnel's per-dispatch sync cost FLAPS between ~30 us and ~25 ms
(session-level, measured 2026-08-19), so any host-timed per-stage number
is untrustworthy: the round-3 harvest recorded 25-30 ms for every stage,
and even RTT-amortized chained dispatch inherits the slow state's
pipelined scheduling cost. This tool instead times ONE jitted program
per ablation level — a ``lax.scan`` of ``reps`` truncated GN iterations
(carry perturbed by each stage's output so nothing hoists or DCEs) —
and attributes device time from the DELTAS between consecutive levels:

  L0 glue        : linearize residuals only (chi2)
  L1 + assemble  : full triplet system_values
  L2 + scatter   : band block-row buffer (_prepare_blocks)
  L3 + factor    : blocked Cholesky chain (or CR with --cr)
  L4 + substitute: forward/backward solve -> dx
  L5 full        : + manifold retraction (the real optimizer body,
                   reference pose_graph_optimization.rs:247-303)

Each level's program is timed with a single sync, so the (state-
dependent) dispatch cost appears once as an additive constant and
cancels in the deltas.

    python tools/tpu_dissect.py [--cpu] [--cr] [--reps 10] [graph ...]
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
    ap.add_argument("graphs", nargs="*", default=["intel", "dlr"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cr", action="store_true",
                    help="use cyclic-reduction factor/substitute at L3/L4")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from rustrobotics_tpu.mapping import load_g2o
    from rustrobotics_tpu.mapping.assemble import (
        apply_update,
        build_layout,
        system_values,
    )
    from rustrobotics_tpu.ops import band_chol as bc

    out = {"platform": jax.devices()[0].platform, "reps": args.reps,
           "factor": "cr" if args.cr else "chain", "graphs": []}

    for name in args.graphs:
        g = load_g2o(
            f"/root/reference/dataset/g2o/{name}.g2o").astype(jnp.float32)
        lay = build_layout(g)
        bl = bc.build_band_chol(lay)
        if bl is None:
            out["graphs"].append({"graph": name, "error": "no band layout"})
            continue
        n, kb, nb = bl.n, bl.kb, bl.nb
        npad = nb * kb
        perm = jnp.asarray(bl.perm)
        inv_perm = jnp.asarray(bl.inv_perm)
        unrolled = nb <= bc.UNROLL_MAX_NB and not args.cr

        def make_prog(level, g0=g, bl=bl, n=n, kb=kb, nb=nb, npad=npad,
                      perm=perm, inv_perm=inv_perm, unrolled=unrolled):
            import dataclasses

            def body(carry, _):
                gg = dataclasses.replace(g0, poses2=carry)
                vals, b, chi2 = system_values(gg, jnp.float32(0.0))
                acc = chi2 * 0.0
                new_poses = carry
                if level >= 2:
                    with jax.default_matmul_precision("highest"):
                        r_blocks, dinv_p = bc._prepare_blocks(bl, vals)
                    acc = acc + r_blocks[0, 0, kb]
                inv = bc.SUBSTITUTE_MODE == "inv" and not args.cr
                if level >= 3:
                    with jax.default_matmul_precision("highest"):
                        if args.cr:
                            fac = bc.cr_factorize(r_blocks)
                        elif unrolled:
                            lds, lps = bc._factorize_unrolled(r_blocks)
                            if inv:
                                lds = bc._invert_factors_unrolled(lds)
                            fac = (lds, lps)
                        else:
                            lds, lps = bc._factorize(r_blocks)
                            if inv:
                                lds = bc._invert_factors(lds)
                            fac = (lds, lps)
                    # depend on BOTH ends of the chain: the first leaf
                    # alone lets XLA dead-code-eliminate every later
                    # stage (observed: factor_delta ~0 while the full
                    # factorization hid inside substitute_delta)
                    leaves = jax.tree.leaves(fac)
                    acc = acc + sum(l.ravel()[0] + l.ravel()[-1]
                                    for l in leaves)
                if level >= 4:
                    bp = b[perm]
                    bp = jnp.concatenate(
                        [bp, jnp.zeros(npad - n, b.dtype)])
                    bp = (bp * dinv_p).reshape(nb, kb)
                    with jax.default_matmul_precision("highest"):
                        if args.cr:
                            xs = bc.cr_substitute(*fac, bp)
                        elif unrolled and inv:
                            xs = bc._substitute_inv_unrolled(*fac, bp)
                        elif unrolled:
                            xs = bc._substitute_unrolled(*fac, bp)
                        elif inv:
                            xs = bc.band_substitute_inv(*fac, bp)
                        else:
                            xs = bc.band_substitute(*fac, bp)
                    y = xs.reshape(-1)[:npad] * dinv_p
                    dx = y[inv_perm]
                    acc = acc + dx[0]
                if level >= 5:
                    new_poses = apply_update(gg, dx).poses2
                # tiny data dependency: stops hoisting/DCE, perturbs the
                # carry below float32 resolution so every rep relinearizes
                new_poses = new_poses + jnp.float32(1e-30) * acc
                return new_poses, chi2

            def prog(poses):
                return jax.lax.scan(body, poses, None, length=args.reps)

            return jax.jit(prog)

        rec = {"graph": name, "n": n, "kb": kb, "nb": nb,
               "unrolled_chain": bool(unrolled)}
        levels = {1: "assemble", 2: "scatter", 3: "factor",
                  4: "substitute", 5: "retract_full"}
        from rustrobotics_tpu.utils.devtime import fetch, scalar_fetch_rtt

        # block_until_ready is a NO-OP over the axon tunnel (measured
        # 2026-08-20): force completion by fetching one element per
        # output leaf, and subtract the dispatch+fetch RTT
        rtt = scalar_fetch_rtt()
        rec["rtt_ms"] = round(rtt * 1e3, 2)
        times = {}
        for level in sorted(levels):
            prog = make_prog(level)
            pz = g.poses2
            fetch(prog(pz))  # compile + warmup
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                fetch(prog(pz))
                best = min(best, time.perf_counter() - t0)
            times[level] = max(best - rtt, 0.0)
            rec[f"L{level}_{levels[level]}_total_ms"] = best * 1e3
        per = args.reps
        rec["per_iter_ms"] = {
            "assemble": (times[1]) / per * 1e3,
            "scatter_delta": (times[2] - times[1]) / per * 1e3,
            "factor_delta": (times[3] - times[2]) / per * 1e3,
            "substitute_delta": (times[4] - times[3]) / per * 1e3,
            "retract_delta": (times[5] - times[4]) / per * 1e3,
            "full": times[5] / per * 1e3,
        }
        out["graphs"].append(rec)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
