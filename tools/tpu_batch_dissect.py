"""Device-side ablation of the BATCHED (fleet) GN iteration.

Why: round-3 measured the vmapped fleet optimizer at only 1.17x
sequential throughput at B=8 (bench_pgo_batch) — the batch axis that is
supposed to multiply throughput (make_optimize_batch docstring) barely
moved it. This tool attributes the batched iteration's device time per
stage, at B=1 vs B=n, with the same dispatch-immune ``lax.scan``-of-reps
methodology as tools/tpu_dissect.py: if a stage's time scales ~linearly
with B, that stage is NOT batching (paying its per-index or per-chain
toll once per row); if it is ~flat, the batch rides free.

    python tools/tpu_batch_dissect.py [--cpu] [--reps 10] [--batches 1,8]
                                      [graph ...]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("graphs", nargs="*", default=["intel"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batches", default="1,8")
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

    from rustrobotics_tpu.utils.devtime import scalar_fetch_rtt

    rtt = scalar_fetch_rtt()
    out = {"platform": jax.devices()[0].platform, "reps": args.reps,
           "rtt_ms": round(rtt * 1e3, 2), "graphs": []}

    for name in args.graphs:
        g = load_g2o(
            f"/root/reference/dataset/g2o/{name}.g2o").astype(jnp.float32)
        lay = build_layout(g)
        bl = bc.build_band_chol(lay)
        if bl is None:
            out["graphs"].append({"graph": name, "error": "no band layout"})
            continue
        kb, nb = bl.kb, bl.nb
        npad = nb * kb
        perm = jnp.asarray(bl.perm)
        inv_perm = jnp.asarray(bl.inv_perm)
        unrolled = nb <= bc.UNROLL_MAX_NB

        def one_iter(g0, level, poses):
            """One truncated GN iteration on a single graph at ablation
            ``level``; returns perturbed poses so no stage DCEs."""
            gg = g0.replace(poses2=poses)
            vals, b, chi2 = system_values(gg, jnp.float32(0.0))
            if level == 0:
                return poses + 1e-9 * chi2
            r_blocks, dinv_p = bc._prepare_blocks(bl, vals)
            if level == 1:
                return poses + 1e-9 * r_blocks[0, 0, 0] + 1e-9 * chi2
            # fused factorize+invert (the production inv path: blocked
            # matmul cholesky + inline tril_inv — see band_chol)
            if unrolled:
                lds, ldinvs, lps = bc._factorize_inv_unrolled(r_blocks)
                guard = ldinvs[-1][0, 0] + lds[0][0, 0]
            else:
                lds, ldinvs, lps = bc._factorize_inv(r_blocks)
                guard = ldinvs[-1, 0, 0] + lds[0, 0, 0]
            if level == 2:
                return poses + 1e-9 * guard + 1e-9 * chi2
            bp = _scaled_rhs(b, dinv_p)
            if level == 3:
                return poses + 1e-9 * bp[0, 0] + 1e-9 * guard + 1e-9 * chi2
            if unrolled:
                xs = bc._substitute_inv_unrolled(ldinvs, lps, bp)
            else:
                xs = bc.band_substitute_inv(ldinvs, lps, bp)
            if level == 4:
                return poses + 1e-9 * xs[0, 0] + 1e-9 * chi2
            y = xs.reshape(-1)[:npad] * dinv_p
            dx = y[inv_perm]
            return apply_update(gg, dx).poses2

        def _scaled_rhs(b, dinv_p):
            bp = b[perm]
            bp = jnp.concatenate([bp, jnp.zeros(npad - bl.n, jnp.float32)])
            return (bp * dinv_p).reshape(nb, kb)

        levels = ["assemble", "scatter", "factor+invert", "rhs-perm",
                  "substitute", "unperm+retract"]
        row = {"graph": name, "kb": kb, "nb": nb, "per_batch": {}}
        for bsz in [int(x) for x in args.batches.split(",")]:
            poses_b = jnp.stack(
                [g.poses2 + 0.01 * i for i in range(bsz)])

            times = []
            for level in range(len(levels)):
                @jax.jit
                def prog(pb, level=level):
                    def body(carry, _):
                        nxt = jax.vmap(
                            lambda p: one_iter(g, level, p))(carry)
                        return nxt, ()

                    outp, _ = jax.lax.scan(body, pb, None,
                                           length=args.reps)
                    return outp.sum()

                # block_until_ready is a NO-OP over the axon tunnel:
                # completion is forced by fetching the scalar result,
                # and the dispatch+fetch RTT is subtracted
                float(prog(poses_b))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(prog(poses_b))
                    best = min(best, time.perf_counter() - t0)
                times.append(max(best - rtt, 0.0) / args.reps)

            deltas = [times[0]] + [times[i] - times[i - 1]
                                   for i in range(1, len(times))]
            row["per_batch"][bsz] = {
                "total_ms_per_iter": round(times[-1] * 1e3, 3),
                "stages_ms": {lv: round(d * 1e3, 3)
                              for lv, d in zip(levels, deltas)},
            }
        b_list = sorted(row["per_batch"])
        if len(b_list) > 1:
            b0, b1 = b_list[0], b_list[-1]
            t0 = row["per_batch"][b0]["total_ms_per_iter"]
            t1 = row["per_batch"][b1]["total_ms_per_iter"]
            row["batch_speedup"] = round((t0 * b1 / b0) / t1, 2)
        out["graphs"].append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
