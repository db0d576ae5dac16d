"""Probe: per-job cost of a FLEET (batched) Pallas band-assembly kernel.

The single-graph Mosaic band scatter measured a NEGATIVE (144 ns/piece >
XLA's 19 ns/scalar-index toll — tools/tpu_pallas_scatter_probe.py). The
fleet changes the arithmetic: the accumulator gains a batch axis on the
SUBLANES — out (nb, kb+8, B, W) — so one job's (3, B, 128) window update
covers all B graphs at once, while XLA's vmapped scatter pays its
per-index toll per B-wide window (~115 ns/index at B=8, i.e.
~1.26 ms/graph on intel). Viability number: ns per job per GRAPH.

Layout facts used: on a 4D ref only the last two dims carry Mosaic's
alignment constraints, so the band ROW offset (dim 1) is a free dynamic
index (no row splitting), B=8 fills exactly one f32 sublane tile, and
the 128-wide column window needs a 128-aligned start (jobs are split at
128 boundaries by the planner; here synthetic, pre-split).

    python tools/tpu_pallas_fleet_scatter_probe.py [--jobs 19320] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CT = 256     # column tile per grid step
WIN = 128    # per-job window width (jobs pre-split at 128 boundaries)


def make_kernel(nb, kb, b, w, jmax, t_rows):
    ct_n = w // CT

    def kernel(meta_a_ref, meta_b_ref, vals_ref, out_ref):
        # meta_*: (nbuckets * jmax,) int32 scalar-prefetch (SMEM).
        #   meta_a = t | (tri << 20); meta_b = r_loc | (c_local << 10).
        # vals_ref (1, t_rows, 9, b) f32; out_ref (1, kb + 8, b, CT).
        i = pl.program_id(0)
        ct = pl.program_id(1)
        bucket = i * ct_n + ct
        out_ref[...] = jnp.zeros_like(out_ref)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (3, b, WIN), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (3, b, WIN), 2)

        def body(j, carry):
            ma = meta_a_ref[bucket * jmax + j]

            @pl.when(ma >= 0)
            def _():
                t = ma & 0xFFFFF
                tri = ma >> 20
                mb = meta_b_ref[bucket * jmax + j]
                r_loc = mb & 1023
                c_local = mb >> 10
                cw = pl.multiple_of((c_local // WIN) * WIN, WIN)
                c_off = c_local - cw
                vr = vals_ref[0, t, :, :]          # (9, b)
                upd = jnp.zeros((3, b, WIN), jnp.float32)
                for dr in range(3):
                    for dc in range(3):
                        live = jnp.logical_or(tri == 0, dr >= dc)
                        v = jnp.where(live, 1.0, 0.0) * vr[3 * dr + dc]
                        upd = upd + jnp.where(
                            (iota_r == dr) & (iota_c == c_off + dc),
                            v[None, :, None], 0.0)
                cur = out_ref[0, pl.ds(r_loc, 3), :, pl.ds(cw, WIN)]
                out_ref[0, pl.ds(r_loc, 3), :, pl.ds(cw, WIN)] = cur + upd

            return carry

        jax.lax.fori_loop(0, jmax, body, 0)

    @jax.jit
    def run(meta_a, meta_b, vals):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb, ct_n),
            in_specs=[
                pl.BlockSpec((1, t_rows, 9, b), lambda i, ct, ma, mb: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, kb + 8, b, CT), lambda i, ct, ma, mb: (i, 0, 0, ct),
                memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (nb, kb + 8, b, w), jnp.float32),
        )(meta_a.reshape(-1), meta_b.reshape(-1), vals)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=19320)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--nb", type=int, default=11)
    ap.add_argument("--kb", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    nb, kb, b = args.nb, args.kb, args.batch
    w = 2 * kb + CT
    ct_n = w // CT
    t_rows = args.jobs  # one value row per job (worst case)
    # synthetic band-shaped jobs: row anywhere, col within the band near
    # the diagonal; bucket by (block, coltile)
    buckets = [[] for _ in range(nb * ct_n)]
    for t in range(args.jobs):
        i = rng.integers(0, nb)
        r = int(rng.integers(0, kb))
        c = int(np.clip(r + kb + rng.integers(-kb, kb), 0, 2 * kb - 3))
        if c % WIN > WIN - 3:
            c = c - 3  # pre-split stand-in: keep window-interior
        ct = c // CT
        c_local = c - ct * CT
        tri = int(rng.random() < 0.1)
        buckets[i * ct_n + ct].append(
            (t | (tri << 20), (r & 1023) | (c_local << 10), i, r, c, tri))
    jmax = max(len(bk) for bk in buckets)
    jmax = -(-jmax // 8) * 8
    meta_a = np.full((nb * ct_n, jmax), -1, np.int32)
    meta_b = np.zeros((nb * ct_n, jmax), np.int32)
    for kbk, bk in enumerate(buckets):
        for j, (ma, mb, *_rest) in enumerate(bk):
            meta_a[kbk, j] = ma
            meta_b[kbk, j] = mb
    vals = rng.standard_normal((1, t_rows, 9, b)).astype(np.float32)

    run = make_kernel(nb, kb, b, w, jmax, t_rows)
    t0 = time.time()
    out = run(jnp.asarray(meta_a), jnp.asarray(meta_b), jnp.asarray(vals))
    out_h = np.asarray(out)
    compile_s = time.time() - t0

    # golden check
    ref = np.zeros((nb, kb + 8, b, w), np.float32)
    for bk in buckets:
        for (ma, mb, i, r, c, tri) in bk:
            t = ma & 0xFFFFF
            for dr in range(3):
                for dc in range(3):
                    if tri and dr < dc:
                        continue
                    ref[i, r + dr, :, c + dc] += vals[0, t, 3 * dr + dc]
    ok = np.allclose(out_h, ref, atol=1e-4)

    from rustrobotics_tpu.utils.devtime import scalar_fetch_rtt

    @jax.jit
    def chained(ma, mb, v):
        def body(c, _):
            o = run(ma, mb, v + c * 1e-30)
            return o[0, 0, 0, 0], ()

        return jax.lax.scan(body, jnp.float32(0), None,
                            length=args.reps)[0]

    float(chained(jnp.asarray(meta_a), jnp.asarray(meta_b),
                  jnp.asarray(vals)))
    rtt = scalar_fetch_rtt()
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(chained(jnp.asarray(meta_a), jnp.asarray(meta_b),
                      jnp.asarray(vals)))
        best = min(best, (time.perf_counter() - t0 - rtt) / args.reps)
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "jobs": args.jobs, "batch": b, "jmax": jmax,
        "padded_slots": int(nb * ct_n * jmax),
        "correct": bool(ok),
        "compile_s": round(compile_s, 1),
        "ms_per_call": round(best * 1e3, 3),
        "ns_per_job": round(best / args.jobs * 1e9, 1),
        "ns_per_job_per_graph": round(best / args.jobs / b * 1e9, 2),
    }))


if __name__ == "__main__":
    main()
