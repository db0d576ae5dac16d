"""Probe: per-job cost of a Pallas band-assembly kernel on the TPU.

The band scatter is bound by XLA's per-index charge (~19-115 ns/index,
tools/tpu_batch_layout_bench.py); the one untried tier is a Mosaic
kernel that loops over pre-sorted block jobs and accumulates (3,3)
patches into a VMEM-resident band block row (VERDICT r4 item 4). Its
viability hinges on ONE number — the per-job cost of the accumulate —
which this probe measures on a synthetic job stream shaped like
intel.g2o's (nb=11 block rows of (512, 1024), ~19k jobs), BEFORE any
integration.

Mosaic constraint shaping the kernel: dynamic offsets on the LANE
(minor) dimension must be 128-aligned, so the patch column c is split
into an aligned tile start (c // 128 * 128) and an in-tile offset;
the (3, 3) patch is placed inside a (3, 256) window by iota-compare
selects (pure VPU) and the window is read-modify-written at the
aligned position. Dynamic SUBLANE offsets (the row r) are unrestricted.

    python tools/tpu_pallas_scatter_probe.py [--jobs 19320]
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

PAD = 128  # out-width padding so a window at the last tile stays in range
# Narrow windows: patches that straddle a tile boundary are SPLIT into
# single-tile pieces on the host (at plan time), so the kernel's
# read-modify-write touches exactly one (8, 128) f32 tile per piece.
WIN = 128
RWIN = 8


def make_kernel(nb, kb, jmax):
    two_kb = 2 * kb
    width = two_kb + PAD

    def kernel(meta_ref, vals_ref, out_ref):
        # meta_ref (nb*jmax,) int32 SCALAR-PREFETCH (SMEM): packed
        # (row_local << 12) | c0; sentinel -1 = padding job. Dynamic
        # slice offsets must be scalars, hence SMEM. vals_ref
        # (1, jmax, 16) f32 (9 used, row-major (dr, dc)).
        # out_ref (1, kb, width) f32.
        blk = pl.program_id(0)
        out_ref[...] = jnp.zeros_like(out_ref)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (RWIN, WIN), 1)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (RWIN, WIN), 0)

        def body(jt, carry):
            # aligned (8, 16) group load: dynamic sublane offsets must be
            # 8-multiples, so jobs are consumed in groups of 8
            vblock = vals_ref[0, pl.ds(jt * 8, 8), :]

            def one(k, carry2):
                # k is STATIC (python-unrolled): traced indexing of a
                # loaded value is unimplemented in Mosaic
                m = meta_ref[blk * jmax + jt * 8 + k]

                @pl.when(m >= 0)
                def _():
                    r_tile = pl.multiple_of((m >> 21) & 1023, 8)
                    r_off = ((m >> 16) & 31) - 8
                    c_tile = pl.multiple_of(((m >> 12) & 15) * 128, 128)
                    c_off = (m & 4095) - 128
                    vr = vblock[k, :]
                    upd = jnp.zeros((RWIN, WIN), jnp.float32)
                    for dr in range(3):
                        for dc in range(3):
                            upd = upd + jnp.where(
                                (iota_r == r_off + dr)
                                & (iota_c == c_off + dc),
                                vr[3 * dr + dc], 0.0)
                    cur = out_ref[0, pl.ds(r_tile, RWIN),
                                  pl.ds(c_tile, WIN)]
                    out_ref[0, pl.ds(r_tile, RWIN),
                            pl.ds(c_tile, WIN)] = cur + upd

                return carry2

            for k in range(8):
                carry = one(k, carry)
            return carry

        jax.lax.fori_loop(0, jmax // 8, body, 0)

    @jax.jit
    def run(meta, vals):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, jmax, 16), lambda i, m: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, kb + 8, width), lambda i, m: (i, 0, 0),
                memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (nb, kb + 8, width), jnp.float32),
        )(meta.reshape(-1), vals)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=19320)
    ap.add_argument("--nb", type=int, default=11)
    ap.add_argument("--kb", type=int, default=512)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    nb, kb = args.nb, args.kb
    jmax = -(-args.jobs // nb)
    jmax = -(-jmax // 8) * 8
    per = args.jobs // nb
    metas, valss, counts = [], [], []
    for i in range(nb):
        r = rng.integers(0, kb - 3, per)
        c = rng.integers(0, 2 * kb - 3, per)
        v = rng.standard_normal((per, 3, 3)).astype(np.float32)
        ms, vs = [], []
        for j in range(per):
            # split into single-tile pieces (row tile x col tile)
            for r0 in {r[j] // 8, (r[j] + 2) // 8}:
                for c0 in {c[j] // 128, (c[j] + 2) // 128}:
                    pv = np.zeros(16, np.float32)
                    for dr in range(3):
                        for dc in range(3):
                            rr, cc = r[j] + dr, c[j] + dc
                            if rr // 8 == r0 and cc // 128 == c0:
                                pv[3 * dr + dc] = v[j, dr, dc]
                    if np.any(pv):
                        ms.append((int(r[j]) << 12) | int(c[j])
                                  | (int(r0 * 8 - r[j] // 8 * 8) << 24))
                        # piece tile encoded by r0/c0 via its own r,c:
                        # re-pack with the piece's tile-anchored offsets
                        ms[-1] = (int(r[j] - r0 * 8) + 64) % 4096  # r_off may be negative
                        ms[-1] = ((int(r0 * 8) << 21) | ((int(r[j] - r0 * 8) + 8) << 16)
                                  | (int(c0 * 128) >> 7 << 12)
                                  | (int(c[j] - c0 * 128) + 128) % 4096)
                        vs.append(pv)
        metas.append(ms)
        valss.append(vs)
        counts.append(len(ms))
    jmax = -(-max(counts) // 8) * 8
    meta = np.full((nb, jmax), -1, np.int32)
    vals = np.zeros((nb, jmax, 16), np.float32)
    for i in range(nb):
        meta[i, :counts[i]] = metas[i]
        vals[i, :counts[i]] = valss[i]
    pieces = sum(counts)
    meta_j = jnp.asarray(meta)
    vals_j = jnp.asarray(vals)

    run = make_kernel(nb, kb, jmax)
    t0 = time.time()
    out = run(meta_j, vals_j)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # golden check vs numpy (pieces carry tile-anchored offsets)
    ref = np.zeros((nb, kb + 8, 2 * kb + PAD), np.float32)
    for i in range(nb):
        for j in range(counts[i]):
            m = int(meta[i, j])
            rt = (m >> 21) & 1023
            ro = ((m >> 16) & 31) - 8
            ct = ((m >> 12) & 15) * 128
            co = (m & 4095) - 128
            for dr in range(3):
                for dc in range(3):
                    rr, cc = rt + ro + dr, ct + co + dc
                    if 0 <= rr - rt < 8 and 0 <= cc - ct < 128:
                        ref[i, rr, cc] += vals[i, j, 3 * dr + dc]
    ok = np.allclose(np.asarray(out), ref, atol=1e-4)

    # timing: scan the kernel reps times inside ONE jitted program with a
    # data-dependent carry, return a scalar, fetch it (block_until_ready
    # is a no-op over the axon tunnel), subtract the scalar-fetch RTT
    from rustrobotics_tpu.utils.devtime import scalar_fetch_rtt

    @jax.jit
    def chained(meta, vals):
        def body(c, _):
            o = run(meta, vals + c * 1e-30)
            return o[0, 0, 0], ()

        return jax.lax.scan(body, jnp.float32(0), None,
                            length=args.reps)[0]

    float(chained(meta_j, vals_j))
    rtt = scalar_fetch_rtt()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(meta_j, vals_j))
        best = min(best, (time.perf_counter() - t0 - rtt) / args.reps)
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "jobs": per * nb, "pieces": pieces, "nb": nb, "kb": kb,
        "jmax": jmax,
        "correct": bool(ok),
        "compile_s": round(compile_s, 1),
        "ms_per_call": round(best * 1e3, 3),
        "ns_per_job": round(best / (per * nb) * 1e9, 1),
        "ns_per_piece": round(best / pieces * 1e9, 1),
    }))


if __name__ == "__main__":
    main()
