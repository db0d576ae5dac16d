"""TPU microbenchmark: dissect the PGO GN iteration piece by piece.

Times, per graph (intel/dlr by default):
  - linearize+assemble (system_values)
  - the band scatter (_prepare_blocks)
  - chain factorization (highest precision) vs CR factorization at
    highest / default / bf16-truncated precision
  - band substitution vs CR substitution
  - matvec variants: ELL gather vs block-tridiagonal einsum vs Pallas
    block-banded
  - full solves and full 10-iteration GN programs per backend
and validates the mixed backend's chi2 trace on hardware (the bf16
factor could go indefinite only on TPU's default-precision matmuls —
the CPU test suite cannot reach that failure mode).

Emits one JSON object. Run on the real chip:
    python tools/tpu_microbench.py [graph ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:  # env vars are ignored (jax preloads at startup)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

# --no-pallas: skip the Mosaic kernels. On the axon tunnel a Mosaic
# compile was observed to wedge the remote worker (every later dispatch
# from this process blocks in recv) — a hang here would lose the whole
# dissection, so the harvest path runs with Pallas disabled and
# bench.py's subprocess pre-flight owns the Mosaic attempt.
NO_PALLAS = "--no-pallas" in sys.argv
if NO_PALLAS:
    sys.argv.remove("--no-pallas")

import jax.numpy as jnp
import numpy as np


RTT_S = 0.0  # measured dispatch+sync round-trip, set in main()


def _measure_rtt(repeats=9):
    """Host->device dispatch + sync round-trip of a trivial program.

    On the axon tunnel this is ~20-30 ms — larger than most of the
    device work this tool dissects, so every per-stage timing must
    amortize it (see _t) or the dissection just measures the tunnel
    (that is exactly what the round-3 harvest recorded: every stage
    "took" 25-30 ms, while ten FULL GN iterations took 67 ms)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def _t(fn, *args, repeats=3, warmup=1, chain=16):
    """Per-call device time of jitted fn(*args), amortizing dispatch RTT.

    Queues ``chain`` identical dispatches asynchronously and syncs ONCE
    (TPU executes a single in-order stream), so the measured window is
    ~(chain * device_time + 1 * RTT); subtracting the separately
    measured RTT and dividing by chain recovers the per-call device
    time. Clamped at >= 0 (a tiny op can time below the RTT noise)."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT_S, 0.0) / chain


def bench_graph(name, path):
    from rustrobotics_tpu.mapping import load_g2o
    from rustrobotics_tpu.mapping.assemble import build_layout, system_values
    from rustrobotics_tpu.mapping import solvers
    from rustrobotics_tpu.mapping.pgo import make_optimize_jit
    from rustrobotics_tpu.ops import band_chol as bc

    rec = {"graph": name}
    g = load_g2o(path).astype(jnp.float32)
    lay = build_layout(g)
    bl = bc.build_band_chol(lay)
    if bl is None:
        rec["error"] = "no band layout"
        return rec
    n, kb, nb = bl.n, bl.kb, bl.nb
    rec.update(n=n, kb=kb, nb=nb)
    zero = jnp.float32(0.0)

    # --- assembly / linearization
    sysv = jax.jit(lambda gg: system_values(gg, zero))
    rec["assemble_ms"] = _t(sysv, g) * 1e3
    vals, b, _ = sysv(g)

    # --- band scatter
    prep = jax.jit(lambda v: bc._prepare_blocks(bl, v))
    rec["band_scatter_ms"] = _t(prep, vals) * 1e3
    r_blocks, dinv_p = prep(vals)

    # --- factorizations
    def chain_hi(rb):
        with jax.default_matmul_precision("highest"):
            return bc._factorize(rb)

    def cr_hi(rb):
        with jax.default_matmul_precision("highest"):
            return bc.cr_factorize(rb)

    def cr_default(rb):
        return bc.cr_factorize(rb)

    def cr_high(rb):
        with jax.default_matmul_precision("high"):
            return bc.cr_factorize(rb)

    def cr_bf16(rb):
        rb_lp = rb.astype(jnp.bfloat16).astype(rb.dtype)
        rb_lp = rb_lp.at[:, :, kb:].add(
            (2.0 ** -8) * jnp.eye(kb, dtype=rb.dtype))
        return bc.cr_factorize(rb_lp)

    for label, fn in [("chain_factor_hi_ms", chain_hi),
                      ("cr_factor_hi_ms", cr_hi),
                      ("cr_factor_high_ms", cr_high),
                      ("cr_factor_default_ms", cr_default),
                      ("cr_factor_bf16_ms", cr_bf16)]:
        try:
            rec[label] = _t(jax.jit(fn), r_blocks) * 1e3
        except Exception as exc:
            rec[label] = f"fail: {exc}"[:120]

    # --- substitutions
    bp = (jnp.concatenate([b[jnp.asarray(bl.perm)],
                           jnp.zeros(nb * kb - n, b.dtype)])
          * dinv_p).reshape(nb, kb)
    try:
        lds, lps = jax.jit(chain_hi)(r_blocks)
        rec["chain_substitute_ms"] = _t(
            jax.jit(lambda y: bc.band_substitute(lds, lps, y)), bp) * 1e3
    except Exception as exc:
        rec["chain_substitute_ms"] = f"fail: {exc}"[:120]
    try:
        levels, f_root = jax.jit(cr_bf16)(r_blocks)
        rec["cr_substitute_ms"] = _t(
            jax.jit(lambda y: bc.cr_substitute(levels, f_root, y)),
            bp) * 1e3
        nan_frac = float(jnp.mean(jnp.isnan(
            bc.cr_substitute(levels, f_root, bp))))
        rec["cr_bf16_substitute_nan_frac"] = nan_frac
        inv_levels, root_inv = jax.jit(
            lambda lv, fr: bc.cr_invert(lv, fr))(levels, f_root)
        rec["cr_invert_precompute_ms"] = _t(
            jax.jit(lambda lv, fr: bc.cr_invert(lv, fr)),
            levels, f_root) * 1e3
        rec["cr_substitute_inv_ms"] = _t(
            jax.jit(lambda y: bc.cr_substitute_inv(
                inv_levels, root_inv, y)), bp) * 1e3
    except Exception as exc:
        rec["cr_substitute_ms"] = f"fail: {exc}"[:120]
    try:
        lv_h, fr_h = jax.jit(cr_high)(r_blocks)
        rec["cr_high_factor_nan"] = bool(
            jnp.isnan(fr_h).any()
            or any(jnp.isnan(t).any() for lvl in lv_h for t in lvl))
    except Exception as exc:
        rec["cr_high_factor_nan"] = f"fail: {exc}"[:120]

    # --- matvec variants
    def ell_mv():
        mv = solvers.make_ell_matvec(lay, vals)
        return jax.jit(mv)

    hi = jax.lax.Precision.HIGHEST
    dsym = bc._bsym(r_blocks[:, :, kb:])
    lo = r_blocks[:, :, :kb]
    lo_next = jnp.concatenate([lo[1:], jnp.zeros((1, kb, kb), lo.dtype)])

    def band_mv(xs):
        x_prev = jnp.concatenate([jnp.zeros((1, kb), xs.dtype), xs[:-1]])
        x_next = jnp.concatenate([xs[1:], jnp.zeros((1, kb), xs.dtype)])
        return (jnp.einsum("jab,jb->ja", dsym, xs, precision=hi)
                + jnp.einsum("jab,jb->ja", lo, x_prev, precision=hi)
                + jnp.einsum("jab,ja->jb", lo_next, x_next, precision=hi))

    on_tpu = jax.devices()[0].platform == "tpu" and not NO_PALLAS
    x_ell = b
    rec["ell_matvec_ms"] = _t(ell_mv(), x_ell) * 1e3
    rec["band_matvec_ms"] = _t(jax.jit(band_mv), bp) * 1e3
    if on_tpu:  # interpret-mode Pallas on CPU takes minutes
        try:
            from rustrobotics_tpu.ops.banded import (
                build_banded,
                make_banded_matvec,
            )
            blay = build_banded(lay)
            pmv = make_banded_matvec(blay, lay, vals, use_pallas=True)
            rec["pallas_matvec_ms"] = _t(jax.jit(pmv), x_ell) * 1e3
        except Exception as exc:
            rec["pallas_matvec_ms"] = f"fail: {exc}"[:120]

    # --- scatter variants on the band buffer
    flat_idx = jnp.asarray(bl.flat_idx)
    sel_vals = vals[jnp.asarray(bl.sel)]
    size = nb * kb * 2 * kb

    def scatter_add(v):
        return jnp.zeros(size, v.dtype).at[flat_idx].add(v)

    order = np.argsort(np.asarray(bl.flat_idx), kind="stable")
    fi_sorted = np.asarray(bl.flat_idx)[order]
    uniq, seg = np.unique(fi_sorted, return_inverse=True)
    order_j = jnp.asarray(order)
    seg_j = jnp.asarray(seg.astype(np.int32))
    uniq_j = jnp.asarray(uniq)

    def scatter_segsum_set(v):
        u = jax.ops.segment_sum(v[order_j], seg_j,
                                num_segments=len(uniq),
                                indices_are_sorted=True)
        return jnp.zeros(size, v.dtype).at[uniq_j].set(
            u, unique_indices=True, indices_are_sorted=True)

    rec["scatter_add_ms"] = _t(jax.jit(scatter_add), sel_vals) * 1e3
    try:
        rec["scatter_segsum_set_ms"] = _t(
            jax.jit(scatter_segsum_set), sel_vals) * 1e3
        a = jax.jit(scatter_add)(sel_vals)
        c = jax.jit(scatter_segsum_set)(sel_vals)
        rec["scatter_variant_maxdiff"] = float(jnp.abs(a - c).max())
    except Exception as exc:
        rec["scatter_segsum_set_ms"] = f"fail: {exc}"[:120]

    # --- full solves
    solve_makers = [("banded-direct", solvers.make_banded_direct),
                    ("banded-cr", solvers.make_banded_cr),
                    ("banded-mixed", solvers.make_banded_mixed),
                    ("banded-mixed-bf16",
                     lambda la: solvers.make_banded_mixed(la, lp="bf16"))]
    if on_tpu:
        solve_makers.insert(2, ("banded-pallas", solvers.make_banded_pallas))
    for backend, make in solve_makers:
        try:
            solve = make(lay)
            if solve is None:
                rec[f"solve_{backend}_ms"] = "unsupported"
                continue
            sj = jax.jit(solve)
            rec[f"solve_{backend}_ms"] = _t(sj, vals, b) * 1e3
            x = sj(vals, b)
            rec[f"solve_{backend}_nan"] = bool(jnp.isnan(x).any())
            if backend.startswith("banded-mixed"):
                lp = "bf16" if backend.endswith("bf16") else "high"
                sr = jax.jit(solvers.make_banded_mixed(
                    lay, lp=lp, return_rounds=True))
                rec[f"solve_{backend}_cg_rounds"] = int(sr(vals, b)[1])
        except Exception as exc:
            rec[f"solve_{backend}_ms"] = f"fail: {exc}"[:120]

    # --- full 10-iteration GN programs
    gn_backends = ["banded-direct", "banded-cr", "banded-mixed"]
    if on_tpu:
        gn_backends.insert(2, "banded-pallas")
    for backend in gn_backends:
        try:
            run = make_optimize_jit(g, num_iterations=10, backend=backend,
                                    tolerance=0.0)
            out = run(g)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(g)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            errs = np.asarray(out[1])
            epos = errs[errs > 0]
            rec[f"gn10_{backend}_ms"] = best * 1e3
            rec[f"gn10_{backend}_chi2_final"] = (
                float(epos[-1]) if len(epos) else None)
        except Exception as exc:
            rec[f"gn10_{backend}_ms"] = f"fail: {exc}"[:120]
    return rec


def main():
    global RTT_S
    graphs = sys.argv[1:] or ["intel", "dlr"]
    RTT_S = _measure_rtt()
    out = {"platform": jax.devices()[0].platform,
           "rtt_ms": RTT_S * 1e3,
           "timing": "per-stage values are RTT-amortized device times "
                     "(chain of 16 async dispatches, one sync); gn10_* "
                     "rows are raw wall times incl. one RTT, comparable "
                     "with bench.py",
           "graphs": []}
    for name in graphs:
        path = f"/root/reference/dataset/g2o/{name}.g2o"
        try:
            out["graphs"].append(bench_graph(name, path))
        except Exception as exc:
            out["graphs"].append({"graph": name,
                                  "error": str(exc)[:200]})
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
