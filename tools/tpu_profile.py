"""Op-level XLA profile of one jitted GN program per solver backend.

Captures a jax.profiler trace of the full 10-iteration PGO program on
the requested graph/backend, parses the xplane directly (the
tensorboard-plugin converter is broken in this image), and prints the
top HLO ops by self time — the ground-truth "where does the iteration
go" table that picks the next kernel target. The ~20-26 ms per-call
tunnel sync is amortized because the whole optimization is ONE jitted
call.

    python tools/tpu_profile.py [--cpu] [--backend banded-mixed] [graph]
"""

import argparse
import collections
import glob
import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def parse_xplane(trace_dir):
    """Aggregate (op_name -> total self duration ps) from the xplane
    protobuf, XLA Ops lines only."""
    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True)
    totals = collections.Counter()
    device_total_ps = 0
    for path in paths:
        raw = open(path, "rb").read()
        if path.endswith(".gz"):
            raw = gzip.decompress(raw)
        space = xplane_pb2.XSpace.FromString(raw)
        for plane in space.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] += ev.duration_ps
                    device_total_ps += ev.duration_ps
    return totals, device_total_ps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("graph", nargs="?", default="intel")
    ap.add_argument("--backend", default="banded-direct")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--width", type=int, default=60,
                    help="op-name truncation width")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--force", action="store_true",
                    help="allow profiler capture on the axon TPU tunnel")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif not args.force:
        # Round-4 evidence (2026-08-19): a jax.profiler capture over the
        # axon tunnel wedged the remote TPU worker (every later dispatch
        # hung; probe loop read DEAD until the worker restarted). On a
        # directly-attached TPU this tool is safe — on the tunnel,
        # require --force and prefer tools/tpu_microbench.py's
        # RTT-amortized timing dissection instead.
        print("refusing profiler capture over the axon tunnel "
              "(wedges the remote worker); pass --force on a "
              "directly-attached TPU, or use tpu_microbench.py",
              file=sys.stderr)
        sys.exit(2)

    import jax.numpy as jnp

    from rustrobotics_tpu.mapping import load_g2o
    from rustrobotics_tpu.mapping.pgo import make_optimize_jit

    g = load_g2o(
        f"/root/reference/dataset/g2o/{args.graph}.g2o").astype(jnp.float32)
    run = make_optimize_jit(g, num_iterations=args.iters,
                            backend=args.backend, tolerance=0.0)
    out = run(g)  # compile + warmup outside the trace
    jax.block_until_ready(out)

    trace_dir = tempfile.mkdtemp(prefix="pgo_trace_")
    jax.profiler.start_trace(trace_dir)
    jax.block_until_ready(run(g))
    jax.profiler.stop_trace()

    totals, device_total_ps = parse_xplane(trace_dir)
    plat = jax.devices()[0].platform
    print(f"# {args.graph} / {args.backend} / {args.iters} GN iters on "
          f"{plat}; device time {device_total_ps / 1e9:.3f} ms "
          f"(trace: {trace_dir})")
    if not totals:
        print("no XLA Ops lines found (CPU traces often lack them; "
              "run on the TPU)")
        return
    w = args.width
    width = max(len(k[:w]) for k, _ in totals.most_common(args.top))
    for name, ps in totals.most_common(args.top):
        pct = 100.0 * ps / max(device_total_ps, 1)
        print(f"{name[:w]:<{width}}  {ps / 1e9:9.3f} ms  {pct:5.1f}%")


if __name__ == "__main__":
    main()
