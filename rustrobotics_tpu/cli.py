"""Non-interactive CLI (reference layer L7).

The reference's user surface is four dialoguer-menu binaries
(examples/localization/*, examples/mapping/*, examples/control/*,
Cargo.toml:55-73). Production TPU jobs can't block on menus, so the same
capabilities are argparse subcommands:

    python -m rustrobotics_tpu.cli localization --algo ekf --plot out.png
    python -m rustrobotics_tpu.cli landmarks --dataset <utias0> --algo pf
    python -m rustrobotics_tpu.cli pgo --file intel.g2o --solver gn --plot d/
    python -m rustrobotics_tpu.cli pendulum --plot out.png
    python -m rustrobotics_tpu.cli bench
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _dataset_root():
    return os.environ.get("RUSTROBOTICS_DATASET", "/root/reference/dataset")


def _apply_precision(args):
    """--x64 is the CPU verification mode: TPUs have no native f64 (and no
    f64 LU/Cholesky), so x64 always pairs with the CPU backend."""
    import jax

    host = getattr(args, "x64", False) or getattr(args, "cpu", False)
    if getattr(args, "x64", False):
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    elif getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    # --distributed N on the host backend: surface N virtual CPU devices
    # so the mesh (and ppermute/psum traffic) is real, not clamped to 1.
    n_mesh = int(getattr(args, "distributed", 0) or 0) * max(
        1, int(getattr(args, "replicas", 1) or 1))
    if host and n_mesh > 1:
        try:
            jax.config.update("jax_num_cpu_devices", n_mesh)
        except RuntimeError:  # backend already initialized — keep going
            pass


def cmd_localization(args):
    import numpy as np

    _apply_precision(args)
    import jax
    from rustrobotics_tpu.localization.simulation import run_simulation_jit

    hist = run_simulation_jit(
        jax.random.key(args.seed), algo=args.algo,
        sim_time=args.sim_time, num_particles=args.particles,
    )
    err = np.sqrt(np.mean(np.sum(
        (np.asarray(hist["x_est"][:, :2]) - np.asarray(hist["x_true"][:, :2])) ** 2,
        axis=-1)))
    dr = np.sqrt(np.mean(np.sum(
        (np.asarray(hist["x_dr"][:, :2]) - np.asarray(hist["x_true"][:, :2])) ** 2,
        axis=-1)))
    print(f"{args.algo}: est-RMSE {err:.3f} m, dead-reckoning {dr:.3f} m")
    if args.plot:
        from rustrobotics_tpu.utils.plot import plot_filter_history

        print("saved", plot_filter_history(hist, args.plot, title=args.algo))
    if args.gif:
        from rustrobotics_tpu.utils.plot import save_filter_gif

        print("saved", save_filter_gif(hist, args.gif, title=args.algo))


def cmd_landmarks(args):
    _apply_precision(args)
    from rustrobotics_tpu.data import load_utias
    from rustrobotics_tpu.localization.landmark_replay import (
        ate_vs_groundtruth,
        run_utias_localization,
    )

    base = args.dataset or (_dataset_root() + "/utias0")
    ds = load_utias(base)
    t0 = time.time()
    times, states = run_utias_localization(
        ds, algo=args.algo, max_events=args.events,
        num_particles=args.particles, seed=args.seed,
    )
    ate = ate_vs_groundtruth(ds, times, states)
    print(f"{args.algo}: {len(times)} events in {time.time()-t0:.2f}s, "
          f"ATE {ate:.3f} m")
    if args.fleet:
        # banked (lane-major) fleet replay: B EKF-KC filters from
        # jittered initial states in one jitted scan — the TPU-native
        # fleet-serving path (localization/banked.py)
        from rustrobotics_tpu.localization.landmark_replay import (
            run_utias_localization_fleet,
        )

        t0 = time.time()
        times_f, xs = run_utias_localization_fleet(
            ds, bank=args.fleet, max_events=args.events, seed=args.seed)
        dt_f = time.time() - t0

        class _Est:
            x = None

        est = _Est()
        import numpy as np

        est.x = np.asarray(xs.mean(axis=-1))
        ate_f = ate_vs_groundtruth(ds, times_f, est)
        print(f"fleet[{args.fleet} banked ekf-kc]: {len(times_f)} events "
              f"x {args.fleet} filters in {dt_f:.2f}s, "
              f"fleet-mean ATE {ate_f:.3f} m")
    if args.plot:
        import numpy as np

        from rustrobotics_tpu.utils.plot import plot_landmark_localization

        gt = ds.groundtruth
        gx = np.interp(times, gt[:, 0], gt[:, 1])
        gy = np.interp(times, gt[:, 0], gt[:, 2])
        print("saved", plot_landmark_localization(
            np.asarray(states.x[:, :2]), ds.landmarks[:, :2],
            np.stack([gx, gy], -1), args.plot,
            title=f"{args.algo} landmarks",
        ))


def cmd_pgo(args):
    _apply_precision(args)
    from rustrobotics_tpu.mapping import PoseGraph

    path = args.file
    if not os.path.exists(path):
        path = _dataset_root() + "/g2o/" + args.file
        if not path.endswith(".g2o"):
            path += ".g2o"
    solver = {"gn": "gauss_newton", "lm": "levenberg_marquardt"}.get(
        args.solver, args.solver
    )
    graph = PoseGraph(path, solver=solver)
    if getattr(args, "init", None) == "chordal":
        from rustrobotics_tpu.mapping.initialization import (
            chordal_init_se2,
            chordal_init_se3,
        )

        init = chordal_init_se3 if graph.data.is_3d else chordal_init_se2
        graph.data = init(graph.data)
    if args.distributed:
        import jax

        from rustrobotics_tpu.parallel import block_optimize, make_mesh

        # f32 (TPU) cannot reach 1e-10 residuals: an unreachable tol
        # makes every CG run to maxiter
        import jax.numpy as jnp

        f64 = graph.data.poses2.dtype == jnp.float64
        replicas = getattr(args, "replicas", 1)
        if replicas > 1:
            from rustrobotics_tpu.parallel.mesh import make_mesh_2d
            from rustrobotics_tpu.parallel.pgo_blocks import (
                block_optimize_multistart,
            )

            n_dev = min(args.distributed,
                        max(1, len(jax.devices()) // replicas))
            mesh2 = make_mesh_2d(blocks=n_dev, replicas=replicas)
            print(f"2-D mesh multi-start: {replicas} replicas x "
                  f"{n_dev} blocks on {jax.devices()[0].platform}")
            _, traces, best = block_optimize_multistart(
                mesh2, graph.data, num_iterations=args.iterations,
                jitter=args.jitter, cg_tol=1e-10 if f64 else 1e-6,
            )
            finals = [t[-1] for t in traces]
            print(f"per-replica final chi2: "
                  f"{[round(f, 3) for f in finals]}")
            print(f"best replica {best}: chi2 {finals[best]:.5f}")
            return
        n_dev = min(args.distributed, len(jax.devices()))
        mesh = make_mesh(n_dev, axis="blocks")
        print(f"map-block distributed optimize over {n_dev} "
              f"{jax.devices()[0].platform} device(s)")
        _, errors, it = block_optimize(
            mesh, graph.data, num_iterations=args.iterations,
            solver=solver, cg_tol=1e-10 if f64 else 1e-6,
            cg_maxiter=4000, schur=args.schur,
            cg_forcing=args.cg_forcing,
            cg_variant=getattr(args, "cg_variant", "auto"),
        )
        print(f"converged in {it} iterations; "
              f"chi2 {errors[0]:.1f} -> {errors[-1]:.5f}")
        return
    if args.plot:
        os.makedirs(args.plot, exist_ok=True)
    errors = graph.optimize(
        num_iterations=args.iterations, log=True, backend=args.backend,
        plot=bool(args.plot), out_dir=args.plot or "img",
        robust=args.robust, robust_delta=args.robust_delta,
        robust_alpha=args.robust_alpha,
    )
    print(f"final error: {errors[-1]:.5f}")


def cmd_pendulum(args):
    import numpy as np

    _apply_precision(args)
    from rustrobotics_tpu.control import simulate_inverted_pendulum

    states, commands = simulate_inverted_pendulum(
        sim_time=args.sim_time, dt=args.dt
    )
    final = np.asarray(states[-1])
    print(f"final state: x={final[0]:.5f} x_dot={final[1]:.5f} "
          f"theta={final[2]:.5f} theta_dot={final[3]:.5f}")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = np.arange(states.shape[0]) * args.dt
        fig, ax = plt.subplots(figsize=(9, 5))
        for i, lbl in enumerate(["x", "x dot", "theta", "theta dot"]):
            ax.plot(t, np.asarray(states[:, i]), label=lbl)
        ax.plot(t, np.asarray(commands), "--", label="u")
        ax.legend()
        ax.set_xlabel("t [s]")
        fig.savefig(args.plot, dpi=110, bbox_inches="tight")
        print("saved", args.plot)


def cmd_slam(args):
    import numpy as np

    _apply_precision(args)
    from rustrobotics_tpu.data.slam_course import load_slam_course
    from rustrobotics_tpu.mapping.slam_replay import (
        landmark_map_error,
        run_slam_course,
    )

    base = args.dataset or (_dataset_root() + "/slam_course")
    ds = load_slam_course(base)
    if args.method == "pgo":
        import jax.numpy as jnp

        from rustrobotics_tpu.mapping.frontend import (
            build_pose_graph_from_slam_course,
        )
        from rustrobotics_tpu.mapping.pgo import optimize

        g = build_pose_graph_from_slam_course(ds)
        res = optimize(g, num_iterations=30, solver="levenberg_marquardt",
                       backend="banded-direct", log=True)
        traj = np.asarray(res.graph.poses2)
        est_lms = np.asarray(res.graph.landmarks2)
        err = np.linalg.norm(est_lms - np.asarray(ds.landmarks), axis=-1)
        print(f"graph SLAM: chi2 {res.errors[0]:.1f} -> {res.errors[-1]:.1f}"
              f", map error mean {err.mean():.3f} m / max {err.max():.3f} m")

        class _S:  # plotting shim matching EkfSlamState's fields
            landmarks = jnp.asarray(est_lms)

        state = _S()
    elif args.method in ("fastslam", "fastslam2"):
        import jax.numpy as jnp

        from rustrobotics_tpu.mapping.slam_replay import (
            run_slam_course_fastslam,
        )

        version = 2 if args.method == "fastslam2" else 1
        # 2.0's measurement-driven proposal needs far fewer particles
        parts, est_lm, seen = run_slam_course_fastslam(
            ds, version=version,
            num_particles=64 if version == 2 else 256)
        err = np.linalg.norm(est_lm - np.asarray(ds.landmarks), axis=-1)
        traj = np.asarray(parts.poses)[:0]  # final cloud, no trajectory
        print(f"FastSLAM {version}.0: {int(seen.sum())}/"
              f"{len(ds.landmark_ids)} landmarks"
              f", map error mean {err.mean():.3f} m / max {err.max():.3f} m")

        class _S:
            landmarks = jnp.asarray(est_lm)

        state = _S()
    else:
        traj, state = run_slam_course(ds)
        mx, mean, nseen = landmark_map_error(ds, state)
        print(f"EKF-SLAM over {traj.shape[0]} steps: {nseen}/"
              f"{len(ds.landmark_ids)} landmarks mapped, "
              f"map error mean {mean:.3f} m / max {mx:.3f} m")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 6))
        ax.plot(traj[:, 0], traj[:, 1], "r-", lw=0.8, label="trajectory")
        lms = np.asarray(state.landmarks)
        ax.scatter(lms[:, 0], lms[:, 1], marker="x", c="r", label="estimated")
        ax.scatter(ds.landmarks[:, 0], ds.landmarks[:, 1], marker="*",
                   s=120, c="k", label="true landmarks")
        ax.set_aspect("equal")
        ax.legend()
        fig.savefig(args.plot, dpi=110, bbox_inches="tight")
        print("saved", args.plot)


def cmd_doctor(args):
    """Device-environment diagnosis. Probes the accelerator in a
    SUBPROCESS under a timeout — a dead TPU tunnel makes jax.devices()
    hang forever in-process, which is exactly the failure mode this
    command exists to report."""
    import subprocess
    import sys as _sys
    import time

    # the sync is forced by a SCALAR FETCH, not block_until_ready: the
    # latter is a no-op over the axon tunnel (utils/devtime), which
    # would make this report ~0 ms on a 25 ms tunnel
    code = (
        "import time, jax, jax.numpy as jnp\n"
        "d = jax.devices()[0]\n"
        "x = jnp.ones((512, 512))\n"
        "f = jax.jit(lambda a: (a @ a).sum())\n"
        "float(f(x))\n"
        "t0 = time.perf_counter(); float(f(x))\n"
        "dt = (time.perf_counter() - t0) * 1e3\n"
        "print(f'{d.platform} {d.device_kind} sync_ms={dt:.1f} "
        "n={len(jax.devices())}')\n"
    )
    t0 = time.time()
    try:
        r = subprocess.run([_sys.executable, "-c", code],
                           capture_output=True, timeout=90, text=True)
        out = r.stdout.strip()
    except subprocess.TimeoutExpired:
        out = ""
    probe_s = time.time() - t0
    if out and r.returncode == 0:
        print(f"accelerator: {out} (probe {probe_s:.1f}s)")
        if "sync_ms" in out:
            sync = float(out.split("sync_ms=")[1].split()[0])
            if "tpu" in out and sync > 60:
                print("warning: dispatch+sync latency is high — the "
                      "tunnel may be congested; amortize by putting "
                      "whole optimizations in one jit (this framework "
                      "already does) and re-measure before concluding")
    else:
        print(f"accelerator: UNREACHABLE (probe timed out after "
              f"{probe_s:.0f}s — with an axon-tunneled TPU this means "
              f"the tunnel is down; jax.devices() would hang forever "
              f"in-process)")
        print("workaround: every subcommand accepts --cpu (f32) or "
              "--x64 (f64 verification mode) to run on the host")
    from rustrobotics_tpu.ops.native_solver import native_available

    from rustrobotics_tpu.mapping.g2o_native import (
        native_available as g2o_native,
    )

    print(f"native C++ LDL solver: "
          f"{'built' if native_available() else 'unavailable (scipy fallback)'}")
    print(f"native C++ g2o parser: "
          f"{'built' if g2o_native() else 'unavailable (python fallback)'}")


def cmd_bench(args):
    if args.suite:
        from rustrobotics_tpu.benchmarks import run_suite

        run_suite()
        return
    import runpy

    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                   run_name="__main__")


def main(argv=None):
    p = argparse.ArgumentParser(prog="rustrobotics_tpu",
                                description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--x64", action="store_true",
                        help="float64 on CPU (verification mode; TPUs have no f64)")
        sp.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (f32) — use when the "
                             "TPU tunnel is unreachable (device discovery "
                             "would otherwise hang)")

    sp = sub.add_parser("localization", help="simulated unicycle EKF/UKF/PF")
    common(sp)
    sp.add_argument("--algo", choices=["ekf", "ukf", "pf"], default="ekf")
    sp.add_argument("--sim-time", type=float, default=50.0)
    sp.add_argument("--particles", type=int, default=300)
    sp.add_argument("--plot", default=None, help="output PNG path")
    sp.add_argument("--gif", default=None,
                    help="output GIF path (animated filter run)")
    sp.set_defaults(fn=cmd_localization)

    sp = sub.add_parser("landmarks", help="UTIAS landmark localization")
    common(sp)
    sp.add_argument("--dataset", default=None, help="utias directory")
    sp.add_argument("--algo", choices=["ekf", "ukf", "pf"], default="ekf")
    sp.add_argument("--events", type=int, default=10000)
    sp.add_argument("--particles", type=int, default=300)
    sp.add_argument("--fleet", type=int, default=0, metavar="B",
                    help="also replay B banked (lane-major) EKF-KC "
                         "filters from jittered inits in one jitted scan")
    sp.add_argument("--plot", default=None)
    sp.set_defaults(fn=cmd_landmarks)

    sp = sub.add_parser("pgo", help="pose-graph optimization on a g2o file")
    common(sp)
    sp.add_argument("--file", required=True,
                    help="g2o path or bundled name (e.g. intel)")
    sp.add_argument("--solver", choices=["gn", "lm"], default="gn")
    sp.add_argument(
        "--backend", default="host",
        choices=["auto", "auto-measure", "host", "native", "dense",
                 "schur", "cg", "banded-direct", "banded-cr",
                 "banded-pallas", "banded-mixed"],
    )
    sp.add_argument("--iterations", type=int, default=50)
    sp.add_argument("--init", choices=["none", "chordal"], default="none",
                    help="bootstrap initialization before optimizing")
    sp.add_argument("--robust",
                    choices=["huber", "cauchy", "barron", "gnc-gm"],
                    default=None,
                    help="M-estimator reweighting of outlier edges; "
                         "barron = Barron general loss (--robust-alpha), "
                         "gnc-gm = graduated non-convexity over "
                         "Geman-McClure (adaptive)")
    sp.add_argument("--robust-delta", type=float, default=1.0)
    sp.add_argument("--robust-alpha", type=float, default=-2.0,
                    help="Barron loss shape (2=L2, 0=Cauchy, -2=GM)")
    sp.add_argument("--plot", default=None, help="output directory for PNGs")
    sp.add_argument("--distributed", type=int, default=0, metavar="N",
                    help="map-block distributed optimize over N devices "
                         "(parallel.block_optimize)")
    sp.add_argument("--schur", action="store_true",
                    help="with --distributed: eliminate 2D landmark "
                         "blocks per-device before the halo-CG")
    sp.add_argument("--replicas", type=int, default=1, metavar="R",
                    help="with --distributed: 2-D (replicas x blocks) "
                         "mesh multi-start — R jittered initializations "
                         "optimized in data-parallel, best chi2 wins")
    sp.add_argument("--jitter", type=float, default=0.05,
                    help="with --replicas: pose-noise scale for the "
                         "non-first replicas' initializations")
    sp.add_argument("--cg-forcing", dest="cg_forcing",
                    choices=["fixed", "ew", "ew-fast"], default="fixed",
                    help="with --distributed: inexact-Newton CG forcing "
                         "(ew: Eisenstat-Walker, exact optimum, ~2.5x "
                         "fewer collectives; ew-fast: ~11x fewer, "
                         "converges into the golden +/-1 band)")
    sp.add_argument("--cg-variant", dest="cg_variant",
                    choices=["auto", "single", "classic"], default="auto",
                    help="with --distributed: CG communication pattern "
                         "(single: Chronopoulos-Gear, one fused psum per "
                         "round; classic: textbook two-reduction loop)")
    sp.set_defaults(fn=cmd_pgo)

    sp = sub.add_parser("pendulum", help="LQR inverted pendulum")
    common(sp)
    sp.add_argument("--sim-time", type=float, default=5.0)
    sp.add_argument("--dt", type=float, default=0.01)
    sp.add_argument("--plot", default=None)
    sp.set_defaults(fn=cmd_pendulum)

    sp = sub.add_parser("slam", help="SLAM on the slam_course dataset")
    common(sp)
    sp.add_argument("--dataset", default=None, help="slam_course directory")
    sp.add_argument("--method",
                    choices=["ekf", "pgo", "fastslam", "fastslam2"],
                    default="ekf",
                    help="online EKF-SLAM, batch graph SLAM, or FastSLAM")
    sp.add_argument("--plot", default=None, help="output PNG path")
    sp.set_defaults(fn=cmd_slam)

    sp = sub.add_parser("doctor", help="diagnose the device environment")
    sp.set_defaults(fn=cmd_doctor)

    sp = sub.add_parser("bench", help="run the headline benchmark")
    sp.add_argument("--suite", action="store_true",
                    help="run the full criterion-equivalent suite")
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
