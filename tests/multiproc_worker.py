"""Worker for the multi-process distributed PGO test (SURVEY §4: exercise
the jax.distributed + cross-process collective path on a CPU mesh, the CI
stand-in for a multi-host TPU pod slice).

Each process contributes 4 local CPU devices to an 8-device global mesh,
builds the SAME synthetic graph, shards edge arrays across the global mesh
(nodes replicated), and runs one distributed GN step. Process 0 prints one
JSON line with chi2 before/after and |dx| for the parent test to compare
against the single-process result.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rustrobotics_tpu.mapping.assemble import apply_update_jit
    from rustrobotics_tpu.mapping.synthetic import synthetic_pose_graph_2d
    from rustrobotics_tpu.parallel.pgo_sharded import (
        _EDGE_FIELDS,
        make_distributed_step_fns,
        pad_edges_for_sharding,
    )

    n_dev = jax.device_count()
    assert n_dev == 4 * nproc, n_dev
    mesh = Mesh(np.array(jax.devices()), ("edges",))

    graph = synthetic_pose_graph_2d(num_poses=32, num_landmarks=4,
                                    dtype=jnp.float32)
    graph = pad_edges_for_sharding(graph, n_dev)

    # shard edge arrays over the global mesh, replicate everything else
    edge_sh = NamedSharding(mesh, P("edges"))
    repl = NamedSharding(mesh, P())
    updates = {}
    for f in graph.__dataclass_fields__:
        v = getattr(graph, f)
        if not hasattr(v, "shape"):
            continue
        sh = edge_sh if (f in _EDGE_FIELDS and v.ndim >= 1 and v.shape[0]) \
            else repl
        updates[f] = jax.device_put(np.asarray(v), sh)
    graph = graph.replace(**updates)

    solve, error = make_distributed_step_fns(mesh, graph, cg_tol=1e-10)
    dx, chi2_before = solve(graph, jnp.asarray(0.0, jnp.float32))
    new_graph = apply_update_jit(graph, dx)
    chi2_after = error(new_graph)

    # ---- full map-block distributed optimization across the process
    # boundary: the whole GN loop is ONE jitted program whose ppermute
    # halo exchanges and psum reductions cross processes (Gloo).
    from rustrobotics_tpu.mapping.synthetic import (
        synthetic_corridor_graph_2d,
    )
    from rustrobotics_tpu.parallel.block_layout import build_block_layout
    from rustrobotics_tpu.parallel.pgo_blocks import (
        layout_device_arrays,
        make_block_optimize,
    )

    mesh_b = Mesh(np.array(jax.devices()), ("blocks",))
    gb = synthetic_corridor_graph_2d(num_poses=256, num_landmarks=8,
                                     dtype=jnp.float32)
    layout = build_block_layout(gb, n_dev)
    state, edges, maps_ = layout_device_arrays(layout, jnp.float32)
    sh = NamedSharding(mesh_b, P("blocks"))

    def put(t):
        return tuple(jax.device_put(np.asarray(a), sh) for a in t)

    run = make_block_optimize(
        mesh_b, layout, num_iterations=8, tolerance=0.0, cg_tol=1e-6,
        dtype=jnp.float32,
    )
    _, errors, it, _ = run(put(state), put(edges), put(maps_))
    errors = np.asarray(errors)

    # ---- 2-D (replica x blocks) mesh with the BLOCKS axis crossing the
    # process boundary (SURVEY §5's graph-block x replica layout): the
    # per-CG-round separator ppermutes ride the cross-host (Gloo) link,
    # the replica axis carries two simultaneous optimizations.
    devs = jax.devices()  # process-major: p0 owns d0-3, p1 owns d4-7
    grid = np.array([[devs[0], devs[1], devs[4], devs[5]],
                     [devs[2], devs[3], devs[6], devs[7]]])
    mesh2 = Mesh(grid, ("replica", "blocks"))
    layout4 = build_block_layout(gb, 4)
    state4, edges4, maps4 = layout_device_arrays(layout4, jnp.float32)
    sh_b = NamedSharding(mesh2, P("blocks"))
    sh_rb = NamedSharding(mesh2, P("replica", "blocks"))
    state_r = tuple(
        jax.device_put(
            np.broadcast_to(np.asarray(a), (2,) + a.shape).copy(), sh_rb)
        for a in state4)
    edges4 = tuple(jax.device_put(np.asarray(a), sh_b) for a in edges4)
    maps4 = tuple(jax.device_put(np.asarray(a), sh_b) for a in maps4)
    run2 = make_block_optimize(
        mesh2, layout4, num_iterations=8, tolerance=0.0, cg_tol=1e-6,
        dtype=jnp.float32,
    )
    _, errors2, it2, _ = run2(state_r, edges4, maps4)
    errors2 = np.asarray(errors2)
    finals2 = [float(e[~np.isnan(e)][-1]) for e in errors2]

    out = {
        "chi2_before": float(chi2_before),
        "chi2_after": float(chi2_after),
        "dx_norm": float(jnp.linalg.norm(dx)),
        "devices": n_dev,
        "block_chi2_first": float(errors[0]),
        "block_chi2_final": float(errors[~np.isnan(errors)][-1]),
        "block_iters": int(it),
        "block2d_chi2_final": finals2,
        "block2d_iters": [int(v) for v in np.asarray(it2)],
    }
    if pid == 0:
        print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
