"""Sharded particle filter: particle clouds partitioned across the mesh.

The reference iterates particles serially in one process
(particle_filter.rs:90-106). Here the cloud lives sharded along the mesh
axis: propagation and weighting are purely local (embarrassingly parallel),
weight normalization reduces with ``psum``, and systematic resampling uses
a globally-consistent draw grid — each device reconstructs its slice of the
resampled cloud from an ``all_gather`` of the (propagated) cloud. The
gather is the simple variant of distributed resampling (SURVEY §5 calls for
psum-prefix offsets; the gather keeps the exchange in one collective and is
bandwidth-optimal on ICI for clouds that fit per-device HBM).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


def make_sharded_pf_step(mesh, pf, num_particles: int):
    """Build a jitted sharded step for a ParticleFilter ``pf``
    (rustrobotics_tpu.localization.pf.ParticleFilter semantics).

    Returns step(key, particles, u, z, dt) with particles sharded
    P(axis) along the cloud dimension; key/u/z replicated.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if num_particles % n_dev:
        raise ValueError("num_particles must divide evenly across the mesh")
    n_local = num_particles // n_dev

    from rustrobotics_tpu.utils.mvn import MultiVariateNormal

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    def step(key, particles, u, z, dt):
        my = jax.lax.axis_index(axis)
        k_local = jax.random.fold_in(key, my)
        k_noise, k_draw = jax.random.split(k_local)

        # local propagate + additive noise (pf.rs:90-94)
        pred = pf.motion_model.prediction(particles, u, dt)
        noise = MultiVariateNormal.create(
            jnp.zeros(particles.shape[-1], dtype=particles.dtype), pf.r
        )
        pred = pred + noise.sample(k_noise, (n_local,))

        # local weights (pf.rs:96-106), globally stabilized in log space
        meas_noise = MultiVariateNormal.create(
            jnp.zeros(z.shape[-1], dtype=z.dtype), pf.q
        )
        logw = meas_noise.logpdf(z - pf.measurement_model.prediction(pred))
        gmax = jax.lax.pmax(jnp.max(logw), axis)
        w = jnp.exp(logw - gmax)

        # global cumulative weights: local cumsum + psum prefix offset
        local_sum = jnp.sum(w)
        sums = jax.lax.all_gather(local_sum, axis)  # (n_dev,)
        offset = jnp.sum(jnp.where(jnp.arange(n_dev) < my, sums, 0.0))
        total = jnp.sum(sums)

        # systematic resampling on the *global* grid: this device owns draw
        # indices [my*n_local, (my+1)*n_local); one shared uniform offset
        u0 = jax.random.uniform(key, (), dtype=w.dtype)  # same on all devices
        gidx = my * n_local + jnp.arange(n_local, dtype=w.dtype)
        draws = (gidx + u0) / num_particles * total

        # global inverse-CDF over the gathered cloud
        cloud = jax.lax.all_gather(pred, axis).reshape(num_particles, -1)
        wall = jax.lax.all_gather(w, axis).reshape(num_particles)
        cum = jnp.cumsum(wall)
        del k_draw, offset  # draws are global; offset retained for clarity
        # sort-based co-ranking: draws are sorted by construction and the
        # binary-search lowering is ~log2(N) serial gather rounds on TPU
        idx = jnp.clip(
            jnp.searchsorted(cum, draws, side="left", method="sort"),
            0, num_particles - 1,
        )
        return cloud[idx]

    return jax.jit(step)


def sharded_pf_step(mesh, pf, key, particles, u, z, dt):
    """One-off convenience wrapper."""
    step = make_sharded_pf_step(mesh, pf, particles.shape[0])
    return step(key, particles, u, z, dt)


def make_sharded_pf_step_bounded(mesh, pf, num_particles: int):
    """Bounded-exchange sharded PF step (SURVEY §5(a)): systematic
    resampling WITHOUT gathering the cloud.

    Each device owns a contiguous global draw range. Because systematic
    draws and the cumulative weights are both monotone, the source
    particles for a device's draws form a contiguous chunk of the global
    cloud — near its own shard when weights are balanced. The cloud
    chunks therefore circulate around the ring (ppermute) only until
    every device has claimed all its draws: a lax.while_loop that
    usually terminates after 1-2 rounds (vs the all_gather variant's
    unconditional D-1 chunks per device). Degenerate weight
    concentrations simply take more rounds — correctness never depends
    on balance.

    Returns step(key, particles, u, z, dt) -> (particles', rounds) where
    ``rounds`` is the number of ring hops actually executed (the comm
    volume is rounds * local cloud bytes).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if num_particles % n_dev:
        raise ValueError("num_particles must divide evenly across the mesh")
    n_local = num_particles // n_dev

    from rustrobotics_tpu.utils.mvn import MultiVariateNormal

    ring_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    ring_bwd = [((i + 1) % n_dev, i) for i in range(n_dev)]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P()),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    def step(key, particles, u, z, dt):
        my = jax.lax.axis_index(axis)
        k_local = jax.random.fold_in(key, my)
        k_noise, _ = jax.random.split(k_local)

        # local propagate + additive noise (pf.rs:90-94)
        pred = pf.motion_model.prediction(particles, u, dt)
        noise = MultiVariateNormal.create(
            jnp.zeros(particles.shape[-1], dtype=particles.dtype), pf.r
        )
        pred = pred + noise.sample(k_noise, (n_local,))

        # local weights, globally stabilized in log space
        meas_noise = MultiVariateNormal.create(
            jnp.zeros(z.shape[-1], dtype=z.dtype), pf.q
        )
        logw = meas_noise.logpdf(z - pf.measurement_model.prediction(pred))
        gmax = jax.lax.pmax(jnp.max(logw), axis)
        w = jnp.exp(logw - gmax)
        # fully-depleted cloud degrades to uniform, not NaN
        total_raw = jax.lax.psum(jnp.sum(w), axis)
        w = jnp.where(total_raw > 0, w, jnp.ones_like(w))

        # global prefix offsets of every shard's weight mass. ALL chunk
        # boundaries come from the same cumsum so the intervals
        # (csum[d-1], csum[d]] tile [0, total] EXACTLY — recomputing
        # lo/hi by addition would leave ulp-sized gaps that strand draws
        sums = jax.lax.all_gather(jnp.sum(w), axis)  # (n_dev,)
        csum = jnp.cumsum(sums)
        total = csum[-1]

        # my draw values on the global systematic grid (sorted)
        u0 = jax.random.uniform(key, (), dtype=w.dtype)  # same everywhere
        gidx = my * n_local + jnp.arange(n_local, dtype=w.dtype)
        draws = (gidx + u0) / num_particles * total

        out0 = jnp.zeros_like(pred)
        filled0 = jnp.zeros(n_local, bool)

        def claim(out, filled, cloud, wvis, owner):
            lo = jnp.where(owner > 0, csum[owner - 1], 0.0)
            cum = lo + jnp.cumsum(wvis)
            hi = csum[owner]
            # draw v sourced from visiting chunk iff v in (lo, hi]
            in_range = (draws > lo) & (draws <= hi)
            idx = jnp.clip(
                jnp.searchsorted(cum, draws, side="left",
                                 method="sort"),
                0, n_local - 1,
            )
            newly = in_range & jnp.logical_not(filled)
            out = jnp.where(newly[:, None], cloud[idx], out)
            return out, filled | in_range

        def body(state):
            # counter-rotating buffers: round r covers owners my-r AND
            # my+r, so boundary draws on either side resolve in one hop
            (out, filled, cf, wf, of, cb, wb, ob, rounds) = state
            cf = jax.lax.ppermute(cf, axis, ring_fwd)
            wf = jax.lax.ppermute(wf, axis, ring_fwd)
            of = (of - 1) % n_dev
            out, filled = claim(out, filled, cf, wf, of)
            cb = jax.lax.ppermute(cb, axis, ring_bwd)
            wb = jax.lax.ppermute(wb, axis, ring_bwd)
            ob = (ob + 1) % n_dev
            out, filled = claim(out, filled, cb, wb, ob)
            return (out, filled, cf, wf, of, cb, wb, ob, rounds + 1)

        def cond(state):
            filled, rounds = state[1], state[8]
            unfilled = jax.lax.psum(
                jnp.sum(jnp.logical_not(filled)), axis)
            return jnp.logical_and(unfilled > 0,
                                   rounds < (n_dev + 1) // 2)

        # claim from the own chunk first: with balanced weights most
        # draws resolve locally and the loop exits after 0-1 ring hops
        out, filled = claim(out0, filled0, pred, w, my)
        state = (out, filled, pred, w, my, pred, w, my,
                 jnp.asarray(0, jnp.int32))
        out, _, _, _, _, _, _, _, rounds = jax.lax.while_loop(
            cond, body, state)
        return out, jax.lax.pmax(rounds, axis)

    return jax.jit(step)
