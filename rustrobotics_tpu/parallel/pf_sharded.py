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
