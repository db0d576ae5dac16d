"""Occupancy-grid mapping (log-odds) from range scans at known poses.

Reference README Todo item "Occupancy Grid" (never implemented there).
The classic algorithm casts each beam with Bresenham line-walking and
per-cell hash updates — serial pointer-chasing. The TPU formulation:

- every beam is SAMPLED at a fixed number of points along its ray
  (static shape: (B, S) sample positions);
- all samples of all beams convert to cell indices in one vectorized
  step and their log-odds contributions (miss along the ray, hit at the
  endpoint) land in the grid via ONE scatter-add;
- a whole trajectory of scans is a ``lax.scan`` over time — the complete
  mapping run is a single XLA program.

Cells touched by several beams accumulate additively, which is exactly
the log-odds independence assumption.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

LOG_ODDS_HIT = 0.85     # log odds of occupied given a hit (~p=0.7)
LOG_ODDS_MISS = -0.4    # log odds given pass-through (~p=0.4)
LOG_ODDS_CLAMP = 10.0   # saturation


@flax.struct.dataclass
class OccupancyGrid:
    """log_odds: (H, W); world frame x = origin[0] + col * resolution."""

    log_odds: jnp.ndarray
    origin: jnp.ndarray      # (2,) world coords of cell (0, 0) corner
    resolution: float = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, height, width, resolution, origin=(0.0, 0.0),
               dtype=jnp.float32):
        return cls(
            log_odds=jnp.zeros((height, width), dtype),
            origin=jnp.asarray(origin, dtype),
            resolution=resolution,
        )

    @property
    def probability(self):
        return jax.nn.sigmoid(self.log_odds)

    def world_to_cell(self, xy):
        """(..., 2) world -> (row, col) float indices."""
        rc = (xy - self.origin) / self.resolution
        return rc[..., 1], rc[..., 0]


def integrate_scan(grid: OccupancyGrid, pose, ranges, angles,
                   max_range: float, samples_per_beam: int = 64):
    """Fuse one range scan taken at ``pose`` [x, y, theta].

    ranges (B,): measured distances (>= max_range or non-finite = no
    return: the ray is free along its whole length, no hit endpoint).
    angles (B,): beam bearings in the robot frame.
    """
    h, w = grid.log_odds.shape
    dtype = grid.log_odds.dtype
    r = jnp.where(jnp.isfinite(ranges), ranges, max_range)
    no_hit = r >= max_range
    r = jnp.clip(r, 0.0, max_range)
    heading = pose[2] + angles
    direction = jnp.stack([jnp.cos(heading), jnp.sin(heading)], -1)  # (B, 2)

    # free-space samples strictly inside the beam, one hit at the end
    frac = (jnp.arange(samples_per_beam, dtype=dtype) + 0.5) \
        / samples_per_beam
    dist = r[:, None] * frac[None, :]                         # (B, S)
    pts = pose[:2] + direction[:, None, :] * dist[..., None]  # (B, S, 2)
    hit_pts = pose[:2] + direction * r[:, None]               # (B, 2)

    def to_cells(xy):
        rc = (xy - grid.origin) / grid.resolution
        col = jnp.floor(rc[..., 0]).astype(jnp.int32)
        row = jnp.floor(rc[..., 1]).astype(jnp.int32)
        ok = (row >= 0) & (row < h) & (col >= 0) & (col < w)
        return jnp.clip(row, 0, h - 1), jnp.clip(col, 0, w - 1), ok

    fr, fc, f_ok = to_cells(pts)
    hr, hc, h_ok = to_cells(hit_pts)
    # samples in the hit cell must not erase the hit: drop free samples
    # that land on the beam's endpoint cell
    same = (fr == hr[:, None]) & (fc == hc[:, None])
    f_ok = f_ok & jnp.logical_not(same)
    # dedup consecutive samples that fall in the same cell, so a beam
    # contributes at most one miss per traversed cell regardless of the
    # sample density (log-odds evidence must not scale with S)
    dup = jnp.zeros_like(f_ok).at[:, 1:].set(
        (fr[:, 1:] == fr[:, :-1]) & (fc[:, 1:] == fc[:, :-1]))
    f_ok = f_ok & jnp.logical_not(dup)
    h_ok = h_ok & jnp.logical_not(no_hit)

    miss = jnp.where(f_ok, LOG_ODDS_MISS, 0.0).astype(dtype)
    hit = jnp.where(h_ok, LOG_ODDS_HIT, 0.0).astype(dtype)
    lo = grid.log_odds
    lo = lo.at[fr.ravel(), fc.ravel()].add(miss.ravel())
    lo = lo.at[hr, hc].add(hit)
    lo = jnp.clip(lo, -LOG_ODDS_CLAMP, LOG_ODDS_CLAMP)
    return grid.replace(log_odds=lo)


def integrate_trajectory(grid: OccupancyGrid, poses, ranges, angles,
                         max_range: float, samples_per_beam: int = 64):
    """Fuse a whole trajectory: poses (T, 3), ranges (T, B), shared beam
    angles (B,) — one lax.scan, one XLA program."""

    def body(g, inp):
        pose, rng = inp
        return integrate_scan(g, pose, rng, angles, max_range,
                              samples_per_beam), None

    grid, _ = jax.lax.scan(body, grid, (poses, ranges))
    return grid


integrate_trajectory_jit = jax.jit(
    integrate_trajectory,
    static_argnames=("max_range", "samples_per_beam"),
)
