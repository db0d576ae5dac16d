"""Configuration layer.

The reference hard-codes every constant (tolerance 1e-4 pgo.rs:253,
λ0 = 0.01 pgo.rs:254, prior 1e7 pgo.rs:331, example noise params) and takes
runtime choices from interactive menus (SURVEY §5). Here the knobs live in
one frozen dataclass that is hashable (usable as a jit static argument) and
overridable from CLI flags or dicts.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PGOConfig:
    """Pose-graph optimizer knobs (defaults = reference behavior)."""

    num_iterations: int = 50
    solver: str = "gauss_newton"  # or "levenberg_marquardt"
    backend: str = "host"  # host | native | dense | cg | cg-banded
    tolerance: float = 1e-4  # ‖dx‖ convergence (pgo.rs:253)
    lambda0: float = 0.01  # LM initial damping (pgo.rs:254)
    prior_weight: float = 1e7  # gauge prior (pgo.rs:331)
    cg_tol: float = 1e-10
    cg_maxiter: int | None = None

    def replace(self, **kw) -> "PGOConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class FilterConfig:
    """Bayesian-filter knobs (defaults = reference examples)."""

    algo: str = "ekf"  # ekf | ukf | pf
    num_particles: int = 300
    resampling: str = "stratified"  # multinomial | stratified | systematic
    ukf_alpha: float = 0.1
    ukf_beta: float = 2.0
    ukf_kappa: float = 0.0

    def replace(self, **kw) -> "FilterConfig":
        return dataclasses.replace(self, **kw)


def from_dict(cls, d: dict):
    """Build a config from a (possibly partial) dict, rejecting unknown
    keys — the CLI/flag entry point."""
    fields = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - fields
    if unknown:
        raise ValueError(f"unknown {cls.__name__} keys: {sorted(unknown)}")
    return cls(**d)
