"""Numerical sanitizers (SURVEY §5: the build's answer to "race detection
/ sanitizers" — JAX's functional purity plus jit-compatible invariant
checks; the reference has nothing here, safe Rust aside).

``checked`` instruments any jittable function with checkify's float checks
so NaN/Inf produced ANYWHERE inside the compiled computation raises with a
source location, instead of surfacing later as a silently-poisoned state.
``check`` adds domain invariants (e.g. covariance symmetry) inside jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import checkify

float_checks = checkify.float_checks
all_checks = checkify.float_checks | checkify.user_checks


def checked(fn, errors=all_checks):
    """Wrap ``fn`` so calling it runs under checkify and RAISES on the
    first NaN/Inf (or failed checkify.check) with its source location.

    Usage: ``checked(jax.jit(step))(state, ...)`` — debugging tool; the
    production path stays uninstrumented.
    """
    cfn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def check_covariance(cov, atol=1e-5, name="cov"):
    """jit-compatible invariant: covariance symmetric with non-negative
    diagonal (call inside a ``checked`` function)."""
    asym = jnp.max(jnp.abs(cov - jnp.swapaxes(cov, -1, -2)))
    checkify.check(asym < atol, f"{name} not symmetric (max asym {{a}})",
                   a=asym)
    dmin = jnp.min(jnp.diagonal(cov, axis1=-2, axis2=-1))
    checkify.check(dmin >= -atol, f"{name} diagonal negative ({{d}})",
                   d=dmin)


def assert_finite(tree, name="pytree"):
    """Host-side: raise if any leaf of a pytree contains NaN/Inf."""
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
    return tree
