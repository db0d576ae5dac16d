"""Multivariate normal with Cholesky-backed pdf/logpdf/sample.

Capability parity with the reference's MultiVariateNormal
(src/utils/mvn.rs:30-84): ``new`` factorizes the covariance (mvn.rs:46),
``pdf`` evaluates the density (mvn.rs:65-70), ``sample`` draws
``mean + L @ u`` with u ~ N(0, I) (mvn.rs:72-83). Non-SPD covariance raises
(mvn.rs:7-28).

TPU-first differences: evaluation is batched — ``pdf``/``logpdf`` accept
(..., D) stacks of points and ``sample`` takes a JAX PRNG key and a shape, so
a particle filter evaluates/samples its entire cloud in one fused call
instead of a Python loop.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


class CovarianceNotPositiveDefinite(ValueError):
    """Raised when the covariance has no Cholesky factorization."""


@flax.struct.dataclass
class MultiVariateNormal:
    mean: jnp.ndarray  # (D,)
    chol: jnp.ndarray  # (D, D) lower-triangular L with cov = L @ L.T
    chol_inv: jnp.ndarray  # (D, D) L^-1 (precomputed whitening transform)
    log_norm: jnp.ndarray  # scalar: -0.5 * (D*log(2*pi) + log det cov)

    @classmethod
    def create(cls, mean, covariance) -> "MultiVariateNormal":
        mean = jnp.asarray(mean)
        covariance = jnp.asarray(covariance)
        chol = jnp.linalg.cholesky(covariance)
        # Eager SPD check when running outside jit (host-side), mirroring the
        # reference's error on non-SPD covariance.
        try:
            bad = bool(jnp.any(jnp.isnan(chol)))
        except jax.errors.TracerBoolConversionError:
            bad = False
        if bad:
            raise CovarianceNotPositiveDefinite(
                "covariance is not symmetric positive definite"
            )
        d = mean.shape[-1]
        log_det = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)))
        log_norm = -0.5 * (d * np.log(2.0 * np.pi) + log_det)
        chol_inv = jax.scipy.linalg.solve_triangular(
            chol, jnp.eye(d, dtype=chol.dtype), lower=True
        )
        return cls(mean=mean, chol=chol, chol_inv=chol_inv, log_norm=log_norm)

    def logpdf(self, x) -> jnp.ndarray:
        """Log density at x: (..., D) -> (...). Whiten with the precomputed
        L^-1 so arbitrary batch shapes are one einsum (TPU-friendly)."""
        dx = jnp.asarray(x) - self.mean
        y = jnp.einsum("ij,...j->...i", self.chol_inv, dx)
        maha = jnp.sum(jnp.square(y), axis=-1)
        return self.log_norm - 0.5 * maha

    def pdf(self, x) -> jnp.ndarray:
        return jnp.exp(self.logpdf(x))

    def sample(self, key, shape=()) -> jnp.ndarray:
        """Draw samples of shape ``shape + (D,)`` as mean + L @ u."""
        d = self.mean.shape[-1]
        u = jax.random.normal(key, tuple(shape) + (d,), dtype=self.mean.dtype)
        return self.mean + jnp.einsum("ij,...j->...i", self.chol, u)
