"""Minimal native bijector set for parameter constraints.

The reference delegates to ``tfp.substrates.jax.bijectors``
(ref: gaussfiltax/parameters.py:4,64,88,116); TFP is not a dependency of this
package, so we supply the small set of bijectors the SSM parameter system
needs: identity, exp, softplus, sigmoid, and a real-vector ↔ PSD-matrix map
for covariance parameters. Each bijector provides ``forward`` (also
``__call__``), ``inverse``, and ``forward_log_det_jacobian``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class Bijector:
    """Base: forward maps unconstrained -> constrained."""

    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def forward_log_det_jacobian(self, x):
        raise NotImplementedError

    def __call__(self, x):
        return self.forward(x)


class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def forward_log_det_jacobian(self, x):
        return jnp.zeros_like(jnp.asarray(x, dtype=jnp.result_type(x, 0.0)))


class Exp(Bijector):
    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y)

    def forward_log_det_jacobian(self, x):
        return jnp.asarray(x)


class Softplus(Bijector):
    def forward(self, x):
        return jax.nn.softplus(x)

    def inverse(self, y):
        # softplus^{-1}(y) = log(expm1(y)), computed stably
        return y + jnp.log(-jnp.expm1(-y))

    def forward_log_det_jacobian(self, x):
        return -jax.nn.softplus(-x)


class Sigmoid(Bijector):
    def __init__(self, low: float = 0.0, high: float = 1.0):
        self.low = low
        self.high = high

    def forward(self, x):
        return self.low + (self.high - self.low) * jax.nn.sigmoid(x)

    def inverse(self, y):
        z = (y - self.low) / (self.high - self.low)
        return jnp.log(z) - jnp.log1p(-z)

    def forward_log_det_jacobian(self, x):
        return (
            jnp.log(self.high - self.low)
            - jax.nn.softplus(-x)
            - jax.nn.softplus(x)
        )


def _tril_indices(n: int):
    return jnp.tril_indices(n)


class RealToPSD(Bijector):
    """Map an unconstrained vector of length n(n+1)/2 to an (n, n) PSD matrix
    via a Cholesky factor with softplus-positive diagonal.

    Stand-in for the dynamax/TFP ``RealToPSDBijector`` used for covariance
    parameters.
    """

    def __init__(self, n: int):
        self.n = n

    def forward(self, x):
        n = self.n
        L = jnp.zeros((n, n), dtype=x.dtype).at[_tril_indices(n)].set(x)
        diag = jax.nn.softplus(jnp.diagonal(L))
        L = L.at[jnp.arange(n), jnp.arange(n)].set(diag)
        return L @ L.T

    def inverse(self, y):
        L = jnp.linalg.cholesky(y)
        softplus_inv = lambda v: v + jnp.log(-jnp.expm1(-v))
        diag = softplus_inv(jnp.diagonal(L))
        L = L.at[jnp.arange(self.n), jnp.arange(self.n)].set(diag)
        return L[_tril_indices(self.n)]

    def forward_log_det_jacobian(self, x):
        # log|d vec(LL^T) / d x|: n log 2 + sum_i (n - i + 1) log L_ii
        # + softplus jacobians of the diagonal entries.
        n = self.n
        L = jnp.zeros((n, n), dtype=x.dtype).at[_tril_indices(n)].set(x)
        raw_diag = jnp.diagonal(L)
        diag = jax.nn.softplus(raw_diag)
        exponents = jnp.arange(n, 0, -1).astype(x.dtype)
        chol_term = n * jnp.log(2.0) + jnp.sum(exponents * jnp.log(diag))
        softplus_term = jnp.sum(-jax.nn.softplus(-raw_diag))
        return chol_term + softplus_term


__all__ = ["Bijector", "Identity", "Exp", "Softplus", "Sigmoid", "RealToPSD"]
