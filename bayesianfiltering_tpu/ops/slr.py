"""Monte-Carlo / statistical-linearization moment approximations.

Batched, key-explicit equivalents of the legacy moment engines:

* :func:`mc_moments` — plain Monte-Carlo transform moments, the core of the
  legacy ``MCF`` filter (ref: gaussfiltax/gaussfilt.py:179-198).
* :func:`mcla_moments` — Monte-Carlo *linearization-augmented* moments: draw
  particles from the deflated ``N(m, P − Δ)``, add the per-particle
  linearization correction ``J Δ Jᵀ`` — the core of the legacy ``MCLAF``
  filter (ref: gaussfiltax/gaussfilt.py:255-308) and of the static ALA
  estimators (ref: gaussfiltax/mean_estimators.py:118-131).

Everything is a fixed-shape batch op: sampling is one batched matmul off a
Cholesky factor, transforms/Jacobians are ``vmap``-ed, and moment
accumulation is an einsum — directly reusable inside `lax.scan` filters and
shardable over a particle mesh axis.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import vmap

from bayesianfiltering_tpu.types import PRNGKey
from bayesianfiltering_tpu.utils.linalg import cholesky_guarded, symmetrize


def _sample(key: PRNGKey, m, P, num: int):
    chol = cholesky_guarded(P)
    eps = jr.normal(key, (num, m.shape[-1]), dtype=m.dtype)
    return m + eps @ chol.T


def mc_moments(
    key: PRNGKey,
    m: jax.Array,
    P: jax.Array,
    func: Callable,
    cov_add: jax.Array,
    num_particles: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Monte-Carlo estimate of the transform moments of ``func``.

    Returns ``(mean_out, var_out, cov_out)`` with the legacy MCF conventions
    (ref: gaussfiltax/gaussfilt.py:188-198): 1/N normalization, additive
    noise covariance ``cov_add`` folded into ``var_out``.
    """
    particles = _sample(key, m, P, num_particles)
    trans = vmap(func)(particles)
    trans = jnp.atleast_2d(trans.reshape(num_particles, -1))
    mean_out = jnp.sum(trans, axis=0) / num_particles
    ct = trans - mean_out
    var_out = symmetrize(cov_add + jnp.einsum("ni,nj->ij", ct, ct) / num_particles)
    cov_out = jnp.einsum("ni,nj->ij", particles - m, ct) / num_particles
    return mean_out, var_out, cov_out


def mcla_moments(
    key: PRNGKey,
    m: jax.Array,
    P: jax.Array,
    func: Callable,
    jacobian: Callable,
    cov_add: jax.Array,
    delta: jax.Array,
    num_particles: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Linearization-augmented Monte-Carlo moments.

    Particles are drawn from the deflated ``N(m, P − Δ)``; each carries a
    local linearization with covariance Δ, contributing ``J_n Δ J_nᵀ / N`` to
    the output variance and ``Δ Σ_n J_nᵀ / N`` to the cross-covariance
    (ref: gaussfiltax/gaussfilt.py:288-303, with the reshape gymnastics
    replaced by einsums).
    """
    particles = _sample(key, m, P - delta, num_particles)
    trans = vmap(func)(particles)
    trans = jnp.atleast_2d(trans.reshape(num_particles, -1))
    grads = vmap(jacobian)(particles)
    grads = grads.reshape(num_particles, trans.shape[-1], m.shape[-1])

    mean_out = jnp.sum(trans, axis=0) / num_particles
    ct = trans - mean_out
    var_out = symmetrize(
        cov_add
        + jnp.einsum("ni,nj->ij", ct, ct) / num_particles
        + jnp.einsum("nik,kl,njl->ij", grads, delta, grads) / num_particles
    )
    cov_out = (
        jnp.einsum("ni,nj->ij", particles - m, ct) / num_particles
        + delta @ jnp.sum(grads, axis=0).T / num_particles
    )
    return mean_out, var_out, cov_out


__all__ = ["mc_moments", "mcla_moments"]
