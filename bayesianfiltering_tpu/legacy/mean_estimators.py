"""ALA static mean estimators: estimators of E[g(x)], x ~ N(m, P).

The reference ships this as a non-importable script
(ref: gaussfiltax/mean_estimators.py — top-level ``import utils`` and
hard-coded experiment constants); here each estimator is an importable,
jit-able function, plus :func:`compare_estimators` reproducing the script's
variance/MSE comparison table.

Estimators (ref line references):
* :func:`mc_estimate` — plain Monte-Carlo (ref :92-98)
* :func:`mcl_estimate` — MC-linear: sample from the deflated N(m, P−Δ)
  (ref :123-132)
* :func:`mcq_estimate` — MC-quadratic: MCL + ½ tr(H̄ Δ) Hessian-trace
  correction (ref :133)
* :func:`mc2_estimate` — two-stage MC with importance-sampling proportional
  allocation (ref :135-156); the data-dependent per-sample allocation loop
  is replaced by a fixed-shape expected-allocation weighting (each outer
  sample spawns a fixed inner batch, contributions weighted by its
  allocation probability) so the estimator is jit-able
* :func:`simple_quadratic_estimate` / :func:`smart_quadratic_estimate` —
  deterministic g(m) + ½ tr(H P) / ½ tr(H Δ) (ref :158-159)
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import jacfwd, jacrev, vmap

from bayesianfiltering_tpu.distributions import mvn_logpdf, mvn_sample
from bayesianfiltering_tpu.types import PRNGKey
from bayesianfiltering_tpu.utils.sdp import sdp_opt_legacy


def _scalarize(g: Callable):
    return lambda x: jnp.squeeze(jnp.atleast_1d(g(x)))


def mc_estimate(key: PRNGKey, g: Callable, m, P, num_samples: int):
    """Plain Monte-Carlo estimate of E[g(x)]."""
    xs = mvn_sample(key, m, P, (num_samples,))
    return jnp.mean(vmap(_scalarize(g))(xs))


def mcl_estimate(key: PRNGKey, g: Callable, m, P, delta, num_samples: int):
    """MC-linear: average g over samples from the deflated N(m, P − Δ)."""
    xs = mvn_sample(key, m, P - delta, (num_samples,))
    return jnp.mean(vmap(_scalarize(g))(xs))


def mcq_estimate(key: PRNGKey, g: Callable, m, P, delta, num_samples: int):
    """MC-quadratic: MCL plus the Hessian-trace correction ½ tr(H̄ Δ)
    with H̄ the sample-averaged Hessian."""
    gs = _scalarize(g)
    hessian = jacfwd(jacrev(gs))
    xs = mvn_sample(key, m, P - delta, (num_samples,))
    vals = vmap(gs)(xs)
    H = jnp.mean(vmap(hessian)(xs), axis=0)
    H = jnp.reshape(H, (m.shape[-1], m.shape[-1]))
    return jnp.mean(vals) + 0.5 * jnp.trace(H @ delta)


def mc2_estimate(key: PRNGKey, g: Callable, m, P, delta,
                 num_outer: int, num_inner: int):
    """Two-stage MC with importance-sampling proportional allocation.

    Outer samples z ~ N(m, P) (the IS proposal); allocation weights
    ∝ N(z; m, P−Δ)/N(z; m, P); inner samples x ~ N(z, Δ). The reference
    allocates integer counts per outer sample (data-dependent shapes); here
    every outer sample gets ``num_inner`` inner draws and its contribution
    is weighted by its allocation probability — same estimator in
    expectation, fixed shapes.
    """
    gs = _scalarize(g)
    k1, k2 = jr.split(key)
    outer = mvn_sample(k1, m, P, (num_outer,))
    log_alloc = vmap(lambda z: mvn_logpdf(z, m, P - delta) - mvn_logpdf(z, m, P))(outer)
    alloc = jax.nn.softmax(log_alloc)
    inner = mvn_sample(k2, outer, jnp.broadcast_to(delta, (num_outer,) + delta.shape),
                       (num_inner,))  # (num_inner, num_outer, dx)
    vals = vmap(vmap(gs))(inner)  # (num_inner, num_outer)
    return jnp.sum(alloc * jnp.mean(vals, axis=0))


def simple_quadratic_estimate(g: Callable, m, P):
    """g(m) + ½ tr(H(m) P) (ref: gaussfiltax/mean_estimators.py:158)."""
    gs = _scalarize(g)
    H = jnp.reshape(jacfwd(jacrev(gs))(m), (m.shape[-1], m.shape[-1]))
    return gs(m) + 0.5 * jnp.trace(H @ P)


def smart_quadratic_estimate(g: Callable, m, P, delta):
    """g(m) + ½ tr(H(m) Δ) (ref: gaussfiltax/mean_estimators.py:159)."""
    gs = _scalarize(g)
    H = jnp.reshape(jacfwd(jacrev(gs))(m), (m.shape[-1], m.shape[-1]))
    return gs(m) + 0.5 * jnp.trace(H @ delta)


def optimal_delta(g: Callable, m, P, num_samples: int, lip: float = 0.1,
                  steps: int = 10, eta: float = 0.01):
    """Splitting covariance from the legacy SDP solver at the mean's Hessian
    (ref: gaussfiltax/mean_estimators.py:115)."""
    gs = _scalarize(g)
    dx = m.shape[-1]
    H = jnp.reshape(jacfwd(jacrev(gs))(m), (dx, dx))
    return sdp_opt_legacy(dx, num_samples, lip, P, P, H, steps, eta)


def compare_estimators(
    key: PRNGKey,
    g: Callable,
    m,
    P,
    delta=None,
    num_samples: int = 10,
    num_trials: int = 100,
    baseline_samples: int = 100_000,
) -> Dict[str, jax.Array]:
    """Reproduce the reference script's estimator comparison
    (ref: gaussfiltax/mean_estimators.py:78-175): per-estimator variance and
    MSE against a large-sample baseline, over ``num_trials`` repetitions.
    """
    m = jnp.atleast_1d(m)
    P = jnp.atleast_2d(P)
    if delta is None:
        delta = optimal_delta(g, m, P, num_samples)

    k_base, k_trials = jr.split(key)
    baseline = mc_estimate(k_base, g, m, P, baseline_samples)

    keys = jr.split(k_trials, num_trials)
    mc = vmap(lambda k: mc_estimate(k, g, m, P, num_samples))(keys)
    mcl = vmap(lambda k: mcl_estimate(k, g, m, P, delta, num_samples))(keys)
    mcq = vmap(lambda k: mcq_estimate(k, g, m, P, delta, num_samples))(keys)
    mc2 = vmap(lambda k: mc2_estimate(k, g, m, P, delta, num_samples,
                                      num_samples))(keys)

    def stats(est):
        mean = jnp.mean(est)
        var = jnp.sum((est - mean) ** 2) / (num_trials - 1)
        mse = jnp.sum((est - baseline) ** 2) / (num_trials - 1)
        return {"var": var, "mse": mse, "mean": mean}

    return {
        "baseline": baseline,
        "delta": delta,
        "mc": stats(mc),
        "mcl": stats(mcl),
        "mcq": stats(mcq),
        "mc2": stats(mc2),
        "simple_quadratic": simple_quadratic_estimate(g, m, P),
        "smart_quadratic": smart_quadratic_estimate(g, m, P, delta),
        "linear": _scalarize(g)(m),
    }


__all__ = [
    "mc_estimate",
    "mcl_estimate",
    "mcq_estimate",
    "mc2_estimate",
    "simple_quadratic_estimate",
    "smart_quadratic_estimate",
    "optimal_delta",
    "compare_estimators",
]
