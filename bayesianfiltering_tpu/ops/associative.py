"""Temporally-parallel Kalman filtering via ``lax.associative_scan``.

Long-sequence scaling story for the linear-Gaussian case: the sequential
scan in :mod:`bayesianfiltering_tpu.ops.linear` is O(T) depth; here the
filtering recursion is phrased as an associative operator over per-timestep
five-tuples ``(A, b, C, J, η)`` and combined in O(log T) depth
(Särkkä & García-Fernández, *Temporal Parallelization of Bayesian Smoothers*,
IEEE TAC 2021 — listed in PAPERS.md). On TPU this turns a latency-bound
recursion into batched matmuls across the time axis (MXU-friendly), which is
how a 1M-step linear filter saturates the chip.

No counterpart exists in the reference (its only time handling is
``lax.scan``, e.g. ref: gaussfiltax/inference.py:371); this is the TPU-native
answer to SURVEY.md §5.7.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, vmap

from bayesianfiltering_tpu.config import with_matmul_precision
from bayesianfiltering_tpu.ops.linear import ParamsLGSSM, PosteriorKalman, _biases
from bayesianfiltering_tpu.utils.linalg import psd_solve, symmetrize


def _first_element(params: ParamsLGSSM, y0):
    """Element for t=0: condition the prior on y_0 (no propagation first,
    matching the update-then-predict convention of the sequential filter)."""
    H, R = params.emission_matrix, params.emission_covariance
    _, d = _biases(params)
    m0, P0 = params.initial_mean, params.initial_covariance
    dx = m0.shape[-1]

    S = symmetrize(H @ P0 @ H.T + R)
    K = psd_solve(S, H @ P0).T
    A = jnp.zeros((dx, dx))
    b = m0 + K @ (y0 - H @ m0 - d)
    C = symmetrize(P0 - K @ S @ K.T)
    J = jnp.zeros((dx, dx))
    eta = jnp.zeros((dx,))
    return A, b, C, J, eta


def _generic_element(params: ParamsLGSSM, y):
    """Element for t >= 1 (predict through F,Q then update with y)."""
    F, Q = params.dynamics_matrix, params.dynamics_covariance
    H, R = params.emission_matrix, params.emission_covariance
    c, d = _biases(params)

    S = symmetrize(H @ Q @ H.T + R)
    K = psd_solve(S, H @ Q).T
    resid = y - d - H @ c
    A = (jnp.eye(F.shape[0]) - K @ H) @ F
    b = c + K @ resid
    C = symmetrize((jnp.eye(F.shape[0]) - K @ H) @ Q)
    HF = H @ F
    J = symmetrize(HF.T @ psd_solve(S, HF))
    eta = HF.T @ psd_solve(S, resid)
    return A, b, C, J, eta


def _combine(elem_left, elem_right):
    """Associative combination of filtering elements (Särkkä & G-F, Lemma 8)."""
    A1, b1, C1, J1, eta1 = elem_left
    A2, b2, C2, J2, eta2 = elem_right
    dx = A1.shape[-1]
    I = jnp.eye(dx, dtype=A1.dtype)

    # (I + C1 J2)^{-1} applied from the right/left via linear solves.
    M = I + C1 @ J2
    A2M = jnp.swapaxes(jnp.linalg.solve(jnp.swapaxes(M, -1, -2),
                                        jnp.swapaxes(A2, -1, -2)), -1, -2)
    A = A2M @ A1
    b = A2M @ (b1 + jnp.einsum("...ij,...j->...i", C1, eta2))[..., None]
    b = b[..., 0] + b2
    C = symmetrize(A2M @ C1 @ jnp.swapaxes(A2, -1, -2) + C2)

    N = I + J2 @ C1
    tmp = jnp.linalg.solve(N, (eta2 - jnp.einsum("...ij,...j->...i", J2, b1))[..., None])[..., 0]
    eta = jnp.einsum("...ji,...j->...i", A1, tmp) + eta1
    JA = jnp.linalg.solve(N, J2 @ A1)
    J = symmetrize(jnp.swapaxes(A1, -1, -2) @ JA + J1)
    return A, b, C, J, eta


@with_matmul_precision
def parallel_kalman_filter(params: ParamsLGSSM, emissions: jax.Array) -> PosteriorKalman:
    """Log-depth Kalman filter; matches :func:`kalman_filter` outputs
    (filtered means/covariances; predicted moments derived by one extra
    propagation; marginal loglik from the innovation form)."""
    F, Q = params.dynamics_matrix, params.dynamics_covariance
    c, _ = _biases(params)

    first = _first_element(params, emissions[0])
    rest = vmap(lambda y: _generic_element(params, y))(emissions[1:])
    elems = tuple(
        jnp.concatenate([f[None], r], axis=0) for f, r in zip(first, rest)
    )

    _, b_all, C_all, _, _ = lax.associative_scan(_combine, elems)
    filtered_means = b_all
    filtered_covs = C_all

    predicted_means = jnp.einsum("ij,tj->ti", F, filtered_means) + c
    predicted_covs = symmetrize(
        jnp.einsum("ik,tkl,jl->tij", F, filtered_covs, F) + Q
    )

    ll = _marginal_loglik(params, emissions, filtered_means, filtered_covs)
    return PosteriorKalman(ll, filtered_means, filtered_covs,
                           predicted_means, predicted_covs)


def _marginal_loglik(params, emissions, filtered_means, filtered_covs):
    """Innovation-form marginal log-likelihood from the filtered moments."""
    F, Q = params.dynamics_matrix, params.dynamics_covariance
    H, R = params.emission_matrix, params.emission_covariance
    c, d = _biases(params)
    from bayesianfiltering_tpu.distributions import mvn_logpdf

    pm_prev = jnp.concatenate(
        [params.initial_mean[None],
         jnp.einsum("ij,tj->ti", F, filtered_means[:-1]) + c], axis=0)
    pP_prev = jnp.concatenate(
        [params.initial_covariance[None],
         symmetrize(jnp.einsum("ik,tkl,jl->tij", F, filtered_covs[:-1], F) + Q)],
        axis=0)
    yhat = jnp.einsum("ij,tj->ti", H, pm_prev) + d
    S = symmetrize(jnp.einsum("ik,tkl,jl->tij", H, pP_prev, H) + R)
    return jnp.sum(mvn_logpdf(emissions, yhat, S))


__all__ = ["parallel_kalman_filter"]
