"""Closed-form linear-Gaussian Kalman filtering and RTS smoothing.

The reference has no dedicated linear path (its experiments run linear models
through the EKF, e.g. the fLG/gLG model at
ref: docs/experiments/adaptive_experiment.py:60-65); we provide one both as
the exactness oracle for tests (EKF/UKF must reproduce it on linear models)
and as the fast path for linear problems. Sequential `lax.scan`
implementation here; the log-depth associative-scan variant lives in
:mod:`bayesianfiltering_tpu.ops.associative`.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from bayesianfiltering_tpu.config import with_matmul_precision
from bayesianfiltering_tpu.utils.linalg import (
    fast_cholesky,
    psd_solve,
    symmetrize,
    tri_inv_lower,
)

_LOG_2PI = math.log(2.0 * math.pi)


class ParamsLGSSM(NamedTuple):
    """Time-invariant linear-Gaussian SSM:
    ``x_t = F x_{t-1} + c + q``, ``y_t = H x_t + d + r``."""

    initial_mean: jax.Array
    initial_covariance: jax.Array
    dynamics_matrix: jax.Array
    dynamics_covariance: jax.Array
    emission_matrix: jax.Array
    emission_covariance: jax.Array
    dynamics_bias: Optional[jax.Array] = None
    emission_bias: Optional[jax.Array] = None


class PosteriorKalman(NamedTuple):
    marginal_loglik: jax.Array
    filtered_means: jax.Array
    filtered_covariances: jax.Array
    predicted_means: jax.Array
    predicted_covariances: jax.Array
    smoothed_means: Optional[jax.Array] = None
    smoothed_covariances: Optional[jax.Array] = None


def _biases(params: ParamsLGSSM):
    dx = params.dynamics_matrix.shape[-1]
    dy = params.emission_matrix.shape[-2]
    c = params.dynamics_bias
    d = params.emission_bias
    c = jnp.zeros((dx,)) if c is None else c
    d = jnp.zeros((dy,)) if d is None else d
    return c, d


@with_matmul_precision
def kalman_filter(params: ParamsLGSSM, emissions: jax.Array) -> PosteriorKalman:
    """Standard Kalman filter over ``emissions`` of shape (T, dy).

    Convention matches the reference filters: the first observation updates
    the *prior* (no propagation before t=0), then predict follows update.
    """
    F, Q = params.dynamics_matrix, params.dynamics_covariance
    H, R = params.emission_matrix, params.emission_covariance
    c, d = _biases(params)
    dy = H.shape[-2]

    def step(carry, y):
        m_pred, P_pred, ll = carry
        # update
        yhat = H @ m_pred + d
        S = symmetrize(H @ P_pred @ H.T + R)
        chol = fast_cholesky(S)
        linv = tri_inv_lower(chol)
        K = (linv.T @ (linv @ (H @ P_pred))).T
        innov = y - yhat
        m_filt = m_pred + K @ innov
        P_filt = symmetrize(P_pred - K @ S @ K.T)
        z = linv @ innov
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        ll = ll - 0.5 * (dy * _LOG_2PI + logdet + jnp.sum(jnp.square(z)))
        # predict
        m_next = F @ m_filt + c
        P_next = symmetrize(F @ P_filt @ F.T + Q)
        return (m_next, P_next, ll), (m_filt, P_filt, m_next, P_next)

    init = (params.initial_mean, params.initial_covariance, jnp.zeros(()))
    (_, _, ll), (fm, fP, pm, pP) = lax.scan(step, init, emissions)
    return PosteriorKalman(ll, fm, fP, pm, pP)


@with_matmul_precision
def kalman_smoother(params: ParamsLGSSM, emissions: jax.Array) -> PosteriorKalman:
    """Rauch–Tung–Striebel smoother built on :func:`kalman_filter`."""
    post = kalman_filter(params, emissions)
    F = params.dynamics_matrix
    fm, fP = post.filtered_means, post.filtered_covariances
    pm, pP = post.predicted_means, post.predicted_covariances

    def step(carry, inputs):
        sm_next, sP_next = carry
        m_f, P_f, m_p, P_p = inputs
        # G = P_f F^T P_p^{-1}
        G = psd_solve(P_p, F @ P_f).T
        sm = m_f + G @ (sm_next - m_p)
        sP = symmetrize(P_f + G @ (sP_next - P_p) @ G.T)
        return (sm, sP), (sm, sP)

    last = (fm[-1], fP[-1])
    # predicted entries at index t correspond to the t -> t+1 transition
    inputs = (fm[:-1], fP[:-1], pm[:-1], pP[:-1])
    _, (sm, sP) = lax.scan(step, last, inputs, reverse=True)
    sm = jnp.concatenate([sm, fm[-1:]], axis=0)
    sP = jnp.concatenate([sP, fP[-1:]], axis=0)
    return post._replace(smoothed_means=sm, smoothed_covariances=sP)


__all__ = ["ParamsLGSSM", "PosteriorKalman", "kalman_filter", "kalman_smoother"]
