"""Oldest-generation ALA API (ref: ALA/test-nonlinear.py).

The reference's earliest experiments import a ``StateSpaceModel`` /
``LinearModelParameters`` API from an ``ssm`` module that no longer exists
in the repo (SURVEY.md §2.5 "historical"); the call surface is fully
determined by ref: ALA/test-nonlinear.py:1,48-53:

    ssm = StateSpaceModel(dx, dy, f, g)          # f/g sample their own noise
    states, obs = ssm.simulate(T, x0)
    means, covs = ssm.extended_kalman_filter(ys, jacob_dyn, jacob_obs, params, init)
    means, covs = ssm.latent_ekf(ys, num_comp, latent_cov, jacob_dyn, jacob_obs, params, init)
    means, covs = ssm.unscented_kalman_filter(ys, init, params, kappa, beta, alpha)

``latent_ekf`` is the original "latent EKF" — the ALA precursor of the AGSF:
per step, draw ``num_comp`` latent linearization points from the deflated
prior ``N(m, P − Λ)``, run an EKF update at each with covariance Λ, and
moment-match the resulting mixture back to one Gaussian.

This shim reconstructs that surface on the JAX core. ``f``/``g`` here are
the *deterministic* parts (noise covariances come from ``params``), matching
how the jacobians in the original script describe only the deterministic
map.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax, vmap

from bayesianfiltering_tpu.distributions import mvn_logpdf, mvn_sample
from bayesianfiltering_tpu.types import PRNGKey
from bayesianfiltering_tpu.utils.linalg import (
    cholesky_guarded,
    psd_solve,
    symmetrize,
)
from bayesianfiltering_tpu.utils.metrics import collapse
from bayesianfiltering_tpu.utils.sigma_points import split_to_sigma_points


class LinearModelParameters(NamedTuple):
    """(A, H, Q, R) noise/linear parameters (ref: ALA/test-nonlinear.py:14)."""

    A: jax.Array
    H: jax.Array
    Q: jax.Array
    R: jax.Array


def _as_cov(x, d):
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim == 0:
        return jnp.maximum(x, 1e-12) * jnp.eye(d)
    return x


class StateSpaceModel:
    def __init__(self, dx: int, dy: int, f: Callable, g: Callable,
                 key: PRNGKey = None):
        self.dx = dx
        self.dy = dy
        self.f = lambda x: jnp.atleast_1d(jnp.asarray(f(x), dtype=jnp.float32))
        self.g = lambda x: jnp.atleast_1d(jnp.asarray(g(x), dtype=jnp.float32))
        self.key = jr.PRNGKey(0) if key is None else key

    def simulate(self, T: int, x0, params: LinearModelParameters = None,
                 Q=None, R=None):
        """Roll out T steps; noise covariances from ``params`` or Q/R."""
        Q = _as_cov(params.Q if Q is None else Q, self.dx)
        R = _as_cov(params.R if R is None else R, self.dy)

        def step(x, k):
            k1, k2 = jr.split(k)
            x_new = self.f(x) + mvn_sample(k1, jnp.zeros(self.dx), Q)
            y_new = self.g(x_new) + mvn_sample(k2, jnp.zeros(self.dy), R)
            return x_new, (x_new, y_new)

        _, (xs, ys) = lax.scan(step, jnp.asarray(x0, dtype=jnp.float32),
                               jr.split(self.key, T))
        return xs, ys

    def _jac(self, jac: Callable, out_dim: int, in_dim: int):
        return lambda x: jnp.reshape(jnp.asarray(jac(x), dtype=jnp.float32),
                                     (out_dim, in_dim))

    def extended_kalman_filter(self, ys, jacob_dyn, jacob_obs,
                               params: LinearModelParameters, init: Sequence):
        """Plain EKF over (f, g) with user-supplied jacobians
        (ref call: ALA/test-nonlinear.py:51). Returns (means, covs)."""
        Q = _as_cov(params.Q, self.dx)
        R = _as_cov(params.R, self.dy)
        Fj = self._jac(jacob_dyn, self.dx, self.dx)
        Hj = self._jac(jacob_obs, self.dy, self.dx)

        def step(carry, y):
            m, P = carry
            F = Fj(m)
            m_pred = self.f(m)
            P_pred = symmetrize(F @ P @ F.T + Q)
            H = Hj(m_pred)
            S = symmetrize(H @ P_pred @ H.T + R)
            K = psd_solve(S, H @ P_pred).T
            m_new = m_pred + K @ (jnp.atleast_1d(y) - self.g(m_pred))
            P_new = symmetrize(P_pred - K @ S @ K.T)
            return (m_new, P_new), (m_new, P_new)

        m0 = jnp.asarray(init[0], dtype=jnp.float32)
        P0 = jnp.asarray(init[1], dtype=jnp.float32)
        _, (means, covs) = lax.scan(step, (m0, P0), jnp.asarray(ys))
        return means, covs

    def latent_ekf(self, ys, num_comp: int, latent_cov, jacob_dyn, jacob_obs,
                   params: LinearModelParameters, init: Sequence,
                   key: PRNGKey = None):
        """The original ALA "latent EKF" (ref call: ALA/test-nonlinear.py:52).

        Per step: predict through the dynamics; draw ``num_comp`` latent
        linearization points from the deflated N(m⁻, P⁻ − Λ); EKF-update each
        with prior covariance Λ; weight by innovation likelihood; collapse
        the mixture to one Gaussian. Returns (means, covs).
        """
        if key is None:
            key = self.key
        Q = _as_cov(params.Q, self.dx)
        R = _as_cov(params.R, self.dy)
        Lam = _as_cov(latent_cov, self.dx)
        Fj = self._jac(jacob_dyn, self.dx, self.dx)
        Hj = self._jac(jacob_obs, self.dy, self.dx)

        def update_one(xn, y):
            H = Hj(xn)
            S = symmetrize(H @ Lam @ H.T + R)
            K = psd_solve(S, H @ Lam).T
            mean = xn + K @ (jnp.atleast_1d(y) - self.g(xn))
            cov = symmetrize(Lam - K @ S @ K.T)
            ll = mvn_logpdf(jnp.atleast_1d(y), self.g(xn), S)
            return mean, cov, ll

        def step(carry, args):
            m, P = carry
            y, k = args
            F = Fj(m)
            m_pred = self.f(m)
            P_pred = symmetrize(F @ P @ F.T + Q)
            chol = cholesky_guarded(P_pred - Lam)
            eps = jr.normal(k, (num_comp, self.dx))
            latents = m_pred + eps @ chol.T
            means, covs, lls = vmap(update_one, (0, None))(latents, y)
            lls = lls - jnp.max(lls)
            w = jnp.exp(lls)
            w = w / jnp.sum(w)
            m_new, P_new = collapse(means, covs, w)
            return (m_new, symmetrize(P_new)), (m_new, P_new)

        m0 = jnp.asarray(init[0], dtype=jnp.float32)
        P0 = jnp.asarray(init[1], dtype=jnp.float32)
        T = len(ys)
        keys = vmap(lambda t: jr.fold_in(key, t))(jnp.arange(T))
        _, (means, covs) = lax.scan(step, (m0, P0), (jnp.asarray(ys), keys))
        return means, covs

    def unscented_kalman_filter(self, ys, init: Sequence,
                                params: LinearModelParameters,
                                kappa: float, beta: float, alpha: float):
        """Legacy-signature UKF (ref call: ALA/test-nonlinear.py:53).
        Returns (means, covs)."""
        Q = _as_cov(params.Q, self.dx)
        R = _as_cov(params.R, self.dy)
        n = self.dx
        lam = alpha**2 * (n + kappa) - n
        w0m = lam / (n + lam)
        wim = 1.0 / (2.0 * (n + lam))
        w0c = w0m + 1.0 - alpha**2 + beta

        def moments(m, P, func, cov, out_dim):
            pts = split_to_sigma_points(m, P, lam)
            new = vmap(func)(pts)
            mu = w0m * new[0] + wim * jnp.sum(new[1:], axis=0)
            d0 = new[0] - mu
            di = new[1:] - mu
            S = cov + w0c * jnp.outer(d0, d0) + wim * jnp.einsum(
                "ij,ik->jk", di, di)
            s0 = pts[0] - m
            si = pts[1:] - m
            C = w0c * jnp.outer(s0, d0) + wim * jnp.einsum("ij,ik->jk", si, di)
            return mu, symmetrize(S), C

        def step(carry, y):
            m, P = carry
            m_pred, P_pred, _ = moments(m, P, self.f, Q, self.dx)
            mu_y, S, C = moments(m_pred, P_pred, self.g, R, self.dy)
            K = psd_solve(S, C.T).T
            m_new = m_pred + K @ (jnp.atleast_1d(y) - mu_y)
            P_new = symmetrize(P_pred - K @ S @ K.T)
            return (m_new, P_new), (m_new, P_new)

        m0 = jnp.asarray(init[0], dtype=jnp.float32)
        P0 = jnp.asarray(init[1], dtype=jnp.float32)
        _, (means, covs) = lax.scan(step, (m0, P0), jnp.asarray(ys))
        return means, covs


__all__ = ["StateSpaceModel", "LinearModelParameters"]
