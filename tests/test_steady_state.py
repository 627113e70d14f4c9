"""Steady-state Kalman filter/smoother vs the exact sequential oracles."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from bayesianfiltering_tpu.models import zoo
from bayesianfiltering_tpu.ops import linear
from bayesianfiltering_tpu.ops.steady_state import (
    steady_state_gains,
    steady_state_kalman_filter,
    steady_state_kalman_smoother,
)


def _params(dx=4, dy=2, seed=0):
    """Well-damped random model with biases (so the bias paths are live)."""
    key = jr.PRNGKey(seed)
    F = 0.7 * jnp.eye(dx) + 0.05 * jr.normal(key, (dx, dx))
    H = jr.normal(jr.fold_in(key, 1), (dy, dx)) / dx
    return linear.ParamsLGSSM(
        initial_mean=jnp.ones(dx),
        initial_covariance=2.0 * jnp.eye(dx),
        dynamics_matrix=F,
        dynamics_covariance=0.3 * jnp.eye(dx),
        emission_matrix=H,
        emission_covariance=0.2 * jnp.eye(dy),
        dynamics_bias=0.1 * jnp.ones(dx),
        emission_bias=-0.2 * jnp.ones(dy),
    )


def _sample(params, T, seed=3):
    key = jr.PRNGKey(seed)
    dx = params.dynamics_matrix.shape[0]
    dy = params.emission_matrix.shape[0]
    c, d = linear._biases(params)

    def step(x, k):
        x = (params.dynamics_matrix @ x + c
             + jnp.linalg.cholesky(params.dynamics_covariance)
             @ jr.normal(jr.fold_in(k, 0), (dx,)))
        y = (params.emission_matrix @ x + d
             + jnp.linalg.cholesky(params.emission_covariance)
             @ jr.normal(jr.fold_in(k, 1), (dy,)))
        return x, y

    _, ys = jax.lax.scan(step, params.initial_mean, jr.split(key, T))
    return ys


class TestGains:
    def test_riccati_converges(self):
        ss = steady_state_gains(_params(), num_iters=128)
        assert float(ss.rel_delta) < 1e-6
        for M in (ss.predicted_covariance, ss.filtered_covariance,
                  ss.smoothed_covariance, ss.innovation_covariance):
            np.testing.assert_allclose(M, M.T, atol=1e-6)
            assert float(jnp.linalg.eigvalsh(M)[0]) > 0

    def test_fixed_point_is_self_consistent(self):
        """P∞ must reproduce itself through one exact filter cov step."""
        p = _params()
        ss = steady_state_gains(p, num_iters=256)
        F, Q = p.dynamics_matrix, p.dynamics_covariance
        P_next = F @ ss.filtered_covariance @ F.T + Q
        np.testing.assert_allclose(P_next, ss.predicted_covariance,
                                   rtol=1e-5, atol=1e-6)

    def test_smoothed_cov_below_filtered(self):
        ss = steady_state_gains(_params(), num_iters=128)
        diff = ss.filtered_covariance - ss.smoothed_covariance
        assert float(jnp.linalg.eigvalsh(symm(diff))[0]) > -1e-6


def symm(M):
    return 0.5 * (M + M.T)


class TestFilter:
    def test_matches_exact_filter(self):
        p = _params()
        ys = _sample(p, 400)
        exact = linear.kalman_filter(p, ys)
        ss = steady_state_kalman_filter(p, ys, head=48)
        np.testing.assert_allclose(ss.filtered_means, exact.filtered_means,
                                   atol=2e-4)
        np.testing.assert_allclose(ss.predicted_means, exact.predicted_means,
                                   atol=2e-4)
        # covariances: exact in the head, steady past it
        np.testing.assert_allclose(ss.filtered_covariances[:48],
                                   exact.filtered_covariances[:48], atol=1e-6)
        np.testing.assert_allclose(ss.filtered_covariances[48:],
                                   exact.filtered_covariances[48:], atol=1e-4)
        ll_rel = abs(float(ss.marginal_loglik - exact.marginal_loglik)
                     / float(exact.marginal_loglik))
        assert ll_rel < 1e-4

    def test_short_sequence_is_exact_path(self):
        p = _params()
        ys = _sample(p, 20)
        exact = linear.kalman_filter(p, ys)
        ss = steady_state_kalman_filter(p, ys, head=64)
        for a, b in zip(ss, exact):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bad_head_raises(self):
        p = _params()
        ys = _sample(p, 8)
        with pytest.raises(ValueError, match="head"):
            steady_state_kalman_filter(p, ys, head=0)

    def test_zoo_model_long(self):
        lg = zoo.linear_gaussian_lgssm(3, 2)
        ys = _sample(lg, 5000, seed=9)
        exact = linear.kalman_filter(lg, ys)
        ss = steady_state_kalman_filter(lg, ys)
        np.testing.assert_allclose(ss.filtered_means, exact.filtered_means,
                                   atol=5e-4)


class TestSmoother:
    def test_matches_exact_smoother(self):
        p = _params()
        ys = _sample(p, 400)
        exact = linear.kalman_smoother(p, ys)
        ss = steady_state_kalman_smoother(p, ys, head=48)
        np.testing.assert_allclose(ss.smoothed_means, exact.smoothed_means,
                                   atol=5e-4)
        np.testing.assert_allclose(ss.smoothed_covariances,
                                   exact.smoothed_covariances, atol=2e-4)

    def test_end_transient_is_exact(self):
        """The last `head` smoothed covariances relax from P_f∞ — they must
        track the exact backward recursion, not the steady fixed point."""
        p = _params()
        ys = _sample(p, 300)
        exact = linear.kalman_smoother(p, ys)
        ss = steady_state_kalman_smoother(p, ys, head=48)
        np.testing.assert_allclose(ss.smoothed_covariances[-48:],
                                   exact.smoothed_covariances[-48:],
                                   atol=2e-4)
        # and the very last entries genuinely differ from the fixed point
        from bayesianfiltering_tpu.ops.steady_state import steady_state_gains
        fp = steady_state_gains(p).smoothed_covariance
        assert float(jnp.max(jnp.abs(ss.smoothed_covariances[-1] - fp))) > 1e-3

    def test_short_sequence_is_exact_path(self):
        p = _params()
        ys = _sample(p, 60)
        exact = linear.kalman_smoother(p, ys)
        ss = steady_state_kalman_smoother(p, ys, head=48)
        for a, b in zip(ss, exact):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
