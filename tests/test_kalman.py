"""Exactness tests: on linear-Gaussian models, EKF/UKF/parallel-KF must
reproduce the closed-form Kalman filter (SURVEY.md §4 test plan, item a)."""
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import bayesianfiltering_tpu.inference as gf
from bayesianfiltering_tpu.models import zoo
from bayesianfiltering_tpu.ops import (
    ParamsUKF,
    kalman_filter,
    kalman_smoother,
    parallel_kalman_filter,
)

STATE_DIM, EMISSION_DIM, T = 3, 3, 60


@pytest.fixture(scope="module")
def linear_setup():
    model, params, _ = zoo.linear_gaussian(STATE_DIM, EMISSION_DIM)
    lg = zoo.linear_gaussian_lgssm(STATE_DIM, EMISSION_DIM)
    _, emissions = model.sample(params, jr.PRNGKey(42), T)
    return model, params, lg, emissions


class TestKalmanExactness:
    def test_ekf_matches_kalman_on_linear_model(self, linear_setup):
        _, params, lg, emissions = linear_setup
        kf = kalman_filter(lg, emissions)
        ekf = gf.extended_kalman_filter(params, emissions)
        np.testing.assert_allclose(ekf.filtered_means, kf.filtered_means,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(ekf.filtered_covariances,
                                   kf.filtered_covariances, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(ekf.marginal_loglik, kf.marginal_loglik,
                                   rtol=1e-4)

    def test_ukf_matches_kalman_on_linear_model(self, linear_setup):
        _, params, lg, emissions = linear_setup
        kf = kalman_filter(lg, emissions)
        ukf = gf.unscented_kalman_filter(params, ParamsUKF(alpha=1.0),
                                         emissions)
        np.testing.assert_allclose(ukf.filtered_means, kf.filtered_means,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(ukf.filtered_covariances,
                                   kf.filtered_covariances, rtol=1e-3,
                                   atol=1e-3)

    def test_parallel_kf_matches_sequential(self, linear_setup):
        _, _, lg, emissions = linear_setup
        seq = kalman_filter(lg, emissions)
        par = parallel_kalman_filter(lg, emissions)
        np.testing.assert_allclose(par.filtered_means, seq.filtered_means,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(par.filtered_covariances,
                                   seq.filtered_covariances, rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(par.marginal_loglik, seq.marginal_loglik,
                                   rtol=1e-3)

    def test_smoother_reduces_variance(self, linear_setup):
        _, _, lg, emissions = linear_setup
        post = kalman_smoother(lg, emissions)
        assert post.smoothed_means.shape == post.filtered_means.shape
        # smoothing can only shrink (or keep) marginal variances
        filt_tr = jnp.trace(post.filtered_covariances, axis1=-2, axis2=-1)
        smth_tr = jnp.trace(post.smoothed_covariances, axis1=-2, axis2=-1)
        assert bool(jnp.all(smth_tr <= filt_tr + 1e-5))
        # and the last step must agree exactly
        np.testing.assert_allclose(post.smoothed_means[-1],
                                   post.filtered_means[-1], atol=1e-6)

    def test_smoother_improves_rmse(self, linear_setup):
        model, params, lg, _ = linear_setup
        states, emissions = model.sample(params, jr.PRNGKey(7), 200)
        post = kalman_smoother(lg, emissions)
        from bayesianfiltering_tpu.utils import rmse

        assert float(rmse(post.smoothed_means, states)) <= float(
            rmse(post.filtered_means, states)
        ) + 1e-6
