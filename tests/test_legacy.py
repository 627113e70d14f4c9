"""Tests for the legacy (v0) object API (SURVEY.md §2.3 components 9-15)."""
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from bayesianfiltering_tpu import legacy
from bayesianfiltering_tpu.legacy import (
    AugGaussSumFilt,
    AugmentedJointApproximation,
    BootstrapPF,
    CompositeGaussSumFilt,
    EKF,
    GaussSumFilt,
    MCF,
    MCLAF,
    SSM,
    Simulation,
    UKF,
    mean_estimators,
)
from bayesianfiltering_tpu.ops import kalman_filter, ParamsLGSSM


def _linear_ssm(dx=2, dy=2, a=0.8, h=0.5, q=0.1, r=0.1):
    A = a * jnp.eye(dx)
    H = h * jnp.eye(dy, dx)
    return SSM(
        dx, dy, jnp.zeros(dx), q * jnp.eye(dx), jnp.zeros(dy),
        r * jnp.eye(dy), f=lambda x: A @ x, g=lambda x: H @ x,
    )


def _scalar_nl_ssm():
    return SSM(
        1, 1, jnp.zeros(1), 0.5 * jnp.eye(1), jnp.zeros(1), 0.5 * jnp.eye(1),
        f=lambda x: 0.8 * x + 0.1 * jnp.sin(x),
        g=lambda x: 0.5 * x + 0.05 * x**2,
    )


@pytest.fixture(scope="module")
def linear_data():
    ssm = _linear_ssm()
    xs, ys = ssm.simulate(40, jnp.zeros(2), key=jr.PRNGKey(0))
    # The legacy GaussFilt recursion predicts through the dynamics BEFORE the
    # first update (ref: gaussfiltax/gaussfilt.py:106-113), while the modern
    # kalman_filter conditions the prior directly on y_0 — so the oracle's
    # "initial" distribution is the one-step-propagated prior.
    lg = ParamsLGSSM(
        initial_mean=jnp.zeros(2),  # A @ 0 = 0
        initial_covariance=(0.8**2 + 0.1) * jnp.eye(2),  # A P0 A^T + Q
        dynamics_matrix=0.8 * jnp.eye(2),
        dynamics_covariance=0.1 * jnp.eye(2),
        emission_matrix=0.5 * jnp.eye(2),
        emission_covariance=0.1 * jnp.eye(2),
    )
    kf = kalman_filter(lg, ys)
    return ssm, xs, ys, kf


class TestLegacySSM:
    def test_simulate_shapes(self):
        ssm = _linear_ssm()
        xs, ys = ssm.simulate(25, jnp.ones(2), key=jr.PRNGKey(1))
        assert xs.shape == (25, 2) and ys.shape == (25, 2)

    def test_simulation_wrapper(self):
        sim = Simulation(_linear_ssm(), 10, jnp.zeros(2), key=jr.PRNGKey(2))
        assert sim.states.shape == (10, 2)
        assert sim.observs.shape == (10, 2)


class TestLegacyGaussFilt:
    def test_ekf_first_order_matches_kalman(self, linear_data):
        ssm, _, ys, kf = linear_data
        ekf = EKF(ssm, order=1)
        ll, means, covs = ekf.run(ys, jnp.zeros(2), jnp.eye(2))
        np.testing.assert_allclose(means, kf.filtered_means, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(float(jnp.sum(ll)), float(kf.marginal_loglik),
                                   rtol=1e-4)

    def test_ekf_second_order_equals_first_on_linear(self, linear_data):
        ssm, _, ys, kf = linear_data
        ll, means, _ = EKF(ssm, order=2).run(ys, jnp.zeros(2), jnp.eye(2))
        np.testing.assert_allclose(means, kf.filtered_means, rtol=1e-4,
                                   atol=1e-4)

    def test_ekf_second_order_differs_on_nonlinear(self):
        ssm = _scalar_nl_ssm()
        _, ys = ssm.simulate(20, jnp.ones(1), key=jr.PRNGKey(3))
        _, m1, _ = EKF(ssm, order=1).run(ys, jnp.zeros(1), jnp.eye(1))
        _, m2, _ = EKF(ssm, order=2).run(ys, jnp.zeros(1), jnp.eye(1))
        assert not np.allclose(m1, m2)

    def test_ukf_matches_kalman_on_linear(self, linear_data):
        ssm, _, ys, kf = linear_data
        ll, means, covs = UKF(ssm, alpha=1.0).run(ys, jnp.zeros(2), jnp.eye(2))
        np.testing.assert_allclose(means, kf.filtered_means, rtol=1e-3,
                                   atol=1e-3)

    def test_mcf_approaches_kalman_on_linear(self, linear_data):
        ssm, _, ys, kf = linear_data
        _, means, _ = MCF(ssm, 3000, key=jr.PRNGKey(4)).run(
            ys, jnp.zeros(2), jnp.eye(2)
        )
        err = float(jnp.max(jnp.abs(means - kf.filtered_means)))
        assert err < 0.25, err

    def test_mclaf_runs_finite(self):
        ssm = _scalar_nl_ssm()
        _, ys = ssm.simulate(15, jnp.ones(1), key=jr.PRNGKey(5))
        _, means, covs = MCLAF(ssm, 50, key=jr.PRNGKey(6)).run(
            ys, jnp.zeros(1), jnp.eye(1)
        )
        assert bool(jnp.all(jnp.isfinite(means)))
        assert bool(jnp.all(jnp.linalg.eigvalsh(covs) > -1e-4))

    def test_composite_gauss_sum_filter(self, linear_data):
        ssm, _, ys, _ = linear_data
        gsf = CompositeGaussSumFilt(EKF(ssm, order=1), 4)
        means, covs, weights, point = gsf.run(ys, jnp.zeros(2), jnp.eye(2))
        assert means.shape == (40, 4, 2)
        assert point.shape == (40, 2)
        np.testing.assert_allclose(weights.sum(axis=1), jnp.ones(40),
                                   rtol=1e-4)


class TestLegacyGaussSum:
    def test_standalone_gsf(self, linear_data):
        ssm, xs, ys, kf = linear_data
        means, covs, weights, point = GaussSumFilt(ssm, 4).run(
            ys, jnp.zeros(2), jnp.eye(2)
        )
        assert means.shape == (40, 4, 2)
        err = float(jnp.max(jnp.abs(point - kf.filtered_means)))
        assert err < 1.5, err

    @pytest.mark.parametrize("modes,args", [
        (("prop", "prop"), (0.2, 0.2)),
        (("opt_lip", "prop"), (1.0, 0.2)),
        (("opt_max_grad", "prop"), (0.5, 0.2)),
        (("test", "prop"), (0.1, 0.2)),
    ])
    def test_aug_gsf_selection_modes(self, modes, args):
        ssm = _scalar_nl_ssm()
        _, ys = ssm.simulate(10, jnp.ones(1), key=jr.PRNGKey(7))
        agsf = AugGaussSumFilt(ssm, 3, 2, 2, key=jr.PRNGKey(8))
        agsf.set_aug_selection_params(*args, mode1=modes[0], mode2=modes[1])
        means, covs, point, Deltas, Lambdas = agsf.run(ys, jnp.zeros(1),
                                                       jnp.eye(1))
        assert means.shape == (10, 3, 1)
        assert Deltas.shape == (10, 3, 1, 1)
        assert bool(jnp.all(jnp.isfinite(point)))

    def test_aug_gsf_input_mode(self):
        ssm = _scalar_nl_ssm()
        _, ys = ssm.simulate(10, jnp.ones(1), key=jr.PRNGKey(9))
        agsf = AugGaussSumFilt(ssm, 3, 2, 2)
        agsf.set_aug_selection_params(
            0.05 * jnp.eye(1), 0.05 * jnp.eye(1), mode1="input", mode2="input"
        )
        means, *_ = agsf.run(ys, jnp.zeros(1), jnp.eye(1))
        assert bool(jnp.all(jnp.isfinite(means)))


class TestLegacyBPF:
    def test_bootstrap_pf_tracks_kalman(self, linear_data):
        ssm, _, ys, kf = linear_data
        particles = BootstrapPF(ssm, 3000, key=jr.PRNGKey(10)).run(
            ys, jnp.zeros(2), jnp.eye(2)
        )
        assert particles.shape == (40, 3000, 2)
        est = particles.mean(axis=1)
        err = float(jnp.max(jnp.abs(est - kf.filtered_means)))
        assert err < 0.3, err


class TestMeanEstimators:
    def test_quadratic_exact_for_quadratic_function(self):
        # For g(x) = x^T A x / 2: E[g] = m^T A m / 2 + tr(A P) / 2 exactly.
        from bayesianfiltering_tpu.models.zoo import quadratic_form

        g, _, _ = quadratic_form(1.0, 2.0)
        m = jnp.array([1.0, -1.0])
        P = jnp.diag(jnp.array([0.5, 0.25]))
        est = mean_estimators.simple_quadratic_estimate(g, m, P)
        exact = g(m) + 0.5 * jnp.trace(jnp.diag(jnp.array([1.0, 2.0])) @ P)
        np.testing.assert_allclose(est, exact, rtol=1e-5)

    def test_mcq_beats_mc_variance(self):
        g = lambda x: jnp.sum(x**2)
        m = jnp.ones(2)
        P = jnp.eye(2)
        out = mean_estimators.compare_estimators(
            jr.PRNGKey(0), g, m, P, delta=0.5 * P, num_samples=10,
            num_trials=50, baseline_samples=20000,
        )
        # MCL/MCQ sample from a deflated covariance -> lower variance than MC
        assert float(out["mcq"]["var"]) < float(out["mc"]["var"])
        # MCQ's Hessian correction keeps it near the baseline
        assert abs(float(out["mcq"]["mean"]) - float(out["baseline"])) < 1.0

    def test_mc_estimate_consistency(self):
        g = lambda x: jnp.sum(x)
        m = jnp.array([2.0, 3.0])
        est = mean_estimators.mc_estimate(jr.PRNGKey(1), g, m, jnp.eye(2),
                                          20000)
        np.testing.assert_allclose(est, 5.0, atol=0.1)


class TestStaticUtils:
    def test_augmented_joint_approximation(self):
        f = lambda x: jnp.array([jnp.sum(x**2)])
        aja = AugmentedJointApproximation(
            num_comp=8, f=f, dim_in=2, dim_out=1,
            mu=jnp.zeros(2), cov=jnp.eye(2), cov_tol=0.1 * jnp.eye(1),
            Delta=0.3 * jnp.eye(2),
        )
        posterior, grads = aja.return_posterior(jnp.array([1.0]),
                                                jr.PRNGKey(11))
        assert posterior.means.shape == (8, 2)
        assert posterior.covs.shape == (8, 2, 2)
        assert grads.shape == (8, 2, 1)
        np.testing.assert_allclose(jnp.sum(posterior.weights), 1.0, rtol=1e-5)


class TestALA:
    """Oldest-generation ALA API (ref: ALA/test-nonlinear.py)."""

    def test_ala_workflow(self):
        from bayesianfiltering_tpu.legacy.ala import (
            LinearModelParameters,
            StateSpaceModel,
        )

        params = LinearModelParameters(0.0, 0.0, 0.1, 0.1)
        freq = 10.0
        f = lambda x: jnp.sin(x) * jnp.sin(freq * x)
        g = lambda x: x
        jacob_dyn = lambda x: (
            jnp.sin(x) * freq * jnp.cos(freq * x) + jnp.cos(x) * jnp.sin(freq * x)
        )
        jacob_obs = lambda x: jnp.ones(())
        ssm = StateSpaceModel(1, 1, f, g, key=jr.PRNGKey(0))
        states, obs = ssm.simulate(60, jnp.zeros(1), params)
        init = [jnp.zeros(1), jnp.eye(1)]

        means, covs = ssm.extended_kalman_filter(obs, jacob_dyn, jacob_obs,
                                                 params, init)
        assert means.shape == (60, 1) and covs.shape == (60, 1, 1)
        m_lat, c_lat = ssm.latent_ekf(obs, 10, 0.05 * jnp.eye(1), jacob_dyn,
                                      jacob_obs, params, init)
        m_ukf, c_ukf = ssm.unscented_kalman_filter(obs, init, params, 10, 2, 1)
        err = lambda m: float(jnp.linalg.norm(m - states))
        # all three should track the (well-observed) state reasonably
        base = float(jnp.linalg.norm(states))
        assert err(means) < base
        assert err(m_lat) < base
        assert err(m_ukf) < base
        assert bool(jnp.all(jnp.isfinite(c_lat)))
