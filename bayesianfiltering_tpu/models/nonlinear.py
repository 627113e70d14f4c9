"""Concrete nonlinear state-space models.

Parity with ref: gaussfiltax/models.py:86-289:

* :class:`NonlinearGaussianSSM` — additive-noise nonlinear model.
* :class:`NonlinearSSM` — general non-additive-noise model (the one every
  reference experiment uses), with the override of ``sample`` that threads
  explicitly-sampled noise through f/h (ref: gaussfiltax/models.py:240-289).

Upgrades over the reference: ``marginal_log_prob`` and ``filter`` are
implemented (EKF-based), which makes the inherited ``fit_sgd`` actually
runnable (the reference's is a NameError, SURVEY.md §2.1).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import jax.random as jr
from jax import lax
from jax.tree_util import tree_map

from bayesianfiltering_tpu.distributions import MVN
from bayesianfiltering_tpu.models.params import ParamsNLSSM
from bayesianfiltering_tpu.models.ssm import SSM
from bayesianfiltering_tpu.types import PRNGKey


class NonlinearGaussianSSM(SSM):
    """Additive-noise nonlinear Gaussian SSM (ref: gaussfiltax/models.py:86-157).

    x_t = f(x_{t-1}, u_t) + q_t,  y_t = h(x_t, u_t) + r_t.
    """

    def __init__(self, state_dim: int, emission_dim: int, input_dim: int = 0):
        self.state_dim = state_dim
        self.emission_dim = emission_dim
        self.input_dim = input_dim

    @property
    def emission_shape(self):
        return (self.emission_dim,)

    @property
    def inputs_shape(self):
        return (self.input_dim,) if self.input_dim > 0 else None

    def initial_distribution(self, params: ParamsNLSSM, inputs=None):
        return MVN(params.initial_mean, params.initial_covariance)

    def transition_distribution(self, params: ParamsNLSSM, state, inputs=None):
        f = params.dynamics_function
        mean = f(state) if inputs is None else f(state, inputs)
        return MVN(mean, params.dynamics_noise_covariance)

    def emission_distribution(self, params: ParamsNLSSM, state, inputs=None):
        h = params.emission_function
        mean = h(state) if inputs is None else h(state, inputs)
        return MVN(mean, params.emission_noise_covariance)

    # -- inference (upgrade: implemented, reference leaves these as stubs) --
    def _as_nonadditive(self, params: ParamsNLSSM) -> ParamsNLSSM:
        """Wrap additive-noise f(x[,u]) / h(x[,u]) into the non-additive
        (x, noise, u) calling convention used by the filters."""
        f, h = params.dynamics_function, params.emission_function
        has_inputs = self.input_dim > 0

        def fna(x, q, u):
            return (f(x, u) if has_inputs else f(x)) + q

        def hna(x, r, u):
            return (h(x, u) if has_inputs else h(x)) + r

        return params._replace(dynamics_function=fna, emission_function=hna)

    def filter(self, params: ParamsNLSSM, emissions, inputs=None):
        from bayesianfiltering_tpu import inference

        return inference.extended_kalman_filter(
            self._as_nonadditive(params), emissions, inputs=inputs
        )

    def marginal_log_prob(self, params: ParamsNLSSM, emissions, inputs=None):
        return self.filter(params, emissions, inputs).marginal_loglik


class NonlinearSSM(NonlinearGaussianSSM):
    """General non-additive-noise nonlinear SSM
    (ref: gaussfiltax/models.py:160-289).

    x_t = f(x_{t-1}, q_t, u_t),  y_t = h(x_t, r_t, u_t).
    """

    def __init__(
        self,
        state_dim: int,
        state_noise_dim: int,
        emission_dim: int,
        emission_noise_dim: int,
        input_dim: int = 0,
    ):
        super().__init__(state_dim, emission_dim, input_dim)
        self.state_noise_dim = state_noise_dim
        self.emission_noise_dim = emission_noise_dim

    def transition_distribution(self, params: ParamsNLSSM, state, inputs=None):
        """Gaussian approximation of p(x' | x): mean is the zero-noise
        propagation f(x, q0, u), covariance the noise-linearized
        F_q Q F_qᵀ — exact when the noise enters additively.

        (The reference's version calls ``f(state)`` and TypeErrors on its own
        non-additive convention, ref: gaussfiltax/models.py:214-225; this is
        the working generalization.)
        """
        from jax import jacfwd

        f = params.dynamics_function
        q0 = params.dynamics_noise_bias
        mean = f(state, q0, inputs)
        Fq = jacfwd(f, argnums=1)(state, q0, inputs)
        cov = Fq @ params.dynamics_noise_covariance @ Fq.T
        return MVN(mean, cov)

    def emission_distribution(self, params: ParamsNLSSM, state, inputs=None):
        """Gaussian approximation of p(y | x) via noise linearization
        (exact for additive noise); see :meth:`transition_distribution`."""
        from jax import jacfwd

        h = params.emission_function
        r0 = params.emission_noise_bias
        mean = h(state, r0, inputs)
        Hr = jacfwd(h, argnums=1)(state, r0, inputs)
        cov = Hr @ params.emission_noise_covariance @ Hr.T
        return MVN(jnp.atleast_1d(mean), jnp.atleast_2d(cov))

    def sample(
        self,
        params: ParamsNLSSM,
        key: PRNGKey,
        num_timesteps: int,
        inputs=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample with explicit noise threading
        (ref: gaussfiltax/models.py:240-289): q ~ N(q0, Q), r ~ N(r0, R),
        x = f(x, q, u), y = h(x, r, u)."""
        f = params.dynamics_function
        h = params.emission_function

        def _step(prev_state, args):
            key_t, inpt = args
            key1, key2 = jr.split(key_t, 2)
            q = MVN(params.dynamics_noise_bias,
                    params.dynamics_noise_covariance).sample(seed=key1)
            r = MVN(params.emission_noise_bias,
                    params.emission_noise_covariance).sample(seed=key2)
            state = f(prev_state, q, inpt)
            emission = h(state, r, inpt)
            return state, (state, emission)

        key1, key2, key = jr.split(key, 3)
        initial_input = tree_map(lambda x: x[0], inputs)
        initial_state = self.initial_distribution(params, initial_input).sample(
            seed=key1
        )
        r0 = MVN(params.emission_noise_bias,
                 params.emission_noise_covariance).sample(seed=key2)
        initial_emission = h(initial_state, r0, initial_input)

        next_keys = jr.split(key, num_timesteps - 1)
        next_inputs = tree_map(lambda x: x[1:], inputs)
        _, (next_states, next_emissions) = lax.scan(
            _step, initial_state, (next_keys, next_inputs)
        )

        expand_and_cat = lambda x0, x1T: jnp.concatenate(
            (jnp.expand_dims(x0, 0), x1T)
        )
        states = tree_map(expand_and_cat, initial_state, next_states)
        emissions = tree_map(expand_and_cat, initial_emission, next_emissions)
        return states, emissions

    def filter(self, params: ParamsNLSSM, emissions, inputs=None):
        from bayesianfiltering_tpu import inference

        return inference.extended_kalman_filter(params, emissions, inputs=inputs)

    def marginal_log_prob(self, params: ParamsNLSSM, emissions, inputs=None):
        return self.filter(params, emissions, inputs).marginal_loglik


__all__ = ["NonlinearGaussianSSM", "NonlinearSSM"]
