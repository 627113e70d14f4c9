"""Trace-size tests: the rebuild's answer to the reference's
``docs/tests/test_compile_times.py`` (which measures jaxpr bloat from
per-component pytree round-trips, ref :91-103). With struct-of-arrays
mixtures the trace must be O(1) in component counts."""
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

import bayesianfiltering_tpu.inference as gf
from bayesianfiltering_tpu.models import zoo


@pytest.fixture(scope="module")
def bot():
    model, params, _ = zoo.bearings_only_tracking()
    inputs = zoo.bot_maneuver_inputs(6)
    _, emissions = model.sample(params, jr.PRNGKey(0), 6, inputs=inputs)
    return params, inputs, emissions


def _jaxpr_len(fn, *args):
    return len(str(jax.make_jaxpr(fn)(*args)))


class TestTraceSize:
    def test_agsf_trace_independent_of_components(self, bot):
        """The reference's pytree AGSF trace grows linearly in M·N·L (the
        reason its 'speedy' rewrite exists); ours must not grow at all."""
        params, inputs, emissions = bot

        def make(M, N, L):
            return lambda e: gf.augmented_gaussian_sum_filter(
                params, e, [M, N, L], jr.PRNGKey(0), 1, (0.1, 0.1), inputs
            )[0].means

        small = _jaxpr_len(make(2, 2, 2), emissions)
        large = _jaxpr_len(make(20, 4, 4), emissions)
        # identical scan structure -> near-identical trace (shapes differ in
        # text length only)
        assert large < 1.1 * small, (small, large)

    def test_gsf_trace_independent_of_components(self, bot):
        params, inputs, emissions = bot
        small = _jaxpr_len(
            lambda e: gf.gaussian_sum_filter(params, e, 2, 1, inputs).means,
            emissions,
        )
        large = _jaxpr_len(
            lambda e: gf.gaussian_sum_filter(params, e, 64, 1, inputs).means,
            emissions,
        )
        assert large < 1.1 * small, (small, large)

    def test_bpf_trace_independent_of_particles(self, bot):
        _, _, bpf2 = zoo.bearings_only_tracking()
        _, inputs, emissions = bot
        small = _jaxpr_len(
            lambda e: gf.bootstrap_particle_filter(
                bpf2, e, 100, jr.PRNGKey(0), inputs, store="summary"
            )["means"],
            emissions,
        )
        large = _jaxpr_len(
            lambda e: gf.bootstrap_particle_filter(
                bpf2, e, 100_000, jr.PRNGKey(0), inputs, store="summary"
            )["means"],
            emissions,
        )
        assert large < 1.1 * small, (small, large)
