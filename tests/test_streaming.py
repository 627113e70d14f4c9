"""Streaming/chunked filtering and diagnostics tests (SURVEY.md §5.1/5.4)."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import bayesianfiltering_tpu.inference as gf
from bayesianfiltering_tpu import diagnostics, streaming
from bayesianfiltering_tpu.models import zoo


@pytest.fixture(scope="module")
def linear_setup():
    model, params, bpf_params = zoo.linear_gaussian(2, 2, r=0.5)
    _, emissions = model.sample(params, jr.PRNGKey(0), 40)
    return params, bpf_params, emissions


class TestStreaming:
    def test_ekf_chunks_match_batch(self, linear_setup):
        params, _, emissions = linear_setup
        full = gf.extended_kalman_filter(params, emissions)

        stepper = streaming.make_ekf_stepper(params)
        state = stepper.init()
        chunks = []
        for start in range(0, 40, 10):
            state, out = stepper.run_chunk(state, emissions[start:start + 10],
                                           t0=start)
            chunks.append(out["mean"])
        means = jnp.concatenate(chunks)
        np.testing.assert_allclose(means, full.filtered_means, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(state.marginal_loglik, full.marginal_loglik,
                                   rtol=1e-4)

    def test_gsf_chunks_match_batch(self, linear_setup):
        params, _, emissions = linear_setup
        full = gf.gaussian_sum_filter(params, emissions, 4)
        stepper = streaming.make_gsf_stepper(params, 4)
        state = stepper.init(jr.PRNGKey(0))
        state, out1 = stepper.run_chunk(state, emissions[:20], t0=0)
        state, out2 = stepper.run_chunk(state, emissions[20:], t0=20)
        means = jnp.concatenate([out1["means"], out2["means"]])
        # full posterior is component-major (M, T, dx)
        np.testing.assert_allclose(jnp.swapaxes(means, 0, 1), full.means,
                                   rtol=1e-4, atol=1e-5)

    def test_bpf_stepper_runs(self, linear_setup):
        _, bpf_params, emissions = linear_setup
        stepper = streaming.make_bpf_stepper(bpf_params, 512)
        state = stepper.init(jr.PRNGKey(1))
        state, out = stepper.run_chunk(state, emissions)
        assert out["mean"].shape == (40, 2)
        assert bool(jnp.all(out["ess"] >= 1.0 - 1e-3))

    def test_checkpoint_roundtrip(self, linear_setup, tmp_path):
        params, _, emissions = linear_setup
        stepper = streaming.make_ekf_stepper(params)
        state = stepper.init()
        state, _ = stepper.run_chunk(state, emissions[:20])
        path = str(tmp_path / "carry")
        streaming.save_state(path, state)
        restored = streaming.restore_state(path, state)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b), state, restored
        )
        # resuming from the restored carry matches resuming from the live one
        s1, o1 = stepper.run_chunk(state, emissions[20:], t0=20)
        s2, o2 = stepper.run_chunk(restored, emissions[20:], t0=20)
        np.testing.assert_allclose(o1["mean"], o2["mean"], atol=1e-6)


class TestDiagnostics:
    def test_benchmark(self):
        res = diagnostics.benchmark(lambda x: jnp.sum(x**2), jnp.ones(128),
                                    num_runs=2)
        assert res.best > 0 and res.compile_time >= res.best * 0.0

    def test_benchmark_on_device_slope(self):
        # Correctness of the harness, not timing: every fori_loop
        # iteration must actually run (the carry folds in each output), so
        # K=4 wall >= K=1 wall and the slope is finite/non-negative.
        xs = jnp.arange(4 * 256, dtype=jnp.float32).reshape(4, 256)
        res = diagnostics.benchmark_on_device(
            lambda x: jnp.cumsum(x**2), xs, reps=(1, 4), num_runs=2)
        assert res.reps == (1, 4)
        assert res.walls[1] > 0 and res.per_call == pytest.approx(
            (res.walls[1] - res.walls[0]) / 3)
        with pytest.raises(ValueError, match="leading axis"):
            diagnostics.benchmark_on_device(lambda x: x, xs, reps=(1, 9))

    def test_check_finite_raises(self):
        with pytest.raises(FloatingPointError, match="bad"):
            diagnostics.check_finite({"a": jnp.ones(3),
                                      "b": jnp.array([1.0, jnp.nan])},
                                     name="bad")
        diagnostics.check_finite({"a": jnp.ones(3)})  # no raise

    def test_ess_diagnostics(self):
        w = jnp.array([0.25, 0.25, 0.25, 0.25])
        d = diagnostics.ess_diagnostics(w)
        assert float(d["ess"]) == pytest.approx(4.0)
        assert float(d["entropy"]) == pytest.approx(np.log(4), rel=1e-5)

    def test_debug_nans_context(self):
        with diagnostics.debug_nans(False):
            pass  # toggling works
        assert not jax.config.jax_debug_nans
