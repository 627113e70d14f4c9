"""Sequence-parallel filtering: the associative-scan Kalman filter with the
TIME axis sharded over the device mesh (SURVEY.md §5.7's long-sequence
scaling story). `lax.associative_scan` is log-depth, so XLA turns the
time-sharded input into a cross-device scan with ICI collectives."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bayesianfiltering_tpu.models import zoo
from bayesianfiltering_tpu.ops import kalman_filter, parallel_kalman_filter
from bayesianfiltering_tpu.ops.associative import parallel_kalman_smoother
from bayesianfiltering_tpu.ops.linear import kalman_smoother
from bayesianfiltering_tpu.parallel import make_mesh


class TestTimeShardedParallelKF:
    def test_time_sharded_matches_sequential(self):
        assert len(jax.devices()) >= 8
        mesh = make_mesh((8,), ("time",))
        model, params, _ = zoo.linear_gaussian(3, 3)
        lg = zoo.linear_gaussian_lgssm(3, 3)
        T = 256  # divisible by 8
        _, emissions = model.sample(params, jr.PRNGKey(0), T)

        seq = kalman_filter(lg, emissions)

        sharded = jax.device_put(
            emissions, NamedSharding(mesh, P("time", None))
        )
        par = jax.jit(lambda e: parallel_kalman_filter(lg, e))(sharded)
        np.testing.assert_allclose(par.filtered_means, seq.filtered_means,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(par.marginal_loglik, seq.marginal_loglik,
                                   rtol=1e-3)

    def test_long_sequence_sharded(self):
        """A 16k-step sequence filtered with the time axis sharded 8 ways."""
        mesh = make_mesh((8,), ("time",))
        lg = zoo.linear_gaussian_lgssm(2, 2)
        model, params, _ = zoo.linear_gaussian(2, 2)
        _, emissions = model.sample(params, jr.PRNGKey(1), 16384)
        sharded = jax.device_put(
            emissions, NamedSharding(mesh, P("time", None))
        )
        post = jax.jit(lambda e: parallel_kalman_filter(lg, e))(sharded)
        assert post.filtered_means.shape == (16384, 2)
        assert bool(jnp.all(jnp.isfinite(post.filtered_means)))


class TestParallelCombineSolvers:
    def test_woodbury_matches_native(self):
        """The matmul-only Woodbury combine must agree with the native-solve
        combine (same associative elements, different inverse evaluation)."""
        lg = zoo.linear_gaussian_lgssm(3, 2)
        model, params, _ = zoo.linear_gaussian(3, 2)
        _, emissions = model.sample(params, jr.PRNGKey(3), 300)
        w = parallel_kalman_filter(lg, emissions, solver="woodbury")
        n = parallel_kalman_filter(lg, emissions, solver="native")
        np.testing.assert_allclose(w.filtered_means, n.filtered_means,
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(w.filtered_covariances,
                                   n.filtered_covariances,
                                   rtol=2e-3, atol=2e-4)


class TestParallelSmoother:
    @pytest.mark.parametrize("dims", [(2, 2), (3, 1)])
    def test_matches_sequential_rts(self, dims):
        dx, dy = dims
        lg = zoo.linear_gaussian_lgssm(dx, dy)
        model, params, _ = zoo.linear_gaussian(dx, dy)
        _, emissions = model.sample(params, jr.PRNGKey(2), 200)
        seq = kalman_smoother(lg, emissions)
        par = parallel_kalman_smoother(lg, emissions)
        np.testing.assert_allclose(par.smoothed_means, seq.smoothed_means,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            par.smoothed_covariances, seq.smoothed_covariances,
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(par.filtered_means, seq.filtered_means,
                                   rtol=1e-3, atol=1e-4)

    def test_time_sharded_smoother(self):
        mesh = make_mesh((8,), ("time",))
        lg = zoo.linear_gaussian_lgssm(2, 2)
        model, params, _ = zoo.linear_gaussian(2, 2)
        _, emissions = model.sample(params, jr.PRNGKey(4), 2048)
        sharded = jax.device_put(
            emissions, NamedSharding(mesh, P("time", None))
        )
        post = jax.jit(lambda e: parallel_kalman_smoother(lg, e))(sharded)
        assert post.smoothed_means.shape == (2048, 2)
        assert bool(jnp.all(jnp.isfinite(post.smoothed_means)))
