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
