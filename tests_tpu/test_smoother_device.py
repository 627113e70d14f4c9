"""On-device iterated-smoother regression: the damped IEKS at stiff R.

Round-4 EXPERIMENTS.md recorded the damped (γ=0.7) parallel IEKS
returning non-finite RMSE on EVERY seed at BOT T=100 (R = 2.5e-5) on the
TPU backend while CPU was clean. Round-5 root cause: the Pallas
bank-combine kernel's in-kernel Cholesky of the ε-jittered C was
unguarded — an exactly-rank-deficient C (BOT: rank dq < dx) plus f32
rounding puts an eigenvalue below −ε, one lane NaNs, and the scan
swallows it (the XLA combine survives via cholesky_guarded). The kernel
now mirrors the guard lane-wise (ops/bank_combine.py); this test pins the
fixed behavior ON DEVICE, where interpret-mode tests can't see it.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def test_damped_ieks_bot_stiff_r_finite(tpu_backend):
    import bayesianfiltering_tpu.inference as gf
    from bayesianfiltering_tpu.models import zoo
    from bayesianfiltering_tpu.ops.parallel_iterated import (
        parallel_iterated_extended_smoother,
    )

    T = 100
    model, params, _ = zoo.range_bearing_tracking()
    inputs = zoo.bot_experiment_inputs(T)
    states, emissions = model.sample(params, jr.PRNGKey(0), T,
                                     inputs=inputs)
    states = np.asarray(jax.device_get(states))

    erts = jax.jit(lambda e: gf.extended_rts_smoother(
        params, e, inputs=inputs))(emissions)
    erts_rmse = float(np.sqrt(np.mean(
        (np.asarray(jax.device_get(erts.smoothed_means)) - states) ** 2)))

    post, aux = jax.jit(lambda e: parallel_iterated_extended_smoother(
        params, e, num_iter=6, inputs=inputs, nominal="filter",
        damping=0.7))(emissions)
    sm = np.asarray(jax.device_get(post.smoothed_means))
    norms = np.asarray(jax.device_get(aux.step_norms))
    assert np.isfinite(sm).all(), "damped IEKS non-finite on device"
    assert np.isfinite(norms).all(), norms
    rmse = float(np.sqrt(np.mean((sm - states) ** 2)))
    # the iterated smoother must beat the one-pass ERTS it refines
    assert rmse < erts_rmse, (rmse, erts_rmse)
