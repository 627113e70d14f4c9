"""On-device parity for the windowed parent-construction kernel.

The interpret-mode tests (tests/test_pallas.py::TestWindowedParents) pin
the algorithm; this pins the REAL Mosaic lowering — the (W/128, 128)
window DMA with dynamic sublane offsets and the in-kernel transpose are
exactly the kind of layout machinery interpret mode does not exercise
(round-5 history: the first cut of this kernel compiled under interpret
and was rejected by Mosaic on device for a lane-dim-1 DMA slice).
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def test_windowed_parents_matches_scatter_at_1m(tpu_backend):
    from bayesianfiltering_tpu.ops import resample_gather as rg
    from bayesianfiltering_tpu.utils import resampling as rs

    n = 1_000_000
    w = jr.dirichlet(jr.PRNGKey(0), jnp.ones(n) * 0.5)
    cdf = jnp.cumsum(w)
    cdf = cdf / cdf[-1]
    counts = jax.lax.cummax(jnp.clip(jnp.ceil(n * cdf - 0.3), 0, n))

    out = jax.jit(lambda c: rg.windowed_parents(c, n))(counts)
    ref = jax.jit(lambda c: rs._scatter_counts_to_parents(c, n))(counts)
    out, ref = jax.device_get((out, ref))
    np.testing.assert_array_equal(out, ref)


def test_bpf_1m_systematic_finite(tpu_backend):
    """One short 1M-particle BPF pass through the dispatched path."""
    import bayesianfiltering_tpu.inference as gf
    from bayesianfiltering_tpu.models import zoo

    _, _, bpfp = zoo.lorenz96(8, 4)
    dm, dp, _ = zoo.lorenz96(8, 4, integrator="rk4")
    em = jax.jit(lambda k: dm.sample(dp, k, 10)[1])(jr.PRNGKey(1))
    out = jax.jit(lambda e: gf.bootstrap_particle_filter(
        bpfp, e, 1_000_000, jr.PRNGKey(2), ess_threshold=2.0,
        store="summary"))(em)
    means = np.asarray(jax.device_get(out["means"]))
    ess = np.asarray(jax.device_get(out["ess"]))
    assert np.isfinite(means).all()
    assert (ess > 0).all()
