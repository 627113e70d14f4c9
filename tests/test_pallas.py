"""Pallas bank-linalg kernels vs XLA references (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from bayesianfiltering_tpu.ops import pallas_kernels as pk

pl = pytest.importorskip("jax.experimental.pallas")
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _interpret(fn, *args, **kw):
    with pltpu.force_tpu_interpret_mode():
        return fn(*args, use_pallas=True, **kw)


def _random_psd_bank(key, m, d):
    a = jr.normal(key, (m, d, d))
    return jnp.einsum("mik,mjk->mij", a, a) + d * jnp.eye(d)


class TestBankLayout:
    def test_roundtrip(self):
        a = jr.normal(jr.PRNGKey(0), (7, 3, 4))
        back = pk.from_bank_major(pk.to_bank_major(a), 3, 4)
        np.testing.assert_array_equal(a, back)


class TestBankKernels:
    @pytest.mark.parametrize("m,d", [(128, 2), (130, 4), (256, 8)])
    def test_bank_matmul_matches_einsum(self, m, d):
        a = jr.normal(jr.PRNGKey(1), (m, d, d))
        b = jr.normal(jr.PRNGKey(2), (m, d, d))
        out = _interpret(pk.bank_matmul, a, b)
        np.testing.assert_allclose(out, jnp.einsum("mik,mkj->mij", a, b),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("m,d", [(128, 2), (200, 4)])
    def test_bank_sandwich_matches_einsum(self, m, d):
        f = jr.normal(jr.PRNGKey(3), (m, d, d))
        p = _random_psd_bank(jr.PRNGKey(4), m, d)
        out = _interpret(pk.bank_sandwich, f, p)
        np.testing.assert_allclose(out, jnp.einsum("mik,mkl,mjl->mij", f, p, f),
                                   rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("m,d", [(128, 2), (192, 4)])
    def test_bank_cholesky_matches_lapack(self, m, d):
        p = _random_psd_bank(jr.PRNGKey(5), m, d)
        out = _interpret(pk.bank_cholesky, p)
        np.testing.assert_allclose(out, jnp.linalg.cholesky(p), rtol=1e-3,
                                   atol=1e-3)

    def test_padding_path(self):
        # m not a multiple of 128 exercises the pad/identity-fill logic
        m, d = 150, 4
        p = _random_psd_bank(jr.PRNGKey(6), m, d)
        out = _interpret(pk.bank_cholesky, p)
        assert out.shape == (m, d, d)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_fallback_without_pallas(self):
        a = jr.normal(jr.PRNGKey(7), (64, 4, 4))
        b = jr.normal(jr.PRNGKey(8), (64, 4, 4))
        out = pk.bank_matmul(a, b, use_pallas=False)
        np.testing.assert_allclose(out, jnp.einsum("mik,mkj->mij", a, b),
                                   rtol=1e-5)


class TestResamplingKernel:
    def test_fused_gather_matches_index_path(self):
        """CPU check of the fused systematic resample+gather contract via
        the XLA path + forced-kernel equivalence is covered on TPU
        (BENCHLOG); here: the public wrapper's fallback correctness."""
        import jax.random as jr
        from bayesianfiltering_tpu.ops.resampling_kernels import (
            systematic_resample_gather,
        )
        from bayesianfiltering_tpu.utils.resampling import systematic_resample

        n, dx = 4096, 4
        p = jr.normal(jr.PRNGKey(0), (n, dx))
        w = jax.nn.softmax(jr.normal(jr.PRNGKey(1), (n,)))
        key = jr.PRNGKey(2)
        out = systematic_resample_gather(key, w, p)  # CPU -> XLA path
        idx = systematic_resample(key, w, n)
        np.testing.assert_array_equal(out, jnp.take(p, idx, axis=0))
