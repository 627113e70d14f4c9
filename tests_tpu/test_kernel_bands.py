"""Band-edge compile + parity smoke tests for every Pallas kernel, on-device.

Each test lowers and compiles (NOT interpret mode) one kernel on the live
axon TPU at the edge of its eligibility band, then checks numerical parity
against the XLA path it replaces. This catches the regression class CPU
interpret tests cannot see: Mosaic VMEM overflows, lowering failures, and
device hangs that only appear on real hardware (the round-4 batched-EKF
predict kernel compiled fine under interpret and VMEM-OOMed on the v5e —
VERDICT round 4 weak #5).

Bands pinned here (narrowing one deliberately should update this file):
  bank_update.bank_chol_update / bank_predict_cov   dx, dy/dq <= 8
  fused_ekf update                                  dx <= 512, dy <= 128
  fused_ekf chunked update                          dy > 128 via dy<=128 chunks
  fused_ekf predict                                 dx, dq <= 512
  fused_ut (all four wrappers)                      augmented dim <= 128
  bank_combine / bank_smoother                      dx <= 8

Run: `python -m pytest tests_tpu -n 0 -q` from /root/repo with the default
shell env (see conftest).  Roughly one Mosaic compile per test; the whole
set is a few minutes on a warm tunnel.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

pytest.importorskip("jax.experimental.pallas")

# Module-level so the marker is present at collection time (the conftest
# also adds it, but hook ordering vs the -m filter is not guaranteed).
pytestmark = pytest.mark.tpu


def _psd_bank(key, m, d, scale=1.0):
    a = jr.normal(key, (m, d, d)) * scale
    return jnp.einsum("mik,mjk->mij", a, a) + d * jnp.eye(d)


def _psd(key, d, scale=1.0):
    a = jr.normal(key, (d, d)) * scale
    return a @ a.T / d + jnp.eye(d)


def _get(tree):
    """Force materialization (device_get) — a bare block_until_ready can
    return while a remote compile is still in flight (CLAUDE.md)."""
    return jax.device_get(tree)


def _allclose(out, ref, rtol, atol, names=None):
    names = names or [str(i) for i in range(len(ref))]
    for nm, o, r in zip(names, _get(out), _get(ref)):
        np.testing.assert_allclose(o, r, rtol=rtol, atol=atol, err_msg=nm)


# ---------------------------------------------------------------------------
# ops/bank_update.py — bank-major lattice kernels, band edge dx = dy = 8
# ---------------------------------------------------------------------------

class TestBankUpdateEdges:
    def test_chol_update_dx8_dy8_unpadded_lanes(self, tpu_backend):
        from bayesianfiltering_tpu.ops import bank_update as bu

        M, dx, dy = 200, 8, 8   # M != 0 mod 128 exercises the pad lanes
        assert bu._should_use_pallas(dx, dy, 0.0)
        k = jr.split(jr.PRNGKey(0), 5)
        ms = jr.normal(k[0], (M, dx))
        Ps = _psd_bank(k[1], M, dx)
        Hx = jr.normal(k[2], (M, dy, dx))
        Rt = _psd_bank(k[3], M, dy, 0.3) * 0.1
        innov = jr.normal(k[4], (M, dy))
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda *a: bu.bank_chol_update(*a, use_pallas=True))(
                ms, Ps, Hx, Rt, innov)
            ref = jax.jit(lambda *a: bu.bank_chol_update(*a, use_pallas=False))(
                ms, Ps, Hx, Rt, innov)
        _allclose(out, ref, 5e-4, 5e-4, ["ll", "mean", "cov", "gain"])

    def test_predict_cov_dx8_dq8(self, tpu_backend):
        from bayesianfiltering_tpu.ops import bank_update as bu

        M, dx, dq = 200, 8, 8
        k = jr.split(jr.PRNGKey(1), 3)
        Fx = jr.normal(k[0], (M, dx, dx))
        P = _psd_bank(k[1], M, dx)
        Fq = jr.normal(k[2], (M, dx, dq))
        Q = jnp.diag(jnp.arange(1.0, dq + 1))
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda *a: bu.bank_predict_cov(*a, use_pallas=True))(
                Fx, P, Fq, Q)
            ref = jax.jit(lambda *a: bu.bank_predict_cov(*a, use_pallas=False))(
                Fx, P, Fq, Q)
        np.testing.assert_allclose(_get(out), _get(ref), rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# ops/fused_ekf.py — single-stream whole-update kernels,
# band edges dy = 128 (_DY_MAX), dx = 512 (_DIM_MAX), chunked dy = 256
# ---------------------------------------------------------------------------

def _single_update_operands(key, dx, dy):
    k = jr.split(key, 5)
    m = jr.normal(k[0], (dx,))
    P = _psd(k[1], dx)
    Hx = jr.normal(k[2], (dy, dx)) / np.sqrt(dx)
    Rt = _psd(k[3], dy, 0.5) * 0.1
    innov = jr.normal(k[4], (dy,))
    return m, P, Hx, Rt, innov


class TestFusedEkfEdges:
    @pytest.mark.parametrize("dx,dy", [(64, 128), (512, 8)])
    def test_update_band_edges(self, tpu_backend, dx, dy):
        from bayesianfiltering_tpu.ops import fused_ekf as fe

        assert fe._should_use_pallas(dx, dy, 0.0)
        ops = _single_update_operands(jr.PRNGKey(2), dx, dy)
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda *a: fe._fused_update(*a, 0.0, True))(*ops)
            ref = jax.jit(lambda *a: fe._fused_update(*a, 0.0, False))(*ops)
        _allclose(out, ref, 2e-3, 2e-3, ["ll", "mean", "cov", "gain"])

    def test_predict_dx512_dq512_in_scan(self, tpu_backend):
        """Band edge for the predict kernel, exercised the way the filters
        use it: INSIDE a lax.scan. Measured quirk (round 5): a standalone
        jit of the kernel at (dx=dq=512) fails Mosaic scoped-VMEM
        allocation by ~1 MB (16.96M vs the 16M limit) while the identical
        kernel inside a scan — the only dispatch path the filters take —
        compiles and runs. The eligibility band is therefore pinned against
        the in-scan lowering; callers invoking the raw kernel standalone at
        the very top of the band get a compile-time error, not wrong
        numbers."""
        from bayesianfiltering_tpu.ops import fused_ekf as fe

        dx = dq = 512
        k = jr.split(jr.PRNGKey(3), 3)
        Fx = jr.normal(k[0], (dx, dx)) / np.sqrt(dx)
        P = _psd(k[1], dx)
        Fq = jr.normal(k[2], (dx, dq)) / np.sqrt(dq)
        Q = jnp.eye(dq) * 0.1

        def chain(use_pallas):
            @jax.jit
            def run(P0):
                def step(Pc, _):
                    S = fe._fused_predict_cov(Fx, Pc, Fq, Q, use_pallas)
                    return 0.99 * S, S[0, 0]
                return jax.lax.scan(step, P0, jnp.arange(3))

            return run(P)

        with jax.default_matmul_precision("highest"):
            Pk, sk = chain(True)
            Px, sx = chain(False)
        np.testing.assert_allclose(_get(Pk), _get(Px), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(_get(sk), _get(sx), rtol=2e-3, atol=2e-3)

    def test_chunked_update_dy256_matches_joint(self, tpu_backend):
        """dy=256 runs two dy=128 kernels; with diagonal Rt the sequential
        recursion is algebraically the joint update (module docstring)."""
        from bayesianfiltering_tpu.ops import ekf as ek
        from bayesianfiltering_tpu.ops import fused_ekf as fe

        dx, dy = 32, 256
        k = jr.split(jr.PRNGKey(4), 4)
        m = jr.normal(k[0], (dx,))
        P = _psd(k[1], dx)
        Hmat = jr.normal(k[2], (dy, dx)) / np.sqrt(dx)
        y = jr.normal(k[3], (dy,))
        Rdiag = jnp.linspace(0.5, 1.5, dy)
        R = jnp.diag(Rdiag)
        h = lambda x, r, u: Hmat @ x + r
        H_x = lambda x, r, u: Hmat
        H_r = lambda x, r, u: jnp.eye(dy)
        r0 = jnp.zeros((dy,))
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda mm, PP: fe.fused_ekf_condition_on_chunked(
                mm, PP, h, H_x, H_r, R, r0, None, y))(m, P)
            ref = jax.jit(lambda mm, PP: ek.ekf_condition_on_iterated(
                mm, PP, h, H_x, H_r, R, r0, None, y))(m, P)
        for nm, o, r in zip(("ll", "mean", "cov"),
                            (out.log_likelihood, out.mean, out.cov),
                            (ref.log_likelihood, ref.mean, ref.cov)):
            np.testing.assert_allclose(_get(o), _get(r), rtol=2e-3, atol=2e-3,
                                       err_msg=nm)


# ---------------------------------------------------------------------------
# ops/fused_ut.py — single-stream UT kernels, band edge (augmented) dim 128
# ---------------------------------------------------------------------------

class TestFusedUTEdges:
    def _params(self):
        from bayesianfiltering_tpu.ops import ukf as uk

        return uk.ParamsUKF(alpha=1.0, beta=2.0, kappa=0.0,
                            sqrt_method="cholesky")

    def test_predict_additive_dx128(self, tpu_backend):
        from bayesianfiltering_tpu.ops import fused_ut as fut
        from bayesianfiltering_tpu.ops import ukf as uk

        dx = 128
        up = self._params()
        assert fut._gate(up, dx)
        k = jr.split(jr.PRNGKey(5), 2)
        m = jr.normal(k[0], (dx,))
        P = _psd(k[1], dx)
        Q = 0.1 * jnp.eye(dx)
        f = lambda x, q, u: jnp.tanh(x) + 0.9 * x + q
        q0 = jnp.zeros((dx,))
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda *a: fut.fused_ukf_predict_additive(
                *a, f, None, Q, up, q0, use_pallas=True))(m, P)
            ref = jax.jit(lambda *a: uk.ukf_predict_additive(
                *a, f, None, Q, up, q0))(m, P)
        _allclose(out, ref, 2e-3, 2e-3, ["mean", "cov"])

    def test_predict_nonadditive_aug128(self, tpu_backend):
        from bayesianfiltering_tpu.ops import fused_ut as fut
        from bayesianfiltering_tpu.ops import ukf as uk

        dx = nq = 64          # augmented dim dx + nq = 128 = _DIM_MAX
        up = self._params()
        assert fut._gate(up, dx + nq)
        k = jr.split(jr.PRNGKey(6), 2)
        m = jr.normal(k[0], (dx,))
        P = _psd(k[1], dx)
        Q = 0.1 * jnp.eye(nq)
        f = lambda x, q, u: jnp.tanh(x) + 0.9 * x + jnp.cos(q)
        q0 = jnp.zeros((nq,))
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda *a: fut.fused_ukf_predict_nonadditive(
                *a, f, None, Q, up, q0, use_pallas=True))(m, P)
            ref = jax.jit(lambda *a: uk.ukf_predict_nonadditive(
                *a, f, None, Q, up, q0))(m, P)
        _allclose(out, ref, 2e-3, 2e-3, ["mean", "cov"])

    def test_update_additive_dx128_dy128(self, tpu_backend):
        from bayesianfiltering_tpu.ops import fused_ut as fut
        from bayesianfiltering_tpu.ops import ukf as uk

        dx = dy = 128
        up = self._params()
        k = jr.split(jr.PRNGKey(7), 4)
        m = jr.normal(k[0], (dx,))
        P = _psd(k[1], dx)
        R = _psd(k[2], dy, 0.5) * 0.2
        y = jr.normal(k[3], (dy,))
        Hmat = jr.normal(jr.fold_in(k[3], 1), (dy, dx)) / np.sqrt(dx)
        h = lambda x, r, u: Hmat @ jnp.sin(x) + r
        r0 = jnp.zeros((dy,))
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda *a: fut.fused_ukf_condition_on_additive(
                *a, h, R, None, y, up, r0, use_pallas=True))(m, P)
            ref = jax.jit(lambda *a: uk.ukf_condition_on_additive(
                *a, h, R, None, y, up, r0))(m, P)
        _allclose(out, ref, 2e-3, 2e-3, ["ll", "mean", "cov"])

    def test_update_nonadditive_aug128(self, tpu_backend):
        from bayesianfiltering_tpu.ops import fused_ut as fut
        from bayesianfiltering_tpu.ops import ukf as uk

        dx = nr = 64          # augmented dim = 128
        dy = 32
        up = self._params()
        k = jr.split(jr.PRNGKey(8), 4)
        m = jr.normal(k[0], (dx,))
        P = _psd(k[1], dx)
        R = _psd(k[2], nr, 0.5) * 0.2
        y = jr.normal(k[3], (dy,))
        Hmat = jr.normal(jr.fold_in(k[3], 2), (dy, dx)) / np.sqrt(dx)
        Gmat = jr.normal(jr.fold_in(k[3], 3), (dy, nr)) / np.sqrt(nr)
        h = lambda x, r, u: Hmat @ x + Gmat @ jnp.tanh(r)
        r0 = jnp.zeros((nr,))
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda *a: fut.fused_ukf_condition_on_nonadditive(
                *a, h, R, None, y, up, r0, use_pallas=True))(m, P)
            ref = jax.jit(lambda *a: uk.ukf_condition_on_nonadditive(
                *a, h, R, None, y, up, r0))(m, P)
        _allclose(out, ref, 2e-3, 2e-3, ["ll", "mean", "cov"])


# ---------------------------------------------------------------------------
# ops/bank_combine.py + ops/bank_smoother.py — associative-scan lattice
# kernels, band edge dx = 8
# ---------------------------------------------------------------------------

class TestAssociativeKernelEdges:
    @staticmethod
    def _elements(key, m, dx, singular_head=0):
        ks = jr.split(key, 5)
        A = jr.normal(ks[0], (m, dx, dx)) * 0.5
        b = jr.normal(ks[1], (m, dx))
        cr = jr.normal(ks[2], (m, dx, dx)) * 0.3
        C = cr @ jnp.swapaxes(cr, -1, -2) + 0.01 * jnp.eye(dx)
        if singular_head:
            C = C.at[:singular_head].set(0.0)
        jr_ = jr.normal(ks[3], (m, dx, 2)) * 0.4
        J = jr_ @ jnp.swapaxes(jr_, -1, -2)
        eta = jr.normal(ks[4], (m, dx))
        return (A, b, C, J, eta)

    def test_filter_combine_dx8(self, tpu_backend):
        from bayesianfiltering_tpu.ops import bank_combine as bc

        dx, M = 8, 200
        left = self._elements(jr.PRNGKey(9), M, dx, singular_head=20)
        right = self._elements(jr.PRNGKey(10), M, dx)
        assert bc.should_use_pallas(dx, *left, *right)
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda l, r: bc.bank_filter_combine(
                l, r, use_pallas=True))(left, right)
            ref = jax.jit(lambda l, r: bc.bank_filter_combine(
                l, r, use_pallas=False))(left, right)
        _allclose(out, ref, 1e-3, 1e-3, ["A", "b", "C", "J", "eta"])

    def test_smoother_elements_and_combine_dx8(self, tpu_backend):
        from bayesianfiltering_tpu.ops import bank_smoother as bs

        dx, M = 8, 200
        key = jr.PRNGKey(11)
        fP = _psd_bank(jr.fold_in(key, 1), M, dx)
        pP = _psd_bank(jr.fold_in(key, 2), M, dx) + jnp.eye(dx)
        fm = jr.normal(jr.fold_in(key, 3), (M, dx))
        pm = jr.normal(jr.fold_in(key, 4), (M, dx))
        F = jr.normal(jr.fold_in(key, 5), (M, dx, dx)) * 0.5
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda *a: bs.bank_smoother_elements(
                *a, use_pallas=True))(fm, fP, pm, pP, F)
            ref = jax.jit(lambda *a: bs.bank_smoother_elements(
                *a, use_pallas=False))(fm, fP, pm, pP, F)
        _allclose(out, ref, 1e-3, 1e-3, ["E", "g", "L"])

        e1 = tuple(x for x in out)
        e2 = (out[0][::-1], out[1][::-1], out[2][::-1])
        with jax.default_matmul_precision("highest"):
            oc = jax.jit(lambda a, b: bs.bank_smoother_combine(
                a, b, use_pallas=True))(e1, e2)
            rc = jax.jit(lambda a, b: bs.bank_smoother_combine(
                a, b, use_pallas=False))(e1, e2)
        _allclose(oc, rc, 1e-3, 1e-3, ["E", "g", "L"])
