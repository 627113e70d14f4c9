"""Fused single-stream EKF update/predict Pallas kernels.

The single-stream EKF step (ref: gaussfiltax/inference.py:72-120 at M=1) is
per-op latency-bound inside ``lax.scan``: the measurement update alone is
~25 XLA fusions (innovation covariance, blocked Cholesky, triangular
inverse, gain, Joseph downdate, log-likelihood), and on the round-2
toolchain the UNBATCHED blocked factorizations additionally compile for
minutes and run ~100× slower than their batched forms. These kernels fuse

    update:  S, chol(S), L⁻¹, K = (S⁻¹ H P)ᵀ, Joseph Σ, μ, log N(innov|0,S)
    predict: Σ⁺ = F_x P F_xᵀ + F_q Q F_qᵀ

each into ONE Pallas kernel on 2-D VMEM tiles: dense products on the MXU
(f32, HIGHEST — no bf16 passes), and the factorization via the blocked
matmul recursion of :func:`~bayesianfiltering_tpu.utils.linalg.chol_and_inv_lower`
with an 8-wide unrolled base case traced INSIDE the kernel (measured on
v5e at dx=64, dy=32, in-scan: base 16 = 17.5 µs/step + 141 s compile,
base 8 = 16.2 µs/step + 2 s compile; masked-column fori_loop and SMEM
scalar-core variants measured slower — BENCHLOG.md round 2).

Semantics match :func:`bayesianfiltering_tpu.ops.ekf.ekf_condition_on` /
``ekf_predict`` (same relative jitter floor, Joseph form, shared-factor
log-likelihood). Differentiation goes through a ``jax.custom_vjp`` whose
backward pass re-runs the XLA reference.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from bayesianfiltering_tpu.ops.pallas_kernels import _HAS_PALLAS
from bayesianfiltering_tpu.utils import linalg as _la

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = math.log(2.0 * math.pi)
_REL_JITTER = 1e-6  # keep in sync with ops/ekf.py
_KERNEL_BASE = 8    # in-kernel blocked-recursion base (see module docstring)
# Whole-step-in-VMEM works to dx=512 for the predict kernel and the update
# kernel's state side (P + workspaces ~4 MB of the 16 MB VMEM). The update
# kernel's FACTORIZATION band is capped separately at dy ≤ 128
# (_DY_MAX): the in-kernel blocked recursion at dy=256 compiles (~4 min)
# but its execution HANGS the device (round 3, reproduced twice — the
# round-2 "1170 steps/s at dy=256" number predates the toolchain bump).
# Large-dy configs go through the exact sequential chunked update below
# (ekf_condition_on_chunked), which runs ⌈dy/128⌉ dy≤128 kernels per step.
_DIM_MAX = 512
_DY_MAX = 128


def _dg(a, b, dims):
    return jax.lax.dot_general(a, b, dims,
                               precision=jax.lax.Precision.HIGHEST)


def _update_kernel(dx, dy, jitter, m_ref, p_ref, hx_ref, rt_ref, inn_ref,
                   ll_ref, mean_ref, cov_ref, gain_ref):
    P = p_ref[:, :]
    H = hx_ref[:, :]
    Rt = rt_ref[:, :]
    m = m_ref[:, :]          # (1, dx)
    inn = inn_ref[:, :]      # (1, dy)
    eye_y = (jax.lax.broadcasted_iota(jnp.int32, (dy, dy), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (dy, dy), 1)).astype(P.dtype)
    eye_x = (jax.lax.broadcasted_iota(jnp.int32, (dx, dx), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (dx, dx), 1)).astype(P.dtype)

    hp = _dg(H, P, (((1,), (0,)), ((), ())))                 # (dy, dx)
    S = Rt + _dg(hp, H, (((1,), (1,)), ((), ())))            # H P Hᵀ + Rt
    S = 0.5 * (S + S.T)
    floor = jitter + _REL_JITTER * jnp.max(jnp.abs(S * eye_y))
    S = S + floor * eye_y

    # force_blocked: Mosaic cannot lower cholesky/triangular_solve at any
    # size, so the _BLOCK_MAX native dispatch must never fire in-kernel
    # (dy in (128, 512] hit it after round 2 lowered _BLOCK_MAX to 128).
    L, Li = _la.chol_and_inv_lower(S, base=_KERNEL_BASE, force_blocked=True)
    Z = _dg(Li, hp, (((1,), (0,)), ((), ())))                # L⁻¹ H P
    W = _dg(Li, Z, (((0,), (0,)), ((), ())))                 # S⁻¹ H P = Kᵀ
    gain_ref[:, :] = W

    A = eye_x - _dg(W, H, (((0,), (0,)), ((), ())))          # I − K H
    AP = _dg(A, P, (((1,), (0,)), ((), ())))
    cov = _dg(AP, A, (((1,), (1,)), ((), ())))
    KR = _dg(W, Rt, (((0,), (0,)), ((), ())))
    cov = cov + _dg(KR, W, (((1,), (0,)), ((), ())))
    cov_ref[:, :] = 0.5 * (cov + cov.T)

    mean_ref[:, :] = m + _dg(inn, W, (((1,), (0,)), ((), ())))
    z = _dg(inn, Li, (((1,), (1,)), ((), ())))               # (1, dy)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.where(eye_y > 0, L, 1.0)))
    ll_ref[0, 0] = -0.5 * (dy * _LOG_2PI + logdet + jnp.sum(z * z))


def _update_pallas(m, P, Hx, Rt, innov, jitter: float):
    dx, dy = P.shape[-1], Rt.shape[-1]
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    ll, mean, cov, gain_t = pl.pallas_call(
        functools.partial(_update_kernel, dx, dy, jitter),
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), P.dtype),
            jax.ShapeDtypeStruct((1, dx), P.dtype),
            jax.ShapeDtypeStruct((dx, dx), P.dtype),
            jax.ShapeDtypeStruct((dy, dx), P.dtype),
        ],
        in_specs=[vm(), vm(), vm(), vm(), vm()],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vm(), vm(), vm()],
    )(m[None, :], P, Hx, Rt, innov[None, :])
    return ll[0, 0], mean[0], cov, jnp.transpose(gain_t)


def _update_xla(m, P, Hx, Rt, innov, jitter):
    # The one shared update implementation (ops/ekf.py) — the kernel is
    # validated against it and the VJP re-runs it.
    from bayesianfiltering_tpu.ops.ekf import chol_update_precomputed

    return chol_update_precomputed(m, P, Hx, Rt, innov, jitter)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_update(m, P, Hx, Rt, innov, jitter, use_pallas):
    if use_pallas:
        return _update_pallas(m, P, Hx, Rt, innov, jitter)
    return _update_xla(m, P, Hx, Rt, innov, jitter)


def _fu_fwd(m, P, Hx, Rt, innov, jitter, use_pallas):
    return _fused_update(m, P, Hx, Rt, innov, jitter, use_pallas), (
        m, P, Hx, Rt, innov)


def _fu_bwd(jitter, use_pallas, res, cts):
    m, P, Hx, Rt, innov = res
    _, vjp = jax.vjp(lambda *a: _update_xla(*a, jitter), m, P, Hx, Rt, innov)
    return vjp(cts)


_fused_update.defvjp(_fu_fwd, _fu_bwd)


def _predict_kernel(fx_ref, p_ref, fq_ref, q_ref, cov_ref):
    Fx = fx_ref[:, :]
    P = p_ref[:, :]
    Fq = fq_ref[:, :]
    Q = q_ref[:, :]
    FP = _dg(Fx, P, (((1,), (0,)), ((), ())))
    cov = _dg(FP, Fx, (((1,), (1,)), ((), ())))
    FQ = _dg(Fq, Q, (((1,), (0,)), ((), ())))
    cov = cov + _dg(FQ, Fq, (((1,), (1,)), ((), ())))
    cov_ref[:, :] = 0.5 * (cov + cov.T)


def _predict_pallas(Fx, P, Fq, Q):
    dx = Fx.shape[-1]
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _predict_kernel,
        out_shape=jax.ShapeDtypeStruct((dx, dx), P.dtype),
        in_specs=[vm(), vm(), vm(), vm()],
        out_specs=vm(),
    )(Fx, P, Fq, Q)


def _predict_xla(Fx, P, Fq, Q):
    return _la.symmetrize(Fx @ P @ Fx.T + Fq @ Q @ Fq.T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_predict_cov(Fx, P, Fq, Q, use_pallas):
    if use_pallas:
        return _predict_pallas(Fx, P, Fq, Q)
    return _predict_xla(Fx, P, Fq, Q)


def _fp_fwd(Fx, P, Fq, Q, use_pallas):
    return _fused_predict_cov(Fx, P, Fq, Q, use_pallas), (Fx, P, Fq, Q)


def _fp_bwd(use_pallas, res, ct):
    _, vjp = jax.vjp(_predict_xla, *res)
    return vjp(ct)


_fused_predict_cov.defvjp(_fp_fwd, _fp_bwd)


# vmap gate: a vmapped pallas_call adds a grid axis that runs the
# per-matrix kernel SEQUENTIALLY per batch element — measured 7× slower
# than the batched XLA blocked factorizations on bench.py's vmap-256
# layout. The fused kernels are single-stream specialists; under vmap the
# XLA path wins. Shared with the factorization dispatchers; fails CLOSED
# (tests/test_pallas.py::TestVmapGate pins both directions).
from bayesianfiltering_tpu.utils.linalg import (  # noqa: E402
    _batch_tracer_cls,
    _is_vmapped,
)


def _should_use_pallas(dx: int, dy: int, jitter) -> bool:
    return (
        _HAS_PALLAS
        and jax.default_backend() == "tpu"
        and dx <= _DIM_MAX
        and dy <= _DY_MAX
        and isinstance(jitter, (int, float))
    )


def fused_ekf_condition_on_iterated(
    m, P, h, H_x, H_r, R, r0, u, y, num_iter=1, jitter=0.0, use_pallas=None,
    residual_fn=None,
):
    """Single-stream (iterated) EKF measurement update with the linear
    algebra fused into one Pallas kernel per iteration. Drop-in for
    :func:`bayesianfiltering_tpu.ops.ekf.ekf_condition_on_iterated`."""
    from bayesianfiltering_tpu.ops.ekf import (
        EKFUpdate,
        _degenerate_update,
        _residual,
        _static_num_iter,
    )

    y = jnp.atleast_1d(y)
    num_iter = _static_num_iter(num_iter)
    if num_iter <= 0:
        return _degenerate_update(m, P, y)
    if not isinstance(jitter, (int, float)):
        # Traced jitter cannot ride custom_vjp's nondiff_argnums; fall back
        # to the plain (natively differentiable) primitive.
        from bayesianfiltering_tpu.ops.ekf import ekf_condition_on_iterated

        return ekf_condition_on_iterated(m, P, h, H_x, H_r, R, r0, u, y,
                                         num_iter, jitter, residual_fn)
    if use_pallas is None:
        use_pallas = (_should_use_pallas(m.shape[-1], y.shape[-1], jitter)
                      and not _is_vmapped(m, P, R, y))
    jitter = float(jitter)
    lin = m
    out = None
    for it in range(num_iter):
        Hx = jnp.reshape(H_x(lin, r0, u), (-1, m.shape[-1]))
        Hr = H_r(lin, r0, u)
        Hr = jnp.reshape(Hr, (Hx.shape[0], -1))
        yhat = jnp.atleast_1d(h(lin, r0, u))
        if it > 0:
            yhat = yhat + Hx @ (m - lin)
        Rt = Hr @ R @ Hr.T
        ll, mean, cov, K = _fused_update(m, P, Hx, Rt,
                                         _residual(y, yhat, residual_fn),
                                         jitter, bool(use_pallas))
        lin = mean
        out = EKFUpdate(ll, mean, cov, Hx, K)
    return out


def fused_ekf_condition_on_chunked(
    m, P, h, H_x, H_r, R, r0, u, y, chunk=_DY_MAX, num_iter=1, jitter=0.0,
    use_pallas=None, residual_fn=None,
):
    """Sequential (chunked) EKF measurement update for large emission dims.

    Processes the emission vector in ``chunk``-sized blocks, one Kalman
    update per block — the classical "sequential processing" form. EXACT
    (same posterior and total log-likelihood as the joint update) whenever
    the effective emission noise ``Rt = H_r R H_rᵀ`` is block-diagonal
    w.r.t. the chunking (e.g. diagonal sensor noise, the BASELINE Lorenz-96
    config); an approximation otherwise — cross-chunk noise correlations
    are dropped.

    Why it exists: the fused single-stream kernel's in-kernel factorization
    is verified to dy ≤ 128 (``_DY_MAX``; at dy=256 the Mosaic-compiled
    blocked recursion hangs the device, round 3), and the XLA fallback at
    dy=256 native-lowers the factorization into a ~100× slower sequential
    loop (BENCHLOG.md). Chunking runs ⌈dy/chunk⌉ kernel-sized updates, each
    in the verified band. Chunk boundaries are static; per-chunk
    innovations are corrected for the mean motion of earlier chunks
    (``inn_c −= H_c (m_cur − m_lin)``), so within one linearization the
    recursion is algebraically the joint update.

    Returns an :class:`~bayesianfiltering_tpu.ops.ekf.EKFUpdate`; the
    ``gain`` field holds the per-chunk gains concatenated to (dx, dy)
    (diagnostic — the joint gain of the fused update is not materialized).
    """
    from bayesianfiltering_tpu.ops.ekf import (
        EKFUpdate,
        _degenerate_update,
        _residual,
        _static_num_iter,
    )

    y = jnp.atleast_1d(y)
    dy = y.shape[-1]
    num_iter = _static_num_iter(num_iter)
    if num_iter <= 0:
        return _degenerate_update(m, P, y)
    chunk = int(chunk)
    bounds = [(lo, min(lo + chunk, dy)) for lo in range(0, dy, chunk)]
    if use_pallas is None:
        use_pallas = (_should_use_pallas(m.shape[-1], min(chunk, dy), jitter)
                      and not _is_vmapped(m, P, R, y))
    if not isinstance(jitter, (int, float)):
        use_pallas = False
    jitter_f = float(jitter) if isinstance(jitter, (int, float)) else jitter

    lin = m
    out = None
    for it in range(num_iter):
        Hx = jnp.reshape(H_x(lin, r0, u), (-1, m.shape[-1]))
        Hr = jnp.reshape(H_r(lin, r0, u), (Hx.shape[0], -1))
        yhat = jnp.atleast_1d(h(lin, r0, u))
        if it > 0:
            yhat = yhat + Hx @ (m - lin)
        Rt = Hr @ R @ Hr.T
        innov_full = _residual(y, yhat, residual_fn)
        ll_total = jnp.zeros(())
        cur_m, cur_P = m, P
        gains = []
        for lo, hi in bounds:
            Hc = Hx[lo:hi]
            Rc = Rt[lo:hi, lo:hi]
            inn = innov_full[lo:hi] - Hc @ (cur_m - m)
            if isinstance(jitter, (int, float)):
                ll, cur_m, cur_P, K = _fused_update(
                    cur_m, cur_P, Hc, Rc, inn, jitter_f, bool(use_pallas))
            else:
                ll, cur_m, cur_P, K = _update_xla(cur_m, cur_P, Hc, Rc, inn,
                                                  jitter)
            ll_total = ll_total + ll
            gains.append(K)
        lin = cur_m
        out = EKFUpdate(ll_total, cur_m, cur_P, Hx,
                        jnp.concatenate(gains, axis=-1))
    return out


def fused_ekf_predict(m, P, f, F_x, F_q, Q, q0, u, use_pallas=None):
    """Single-stream EKF predict with the covariance propagation fused into
    one Pallas kernel. Drop-in for ``ops.ekf.ekf_predict``."""
    Fx = F_x(m, q0, u)
    Fq = F_q(m, q0, u)
    mu = f(m, q0, u)
    if use_pallas is None:
        use_pallas = (
            _HAS_PALLAS and jax.default_backend() == "tpu"
            and P.shape[-1] <= _DIM_MAX and Fq.shape[-1] <= _DIM_MAX
            and not _is_vmapped(m, P, Q)
        )
    Sigma = _fused_predict_cov(Fx, P, Fq, Q, bool(use_pallas))
    return mu, Sigma, Fx


__all__ = [
    "fused_ekf_condition_on_iterated",
    "fused_ekf_condition_on_chunked",
    "fused_ekf_predict",
]
