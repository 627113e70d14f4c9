"""Fused BATCHED EKF whole-update / predict kernels — MXU bank path.

The batched-EKF headline workload (512 independent dx=64 sequences,
ref: gaussfiltax/inference.py:72-120 vmapped over sequences) is HBM-bound
after round 3: the wall is the (512, 64, 64) covariance matmuls, ~300 MB of
P-sized HBM traffic per scan step because every XLA matmul in the update
chain round-trips its operands (BENCHLOG.md round 3 decomposition). The
lane-major kernels of :mod:`~bayesianfiltering_tpu.ops.bank_update` don't
apply — their fully-unrolled d×d scalar lattice is only tractable for
d ≤ 8.

This module fuses the ENTIRE measurement update (and separately the predict
covariance) for a bank of M medium-dimension Gaussians into ONE Pallas
kernel per batch block: the grid tiles the bank axis, each grid step loads a
(Bblk, d, d) block of the bank into VMEM ONCE and runs the full chain

    update:  S = Rt + H P Hᵀ (+rel floor), L/L⁻¹, K = (S⁻¹ H P)ᵀ,
             Joseph Σ, μ = m + K innov, log N(innov | 0, S)
    predict: Σ⁺ = F_x P F_xᵀ + F_q Q F_qᵀ

as batched ``dot_general`` contractions on the MXU (f32, HIGHEST — Mosaic
lowers batch-dim dots natively, verified round 3). The factorization is a
masked column/row Cholesky + forward substitution (one batched matvec and a
one-hot writeback per column) — see :func:`_chol_inv_batched` for why the
lattice and blocked-recursion forms do not lower through Mosaic batched.

HBM traffic per update step drops from ~300 MB (XLA chain at "highest"
precision) to one read + one write of the bank (~26 MB at the headline
shape): measured 809k → 2.36M timestep-equiv/s on bench.py (BENCHLOG
round 4).

Numerics match :func:`bayesianfiltering_tpu.ops.ekf.chol_update_precomputed`
(same relative jitter floor, Joseph form, shared-factor log-likelihood).
Differentiation: ``jax.custom_vjp`` whose backward re-runs the vmapped XLA
reference — same contract as the sibling kernels.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from bayesianfiltering_tpu.ops.pallas_kernels import _HAS_PALLAS

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = math.log(2.0 * math.pi)
_REL_JITTER = 1e-6   # keep in sync with ops/ekf.py
_DIM_MAX = 128       # verified kernel band (dx and dy)
# Block-size budget for the LIVE estimate below. Mosaic double-buffers every
# in/out block for grid pipelining and keeps several temporaries live, so the
# real VMEM footprint is ~4-5× the naive operand estimate (measured: the
# predict kernel at block=64/naive 6.3 MB allocated 22 MB and OOMed).
_VMEM_BUDGET = 3 * 1024 * 1024
_HI = jax.lax.Precision.HIGHEST


def _reduce2(op, x):
    """Reduce the last two axes to (..., 1, 1) as TWO single-axis keepdims
    reductions: Mosaic's layout inference aborts (layout.h rank check) on a
    rank-3 multi-axis keepdims reduce — measured on v5e, round 4."""
    return op(op(x, axis=-1, keepdims=True), axis=-2, keepdims=True)


def _dg(a, b, contract, batch=((0,), (0,))):
    """Batched dot_general with explicit contracting dims, f32 HIGHEST."""
    return jax.lax.dot_general(a, b, ((contract[0], contract[1]), batch),
                               precision=_HI)


# ---------------------------------------------------------------------------
# In-kernel batched Cholesky + triangular inverse: masked column/row form.
#
# Neither the scalar lattice (1-D (batch,) intermediates) nor the blocked
# recursion (tpu.concatenate of sliced values hits "result/input offset
# mismatch on non-concat dimension") lowers through Mosaic for BATCHED
# operands — both measured on v5e, round 4. This form never concatenates:
# each column/row is computed as one batched matvec against the running
# factor and written back with a one-hot broadcast multiply-add, so every
# op is a (b, n, n) / (b, n, 1) / (b, 1, n) Mosaic-friendly shape and the
# matvecs ride the MXU. ~n³ MACs vs n³/3 optimal — irrelevant next to the
# dx³ update matmuls the kernel exists to fuse.
# ---------------------------------------------------------------------------

def _chol_inv_batched(S):
    """(L, L⁻¹) for batched PSD S, unrolled over n static column/row steps."""
    n = S.shape[-1]
    dt = S.dtype
    eye = jnp.eye(n, dtype=dt)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    L = jnp.zeros_like(S)
    for j in range(n):
        # column j: v_i = S_ij − Σ_k L_ik L_jk (columns ≥ j of L still zero)
        v = S[..., :, j:j + 1] - _dg(L, L[..., j:j + 1, :], ((2,), (2,)))
        # NOT lax.rsqrt: Mosaic lowers it to the raw VPU approximation
        # (~1e-3 relative — measured 1e-2 gain error on-device, round 4);
        # sqrt + divide stays f32-exact.
        dinv = 1.0 / jnp.sqrt(v[..., j:j + 1, :])
        colmask = (row_idx >= j).astype(dt)                   # (n, 1)
        L = L + (v * dinv * colmask) * eye[j:j + 1, :]        # place col j
    Li = jnp.zeros_like(S)
    for i in range(n):
        # row i of L⁻¹: (e_i − L_i,<i · Li_<i,:) / L_ii
        r = eye[i:i + 1, :] - _dg(L[..., i:i + 1, :], Li, ((2,), (1,)))
        dinv = 1.0 / L[..., i:i + 1, i:i + 1]
        Li = Li + (r * dinv) * eye[:, i:i + 1]                # place row i
    return L, Li


# ---------------------------------------------------------------------------
# Update kernel
# ---------------------------------------------------------------------------

def _update_kernel(dx, dy, jitter, m_ref, p_ref, hx_ref, rt_ref, inn_ref,
                   ll_ref, mean_ref, cov_ref, gain_ref):
    P = p_ref[...]            # (b, dx, dx)
    H = hx_ref[...]           # (b, dy, dx)
    Rt = rt_ref[...]          # (b, dy, dy)
    m = m_ref[...]            # (b, dx, 1)
    inn = inn_ref[...]        # (b, dy, 1)
    eye_y = jnp.broadcast_to(jnp.eye(dy, dtype=P.dtype), Rt.shape)
    eye_x = jnp.broadcast_to(jnp.eye(dx, dtype=P.dtype), P.shape)

    hp = _dg(H, P, ((2,), (1,)))                          # (b, dy, dx)
    S = Rt + _dg(hp, H, ((2,), (2,)))                     # H P Hᵀ + Rt
    S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    floor = jitter + _REL_JITTER * _reduce2(jnp.max, jnp.abs(S * eye_y))
    S = S + floor * eye_y

    L, Li = _chol_inv_batched(S)
    Z = _dg(Li, hp, ((2,), (1,)))                         # L⁻¹ H P
    W = _dg(Li, Z, ((1,), (1,)))                          # S⁻¹ H P = Kᵀ
    gain_ref[...] = jnp.swapaxes(W, -1, -2)

    A = eye_x - _dg(W, H, ((1,), (1,)))                   # I − K H
    AP = _dg(A, P, ((2,), (1,)))
    cov = _dg(AP, A, ((2,), (2,)))                        # A P Aᵀ
    KR = _dg(W, Rt, ((1,), (1,)))                         # K Rt  (b, dx, dy)
    cov = cov + _dg(KR, W, ((2,), (1,)))                  # + K Rt Kᵀ
    cov_ref[...] = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))

    mean_ref[...] = m + _dg(W, inn, ((1,), (1,)))         # m + K innov
    z = _dg(Li, inn, ((2,), (1,)))                        # (b, dy, 1)
    zsq = _reduce2(jnp.sum, z * z)
    logdet = 2.0 * _reduce2(jnp.sum, jnp.log(jnp.where(eye_y > 0, L, 1.0)))
    ll_ref[...] = -0.5 * (dy * _LOG_2PI + logdet + zsq)


def _pick_block(M: int, elem_bytes: int) -> int:
    blk = 8
    while blk * 2 <= 128 and blk * 2 * elem_bytes <= _VMEM_BUDGET:
        blk *= 2
    while blk > M and blk > 8:
        blk //= 2
    return blk


def _pad_batch(x, blk):
    M = x.shape[0]
    pad = (-M) % blk
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def _update_pallas(m, P, Hx, Rt, innov, jitter: float, block=None):
    M, dx = m.shape
    dy = innov.shape[-1]
    if block is None:
        # live-range estimate: P/cov/A/AP + H-shaped workspaces + S factors
        elem = 4 * (5 * dx * dx + 6 * dx * dy + 6 * dy * dy)
        block = _pick_block(M, elem)
    # pad lanes get Rt = I (so S = I: chol/log/reciprocal stay finite) and
    # zero H/P/m/innov — outputs there are discarded below.
    pad = (-M) % block
    mp = M + pad
    args = [_pad_batch(m[:, :, None], block), _pad_batch(P, block),
            _pad_batch(Hx, block)]
    rt_pad = jnp.concatenate([
        Rt, jnp.broadcast_to(jnp.eye(dy, dtype=Rt.dtype), (pad, dy, dy))
    ], axis=0) if pad else Rt
    args += [rt_pad, _pad_batch(innov[:, :, None], block)]
    spec = lambda *dims: pl.BlockSpec((block,) + dims,
                                      lambda i: (i,) + (0,) * len(dims),
                                      memory_space=pltpu.VMEM)
    ll, mean, cov, gain = pl.pallas_call(
        functools.partial(_update_kernel, dx, dy, jitter),
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1, 1), m.dtype),
            jax.ShapeDtypeStruct((mp, dx, 1), m.dtype),
            jax.ShapeDtypeStruct((mp, dx, dx), m.dtype),
            jax.ShapeDtypeStruct((mp, dx, dy), m.dtype),
        ],
        grid=(mp // block,),
        in_specs=[spec(dx, 1), spec(dx, dx), spec(dy, dx), spec(dy, dy),
                  spec(dy, 1)],
        out_specs=[spec(1, 1), spec(dx, 1), spec(dx, dx), spec(dx, dy)],
    )(*args)
    return ll[:M, 0, 0], mean[:M, :, 0], cov[:M], gain[:M]


def _update_xla(m, P, Hx, Rt, innov, jitter):
    from bayesianfiltering_tpu.ops.ekf import chol_update_precomputed

    return jax.vmap(chol_update_precomputed, in_axes=(0, 0, 0, 0, 0, None))(
        m, P, Hx, Rt, innov, jitter
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _batched_update(m, P, Hx, Rt, innov, jitter, use_pallas):
    if use_pallas:
        return _update_pallas(m, P, Hx, Rt, innov, jitter)
    return _update_xla(m, P, Hx, Rt, innov, jitter)


def _bu_fwd(m, P, Hx, Rt, innov, jitter, use_pallas):
    out = _batched_update(m, P, Hx, Rt, innov, jitter, use_pallas)
    return out, (m, P, Hx, Rt, innov)


def _bu_bwd(jitter, use_pallas, res, cts):
    m, P, Hx, Rt, innov = res
    _, vjp = jax.vjp(lambda *a: _update_xla(*a, jitter), m, P, Hx, Rt, innov)
    return vjp(cts)


_batched_update.defvjp(_bu_fwd, _bu_bwd)


# ---------------------------------------------------------------------------
# Predict-covariance kernel: Σ⁺ = F_x P F_xᵀ + F_q Q F_qᵀ (Q shared)
# ---------------------------------------------------------------------------

def _predict_kernel(fx_ref, p_ref, fq_ref, q_ref, cov_ref):
    Fx = fx_ref[...]          # (b, dx, dx)
    P = p_ref[...]
    Fq = fq_ref[...]          # (b, dx, dq)
    Q = q_ref[...]            # (dq, dq) shared
    FP = _dg(Fx, P, ((2,), (1,)))
    cov = _dg(FP, Fx, ((2,), (2,)))
    FQ = jax.lax.dot_general(Fq, Q, (((2,), (0,)), ((), ())), precision=_HI)
    cov = cov + _dg(FQ, Fq, ((2,), (2,)))
    cov_ref[...] = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))


def _predict_pallas(Fx, P, Fq, Q, block=None):
    M, dx = Fx.shape[0], Fx.shape[-1]
    dq = Fq.shape[-1]
    if block is None:
        elem = 4 * (4 * dx * dx + 2 * dx * dq)
        block = _pick_block(M, elem)
    mp = M + ((-M) % block)
    spec = lambda *dims: pl.BlockSpec((block,) + dims,
                                      lambda i: (i,) + (0,) * len(dims),
                                      memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((dq, dq), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cov = pl.pallas_call(
        _predict_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, dx, dx), P.dtype),
        grid=(mp // block,),
        in_specs=[spec(dx, dx), spec(dx, dx), spec(dx, dq), qspec],
        out_specs=spec(dx, dx),
    )(_pad_batch(Fx, block), _pad_batch(P, block), _pad_batch(Fq, block), Q)
    return cov[:M]


def _predict_xla(Fx, P, Fq, Q):
    from bayesianfiltering_tpu.utils.linalg import symmetrize

    return symmetrize(
        jnp.einsum("mik,mkl,mjl->mij", Fx, P, Fx, precision=_HI)
        + jnp.einsum("mik,kl,mjl->mij", Fq, Q, Fq, precision=_HI)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _batched_predict_cov(Fx, P, Fq, Q, use_pallas):
    if use_pallas:
        return _predict_pallas(Fx, P, Fq, Q)
    return _predict_xla(Fx, P, Fq, Q)


def _bp_fwd(Fx, P, Fq, Q, use_pallas):
    return _batched_predict_cov(Fx, P, Fq, Q, use_pallas), (Fx, P, Fq, Q)


def _bp_bwd(use_pallas, res, ct):
    _, vjp = jax.vjp(_predict_xla, *res)
    return vjp(ct)


_batched_predict_cov.defvjp(_bp_fwd, _bp_bwd)


# ---------------------------------------------------------------------------
# Public dispatchers (called from ops/bank_update.py)
# ---------------------------------------------------------------------------

def _eligible(dx: int, dy: int, M: int, jitter, *arrays) -> bool:
    from bayesianfiltering_tpu.utils.linalg import _is_vmapped

    return (
        _HAS_PALLAS
        and jax.default_backend() == "tpu"
        and dx <= _DIM_MAX
        and dy <= _DIM_MAX
        and (dx > 8 or dy > 8)          # the lane-major kernel owns d ≤ 8
        and M >= 8
        and isinstance(jitter, (int, float))
        and not _is_vmapped(*arrays)    # sequential-grid pathology under vmap
    )


def batched_chol_update(m, P, Hx, Rt, innov, jitter=0.0, use_pallas=None):
    """Fused whole measurement update over a bank of M medium-dim Gaussians.

    Same contract as :func:`bayesianfiltering_tpu.ops.bank_update.bank_chol_update`
    (which dispatches here for 8 < d ≤ 128): returns ``(ll, mean, cov, gain)``
    of shapes ``(M,), (M, dx), (M, dx, dx), (M, dx, dy)``.
    """
    if not isinstance(jitter, (int, float)):
        return _update_xla(m, P, Hx, Rt, innov, jitter)
    if use_pallas is None:
        use_pallas = _eligible(m.shape[-1], innov.shape[-1], m.shape[0],
                               jitter, m, P, Hx, Rt, innov)
    return _batched_update(m, P, Hx, Rt, innov, float(jitter),
                           bool(use_pallas))


def batched_predict_cov(Fx, P, Fq, Q, use_pallas=None):
    """Σ⁺[m] = F_x[m] P[m] F_x[m]ᵀ + F_q[m] Q F_q[m]ᵀ fused into one batched
    MXU kernel (Q shared across the bank)."""
    if use_pallas is None:
        use_pallas = _eligible(Fx.shape[-1], Fq.shape[-1], Fx.shape[0],
                               0.0, Fx, P, Fq, Q)
    return _batched_predict_cov(Fx, P, Fq, Q, bool(use_pallas))


__all__ = ["batched_chol_update", "batched_predict_cov"]
