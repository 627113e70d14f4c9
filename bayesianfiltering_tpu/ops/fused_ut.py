"""Fused single-stream unscented-transform Pallas kernels.

The single-stream UKF step (ref: gaussfiltax/inference.py:122-224 at M=1)
has the same in-scan pathology the fused EKF kernels solve
(ops/fused_ekf.py): every small factorization and moment contraction is a
separate latency-bound XLA op, and the unbatched in-scan factorizations
(sigma-point Cholesky of P, innovation Cholesky of S) either native-lower
to sequential loops or hit the catastrophic unbatched blocked-recursion
regime (BENCHLOG.md round 2; measured round 3: single-stream UKF dx=64 ran
at ~0.3-1.3k steps/s vs the fused EKF's 59k). These kernels fuse each half
of the UT step into one Pallas program on whole-matrix VMEM tiles:

    sigma:    L = chol(P) (in-kernel blocked recursion, base 8) or
              P^{1/2} via Newton-Schulz (matmuls only);
              pts = [m + c·Lᵀ; m − c·Lᵀ]   (2n, n)
    update:   μ_y, S = Σw ccᵀ (+R), chol(S), L⁻¹, C, K = (S⁻¹C)ᵀ,
              grouped-Joseph Σ, μ, log N(innov | 0, S)
    predict:  μ, Σ = Σw ccᵀ (+Q)

The nonlinear f/h evaluations stay OUTSIDE the kernels (arbitrary traced
Python, vmapped over the 2n rows); the kernels bracket them. Semantics
match :mod:`bayesianfiltering_tpu.ops.ukf` (same weight scheme, same
relative jitter floor, same grouped-Joseph downdate, same shared-factor
log-likelihood). Differentiation goes through ``jax.custom_vjp`` whose
backward pass re-runs the XLA twins (same pattern as ops/fused_ekf.py).

Like the fused EKF kernels these are SINGLE-STREAM specialists: a vmapped
``pallas_call`` serializes over the batch (BENCHLOG.md), so every entry
point gates on ``_is_vmapped`` and the filter-level
``_filter_vmap_gate`` (inference.py) — batched banks keep the batched
blocked-recursion XLA path, which is faster there.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import vmap

from bayesianfiltering_tpu.ops import ukf as _ukf
from bayesianfiltering_tpu.ops.pallas_kernels import _HAS_PALLAS
from bayesianfiltering_tpu.utils import linalg as _la

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = math.log(2.0 * math.pi)
_REL_JITTER = 1e-6  # keep in sync with ops/ukf.py::_ukf_gain_update
_KERNEL_BASE = 8    # in-kernel blocked-recursion base (ops/fused_ekf.py)
# In-kernel factorization band: verified to 128 (the fused EKF update's
# _DY_MAX rationale — the blocked recursion at 256 hangs the device).
_DIM_MAX = 128
_NS_ITERS = 14      # keep in sync with utils/linalg.py::sqrtm_psd_ns


def _dg(a, b, dims):
    return jax.lax.dot_general(a, b, dims,
                               precision=jax.lax.Precision.HIGHEST)


def _eye(n, dtype):
    return (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(dtype)


def _sqrtm_ns_inkernel(p, eye):
    """Newton-Schulz symmetric PSD square root, Mosaic-safe ops only.

    Mirrors :func:`bayesianfiltering_tpu.utils.linalg.sqrtm_psd_ns`
    (trace via masked sum, same spectrum floor, same iteration count) so
    the kernel and XLA paths agree to rounding.
    """
    p = 0.5 * (p + p.T)
    s = jnp.sum(p * eye) + 1e-30
    a = p / s
    y, z = a, eye
    for _ in range(_NS_ITERS):
        t = 0.5 * (3.0 * eye - _dg(z, y, (((1,), (0,)), ((), ()))))
        y = _dg(y, t, (((1,), (0,)), ((), ())))
        z = _dg(t, z, (((1,), (0,)), ((), ())))
    y = y * jnp.sqrt(s)
    return 0.5 * (y + y.T)


def _factor(P, eye, method: str):
    if method == "cholesky":
        L, _ = _la.chol_and_inv_lower(P, base=_KERNEL_BASE,
                                      force_blocked=True)
        return L
    return _sqrtm_ns_inkernel(P, eye)


# ---------------------------------------------------------------------------
# sigma-point kernels
# ---------------------------------------------------------------------------

def _sigma_kernel(dx, scale, method, m_ref, p_ref, pts_ref):
    P = p_ref[:, :]
    m = m_ref[:, :]                       # (1, dx)
    L = _factor(P, _eye(dx, P.dtype), method)
    off = scale * L.T                     # rows = scaled factor columns
    pts_ref[:dx, :] = m + off
    pts_ref[dx:, :] = m - off


def _sigma_pallas(m, P, scale, method):
    dx = P.shape[-1]
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sigma_kernel, dx, scale, method),
        out_shape=jax.ShapeDtypeStruct((2 * dx, dx), P.dtype),
        in_specs=[vm(), vm()],
        out_specs=vm(),
    )(m[None, :], P)


def _sigma_xla(m, P, scale, method):
    if method == "cholesky":
        L = _la.fast_cholesky(P)
    else:
        L = _la.sqrtm_psd(P)
    off = scale * jnp.swapaxes(L, -1, -2)
    return jnp.concatenate([m[None, :] + off, m[None, :] - off], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_sigma(m, P, scale, method, use_pallas):
    if use_pallas:
        return _sigma_pallas(m, P, scale, method)
    return _sigma_xla(m, P, scale, method)


def _fs_fwd(m, P, scale, method, use_pallas):
    return _fused_sigma(m, P, scale, method, use_pallas), (m, P)


def _fs_bwd(scale, method, use_pallas, res, ct):
    m, P = res
    _, vjp = jax.vjp(lambda mm, pp: _sigma_xla(mm, pp, scale, method), m, P)
    return vjp(ct)


_fused_sigma.defvjp(_fs_fwd, _fs_bwd)


def _sigma_aug_kernel(dx, dn, scale, method, m_ref, p_ref, b_ref, c_ref,
                      pts_ref):
    """Augmented sigma points from the block-diagonal [[P,0],[0,C]] without
    materializing the augmented matrix: chol(blkdiag) = blkdiag(chols)."""
    na = dx + dn
    P = p_ref[:, :]
    C = c_ref[:, :]
    m = m_ref[:, :]                       # (1, dx)
    b = b_ref[:, :]                       # (1, dn)
    offx = scale * _factor(P, _eye(dx, P.dtype), method).T   # (dx, dx)
    offn = scale * _factor(C, _eye(dn, P.dtype), method).T   # (dn, dn)
    mx = jnp.broadcast_to(m, (dn, dx))
    bn = jnp.broadcast_to(b, (dx, dn))
    pts_ref[0:dx, 0:dx] = m + offx
    pts_ref[0:dx, dx:na] = bn
    pts_ref[dx:na, 0:dx] = mx
    pts_ref[dx:na, dx:na] = b + offn
    pts_ref[na:na + dx, 0:dx] = m - offx
    pts_ref[na:na + dx, dx:na] = bn
    pts_ref[na + dx:, 0:dx] = mx
    pts_ref[na + dx:, dx:na] = b - offn


def _sigma_aug_pallas(m, P, bias, C, scale, method):
    dx, dn = P.shape[-1], C.shape[-1]
    na = dx + dn
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sigma_aug_kernel, dx, dn, scale, method),
        out_shape=jax.ShapeDtypeStruct((2 * na, na), P.dtype),
        in_specs=[vm(), vm(), vm(), vm()],
        out_specs=vm(),
    )(m[None, :], P, bias[None, :], C)


def _sigma_aug_xla(m, P, bias, C, scale, method):
    dx, dn = P.shape[-1], C.shape[-1]
    if method == "cholesky":
        Lp, Lc = _la.fast_cholesky(P), _la.fast_cholesky(C)
    else:
        Lp, Lc = _la.sqrtm_psd(P), _la.sqrtm_psd(C)
    offx = scale * jnp.swapaxes(Lp, -1, -2)
    offn = scale * jnp.swapaxes(Lc, -1, -2)
    zx = jnp.zeros((dx, dn), P.dtype)
    zn = jnp.zeros((dn, dx), P.dtype)
    off = jnp.block([[offx, zx], [zn, offn]])
    mA = jnp.concatenate([m, bias])[None, :]
    return jnp.concatenate([mA + off, mA - off], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_sigma_aug(m, P, bias, C, scale, method, use_pallas):
    if use_pallas:
        return _sigma_aug_pallas(m, P, bias, C, scale, method)
    return _sigma_aug_xla(m, P, bias, C, scale, method)


def _fsa_fwd(m, P, bias, C, scale, method, use_pallas):
    return _fused_sigma_aug(m, P, bias, C, scale, method, use_pallas), (
        m, P, bias, C)


def _fsa_bwd(scale, method, use_pallas, res, ct):
    _, vjp = jax.vjp(
        lambda mm, pp, bb, cc: _sigma_aug_xla(mm, pp, bb, cc, scale, method),
        *res)
    return vjp(ct)


_fused_sigma_aug.defvjp(_fsa_fwd, _fsa_bwd)


# ---------------------------------------------------------------------------
# UT measurement-update kernel
# ---------------------------------------------------------------------------

def _ut_update_kernel(dx, dy, w_side, w0m, w0c, add_r,
                      ptsx_ref, hpts_ref, cy_ref, m_ref, p_ref, r_ref, y_ref,
                      ll_ref, mean_ref, cov_ref):
    pts = ptsx_ref[:, :]                  # (2n, dx) prior sigma pts (state)
    hp = hpts_ref[:, :]                   # (2n, dy) propagated
    center = cy_ref[:, :]                 # (1, dy)
    m = m_ref[:, :]                       # (1, dx)
    P = p_ref[:, :]
    y = y_ref[:, :]                       # (1, dy)
    eye_y = _eye(dy, P.dtype)

    mu_y = w_side * jnp.sum(hp, axis=0, keepdims=True) + w0m * center
    cen = hp - mu_y                       # (2n, dy)
    d0 = center - mu_y                    # (1, dy)
    S = w_side * _dg(cen, cen, (((0,), (0,)), ((), ())))
    S = S + w0c * _dg(d0, d0, (((0,), (0,)), ((), ())))
    if add_r:
        S = S + r_ref[:, :]
    S = 0.5 * (S + S.T)
    floor = _REL_JITTER * jnp.max(jnp.abs(S * eye_y))
    S = S + floor * eye_y

    L, Li = _la.chol_and_inv_lower(S, base=_KERNEL_BASE, force_blocked=True)
    C = w_side * _dg(cen, pts - m, (((0,), (0,)), ((), ())))   # (dy, dx)
    Z = _dg(Li, C, (((1,), (0,)), ((), ())))
    W = _dg(Li, Z, (((0,), (0,)), ((), ())))                   # S⁻¹C = Kᵀ
    KC = _dg(W, C, (((0,), (0,)), ((), ())))                   # (dx, dx)
    KL = _dg(W, L, (((0,), (0,)), ((), ())))                   # K L (dx, dy)
    cov = P - KC - KC.T + _dg(KL, KL, (((1,), (1,)), ((), ())))
    cov_ref[:, :] = 0.5 * (cov + cov.T)

    inn = y - mu_y                                             # (1, dy)
    mean_ref[:, :] = m + _dg(inn, W, (((1,), (0,)), ((), ())))
    z = _dg(inn, Li, (((1,), (1,)), ((), ())))
    logdet = 2.0 * jnp.sum(jnp.log(jnp.where(eye_y > 0, L, 1.0)))
    ll_ref[0, 0] = -0.5 * (dy * _LOG_2PI + logdet + jnp.sum(z * z))


def _ut_update_pallas(ptsx, hpts, center_y, m, P, R, y, consts, add_r):
    dx, dy = P.shape[-1], y.shape[-1]
    w_side, w0m, w0c = consts
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    ll, mean, cov = pl.pallas_call(
        functools.partial(_ut_update_kernel, dx, dy, w_side, w0m, w0c, add_r),
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), P.dtype),
            jax.ShapeDtypeStruct((1, dx), P.dtype),
            jax.ShapeDtypeStruct((dx, dx), P.dtype),
        ],
        in_specs=[vm()] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vm(), vm()],
    )(ptsx, hpts, center_y[None, :], m[None, :], P, R, y[None, :])
    return ll[0, 0], mean[0], cov


def _ut_update_xla(ptsx, hpts, center_y, m, P, R, y, consts, add_r):
    w_side, w0m, w0c = consts
    mu_y = w_side * jnp.sum(hpts, axis=0) + w0m * center_y
    cen = hpts - mu_y
    d0 = center_y - mu_y
    S = w_side * jnp.einsum("ni,nj->ij", cen, cen) + w0c * jnp.outer(d0, d0)
    if add_r:
        S = S + R
    S = _la.symmetrize(S)
    C = w_side * jnp.einsum("ni,nj->ij", cen, ptsx - m)
    return _ukf._ukf_gain_update(m, P, mu_y, S, C, y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_ut_update(ptsx, hpts, center_y, m, P, R, y, consts, add_r,
                     use_pallas):
    if use_pallas:
        return _ut_update_pallas(ptsx, hpts, center_y, m, P, R, y, consts,
                                 add_r)
    return _ut_update_xla(ptsx, hpts, center_y, m, P, R, y, consts, add_r)


def _fuu_fwd(ptsx, hpts, center_y, m, P, R, y, consts, add_r, use_pallas):
    return _fused_ut_update(ptsx, hpts, center_y, m, P, R, y, consts, add_r,
                            use_pallas), (ptsx, hpts, center_y, m, P, R, y)


def _fuu_bwd(consts, add_r, use_pallas, res, cts):
    _, vjp = jax.vjp(lambda *a: _ut_update_xla(*a, consts, add_r), *res)
    return vjp(cts)


_fused_ut_update.defvjp(_fuu_fwd, _fuu_bwd)


# ---------------------------------------------------------------------------
# UT predict-moments kernel
# ---------------------------------------------------------------------------

def _ut_predict_kernel(dx, w_side, w0m, w0c, add_q,
                       fpts_ref, cx_ref, q_ref, mu_ref, cov_ref):
    fp = fpts_ref[:, :]                   # (2n, dx) propagated points
    center = cx_ref[:, :]                 # (1, dx)
    mu = w_side * jnp.sum(fp, axis=0, keepdims=True) + w0m * center
    cen = fp - mu
    d0 = center - mu
    cov = w_side * _dg(cen, cen, (((0,), (0,)), ((), ())))
    cov = cov + w0c * _dg(d0, d0, (((0,), (0,)), ((), ())))
    if add_q:
        cov = cov + q_ref[:, :]
    mu_ref[:, :] = mu
    cov_ref[:, :] = 0.5 * (cov + cov.T)


def _ut_predict_pallas(fpts, center_x, Q, consts, add_q):
    dx = Q.shape[-1]
    w_side, w0m, w0c = consts
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    mu, cov = pl.pallas_call(
        functools.partial(_ut_predict_kernel, dx, w_side, w0m, w0c, add_q),
        out_shape=[
            jax.ShapeDtypeStruct((1, dx), Q.dtype),
            jax.ShapeDtypeStruct((dx, dx), Q.dtype),
        ],
        in_specs=[vm(), vm(), vm()],
        out_specs=[vm(), vm()],
    )(fpts, center_x[None, :], Q)
    return mu[0], cov


def _ut_predict_xla(fpts, center_x, Q, consts, add_q):
    w_side, w0m, w0c = consts
    mu = w_side * jnp.sum(fpts, axis=0) + w0m * center_x
    cen = fpts - mu
    d0 = center_x - mu
    cov = w_side * jnp.einsum("ni,nj->ij", cen, cen) + w0c * jnp.outer(d0, d0)
    if add_q:
        cov = cov + Q
    return mu, _la.symmetrize(cov)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_ut_predict(fpts, center_x, Q, consts, add_q, use_pallas):
    if use_pallas:
        return _ut_predict_pallas(fpts, center_x, Q, consts, add_q)
    return _ut_predict_xla(fpts, center_x, Q, consts, add_q)


def _fup_fwd(fpts, center_x, Q, consts, add_q, use_pallas):
    return _fused_ut_predict(fpts, center_x, Q, consts, add_q, use_pallas), (
        fpts, center_x, Q)


def _fup_bwd(consts, add_q, use_pallas, res, cts):
    _, vjp = jax.vjp(lambda *a: _ut_predict_xla(*a, consts, add_q), *res)
    return vjp(cts)


_fused_ut_predict.defvjp(_fup_fwd, _fup_bwd)


# ---------------------------------------------------------------------------
# filter-facing wrappers (drop-ins for ops/ukf.py entry points)
# ---------------------------------------------------------------------------

def _consts(n_aug: int, uparams) -> tuple:
    """(scale, (w_side, w0m, w0c)) for the reference weight scheme
    (ref: gaussfiltax/inference.py:141-143; ops/ukf.py::_ut_moments)."""
    alpha = float(uparams.alpha)
    lamda = alpha**2 * (n_aug + float(uparams.kappa)) - n_aug
    w_side = 1.0 / (2.0 * (lamda + n_aug))
    w0m = lamda / (lamda + n_aug)
    w0c = w0m + 1.0 - alpha**2 + float(uparams.beta)
    return math.sqrt(n_aug + lamda), (w_side, w0m, w0c)


def _gate(uparams, *dims, arrays=(), use_pallas=None) -> bool:
    if use_pallas is False:
        return False
    ok = (
        _HAS_PALLAS
        and jax.default_backend() == "tpu"
        and uparams.sqrt_method in ("cholesky", "sqrtm")
        and all(d <= _DIM_MAX for d in dims)
        and not _la._is_vmapped(*arrays)
    )
    return ok


def fused_ukf_predict_additive(m, P, f, u, Q, uparams, q0, use_pallas=None):
    """Drop-in for :func:`bayesianfiltering_tpu.ops.ukf.ukf_predict_additive`
    with sigma generation and moment accumulation each fused into one
    Pallas kernel (single-stream TPU only; falls back otherwise)."""
    dx = m.shape[-1]
    if not _gate(uparams, dx, arrays=(m, P, Q), use_pallas=use_pallas):
        return _ukf.ukf_predict_additive(m, P, f, u, Q, uparams, q0)
    scale, consts = _consts(dx, uparams)
    pts = _fused_sigma(m, P, scale, uparams.sqrt_method, True)
    q0z = jnp.zeros((dx,), dtype=m.dtype)
    fpts = vmap(f, in_axes=(0, None, None))(pts, q0z, u)
    center = f(m, q0z, u)
    mu, cov = _fused_ut_predict(fpts, center, Q, consts, True, True)
    return mu, cov


def fused_ukf_predict_nonadditive(m, P, f, u, Q, uparams, q0,
                                  use_pallas=None):
    """Drop-in for ``ukf_predict_nonadditive`` (state-noise augmentation);
    the augmented factor is built block-wise in one kernel."""
    dx = m.shape[-1]
    nq = q0.shape[-1]
    na = dx + nq
    if not _gate(uparams, na, arrays=(m, P, Q), use_pallas=use_pallas):
        return _ukf.ukf_predict_nonadditive(m, P, f, u, Q, uparams, q0)
    scale, consts = _consts(na, uparams)
    pts = _fused_sigma_aug(m, P, q0, Q, scale, uparams.sqrt_method, True)
    fA = lambda xA, uu: f(xA[:dx], xA[dx:], uu)
    fpts = vmap(fA, in_axes=(0, None))(pts, u)
    center = f(m, q0, u)
    zq = jnp.zeros((dx, dx), dtype=P.dtype)
    mu, cov = _fused_ut_predict(fpts, center, zq, consts, False, True)
    return mu, cov


def fused_ukf_condition_on_additive(m, P, h, R, u, y, uparams, r0=None,
                                    residual_fn=None, use_pallas=None):
    """Drop-in for ``ukf_condition_on_additive``: sigma kernel + one fused
    moments/gain/update kernel. Returns (ll, mean, cov)."""
    dx = m.shape[-1]
    y = jnp.atleast_1d(y)
    dy = y.shape[-1]
    if residual_fn is not None or not _gate(uparams, dx, dy,
                                            arrays=(m, P, R, y),
                                            use_pallas=use_pallas):
        return _ukf.ukf_condition_on_additive(m, P, h, R, u, y, uparams, r0,
                                              residual_fn)
    scale, consts = _consts(dx, uparams)
    pts = _fused_sigma(m, P, scale, uparams.sqrt_method, True)
    r0z = jnp.zeros((dy,), dtype=m.dtype)
    hpts = vmap(h, in_axes=(0, None, None))(pts, r0z, u)
    center = jnp.atleast_1d(h(m, r0z, u))
    return _fused_ut_update(pts, hpts, center, m, P, R, y, consts, True, True)


def fused_ukf_condition_on_nonadditive(m, P, h, R, u, y, uparams, r0=None,
                                       residual_fn=None, use_pallas=None):
    """Drop-in for ``ukf_condition_on_nonadditive`` (noise augmentation).
    Returns (ll, mean, cov)."""
    dx = m.shape[-1]
    nr = r0.shape[-1]
    na = dx + nr
    y = jnp.atleast_1d(y)
    dy = y.shape[-1]
    if residual_fn is not None or not _gate(uparams, na, dy,
                                            arrays=(m, P, R, y),
                                            use_pallas=use_pallas):
        return _ukf.ukf_condition_on_nonadditive(m, P, h, R, u, y, uparams,
                                                 r0, residual_fn)
    scale, consts = _consts(na, uparams)
    pts = _fused_sigma_aug(m, P, r0, R, scale, uparams.sqrt_method, True)
    hA = lambda xA, uu: h(xA[:dx], xA[dx:], uu)
    hpts = vmap(hA, in_axes=(0, None))(pts, u)
    center = jnp.atleast_1d(h(m, r0, u))
    zr = jnp.zeros((dy, dy), dtype=P.dtype)
    return _fused_ut_update(pts[:, :dx], hpts, center, m, P, zr, y, consts,
                            False, True)


__all__ = [
    "fused_ukf_predict_additive",
    "fused_ukf_predict_nonadditive",
    "fused_ukf_condition_on_additive",
    "fused_ukf_condition_on_nonadditive",
]
