"""Fused Pallas kernels for the associative RTS smoother's backward pass.

Two kernels in the bank-major lane layout (bank index along the 128-wide
lane dimension, dx ≤ 8, lattice fully unrolled at trace time):

* :func:`bank_smoother_elements` — per-step smoothing elements
  ``G = (Pp⁻¹ F Pf)ᵀ`` (classic smoothing gain via an in-kernel Cholesky +
  forward-substitution solve), ``g = mf − G mp``,
  ``L = sym(Pf − (G Lp)(G Lp)ᵀ)`` — replacing a batched ``psd_solve`` +
  three einsums over the full T axis.
* :func:`bank_smoother_combine` — the solve-free affine composition
  ``E = E1 E2``, ``g = E1 g2 + g1``, ``L = sym(E1 L2 E1ᵀ + L1)``
  (Särkkä & G-F Lemma 10) for the reverse chunked scan.

Math matches ``ops/associative.parallel_kalman_smoother``'s XLA path
exactly; differentiation re-runs the XLA reference under ``jax.vjp``
(house pattern of :mod:`~bayesianfiltering_tpu.ops.bank_update`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bayesianfiltering_tpu.ops.bank_combine import (
    _chol,
    _load,
    _loadv,
    _mm,
    _mmt,
    _mtm,
    _mv,
    _tri_inv,
)
from bayesianfiltering_tpu.ops.pallas_kernels import (
    LANES,
    _HAS_PALLAS,
    _pad_banks,
    from_bank_major,
    to_bank_major,
)

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Element construction kernel
# ---------------------------------------------------------------------------

def _elements_kernel(dx: int, fm_ref, fp_ref, pm_ref, pp_ref, f_ref,
                     e_ref, g_ref, l_ref):
    Pf = _load(fp_ref, dx, dx)
    Pp = _load(pp_ref, dx, dx)
    F = _load(f_ref, dx, dx)
    mf = _loadv(fm_ref, dx)
    mp = _loadv(pm_ref, dx)

    # Padded lanes carry Pp = 0; a tiny absolute floor keeps their chol
    # finite (real lanes are PD predicted covariances, floor ≪ rounding).
    Ppj = dict(Pp)
    for i in range(dx):
        Ppj[(i, i)] = Pp[(i, i)] + 1e-30

    Lp = _chol(Ppj, dx)
    linv = _tri_inv(Lp, dx)
    # full lower lattices with explicit zeros above the diagonal
    zero = 0.0 * Pp[(0, 0)]
    for i in range(dx):
        for j in range(i + 1, dx):
            Lp[(i, j)] = zero
            linv[(i, j)] = zero

    FP = _mm(F, Pf, dx, dx, dx)
    Y = _mm(linv, FP, dx, dx, dx)            # Lp⁻¹ F Pf
    X = _mtm(linv, Y, dx, dx, dx)            # Pp⁻¹ F Pf
    G = {(i, j): X[(j, i)] for i in range(dx) for j in range(dx)}
    for i in range(dx):
        for j in range(dx):
            e_ref[i * dx + j, :] = G[(i, j)]

    gm = _mv(G, mp, dx, dx)
    for i in range(dx):
        g_ref[i, :] = mf[i] - gm[i]

    GL = _mm(G, Lp, dx, dx, dx)
    GG = _mmt(GL, GL, dx, dx, dx)
    for i in range(dx):
        for j in range(i, dx):
            v = 0.5 * (Pf[(i, j)] + Pf[(j, i)]) - 0.5 * (GG[(i, j)]
                                                         + GG[(j, i)])
            l_ref[i * dx + j, :] = v
            if i != j:
                l_ref[j * dx + i, :] = v


def _elements_xla(fm, fP, pm, pP, F):
    from bayesianfiltering_tpu.utils.linalg import psd_solve, symmetrize

    G = jax.vmap(lambda Pf, Pp, Ft: psd_solve(Pp, Ft @ Pf).T)(fP, pP, F)
    g = fm - jnp.einsum("tij,tj->ti", G, pm)
    L = symmetrize(fP - jnp.einsum("tij,tjk,tlk->til", G, pP, G))
    return G, g, L


def _elements_pallas(fm, fP, pm, pP, F):
    M, dx = fm.shape
    prep = lambda x: _pad_banks(
        to_bank_major(x if x.ndim == 3 else x[:, :, None]))[0]
    ins = [prep(fm), prep(fP), prep(pm), prep(pP), prep(F)]
    mp = ins[0].shape[-1]
    spec = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    mat, vec = spec(dx * dx), spec(dx)
    E, g, L = pl.pallas_call(
        functools.partial(_elements_kernel, dx),
        out_shape=[
            jax.ShapeDtypeStruct((dx * dx, mp), fm.dtype),
            jax.ShapeDtypeStruct((dx, mp), fm.dtype),
            jax.ShapeDtypeStruct((dx * dx, mp), fm.dtype),
        ],
        grid=(mp // LANES,),
        in_specs=[vec, mat, vec, mat, mat],
        out_specs=[mat, vec, mat],
    )(*ins)
    return (
        from_bank_major(E[:, :M], dx, dx),
        from_bank_major(g[:, :M], dx, 1)[:, :, 0],
        from_bank_major(L[:, :M], dx, dx),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _bank_elements(fm, fP, pm, pP, F, use_pallas):
    if use_pallas:
        return _elements_pallas(fm, fP, pm, pP, F)
    return _elements_xla(fm, fP, pm, pP, F)


def _el_fwd(fm, fP, pm, pP, F, use_pallas):
    return _bank_elements(fm, fP, pm, pP, F, use_pallas), (fm, fP, pm, pP, F)


def _el_bwd(use_pallas, res, cts):
    _, vjp = jax.vjp(_elements_xla, *res)
    return vjp(cts)


_bank_elements.defvjp(_el_fwd, _el_bwd)


def bank_smoother_elements(fm, fP, pm, pP, F, use_pallas=None):
    """Per-step RTS smoothing elements ``(G, g, L)`` over a bank of T
    steps; one fused kernel on TPU at dx ≤ 8, the XLA reference elsewhere.
    ``F`` is (T, dx, dx) (broadcast a shared transition before calling)."""
    from bayesianfiltering_tpu.ops.bank_combine import should_use_pallas

    if use_pallas is None:
        use_pallas = should_use_pallas(fm.shape[-1], fm, fP, pm, pP, F)
    return _bank_elements(fm, fP, pm, pP, F, bool(use_pallas))


# ---------------------------------------------------------------------------
# Smoothing combine kernel
# ---------------------------------------------------------------------------

def _smoother_combine_kernel(dx: int, e1_ref, g1_ref, l1_ref,
                             e2_ref, g2_ref, l2_ref,
                             e_ref, g_ref, l_ref):
    E1 = _load(e1_ref, dx, dx)
    L1 = _load(l1_ref, dx, dx)
    E2 = _load(e2_ref, dx, dx)
    L2 = _load(l2_ref, dx, dx)
    g1 = _loadv(g1_ref, dx)
    g2 = _loadv(g2_ref, dx)

    E = _mm(E1, E2, dx, dx, dx)
    for i in range(dx):
        for j in range(dx):
            e_ref[i * dx + j, :] = E[(i, j)]

    gv = _mv(E1, g2, dx, dx)
    for i in range(dx):
        g_ref[i, :] = gv[i] + g1[i]

    T1 = _mm(E1, L2, dx, dx, dx)
    T2 = _mmt(T1, E1, dx, dx, dx)
    for i in range(dx):
        for j in range(i, dx):
            v = 0.5 * (T2[(i, j)] + T2[(j, i)] + L1[(i, j)] + L1[(j, i)])
            l_ref[i * dx + j, :] = v
            if i != j:
                l_ref[j * dx + i, :] = v


def _scombine_xla(earlier, later):
    from bayesianfiltering_tpu.ops.associative import _smoother_combine

    return _smoother_combine(earlier, later)


def _scombine_pallas(earlier, later):
    dx = earlier[0].shape[-1]
    M = earlier[0].shape[0]
    prep = lambda x: _pad_banks(
        to_bank_major(x if x.ndim == 3 else x[:, :, None]))[0]
    ins = [prep(x) for x in earlier] + [prep(x) for x in later]
    mp = ins[0].shape[-1]
    spec = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    mat, vec = spec(dx * dx), spec(dx)
    E, g, L = pl.pallas_call(
        functools.partial(_smoother_combine_kernel, dx),
        out_shape=[
            jax.ShapeDtypeStruct((dx * dx, mp), earlier[0].dtype),
            jax.ShapeDtypeStruct((dx, mp), earlier[0].dtype),
            jax.ShapeDtypeStruct((dx * dx, mp), earlier[0].dtype),
        ],
        grid=(mp // LANES,),
        in_specs=[mat, vec, mat] * 2,
        out_specs=[mat, vec, mat],
    )(*ins)
    return (
        from_bank_major(E[:, :M], dx, dx),
        from_bank_major(g[:, :M], dx, 1)[:, :, 0],
        from_bank_major(L[:, :M], dx, dx),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bank_scombine(earlier, later, use_pallas):
    if use_pallas:
        return _scombine_pallas(earlier, later)
    return _scombine_xla(earlier, later)


def _sc_fwd(earlier, later, use_pallas):
    return _bank_scombine(earlier, later, use_pallas), (earlier, later)


def _sc_bwd(use_pallas, res, cts):
    _, vjp = jax.vjp(_scombine_xla, *res)
    return vjp(cts)


_bank_scombine.defvjp(_sc_fwd, _sc_bwd)


def bank_smoother_combine(earlier, later, use_pallas=None):
    """Affine smoothing composition over banks with broadcastable leading
    batch axes; one fused kernel on TPU at dx ≤ 8."""
    from bayesianfiltering_tpu.ops.bank_combine import should_use_pallas

    dx = earlier[0].shape[-1]
    if use_pallas is None:
        use_pallas = should_use_pallas(dx, *earlier, *later)
    if not use_pallas:
        return _scombine_xla(earlier, later)

    batch = jnp.broadcast_shapes(earlier[0].shape[:-2], later[0].shape[:-2])
    M = 1
    for s in batch:
        M *= s

    def flat(x, core):
        full = batch + x.shape[x.ndim - core:]
        return jnp.broadcast_to(x, full).reshape((M,) + full[len(batch):])

    ef = (flat(earlier[0], 2), flat(earlier[1], 1), flat(earlier[2], 2))
    lf = (flat(later[0], 2), flat(later[1], 1), flat(later[2], 2))
    E, g, L = _bank_scombine(ef, lf, True)
    return (E.reshape(batch + (dx, dx)), g.reshape(batch + (dx,)),
            L.reshape(batch + (dx, dx)))


__all__ = ["bank_smoother_elements", "bank_smoother_combine"]
