"""Pallas TPU kernels for banks of tiny matrices (mixture-filter hot loops).

The AGSF/GSF hot ops are banks of M small-matrix products (M up to tens of
thousands of components, dx typically 1-16; SURVEY.md §3.3). XLA executes a
(M, d, d) batched matmul as M tiny MXU ops — each far below the 128×128
systolic tile, so utilization is ~(d/128)². These kernels flip the layout:
the BANK index M lies along the 128-wide lane dimension and the d² matrix
entries along sublanes, turning the whole bank into d³ VPU
multiply-accumulates that are M-wide each (full lane utilization for
M ≥ 128).

Layout convention: "bank-major" = ``(d, d, M)`` (entries × lanes). Helpers
``to_bank_major`` / ``from_bank_major`` convert from the filters' standard
``(M, d, d)``.

Kernels:
* :func:`bank_matmul`      — C[m] = A[m] @ B[m]
* :func:`bank_sandwich`    — C[m] = F[m] @ P[m] @ F[m]^T  (EKF covariance)
* :func:`bank_cholesky`    — L[m] = chol(P[m])  (unrolled Cholesky–Crout)

All kernels have pure-XLA reference fallbacks (used automatically off-TPU
and for the VJP) and are validated against them in tests via interpret mode.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only at runtime but importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

LANES = 128


def to_bank_major(a: jax.Array) -> jax.Array:
    """(M, d, e) -> (d*e, M)."""
    m = a.shape[0]
    return jnp.transpose(jnp.reshape(a, (m, -1)))


def from_bank_major(a: jax.Array, d: int, e: int) -> jax.Array:
    """(d*e, M) -> (M, d, e)."""
    return jnp.reshape(jnp.transpose(a), (-1, d, e))


def _pad_banks(x: jax.Array) -> Tuple[jax.Array, int]:
    """Pad the lane (bank) dimension up to a multiple of 128."""
    m = x.shape[-1]
    pad = (-m) % LANES
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, m


# ---------------------------------------------------------------------------
# bank_matmul
# ---------------------------------------------------------------------------

def _bank_matmul_kernel(d: int, a_ref, b_ref, c_ref):
    # a_ref, b_ref: (d*d, TM) blocks; row i*d+k of A holds A[:, i, k] lanes.
    for i in range(d):
        for j in range(d):
            acc = a_ref[i * d, :] * b_ref[j, :]
            for k in range(1, d):
                acc += a_ref[i * d + k, :] * b_ref[k * d + j, :]
            c_ref[i * d + j, :] = acc


def _bank_matmul_xla(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.einsum("mik,mkj->mij", a, b)


def bank_matmul(a: jax.Array, b: jax.Array, use_pallas: bool = None) -> jax.Array:
    """Batched C[m] = A[m] @ B[m] for (M, d, d) banks.

    With ``use_pallas`` unset, the kernel path is taken on TPU backends for
    d ≤ 16 (where the MXU tile would be mostly idle); otherwise XLA einsum.
    """
    m, d, _ = a.shape
    if use_pallas is None:
        use_pallas = (
            _HAS_PALLAS
            and jax.default_backend() == "tpu"
            and d <= 16
            and m >= LANES
        )
    if not use_pallas:
        return _bank_matmul_xla(a, b)

    am, _ = _pad_banks(to_bank_major(a))
    bm, _ = _pad_banks(to_bank_major(b))
    mp = am.shape[-1]
    grid = (mp // LANES,)
    out = pl.pallas_call(
        functools.partial(_bank_matmul_kernel, d),
        out_shape=jax.ShapeDtypeStruct((d * d, mp), a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d * d, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d * d, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(am, bm)
    return from_bank_major(out[:, :m], d, d)


# ---------------------------------------------------------------------------
# bank_sandwich: F P F^T
# ---------------------------------------------------------------------------

def _bank_sandwich_kernel(d: int, f_ref, p_ref, c_ref):
    # C[i,j] = sum_{k,l} F[i,k] P[k,l] F[j,l]; exploit symmetry of output.
    for i in range(d):
        for j in range(i + 1):
            acc = None
            for k in range(d):
                # t_k = sum_l P[k,l] F[j,l]
                t = p_ref[k * d, :] * f_ref[j * d, :]
                for l in range(1, d):
                    t += p_ref[k * d + l, :] * f_ref[j * d + l, :]
                contrib = f_ref[i * d + k, :] * t
                acc = contrib if acc is None else acc + contrib
            c_ref[i * d + j, :] = acc
            if i != j:
                c_ref[j * d + i, :] = acc


def _bank_sandwich_xla(f: jax.Array, p: jax.Array) -> jax.Array:
    return jnp.einsum("mik,mkl,mjl->mij", f, p, f)


def bank_sandwich(f: jax.Array, p: jax.Array, use_pallas: bool = None) -> jax.Array:
    """Batched congruence C[m] = F[m] P[m] F[m]^T (EKF covariance predict)."""
    m, d, _ = f.shape
    if use_pallas is None:
        use_pallas = (
            _HAS_PALLAS
            and jax.default_backend() == "tpu"
            and d <= 16
            and m >= LANES
        )
    if not use_pallas:
        return _bank_sandwich_xla(f, p)

    fm, _ = _pad_banks(to_bank_major(f))
    pm, _ = _pad_banks(to_bank_major(p))
    mp = fm.shape[-1]
    out = pl.pallas_call(
        functools.partial(_bank_sandwich_kernel, d),
        out_shape=jax.ShapeDtypeStruct((d * d, mp), f.dtype),
        grid=(mp // LANES,),
        in_specs=[
            pl.BlockSpec((d * d, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d * d, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(fm, pm)
    return from_bank_major(out[:, :m], d, d)


# ---------------------------------------------------------------------------
# bank_cholesky (unrolled Cholesky–Crout; d is tiny and static)
# ---------------------------------------------------------------------------

def _bank_cholesky_kernel(d: int, p_ref, l_ref):
    # Column-by-column Crout, fully unrolled over the d x d lattice; every
    # statement is an M-wide VPU op. Lower triangle written, upper zeroed.
    cols = {}
    for j in range(d):
        # diagonal entry
        acc = p_ref[j * d + j, :]
        for k in range(j):
            acc -= cols[(j, k)] * cols[(j, k)]
        diag = jnp.sqrt(acc)
        cols[(j, j)] = diag
        l_ref[j * d + j, :] = diag
        inv_diag = 1.0 / diag
        for i in range(j + 1, d):
            acc = p_ref[i * d + j, :]
            for k in range(j):
                acc -= cols[(i, k)] * cols[(j, k)]
            val = acc * inv_diag
            cols[(i, j)] = val
            l_ref[i * d + j, :] = val
        for i in range(j):
            l_ref[i * d + j, :] = jnp.zeros_like(diag)


def _bank_cholesky_xla(p: jax.Array) -> jax.Array:
    return jnp.linalg.cholesky(p)


def bank_cholesky(p: jax.Array, use_pallas: bool = None) -> jax.Array:
    """Batched lower Cholesky factors of (M, d, d) PSD banks."""
    m, d, _ = p.shape
    if use_pallas is None:
        use_pallas = (
            _HAS_PALLAS
            and jax.default_backend() == "tpu"
            and d <= 16
            and m >= LANES
        )
    if not use_pallas:
        return _bank_cholesky_xla(p)

    pm, _ = _pad_banks(to_bank_major(p))
    # padded banks are all-zero matrices -> sqrt(0)=0, 1/0=inf, 0*inf=nan in
    # the padded lanes only; make padding identity matrices instead.
    mp = pm.shape[-1]
    if mp != m:
        eye_cols = to_bank_major(
            jnp.broadcast_to(jnp.eye(d, dtype=p.dtype), (mp - m, d, d))
        )
        pm = pm.at[:, m:].set(eye_cols)
    out = pl.pallas_call(
        functools.partial(_bank_cholesky_kernel, d),
        out_shape=jax.ShapeDtypeStruct((d * d, mp), p.dtype),
        grid=(mp // LANES,),
        in_specs=[
            pl.BlockSpec((d * d, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d * d, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(pm)
    return from_bank_major(out[:, :m], d, d)


__all__ = [
    "to_bank_major",
    "from_bank_major",
    "bank_matmul",
    "bank_sandwich",
    "bank_cholesky",
]
