"""Fused Pallas kernel for the associative Kalman filtering combine.

The chunked two-level scan (:func:`bayesianfiltering_tpu.ops.associative.
chunked_associative_scan`) spends its time in combines BATCHED over the
chunk bank: under XLA each combine is ~150 small fusions on (G, dx, dx)
arrays far below the MXU tile, each a separate HBM round-trip — measured
63% of the 1M-step chunked filter's wall (BENCHLOG.md round 3,
"decomposition"). This module fuses the ENTIRE Woodbury combine
(Särkkä & García-Fernández Lemma 8 with the covariance-side Woodbury
identity of ``ops/associative._minv_woodbury``):

    ε     = 1e-7·tr(C1)/dx + 1e-30            (singular-C1 jitter)
    U     = chol(C1 + εI)
    inner = I + Uᵀ J2 U ;  L = chol(inner), L⁻¹ by forward substitution
    M⁻¹   = I − U (innerinv) (J2 U)ᵀ,  N⁻¹ = M⁻ᵀ
    A     = A2 M⁻¹ A1
    b     = A2 M⁻¹ (b1 + C1 η2) + b2
    C     = sym(A2 M⁻¹ C1 A2ᵀ + C2)
    η     = A1ᵀ N⁻¹ (η2 − J2 b1) + η1
    J     = sym(A1ᵀ N⁻¹ J2 A1 + J1)

into ONE kernel in the bank-major layout of
:mod:`~bayesianfiltering_tpu.ops.pallas_kernels` — the bank index lies
along the 128-wide lane dimension and every scalar of the dx×dx lattice is
an M-wide VPU statement, fully unrolled at trace time (dx ≤ 8, static).

No counterpart exists in the reference (it has no temporal parallelism at
all — SURVEY.md §2.4); this is TPU speed-of-light work on a new surface.

Differentiation: custom_vjp whose backward re-runs the pure-XLA combine
under ``jax.vjp`` (the kernel is forward-only), the house pattern of
:mod:`~bayesianfiltering_tpu.ops.bank_update`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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
# Scalar-lattice helpers: every entry is an M-lane-wide (1, LANES) row.
# ---------------------------------------------------------------------------

def _load(ref, r, c):
    return {(i, j): ref[i * c + j, :] for i in range(r) for j in range(c)}


def _loadv(ref, r):
    return {i: ref[i, :] for i in range(r)}


def _mm(X, Y, n, k, m):
    """(n,k) @ (k,m) on dict lattices."""
    out = {}
    for i in range(n):
        for j in range(m):
            acc = X[(i, 0)] * Y[(0, j)]
            for l in range(1, k):
                acc += X[(i, l)] * Y[(l, j)]
            out[(i, j)] = acc
    return out


def _mtm(X, Y, n, k, m):
    """Xᵀ @ Y where X is (k,n): (n,k-of-Xᵀ) @ (k,m)."""
    out = {}
    for i in range(n):
        for j in range(m):
            acc = X[(0, i)] * Y[(0, j)]
            for l in range(1, k):
                acc += X[(l, i)] * Y[(l, j)]
            out[(i, j)] = acc
    return out


def _mmt(X, Y, n, k, m):
    """X @ Yᵀ where Y is (m,k)."""
    out = {}
    for i in range(n):
        for j in range(m):
            acc = X[(i, 0)] * Y[(j, 0)]
            for l in range(1, k):
                acc += X[(i, l)] * Y[(j, l)]
            out[(i, j)] = acc
    return out


def _mv(X, v, n, k):
    out = {}
    for i in range(n):
        acc = X[(i, 0)] * v[0]
        for l in range(1, k):
            acc += X[(i, l)] * v[l]
        out[i] = acc
    return out


def _chol(S, n):
    """Cholesky–Crout on an n×n lattice (lower factor)."""
    L = {}
    for j in range(n):
        acc = S[(j, j)]
        for k in range(j):
            acc -= L[(j, k)] * L[(j, k)]
        diag = jnp.sqrt(acc)
        L[(j, j)] = diag
        inv_diag = 1.0 / diag
        for i in range(j + 1, n):
            acc = S[(i, j)]
            for k in range(j):
                acc -= L[(i, k)] * L[(j, k)]
            L[(i, j)] = acc * inv_diag
    return L


def _tri_inv(L, n):
    """L⁻¹ by forward substitution (lower triangular lattice)."""
    linv = {}
    for j in range(n):
        linv[(j, j)] = 1.0 / L[(j, j)]
        for i in range(j + 1, n):
            acc = L[(i, j)] * linv[(j, j)]
            for k in range(j + 1, i):
                acc += L[(i, k)] * linv[(k, j)]
            linv[(i, j)] = -acc / L[(i, i)]
    return linv


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------

def _combine_lattice(dx: int, left, right):
    """The Woodbury filtering combine on scalar lattices (dicts of
    lane-wide rows). ``left``/``right`` are 5-tuples of lattices
    (A, b, C, J, η); returns the combined 5-tuple of lattices. Pure
    compute, separated from the ref plumbing of :func:`_combine_kernel`.
    (An in-kernel sequential chunk scan built on this body measured
    neutral-to-slower vs per-combine launches — the combine is
    VPU-compute-bound — and was deleted; BENCHLOG round 3.)"""
    A1, b1, C1, J1, e1 = left
    A2, b2, C2, J2, e2 = right

    # ε-jittered C1 (ops/associative._minv_woodbury: trace-relative floor
    # keeps rank-deficient filtering covariances factorizable)
    tr = C1[(0, 0)]
    for i in range(1, dx):
        tr = tr + C1[(i, i)]
    eps = 1e-7 * tr / dx + 1e-30
    C1j = dict(C1)
    for i in range(dx):
        C1j[(i, i)] = C1[(i, i)] + eps

    U = _chol(C1j, dx)
    # Guard (parity with utils.linalg.cholesky_guarded, which the XLA
    # combine uses): a combined C is PSD only up to f32 rounding and
    # EXACTLY rank-deficient on reduced-noise models (BOT: rank dq < dx),
    # while the ε floor is trace-relative and can sit BELOW the rounding
    # noise of upstream combines — the unguarded lattice Cholesky then
    # NaNs individual lanes (sqrt of ≈ −1e-9) and the NaN swallows the
    # whole scan. Zero the entire factor for such lanes exactly like the
    # XLA path (U=0 ⇒ inner=I ⇒ M⁻¹=I for that lane). Round-5 root cause
    # of the TPU-only damped-IEKS non-finiteness at stiff R (BENCHLOG).
    bad = None
    for j in range(dx):
        for i in range(j, dx):
            flag = ~jnp.isfinite(U[(i, j)])
            bad = flag if bad is None else jnp.logical_or(bad, flag)
    for j in range(dx):
        for i in range(j, dx):
            U[(i, j)] = jnp.where(bad, 0.0, U[(i, j)])
    # U is lower triangular: fill the upper lattice with zeros for reuse
    zero = 0.0 * tr
    for i in range(dx):
        for j in range(i + 1, dx):
            U[(i, j)] = zero

    J2U = _mm(J2, U, dx, dx, dx)
    W = _mtm(U, J2U, dx, dx, dx)             # Uᵀ J2 U
    inner = {}
    for i in range(dx):
        for j in range(dx):
            s = 0.5 * (W[(i, j)] + W[(j, i)])
            inner[(i, j)] = s + 1.0 if i == j else s
    Li = _chol(inner, dx)
    linv = _tri_inv(Li, dx)
    # innerinv = linvᵀ linv (lower lattice with implicit zeros above diag)
    innerinv = {}
    for i in range(dx):
        for j in range(dx):
            acc = None
            for l in range(max(i, j), dx):
                term = linv[(l, i)] * linv[(l, j)]
                acc = term if acc is None else acc + term
            innerinv[(i, j)] = acc

    V = _mmt(innerinv, J2U, dx, dx, dx)      # innerinv (J2U)ᵀ
    UV = _mm(U, V, dx, dx, dx)
    Minv = {}
    for i in range(dx):
        for j in range(dx):
            Minv[(i, j)] = (1.0 - UV[(i, j)]) if i == j else -UV[(i, j)]

    A2M = _mm(A2, Minv, dx, dx, dx)
    A = _mm(A2M, A1, dx, dx, dx)

    # b = A2M (b1 + C1 η2) + b2
    s = _mv(C1, e2, dx, dx)
    for i in range(dx):
        s[i] = s[i] + b1[i]
    bv = _mv(A2M, s, dx, dx)
    for i in range(dx):
        bv[i] = bv[i] + b2[i]

    # C = sym(A2M C1 A2ᵀ + C2)
    T1 = _mm(A2M, C1, dx, dx, dx)
    T2 = _mmt(T1, A2, dx, dx, dx)
    Cout = {}
    for i in range(dx):
        for j in range(i, dx):
            v = 0.5 * (T2[(i, j)] + T2[(j, i)] + C2[(i, j)] + C2[(j, i)])
            Cout[(i, j)] = v
            Cout[(j, i)] = v

    # N⁻¹ = M⁻ᵀ: index-transpose the Minv lattice
    Ninv = {(i, j): Minv[(j, i)] for i in range(dx) for j in range(dx)}

    # η = A1ᵀ N⁻¹ (η2 − J2 b1) + η1
    w = _mv(J2, b1, dx, dx)
    for i in range(dx):
        w[i] = e2[i] - w[i]
    tmp = _mv(Ninv, w, dx, dx)
    ev = {}
    for i in range(dx):
        acc = A1[(0, i)] * tmp[0]
        for l in range(1, dx):
            acc += A1[(l, i)] * tmp[l]
        ev[i] = acc + e1[i]

    # J = sym(A1ᵀ N⁻¹ J2 A1 + J1)
    NJ = _mm(Ninv, J2, dx, dx, dx)
    NJA = _mm(NJ, A1, dx, dx, dx)
    JJ = _mtm(A1, NJA, dx, dx, dx)
    Jout = {}
    for i in range(dx):
        for j in range(i, dx):
            v = 0.5 * (JJ[(i, j)] + JJ[(j, i)] + J1[(i, j)] + J1[(j, i)])
            Jout[(i, j)] = v
            Jout[(j, i)] = v

    return A, bv, Cout, Jout, ev


def _combine_kernel(dx: int,
                    a1_ref, b1_ref, c1_ref, j1_ref, e1_ref,
                    a2_ref, b2_ref, c2_ref, j2_ref, e2_ref,
                    a_ref, b_ref, c_ref, j_ref, e_ref):
    left = (_load(a1_ref, dx, dx), _loadv(b1_ref, dx), _load(c1_ref, dx, dx),
            _load(j1_ref, dx, dx), _loadv(e1_ref, dx))
    right = (_load(a2_ref, dx, dx), _loadv(b2_ref, dx), _load(c2_ref, dx, dx),
             _load(j2_ref, dx, dx), _loadv(e2_ref, dx))
    A, bv, C, J, ev = _combine_lattice(dx, left, right)
    for i in range(dx):
        b_ref[i, :] = bv[i]
        e_ref[i, :] = ev[i]
        for j in range(dx):
            a_ref[i * dx + j, :] = A[(i, j)]
            c_ref[i * dx + j, :] = C[(i, j)]
            j_ref[i * dx + j, :] = J[(i, j)]


# ---------------------------------------------------------------------------
# XLA reference (also the VJP path)
# ---------------------------------------------------------------------------

def _combine_xla(left, right):
    from bayesianfiltering_tpu.ops.associative import _combine

    return _combine(left, right, solver="woodbury")


# ---------------------------------------------------------------------------
# Pallas dispatch over flat (M, ...) banks
# ---------------------------------------------------------------------------

def _combine_pallas(left, right):
    dx = left[0].shape[-1]
    M = left[0].shape[0]

    def prep(x):
        bm = to_bank_major(x if x.ndim == 3 else x[:, :, None])
        return _pad_banks(bm)[0]

    ins = [prep(x) for x in left] + [prep(x) for x in right]
    mp = ins[0].shape[-1]
    dtype = left[0].dtype
    spec = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    mat, vec = spec(dx * dx), spec(dx)
    A, b, C, J, eta = pl.pallas_call(
        functools.partial(_combine_kernel, dx),
        out_shape=[
            jax.ShapeDtypeStruct((dx * dx, mp), dtype),
            jax.ShapeDtypeStruct((dx, mp), dtype),
            jax.ShapeDtypeStruct((dx * dx, mp), dtype),
            jax.ShapeDtypeStruct((dx * dx, mp), dtype),
            jax.ShapeDtypeStruct((dx, mp), dtype),
        ],
        grid=(mp // LANES,),
        in_specs=[mat, vec, mat, mat, vec] * 2,
        out_specs=[mat, vec, mat, mat, vec],
    )(*ins)
    return (
        from_bank_major(A[:, :M], dx, dx),
        from_bank_major(b[:, :M], dx, 1)[:, :, 0],
        from_bank_major(C[:, :M], dx, dx),
        from_bank_major(J[:, :M], dx, dx),
        from_bank_major(eta[:, :M], dx, 1)[:, :, 0],
    )


# ---------------------------------------------------------------------------
# Public entry point: broadcastable batch dims, differentiable via XLA
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bank_combine(left, right, use_pallas):
    if use_pallas:
        return _combine_pallas(left, right)
    return _combine_xla(left, right)


def _fwd(left, right, use_pallas):
    return _bank_combine(left, right, use_pallas), (left, right)


def _bwd(use_pallas, res, cts):
    left, right = res
    _, vjp = jax.vjp(_combine_xla, left, right)
    return vjp(cts)


_bank_combine.defvjp(_fwd, _bwd)


def should_use_pallas(dx: int, *arrays) -> bool:
    from bayesianfiltering_tpu.ops.fused_ekf import _is_vmapped

    return (
        _HAS_PALLAS
        and jax.default_backend() == "tpu"
        and dx <= 8
        and all(a.dtype == jnp.float32 for a in arrays)
        # a vmapped pallas_call serializes per batch element
        and not _is_vmapped(*arrays)
    )


def bank_filter_combine(left, right, use_pallas=None):
    """Associative Kalman-filtering combine over banks of elements.

    ``left``/``right`` are 5-tuples ``(A, b, C, J, η)`` with arbitrary
    broadcastable leading batch axes (matrices batch+(dx,dx), vectors
    batch+(dx,)). Semantics identical to
    ``ops.associative._combine(..., solver="woodbury")``; on TPU with
    dx ≤ 8 the whole combine runs as ONE Pallas kernel over the flattened
    bank.
    """
    dx = left[0].shape[-1]
    if use_pallas is None:
        use_pallas = should_use_pallas(dx, *left, *right)
    if not use_pallas:
        return _combine_xla(left, right)

    batch = jnp.broadcast_shapes(left[0].shape[:-2], right[0].shape[:-2])
    M = 1
    for s in batch:
        M *= s

    def flat(x, ndim_core):
        full = batch + x.shape[x.ndim - ndim_core:]
        return jnp.broadcast_to(x, full).reshape((M,) + full[len(batch):])

    lf = (flat(left[0], 2), flat(left[1], 1), flat(left[2], 2),
          flat(left[3], 2), flat(left[4], 1))
    rf = (flat(right[0], 2), flat(right[1], 1), flat(right[2], 2),
          flat(right[3], 2), flat(right[4], 1))
    A, b, C, J, eta = _bank_combine(lf, rf, True)
    return (
        A.reshape(batch + (dx, dx)),
        b.reshape(batch + (dx,)),
        C.reshape(batch + (dx, dx)),
        J.reshape(batch + (dx, dx)),
        eta.reshape(batch + (dx,)),
    )


__all__ = ["bank_filter_combine", "should_use_pallas"]
