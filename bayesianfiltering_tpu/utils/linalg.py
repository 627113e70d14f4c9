"""Dense linear-algebra primitives shared by all filters.

TPU-first equivalents of the reference numerics:

* ``psd_solve`` — ref: gaussfiltax/utils.py:256-259. The reference does an LU
  solve after adding the scalar ``1e-6`` to *every entry* of ``A`` (not the
  diagonal). We solve via Cholesky (half the FLOPs, PSD-respecting, maps to
  the MXU through batched triangular solves) with an optional diagonal
  jitter; the reference's scalar-add behavior is available as
  ``compat_scalar=True`` for golden-parity experiments.
* ``project_to_psd`` — ref: gaussfiltax/utils.py:89-95 (eigh + clamp).
* ``sqrtm_psd`` — ref: gaussfiltax/utils.py:247-254 uses
  ``scipy.linalg.sqrtm`` (Schur-based, no TPU kernel, returns complex). For
  symmetric PSD input the eigh-based symmetric square root is the same
  matrix, is differentiable, and batches under ``vmap``.
* ``cholesky_guarded`` — Cholesky whose NaN columns (non-PSD input) are
  replaced by zeros, mirroring the NaN-guard semantics of
  ref: gaussfiltax/containers.py:83 at the sampling site.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def symmetrize(a: jax.Array) -> jax.Array:
    """Return the symmetric part ``(A + A^T)/2`` (batched)."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def psd_solve(
    a: jax.Array,
    b: jax.Array,
    jitter: float = 0.0,
    compat_scalar: bool = False,
) -> jax.Array:
    """Solve ``A x = b`` for symmetric PSD ``A`` via Cholesky.

    Args:
        a: (..., n, n) PSD matrix.
        b: (..., n) or (..., n, k) right-hand side.
        jitter: optional multiple of the identity added to ``A`` before
            factorization (numerical safety for near-singular innovation
            covariances).
        compat_scalar: reproduce the reference quirk of adding ``1e-6`` to
            every entry of ``A`` (ref: gaussfiltax/utils.py:258) before an LU
            solve — only for parity experiments.
    """
    if compat_scalar:
        return jnp.linalg.solve(a + 1e-6, b)
    n = a.shape[-1]
    if jitter:
        a = a + jitter * jnp.eye(n, dtype=a.dtype)
    chol = jnp.linalg.cholesky(a)
    vector_rhs = b.ndim == a.ndim - 1
    if vector_rhs:
        b = b[..., None]
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(chol, y, lower=True, trans=1)
    return x[..., 0] if vector_rhs else x


def project_to_psd(delta: jax.Array) -> jax.Array:
    """Project a symmetric matrix onto the PSD cone (eigenvalue clamp).

    Same math as ref: gaussfiltax/utils.py:89-95; we keep the input dtype
    instead of force-casting to float32 and use a broadcasted eigenvector
    scale instead of materializing ``diag(evals)``.
    """
    evals, evecs = jnp.linalg.eigh(symmetrize(delta))
    clamped = jnp.maximum(evals, 0.0)
    projected = (evecs * clamped[..., None, :]) @ jnp.swapaxes(evecs, -1, -2)
    return symmetrize(projected)


def sqrtm_psd(p: jax.Array) -> jax.Array:
    """Symmetric PSD matrix square root via eigendecomposition.

    TPU-native stand-in for ``jnp.real(scipy.linalg.sqrtm(P))``
    (ref: gaussfiltax/utils.py:250): identical for symmetric PSD ``P``,
    batched, differentiable, and free of complex intermediates.
    """
    evals, evecs = jnp.linalg.eigh(symmetrize(p))
    root = jnp.sqrt(jnp.maximum(evals, 0.0))
    return symmetrize((evecs * root[..., None, :]) @ jnp.swapaxes(evecs, -1, -2))


def cholesky_guarded(p: jax.Array) -> jax.Array:
    """Cholesky factor with NaNs (non-PSD input) replaced by zeros.

    Sampling with a zero factor collapses the perturbation to the mean,
    which is exactly the recovery behavior of the reference NaN guard
    ``jnp.where(jnp.isnan(new_means), node.mean, new_means)``
    (ref: gaussfiltax/containers.py:83,133), expressed one level earlier so a
    single guarded factor serves any number of samples.
    """
    chol = jnp.linalg.cholesky(p)
    return jnp.where(jnp.isnan(chol), 0.0, chol)


def sandwich(f: jax.Array, p: jax.Array) -> jax.Array:
    """Congruence transform ``F P F^T`` (batched). The EKF covariance kernel."""
    return jnp.einsum("...ik,...kl,...jl->...ij", f, p, f)


def matrix_projection(a: jax.Array, b: jax.Array) -> jax.Array:
    """Frobenius projection of ``A`` on span(B) (ref: gaussfiltax/utils.py:86-87)."""
    return (jnp.trace(a.T @ b) / jnp.trace(b.T @ b)) * b


__all__ = [
    "symmetrize",
    "psd_solve",
    "project_to_psd",
    "sqrtm_psd",
    "cholesky_guarded",
    "sandwich",
    "matrix_projection",
]
