"""Batched factorization crossover: column-vectorized vs blocked vs native.

Round 3 introduced the column-vectorized `_chol_cols`/`_tri_inv_cols` for
batched n in (4, 128] on a (512, 32, 32) measurement (6.1× vs the blocked
lattice recursion). The batched UKF factorizes (512, 64, 64) sigma-point
covariances twice per step; its round-5 re-measure came out ~2.5× below
the round-2 number, so verify the dispatch choice is actually right at
n=64 (VERDICT r4 weak #3 / task 3).

Chained-scan slope protocol: per-step cost of chol+tri_inv at
(B, n, n) for each implementation, n in {32, 64, 128}.

Usage: python experiments/chol_crossover.py [--B 512]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from bayesianfiltering_tpu.utils import linalg as la


def _wall(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def _chain(impl, K):
    """K chained chol+tri_inv steps: Li feeds the next S so nothing DCEs."""

    def step(S, _):
        if impl == "cols":
            L = la._chol_cols(S)
            Li = la._tri_inv_cols(L)
        elif impl == "fused_blocked":
            L, Li = la.chol_and_inv_lower(S, force_blocked=True)
        elif impl == "native":
            L = jnp.linalg.cholesky(S)
            eye = jnp.broadcast_to(jnp.eye(S.shape[-1], dtype=S.dtype),
                                   S.shape)
            Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        else:
            raise ValueError(impl)
        # rebuild a PSD matrix from Li so the chain depends on both outputs
        S2 = jnp.einsum("...ji,...jk->...ik", Li, Li)
        n = S.shape[-1]
        S2 = S2 / (jnp.trace(S2, axis1=-2, axis2=-1)[..., None, None] / n)
        S2 = 0.5 * (S2 + jnp.swapaxes(S2, -1, -2)) + 0.1 * jnp.eye(
            n, dtype=S.dtype)
        return S2, L[..., 0, 0]

    @jax.jit
    def run(S):
        return jax.lax.scan(step, S, jnp.arange(K))[1]

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--K1", type=int, default=50)
    ap.add_argument("--K2", type=int, default=200)
    ap.add_argument("--ns", default="32,64,128")
    ap.add_argument("--impls", default="cols,fused_blocked,native")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}  B={args.B}  "
          f"K1={args.K1} K2={args.K2}")

    for n in [int(x) for x in args.ns.split(",")]:
        key = jr.PRNGKey(n)
        a = jr.normal(key, (args.B, n, n))
        S = jnp.einsum("bik,bjk->bij", a, a) / n + jnp.eye(n)
        for impl in args.impls.split(","):
            try:
                w1 = _wall(_chain(impl, args.K1), S)
                w2 = _wall(_chain(impl, args.K2), S)
                sl = (w2 - w1) / (args.K2 - args.K1)
                print(f"n={n:4d} {impl:14s} {sl * 1e6:10.1f} µs/step  "
                      f"(walls {w1:6.3f} / {w2:6.3f} s)", flush=True)
            except Exception as e:
                print(f"n={n:4d} {impl:14s} FAILED: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
