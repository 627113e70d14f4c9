"""Bank-major layout helpers shared by the Pallas TPU kernels.

The AGSF/GSF hot ops are banks of M small-matrix products (M up to tens of
thousands of components, dx typically 1-16; SURVEY.md §3.3). XLA executes a
(M, d, d) batched matmul as M tiny MXU ops — each far below the 128×128
systolic tile, so utilization is ~(d/128)². The production kernels
(:mod:`~bayesianfiltering_tpu.ops.bank_update`) flip the layout: the BANK
index M lies along the 128-wide lane dimension and the d² matrix entries
along sublanes, turning the whole bank into d³ VPU multiply-accumulates
that are M-wide each (full lane utilization for M ≥ 128).

Layout convention: "bank-major" = ``(d*e, M)`` (entries × lanes). Helpers
``to_bank_major`` / ``from_bank_major`` convert from the filters' standard
``(M, d, e)``; ``_pad_banks`` pads the lane axis to a multiple of 128.

History: this module once also carried standalone demo kernels
(``bank_matmul`` / ``bank_sandwich`` / ``bank_cholesky``). They never won a
production call site — the fused bank kernels in ``bank_update.py`` and the
single-stream kernels in ``fused_ekf.py`` subsume them — so they were
deleted (round 3); only the layout helpers every production kernel uses
remain.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only at runtime but importable everywhere
    from jax.experimental import pallas as pl  # noqa: F401

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


__all__ = [
    "LANES",
    "to_bank_major",
    "from_bank_major",
]
