"""Windowed parent-index construction for low-variance resampling.

The systematic/stratified resamplers reduce to "invert a monotone
cumulative-count function": output slot j takes parent
``parent(j) = #{i : counts_i ≤ j}`` (utils/resampling._counts_to_parents).
The XLA formulation (scatter-add of ones at the run starts + cumsum) is
row-granular-DMA bound on TPU: **9.05 ms/step at 1M particles inside the
scan** (measured, experiments/profile_bpf.py slope protocol, BENCHLOG
round 5) — by far the largest piece of the bootstrap-PF step, bigger than
the 4.9 ms particle gather it feeds.

This module computes the same parents as a dense windowed COUNT instead:
``counts`` is sorted, so the parents needed by an output tile
``[tB, (t+1)B)`` all lie in a narrow index window of ``counts`` (average
width B — parents advance one-for-one with outputs in aggregate), and

    parent(j) = s_t + Σ_{w<W} [counts[s_t + w] ≤ j]        (s_t ≤ p_lo(t))

One Pallas kernel walks output tiles: DMA the (W/128, 128) counts window
(sequential rows, no per-row DMA), transpose it in-kernel so count values
sit on sublanes, and accumulate the outer ``(128, B)`` compares — pure
VPU work, no scatter.

Window coverage is data-dependent (weight skew widens a tile's parent
span), so the wrapper computes per-tile window starts with a small
searchsorted (n_tiles+1 queries) and falls back to the XLA scatter path
via ``lax.cond`` whenever any tile's span exceeds the static window —
correctness never depends on the weights.

Mosaic layout constraints shaped the design (round-5 measured): DMA
slices must be tile-aligned in BOTH trailing dims — an ``(N, 1)`` int32
array cannot be windowed (lane dim 1 < 128), so the window rides the
SUBLANE dim of an ``(N/128, 128)`` reshape with starts aligned to
8·128 = 1024 elements, and the in-kernel transpose restores the
sublane-major orientation the outer compare needs.

No reference counterpart (ref: gaussfiltax/utils.py:207-214 is a plain
``jr.choice`` multinomial reset); this is TPU speed-of-light work on the
resampling bottleneck identified in rounds 1-3.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from bayesianfiltering_tpu.ops.pallas_kernels import _HAS_PALLAS

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

# Output tile B and counts window W (in elements; W/128 rows per DMA).
# Window starts are aligned DOWN to _ALIGN = 8 sublanes × 128 lanes, so
# the usable slack is W − B − _ALIGN; heavier per-tile parent skew falls
# back to XLA (see module docstring).
_B = 2048
_W = 4096
_ALIGN = 1024
_LANES = 128
# Below this size the scatter path is already cheap and the kernel's
# per-tile overhead isn't worth it.
_MIN_N = 1 << 16


def _parents_kernel(s_ref, counts_hbm, out_ref, cnt_vmem, sem):
    t = pl.program_id(0)
    r0 = s_ref[t] // _LANES                      # window start row (8-aligned)
    copy = pltpu.make_async_copy(
        counts_hbm.at[pl.ds(r0, _W // _LANES), :], cnt_vmem, sem)
    copy.start()
    copy.wait()
    # cnt_vmem[r, l] = counts[s + 128 r + l]; transpose puts the 128
    # values of each row on SUBLANES so they broadcast against the
    # lane-major output index row.
    tc = jnp.swapaxes(cnt_vmem[:, :], 0, 1)      # (128, W/128)
    j = t * _B + lax.broadcasted_iota(jnp.int32, (1, _B), 1)
    acc = jnp.zeros((1, _B), jnp.int32)
    for r in range(_W // _LANES):
        col = tc[:, r:r + 1]                     # (128, 1) count values
        acc = acc + jnp.sum((col <= j).astype(jnp.int32), axis=0,
                            keepdims=True)
    out_ref[:, :] = s_ref[t] + acc


def _parents_pallas(counts_i32, num_samples: int, s_arr, n_tiles: int):
    rows = -(-(num_samples + _W + _ALIGN) // _LANES)
    pad = rows * _LANES - num_samples
    counts_pad = jnp.concatenate([
        counts_i32,
        jnp.full((pad,), num_samples, jnp.int32),
    ]).reshape(rows, _LANES)
    out = pl.pallas_call(
        _parents_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, _B), lambda t, s_ref: (0, t)),
            scratch_shapes=[
                pltpu.VMEM((_W // _LANES, _LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * _B), jnp.int32),
    )(s_arr, counts_pad)
    # Tail-slot backfill parity with the scatter formulation: f32 rounding
    # in ``ceil(n·cdf − u0)`` can leave the final cumulative count at
    # n−1 < n, making the LAST output slot unassigned. The scatter+cumsum
    # path implicitly backfills such slots with parent N−1; the count
    # formula returns N there (one out-of-range index → a NaN row through
    # jnp.take's default fill mode — round-5 BPF NaN at step 7, BENCHLOG).
    return jnp.minimum(out[0, :num_samples], num_samples - 1)


def _parents_xla(counts, num_samples: int):
    from bayesianfiltering_tpu.utils.resampling import (
        _scatter_counts_to_parents,
    )

    return _scatter_counts_to_parents(counts, num_samples)


def windowed_parents_eligible(num_samples: int, *arrays) -> bool:
    from bayesianfiltering_tpu.utils.linalg import _is_vmapped

    return (
        _HAS_PALLAS
        and jax.default_backend() == "tpu"
        and num_samples >= _MIN_N
        and not _is_vmapped(*arrays)
    )


def _dense_window_bounds(counts_i32, num_samples: int, n_tiles: int):
    """Per-tile window starts + coverage flag from ONE dense pass.

    Chunk-max bracketing: ``sub2[m] = max(chunk m) = counts[(m+1)K−1]``
    (counts sorted), so ``p_lo(t) ∈ (r·K, r·K + K]`` with
    ``r = #{m : sub2[m] ≤ tB}``. Dense reduce + a (n_chunks × n_tiles)
    compare — no ``searchsorted``: 20 rounds of dependent sparse gathers
    from the 1M array measured ~3.7 ms/step INSIDE the filter scan
    (BENCHLOG round 5), the dense form is ~µs.
    """
    n = num_samples
    K = _ALIGN
    n_chunks = -(-n // K)
    pad = n_chunks * K - n
    cpad = jnp.concatenate([counts_i32, jnp.full((pad,), n, jnp.int32)])
    sub2 = jnp.max(cpad.reshape(n_chunks, K), axis=1)
    tile_js = (jnp.arange(n_tiles + 1) * _B).astype(jnp.int32)
    r2 = jnp.sum((sub2[:, None] <= tile_js[None, :]).astype(jnp.int32),
                 axis=0)
    s_ext = r2 * K                               # p_lo(t) ∈ (s_ext, s_ext+K]
    s_arr = s_ext[:-1].astype(jnp.int32)
    # coverage: p_hi(t) ≤ p_lo(t+1) ≤ s_ext[t+1] + K must fit the window
    ok = jnp.max(s_ext[1:] + K - s_arr) <= _W
    return s_arr, ok


def windowed_parents_or_defer(counts: jax.Array, num_samples: int):
    """Parents + coverage flag, NO fallback branch: ``(parents, ok)``.

    When ``ok`` is True, ``parents`` equals the scatter formulation
    exactly; when False (per-tile parent span overflowed the static
    window), ``parents`` is the IDENTITY permutation and the caller must
    treat the step as "cannot resample cheaply" — the bootstrap PF defers
    that step's resampling (resampling timing is a free choice for the
    weighted-particle estimator; ESS stays low and triggers again next
    step).

    Why no exact in-graph fallback: measured on v5e (BENCHLOG round 5),
    ANY expensive alternative branch inside the per-step ``lax.cond``
    leaks its cost into EVERY step — the scatter fallback +3.6 ms/step,
    a sort-based one +7 ms/step, both while never taken (XLA hoists
    branch computations whose inputs are available; an
    ``optimization_barrier`` did not stop it). A ``cond`` whose branches
    are both cheap is free — so the deferral flag is the only overflow
    mechanism that keeps the fast path fast.
    """
    n = num_samples
    counts_i32 = jnp.clip(counts, 0, n).astype(jnp.int32)
    n_tiles = -(-n // _B)
    s_arr, ok = _dense_window_bounds(counts_i32, n, n_tiles)
    p = _parents_pallas(counts_i32, n, s_arr, n_tiles)
    return jnp.where(ok, p, jnp.arange(n, dtype=jnp.int32)), ok


def windowed_parents(counts: jax.Array, num_samples: int) -> jax.Array:
    """Parents from cumulative counts: ``parent(j) = #{i : counts_i ≤ j}``.

    Same contract as the scatter formulation in
    ``utils/resampling._counts_to_parents`` (cumulative counts in, one
    parent index per output slot out) — ALWAYS exact: per-call weight
    skew that overflows the static window falls back to the scatter path
    inside a ``lax.cond``. Standalone/utility use only; the bootstrap
    PF's hot loop uses :func:`windowed_parents_or_defer` instead because
    the fallback branch's mere presence costs ~3.6 ms/step in-scan (see
    there).
    """
    n = num_samples
    counts_i32 = jnp.clip(counts, 0, n).astype(jnp.int32)
    n_tiles = -(-n // _B)
    s_arr, ok = _dense_window_bounds(counts_i32, n, n_tiles)

    return lax.cond(
        ok,
        lambda c: _parents_pallas(c, n, s_arr, n_tiles),
        lambda c: _parents_xla(c, n),
        counts_i32,
    )


__all__ = [
    "windowed_parents",
    "windowed_parents_or_defer",
    "windowed_parents_eligible",
]
