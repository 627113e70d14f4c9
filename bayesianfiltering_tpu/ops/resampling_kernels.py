"""Pallas TPU kernel for the particle-resampling gather.

The 1M-particle BPF step is dominated by resampling data movement: building
parent indices via scatter-add (~7 ms) plus the (N, dx) row gather (~5 ms)
run ~100× below HBM bandwidth through XLA's TPU gather/scatter lowering
(BENCHLOG.md). This kernel exploits the *sortedness* of systematic
resampling: with cumulative child counts ``c_i`` (non-decreasing,
``c_{N-1} = N``), output slot j belongs to the unique particle i with
``c_{i-1} ≤ j < c_i`` — so consecutive output slots draw from a narrow,
monotonically advancing window of source particles.

Layout: particles travel BANK-MAJOR ``(dx, N)`` so windows slice the
128-tiled lane dimension (window starts are rounded down to lane tiles).
Per output tile of ``TILE`` slots the kernel:
  1. DMAs the source window ``p[:, lo:lo+W]`` plus the two count windows
     ``c_{i-1}`` / ``c_i`` (pre-shifted arrays — no in-kernel offset slicing);
  2. builds the transposed one-hot selection
     ``Sᵀ[w, r] = (c_{lo+w-1} ≤ j_r < c_{lo+w})`` from broadcasted compares;
  3. materializes the gathered bank as ``window @ Sᵀ`` on the MXU
     (exact: one-hot columns, f32 HIGHEST accumulation).

No gather/scatter instructions — DMAs and matmuls only. A window of ``W``
source particles covers a tile whenever fewer than ``W − TILE − 128``
zero-count particles interleave its parents; the wrapper checks this with a
cheap searchsorted over tile boundaries and falls back to the XLA path via
``lax.cond`` otherwise (pathological weight collapse).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

TILE = 1024       # output slots per grid step
WINDOW = 4096     # source particles DMA'd per grid step
_ALIGN = 1024     # window starts aligned to the coarsest (int32 1-D) tiling
_CHUNK = 256      # matmul column-chunk (bounds the (WINDOW, chunk) one-hot)


def _resample_gather_kernel(dx: int, tile_los, pt_hbm, clo_hbm, chi_hbm,
                            out_ref):
    def body(pwin, clo, chi, sem_p, sem_lo, sem_hi):
        t = pl.program_id(0)
        lo = pl.multiple_of(tile_los[t], _ALIGN)

        copy_p = pltpu.make_async_copy(
            pt_hbm.at[:, pl.ds(lo, WINDOW)], pwin, sem_p
        )
        copy_lo = pltpu.make_async_copy(
            clo_hbm.at[pl.ds(lo, WINDOW)], clo, sem_lo
        )
        copy_hi = pltpu.make_async_copy(
            chi_hbm.at[pl.ds(lo, WINDOW)], chi, sem_hi
        )
        copy_p.start()
        copy_lo.start()
        copy_hi.start()
        copy_p.wait()
        copy_lo.wait()
        copy_hi.wait()

        base = t * TILE
        c_lo = clo[:]
        c_hi = chi[:]
        for chunk in range(TILE // _CHUNK):
            j = (
                base
                + chunk * _CHUNK
                + jax.lax.broadcasted_iota(jnp.int32, (WINDOW, _CHUNK), 1)
            )
            sel_t = jnp.logical_and(c_lo[:, None] <= j, j < c_hi[:, None])
            out_ref[:, chunk * _CHUNK : (chunk + 1) * _CHUNK] = (
                jax.lax.dot_general(
                    pwin[:],
                    sel_t.astype(jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
            )

    pl.run_scoped(
        body,
        pwin=pltpu.VMEM((dx, WINDOW), jnp.float32),
        clo=pltpu.VMEM((WINDOW,), jnp.int32),
        chi=pltpu.VMEM((WINDOW,), jnp.int32),
        sem_p=pltpu.SemaphoreType.DMA(()),
        sem_lo=pltpu.SemaphoreType.DMA(()),
        sem_hi=pltpu.SemaphoreType.DMA(()),
    )


def _pallas_resample_gather(particles_t, counts):
    """particles_t: (dx, N) bank-major; counts: (N,) int32 cumulative."""
    dx, n = particles_t.shape
    n_tiles = n // TILE
    tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * TILE
    los = jnp.searchsorted(counts, tile_starts, side="right").astype(jnp.int32)
    los = (los // _ALIGN) * _ALIGN            # memref tiling alignment
    los = jnp.minimum(los, n - WINDOW)

    # c_{i-1} (shifted) and c_i windows, padded past N with sentinel N so the
    # slack lanes never select.
    pad = jnp.full((WINDOW,), n, counts.dtype)
    c_hi_arr = jnp.concatenate([counts, pad])
    c_lo_arr = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), counts[:-1], pad]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (dx, TILE), lambda t, los_ref: (0, t), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_resample_gather_kernel, dx),
        out_shape=jax.ShapeDtypeStruct((dx, n), jnp.float32),
        grid_spec=grid_spec,
    )(los, particles_t, c_lo_arr, c_hi_arr)


def _xla_resample_gather(particles, counts):
    from bayesianfiltering_tpu.utils.resampling import _counts_to_parents

    parents = _counts_to_parents(counts, particles.shape[0])
    return jnp.take(particles, parents, axis=0)


def systematic_resample_gather(key, weights, particles,
                               use_pallas: bool = None) -> jax.Array:
    """Systematic resampling fused with the particle gather.

    Equivalent to ``jnp.take(particles, systematic_resample(key, weights, N),
    axis=0)`` but routed through the windowed MXU gather kernel on TPU when
    shapes allow and the parent windows fit (``lax.cond`` falls back to the
    XLA path otherwise).
    """
    n, dx = particles.shape
    u0 = jax.random.uniform(key, (), dtype=weights.dtype)
    cdf = jnp.cumsum(weights)
    cdf = cdf / cdf[-1]
    counts = jnp.clip(jnp.ceil(n * cdf - u0), 0, n).astype(jnp.int32)
    # XLA's parallel f32 cumsum is NOT monotone (re-association rounding can
    # dip partial sums by an ulp), which breaks the straddle's
    # exactly-one-selector invariant — enforce monotonicity.
    counts = jax.lax.cummax(counts)

    if use_pallas is None:
        use_pallas = (
            _HAS_PALLAS
            and jax.default_backend() == "tpu"
            and n % TILE == 0
            and n >= 4 * WINDOW
            and dx <= 256
        )
    if not use_pallas:
        return _xla_resample_gather(particles, counts)

    # window validity: a tile's parents (plus the <_ALIGN alignment slack)
    # must span < WINDOW source rows
    n_tiles = n // TILE
    starts = jnp.arange(n_tiles, dtype=jnp.int32) * TILE
    ends = starts + (TILE - 1)
    lo = jnp.searchsorted(counts, starts, side="right")
    hi = jnp.searchsorted(counts, ends, side="right")
    valid = jnp.all(hi - lo < WINDOW - _ALIGN - 1)

    def pallas_path(args):
        p, c = args
        return jnp.transpose(_pallas_resample_gather(jnp.transpose(p), c))

    return lax.cond(
        valid,
        pallas_path,
        lambda args: _xla_resample_gather(*args),
        (particles, counts),
    )


__all__ = ["systematic_resample_gather"]
