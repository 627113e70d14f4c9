"""Data-parallel filtering over batches of independent sequences.

BASELINE config 5 runs 1k Lorenz-96 sequences; the TPU-native shape for that
is ``vmap`` over the sequence axis jitted under a sharding that lays the
batch across a mesh axis — XLA then runs each device's shard locally with no
collectives (embarrassingly parallel, ICI only for the final gather).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax import vmap
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int], axis_names: Sequence[str],
              devices=None) -> Mesh:
    """Build a :class:`jax.sharding.Mesh` over the available devices."""
    devices = jax.devices() if devices is None else devices
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh of size {n} exceeds {len(devices)} devices")
    grid = np.asarray(devices[:n]).reshape(tuple(axis_sizes))
    return Mesh(grid, tuple(axis_names))


def batched_filter(
    filter_fn: Callable,
    params,
    batch_emissions: jax.Array,
    *filter_args,
    mesh: Optional[Mesh] = None,
    axis_name: str = "batch",
    batch_inputs: Optional[jax.Array] = None,
    **filter_kwargs,
):
    """Run ``filter_fn(params, emissions, *args, inputs=..., **kwargs)`` over
    a leading batch of sequences, sharded across ``mesh[axis_name]``.

    ``batch_emissions`` has shape (B, T, dy); outputs keep the leading B
    axis. Without a mesh this is a plain jitted vmap (single device).
    """

    def single(emissions, inputs):
        return filter_fn(params, emissions, *filter_args, inputs=inputs,
                         **filter_kwargs)

    if batch_inputs is None:
        fn = vmap(lambda e: single(e, None))
        args = (batch_emissions,)
    else:
        fn = vmap(single)
        args = (batch_emissions, batch_inputs)

    if mesh is None:
        return jax.jit(fn)(*args)

    shardings = tuple(
        NamedSharding(mesh, P(axis_name, *([None] * (a.ndim - 1)))) for a in args
    )
    args = tuple(jax.device_put(a, s) for a, s in zip(args, shardings))
    # Output shardings are propagated by XLA from the batch-sharded inputs.
    return jax.jit(fn)(*args)


__all__ = ["make_mesh", "batched_filter"]
