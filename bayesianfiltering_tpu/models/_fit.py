"""Fitting helpers: batch-dim normalization and a generic optax SGD loop.

The reference's ``fit_em``/``fit_sgd`` call ``ensure_array_has_batch_dim``
and ``run_sgd`` that were never imported from dynamax — a latent NameError
(ref: gaussfiltax/ssm.py:381,459; flagged in SURVEY.md §2.1). These are the
working implementations.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
import optax
from jax import jit, value_and_grad
from jax.tree_util import tree_map

from bayesianfiltering_tpu.types import PRNGKey


def ensure_array_has_batch_dim(tree, instance_shapes):
    """Add a leading batch dimension to ``tree`` if it is a single instance.

    ``instance_shapes`` is a pytree (matching ``tree``) of per-timestep
    shapes, e.g. ``(emission_dim,)``; an array of rank
    ``len(shape) + 1`` is a single (T, ...) sequence and gets a new leading
    axis, rank ``len(shape) + 2`` is already batched.
    """
    if tree is None:
        return None

    def _ensure(arr, shape):
        arr = jnp.asarray(arr)
        target_rank = len(shape) + 2
        if arr.ndim == target_rank:
            return arr
        if arr.ndim == target_rank - 1:
            return arr[None]
        raise ValueError(
            f"array of rank {arr.ndim} does not match instance shape {shape}"
        )

    if instance_shapes is None:
        # Model declares no inputs_shape (input_dim 0): the per-timestep
        # input shape is unknowable here, so pass through unchanged — the
        # caller must supply inputs already batched (B, T, ...).
        return tree
    if isinstance(instance_shapes, tuple) and all(
        isinstance(s, int) for s in instance_shapes
    ):
        return _ensure(tree, instance_shapes)
    return tree_map(_ensure, tree, instance_shapes)


def sample_minibatches(key: PRNGKey, dataset, batch_size: int, shuffle: bool):
    """Yield minibatches (pytrees sliced along axis 0)."""
    n = len(jax.tree_util.tree_leaves(dataset)[0])
    perm = jr.permutation(key, n) if shuffle else jnp.arange(n)
    for start in range(0, n, batch_size):
        idx = perm[start : start + batch_size]
        yield tree_map(lambda x: x[idx], dataset)


def _is_none(x):
    return x is None


def partition_static(tree):
    """Split a params pytree into (arrays, statics): function-valued leaves
    (e.g. ``ParamsNLSSM.dynamics_function``) become static closures so the
    remainder can flow through jit/optax. ``None`` marks the other kind's
    slot in each tree."""
    arrays = tree_map(lambda x: None if callable(x) else x, tree)
    statics = tree_map(lambda x: x if callable(x) else None, tree)
    return arrays, statics


def combine_static(arrays, statics):
    """Inverse of :func:`partition_static`."""
    return tree_map(
        lambda a, s: s if a is None else a, arrays, statics, is_leaf=_is_none
    )


def run_sgd(
    loss_fn: Callable,
    params,
    dataset,
    optimizer: optax.GradientTransformation = optax.adam(1e-3),
    batch_size: int = 1,
    num_epochs: int = 50,
    shuffle: bool = False,
    key: PRNGKey = None,
) -> Tuple[object, jax.Array]:
    """Minibatch SGD over ``dataset`` pytrees (leading axis = sequences).

    ``loss_fn(params, minibatch)`` must return a scalar. Function-valued
    leaves in ``params`` (the model's f/h callables) are held static; only
    array leaves are optimized. Returns the final params and the per-epoch
    mean loss trace.
    """
    if key is None:
        key = jr.PRNGKey(0)
    arrays, statics = partition_static(params)
    opt_state = optimizer.init(arrays)

    def array_loss(arrays, minibatch):
        return loss_fn(combine_static(arrays, statics), minibatch)

    @jit
    def train_step(carry, minibatch):
        arrays, opt_state = carry
        loss, grads = value_and_grad(array_loss)(arrays, minibatch)
        updates, opt_state = optimizer.update(grads, opt_state, arrays)
        arrays = optax.apply_updates(arrays, updates)
        return (arrays, opt_state), loss

    losses = []
    carry = (arrays, opt_state)
    for _ in range(num_epochs):
        key, subkey = jr.split(key)
        epoch_losses = []
        for minibatch in sample_minibatches(subkey, dataset, batch_size, shuffle):
            carry, loss = train_step(carry, minibatch)
            epoch_losses.append(loss)
        losses.append(jnp.mean(jnp.stack(epoch_losses)))
    arrays, _ = carry
    return combine_static(arrays, statics), jnp.stack(losses)


__all__ = [
    "ensure_array_has_batch_dim",
    "sample_minibatches",
    "run_sgd",
    "partition_static",
    "combine_static",
]
