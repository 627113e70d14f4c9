"""Angular (wrapped) innovation helpers.

Bearing-type observations live on the circle: when the true bearing crosses
the ±π branch cut of ``arctan2`` the raw innovation ``y − ŷ`` jumps by ~2π,
and with the BOT benchmark's tiny bearing noise (R = 2.5e-5, ref:
docs/tests/test_inference.py:49) a single wrapped innovation catapults every
EKF in the bank — the root cause of the plain-GSF divergences on the
reference's BOT benchmark (the reference's own committed BOT notebook run
NaNs the same way, ref: docs/notebooks/BOTExperiment.ipynb cell 7).

The fix is standard target-tracking practice: wrap angular components of
the innovation to (−π, π]. Models opt in by setting
``ParamsNLSSM.emission_residual = angular_residual(angular_dims)``; every
filter update in this package then routes its innovation through it.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def wrap_angle(theta: jax.Array) -> jax.Array:
    """Wrap to (−π, π] (elementwise)."""
    return theta - 2.0 * jnp.pi * jnp.round(theta / (2.0 * jnp.pi))


def angular_residual(angular_dims: Sequence[int]) -> Callable:
    """Residual function wrapping the given emission components.

    Returns ``residual(y, yhat) -> y − yhat`` with components listed in
    ``angular_dims`` wrapped to (−π, π]. Broadcasts over any leading batch
    dimensions (the mixture filters call it on banked ŷ).
    """
    dims = tuple(int(d) for d in angular_dims)

    def residual(y: jax.Array, yhat: jax.Array) -> jax.Array:
        r = jnp.atleast_1d(y) - jnp.atleast_1d(yhat)
        if not dims:
            return r
        mask = jnp.zeros((r.shape[-1],), dtype=bool)
        mask = mask.at[jnp.array(dims)].set(True)
        return jnp.where(mask, wrap_angle(r), r)

    return residual


__all__ = ["wrap_angle", "angular_residual"]
