"""Shared type aliases.

Capability parity with the reference's ``gaussfiltax/types.py`` (ref:
gaussfiltax/types.py:7-9), updated for modern JAX where typed PRNG keys are
plain ``jax.Array`` values.
"""
from typing import Union

import jax

PRNGKey = jax.Array
Scalar = Union[float, jax.Array]

__all__ = ["PRNGKey", "Scalar"]
