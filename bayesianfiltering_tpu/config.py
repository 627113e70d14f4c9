"""Package configuration knobs.

Matmul precision: TPU f32 matmuls default to one-pass bf16 inputs
(~8 mantissa bits). Kalman-type covariance algebra is catastrophically
sensitive to that — e.g. the innovation covariance ``S = R + H P Hᵀ`` with
small ``R`` can come out *negative* under bf16 cancellation, NaN-ing the
Cholesky (observed on the reference's own BOT benchmark, R = 2.5e-5, while
the identical program is NaN-free on CPU). Every filter entry point in this
package therefore traces its math under
``jax.default_matmul_precision(matmul_precision())``.

Default is "highest" (three-pass bf16 ≡ f32-accurate). Override with the
``BFT_MATMUL_PRECISION`` env var (e.g. "default" to accept bf16 speed/risk,
for large-dx throughput experiments).
"""
from __future__ import annotations

import functools
import os

import jax

_ENV_VAR = "BFT_MATMUL_PRECISION"


def matmul_precision() -> str:
    """The package-wide matmul precision name (a valid
    ``jax.default_matmul_precision`` argument)."""
    return os.environ.get(_ENV_VAR, "highest")


def with_matmul_precision(fn):
    """Decorator: trace ``fn`` under the configured matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision(matmul_precision()):
            return fn(*args, **kwargs)

    return wrapper


__all__ = ["matmul_precision", "with_matmul_precision"]
