"""Decompose the chunked parallel KF's wall at T=1M: element construction,
the chunked scan itself, and the loglik/predicted-moment epilogue."""
import time

import jax
import jax.numpy as jnp
import jax.random as jr

from bayesianfiltering_tpu.diagnostics import benchmark
from bayesianfiltering_tpu.ops import associative as A, linear

T = 1_000_000
dx, dy = 4, 2
key = jr.PRNGKey(0)
F = 0.99 * jnp.eye(dx) + 0.01 * jr.normal(key, (dx, dx)) / dx
H = jr.normal(jr.fold_in(key, 1), (dy, dx)) / dx
params = linear.ParamsLGSSM(jnp.zeros(dx), jnp.eye(dx), F, 0.1 * jnp.eye(dx),
                            H, 0.1 * jnp.eye(dy))
ys = jr.normal(jr.fold_in(key, 2), (T, dy))

print("backend:", jax.default_backend())


def elements(y):
    first = A._first_element(params, y[0])
    rest = jax.vmap(lambda yy: A._generic_element(params, yy))(y[1:])
    return tuple(jnp.concatenate([f[None], r], 0) for f, r in zip(first, rest))


def scan_only(es):
    return A.chunked_associative_scan(
        A._combine, es, A._filter_identity(dx, es[0].dtype), chunk=128)


def filt(y):
    return A.parallel_kalman_filter(params, y, chunk=128)


es = jax.jit(elements)(ys)
jax.device_get(es[0].ravel()[0])

for name, fn, arg in (
    ("elements only", elements, ys),
    ("chunked scan only", scan_only, es),
    ("elements+scan+epilogue (full filter)", filt, ys),
):
    r = benchmark(fn, arg, num_runs=3)
    print(f"{name:40s} best {r.best:7.3f} s   first {r.compile_time:6.1f} s",
          flush=True)
