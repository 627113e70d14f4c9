"""Legacy (v0 API) demo drivers: particle-filter and Gaussian-filtering
tables.

Rebuild of the two remaining reference demo scripts over the rebuilt
legacy API (VERDICT round-2 missing #2):

* ``--table particlefilt`` — ref: docs/experiments/exp_particlefilt.py:1-43:
  scalar model f = sin(x), g = x² (Q=4, R=1, P0=10) filtered by the legacy
  :class:`~bayesianfiltering_tpu.legacy.particlefilt.BootstrapPF`.
* ``--table gaussfilt`` — ref: docs/experiments/exp_gaussian_filtering.py
  (whose committed form is broken: an ``import import`` typo at :1 and a
  dx=10 re-definition under which its dx=2 dynamics cannot run; this driver
  keeps the script's *live* dx=2 sinusoid model f = [x₀+sin(x₁), 0.9·x₀],
  g = Hx/ΣH and runs the full commented-out filter roster — MCF / EKF /
  MCLAF / UKF — plus the script's final GaussSumFilt(EKF, 10) bank).

Each table prints per-filter RMSE vs the simulated truth and steady-state
wall-clock (jitted + block_until_ready, unlike the reference's eager
NumPy loops). Runs in well under a minute on CPU.

Usage:  python experiments/legacy_experiment.py [--table both]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# --cpu must take effect BEFORE the package imports below: they build jnp
# constants at import time, which initializes the backend (axon TPU in this
# environment), after which jax_platforms updates are ignored.
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import jax.random as jr

from bayesianfiltering_tpu.legacy import gaussfilt as lgf
from bayesianfiltering_tpu.legacy.particlefilt import BootstrapPF
from bayesianfiltering_tpu.utils import rmse


def _time(fn):
    """Steady-state wall-clock of a zero-arg filter closure, jitted.

    The legacy OO ``run`` methods trace a fresh ``lax.scan`` per call —
    harmless once under ``jax.jit`` (compile once at warm-up), but ~30 s
    of retracing per call eagerly for MCLAF's SDP-in-scan body."""
    def _force(o):
        # Fetch-synced (axon async compile; BENCHLOG.md round 3).
        leaf = jax.tree_util.tree_leaves(o)[0]
        jax.device_get(jnp.ravel(leaf)[0])
        return o

    jfn = jax.jit(fn)
    out = _force(jfn())
    t0 = time.perf_counter()
    out = _force(jfn())
    return out, time.perf_counter() - t0


def particlefilt_table(seq_length: int = 100, num_prt: int = 1000):
    """BPF on the scalar sin/x² model (ref: exp_particlefilt.py:11-36)."""
    dx = dy = 1
    m0 = 0.1 * jnp.ones(dx)
    P0 = 10.0 * jnp.eye(dx)
    ssm = lgf.SSM(dx, dy, c=jnp.zeros(dx), Q=4.0 * jnp.eye(dx),
                  d=jnp.zeros(dy), R=1.0 * jnp.eye(dy),
                  f=lambda x: jnp.sin(x), g=lambda x: x ** 2)
    xs, ys = ssm.simulate(seq_length, m0, key=jr.PRNGKey(1))

    print(f"\n== exp_particlefilt: scalar f=sin(x), g=x^2, T={seq_length} ==")
    print(f"{'filter':<22} {'RMSE':>8} {'time':>9}")
    for n in (10, num_prt):
        bpf = BootstrapPF(ssm, n, key=jr.PRNGKey(2))
        hist, dt = _time(lambda: bpf.run(ys, m0, P0))
        est = jnp.mean(hist, axis=1)  # (T, dx) particle mean
        print(f"{f'BPF (N={n})':<22} {float(rmse(est, xs)):8.3f} "
              f"{dt * 1e3:7.1f}ms")


def gaussfilt_table(seq_length: int = 100, num_particles: int = 10):
    """Legacy Gaussian-filter roster on the dx=2 sinusoid model
    (ref: exp_gaussian_filtering.py:20-23, :79-100, :135-138)."""
    dx, dy = 2, 1
    m0 = jnp.zeros(dx)
    P0 = jnp.eye(dx)
    H = jr.uniform(jr.PRNGKey(7), (dy, dx))
    f = lambda x: jnp.array([x[0] + jnp.sin(x[1]), 0.9 * x[0]])
    g = lambda x: (H @ x) / jnp.sum(H)
    ssm = lgf.SSM(dx, dy, c=jnp.zeros(dx), Q=1.0 * jnp.eye(dx),
                  d=jnp.zeros(dy), R=0.1 * jnp.eye(dy), f=f, g=g)
    xs, ys = ssm.simulate(seq_length, m0, key=jr.PRNGKey(15))

    filters = {
        "MCF": lgf.MCF(ssm, num_particles, key=jr.PRNGKey(3)),
        "EKF (order=1)": lgf.EKF(ssm, order=1),
        "EKF (order=2)": lgf.EKF(ssm, order=2),
        "UKF": lgf.UKF(ssm, alpha=1.0, beta=2.0, kappa=0.0),
        "MCLAF": lgf.MCLAF(ssm, num_particles, key=jr.PRNGKey(4)),
    }
    print(f"\n== exp_gaussian_filtering: dx=2 sinusoid, T={seq_length} ==")
    print(f"{'filter':<22} {'RMSE':>8} {'time':>9}")
    for name, filt in filters.items():
        (ll, means, covs), dt = _time(lambda filt=filt: filt.run(ys, m0, P0))
        print(f"{name:<22} {float(rmse(means, xs)):8.3f} {dt * 1e3:7.1f}ms")

    gsf = lgf.GaussSumFilt(lgf.EKF(ssm, order=1), 10)
    (_, _, _, point), dt = _time(lambda: gsf.run(ys, m0, P0))
    print(f"{'GaussSumFilt(EKF,10)':<22} {float(rmse(point, xs)):8.3f} "
          f"{dt * 1e3:7.1f}ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", choices=["particlefilt", "gaussfilt", "both"],
                    default="both")
    ap.add_argument("--seq-length", type=int, default=100)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled at import time — "
                         "these demos are tiny; the env's sitecustomize "
                         "ignores JAX_PLATFORMS)")
    args = ap.parse_args()
    if args.table in ("particlefilt", "both"):
        particlefilt_table(args.seq_length)
    if args.table in ("gaussfilt", "both"):
        gaussfilt_table(args.seq_length)


if __name__ == "__main__":
    main()
