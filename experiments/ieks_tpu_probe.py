"""Bisect the TPU-only damped-IEKS non-finiteness at stiff R (task r5.5).

EXPERIMENTS.md (round 4): on the TPU backend the damped (γ=0.7) IEKS
returns non-finite RMSE on EVERY seed at BOT T=100 (R = 2.5e-5), while
the same config is clean on CPU and the LM/IPLS variants mostly survive.
This probe runs ONE seed with per-iteration diagnostics across a config
grid (damping × recenter × solver) so the failing ingredient is isolated
on hardware rather than guessed.

Usage: python experiments/ieks_tpu_probe.py [--backend cpu] [--T 100]
       [--num-iter 8] [--seed 0]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="")
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--num-iter", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import jax.numpy as jnp
    import jax.random as jr
    import numpy as np

    import bayesianfiltering_tpu.inference as gf
    from bayesianfiltering_tpu.models import zoo
    from bayesianfiltering_tpu.ops.parallel_iterated import (
        parallel_iterated_extended_smoother,
    )

    print(f"backend={jax.default_backend()}  T={args.T}  "
          f"num_iter={args.num_iter}  seed={args.seed}")

    model, params, _ = zoo.range_bearing_tracking()
    inputs = zoo.bot_experiment_inputs(args.T)
    states, emissions = model.sample(params, jr.PRNGKey(args.seed), args.T,
                                     inputs=inputs)
    states = np.asarray(states)

    # reference: the sequential ERTS (known-good on both backends)
    erts = gf.extended_rts_smoother(params, emissions, inputs=inputs)
    r = np.asarray(erts.smoothed_means) - states
    print(f"ERTS rmse {np.sqrt((r ** 2).mean()):.5f}  "
          f"finite {np.isfinite(r).all()}")

    grid = [
        dict(damping=0.7, recenter=True),
        dict(damping=0.7, recenter=False),
        dict(damping=1.0, recenter=True),
        dict(damping=1.0, recenter=False),
        dict(damping=0.7, recenter=True, solver="reference"),
    ]
    for cfg in grid:
        solver = cfg.pop("solver", "woodbury")
        run = jax.jit(lambda e, d=cfg["damping"], rc=cfg["recenter"],
                      sv=solver: parallel_iterated_extended_smoother(
            params, e, num_iter=args.num_iter, inputs=inputs,
            nominal="filter", damping=d, recenter=rc, solver=sv))
        try:
            post, aux = run(emissions)
            sm = np.asarray(post.smoothed_means)
            norms = np.asarray(aux.step_norms)
            rm = np.sqrt(((sm - states) ** 2).mean())
            print(f"damping={cfg['damping']} recenter={cfg['recenter']} "
                  f"solver={solver}: rmse {rm:.5f} "
                  f"finite(means)={np.isfinite(sm).all()} "
                  f"ll={float(post.marginal_loglik):.2f}")
            print(f"    step_norms: "
                  + " ".join(f"{x:.3g}" for x in norms))
        except Exception as e:
            print(f"damping={cfg['damping']} recenter={cfg['recenter']} "
                  f"solver={solver}: RAISED {str(e)[:160]}")

    # iteration bisect on the canonical failing config: where does the
    # first non-finite appear?
    print("--- iteration sweep (damping=0.7, recenter=True) ---")
    for ni in range(0, args.num_iter + 1):
        run = jax.jit(lambda e, n=ni: parallel_iterated_extended_smoother(
            params, e, num_iter=n, inputs=inputs, nominal="filter",
            damping=0.7))
        post, aux = run(emissions)
        sm = np.asarray(post.smoothed_means)
        rm = np.sqrt(((sm - states) ** 2).mean())
        print(f"  num_iter={ni}: finite={np.isfinite(sm).all()} "
              f"rmse={rm:.5f} "
              f"last_norm={float(np.asarray(aux.step_norms)[-1]) if ni else 0:.3g}",
              flush=True)


if __name__ == "__main__":
    main()
