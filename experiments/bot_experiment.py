"""Bearing-only tracking benchmark with maneuvers.

Rebuild of the reference's canonical experiment
(ref: docs/experiments/BOT_Experiment_script.py and
docs/notebooks/BOTExperiment.ipynb, BASELINE.md "BOT tracking" rows):
GSF / UGSF / AGSF / UAGSF / BPF on the maneuvering bearing-only model,
``n_sim`` Monte-Carlo repetitions, bootstrap CIs, LaTeX table.

Usage:  python experiments/bot_experiment.py [--seq-length 100] [--n-sim 10]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import jax.random as jr

import bayesianfiltering_tpu.inference as gf
from bayesianfiltering_tpu.models import zoo
from bayesianfiltering_tpu.ops import ParamsUKF
from experiments.common import latex_table, print_summary, run_comparison


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-length", type=int, default=100)
    ap.add_argument("--n-sim", type=int, default=10)
    ap.add_argument("--num-components", type=int, default=50,
                    help="M for GSF/UGSF and AGSF outer components")
    ap.add_argument("--bpf-particles", type=int, default=50_000)
    ap.add_argument("--latex", action="store_true")
    ap.add_argument("--reduction", choices=["multinomial", "topk", "optimal"],
                    default="topk",
                    help="AGSF mixture reduction; topk avoids the occasional "
                         "catastrophic track loss of multinomial resampling "
                         "at long horizons")
    ap.add_argument("--variant", choices=["bearing", "range-bearing"],
                    default="range-bearing",
                    help="'range-bearing' is the reference's T=500 notebook "
                         "config (observable range, RMSE ~3); 'bearing' the "
                         "test-suite bearing-only config (unobservable "
                         "range, diverges at long horizons)")
    args = ap.parse_args()

    if args.variant == "range-bearing":
        model, params, bpf_params = zoo.range_bearing_tracking()
        inputs = zoo.bot_experiment_inputs(args.seq_length)
    else:
        model, params, bpf_params = zoo.bearings_only_tracking()
        inputs = zoo.bot_maneuver_inputs(args.seq_length)
    M = args.num_components
    uparams = ParamsUKF()

    def sample_fn(key):
        return model.sample(params, key, args.seq_length, inputs=inputs)

    def point(post):
        return jnp.einsum("mt,mtd->td", post.weights, post.means)

    filters = {
        "GSF": lambda e, k: point(
            gf.gaussian_sum_filter(params, e, M, 1, inputs)
        ),
        "UGSF": lambda e, k: point(
            gf.unscented_gaussian_sum_filter(params, uparams, e, M, 1, inputs)
        ),
        "AGSF": lambda e, k: point(
            gf.augmented_gaussian_sum_filter(
                params, e, [M, 2, 2], k, 1, (0.1, 0.1), inputs,
                reduction=args.reduction,
            )[0]
        ),
        "UAGSF": lambda e, k: point(
            gf.unscented_agsf(
                params, uparams, e, [M, 2, 2], k, 1, (0.1, 0.1), inputs
            )[0]
        ),
        "BPF": lambda e, k: gf.bootstrap_particle_filter(
            bpf_params, e, args.bpf_particles, k, inputs, store="summary"
        )["means"],
    }

    summary = run_comparison(sample_fn, filters, n_sim=args.n_sim)
    print_summary(summary, f"BOT tracking, T={args.seq_length}, M={M}, "
                           f"BPF={args.bpf_particles}, n_sim={args.n_sim}")
    if args.latex:
        print(latex_table(summary, caption="Bearing-only tracking"))


if __name__ == "__main__":
    main()
