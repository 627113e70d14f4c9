"""Markov-switching stochastic-volatility experiment (regime change at T/2).

Rebuild of ref: docs/experiments/adaptive_experiment.py: a linear regime for
t < T/2 switching to multiplicative exp-volatility emissions, comparing
GSF / AGSF / BPF adaptation across the change point.

Usage:  python experiments/adaptive_experiment.py [--seq-length 100] [--n-sim 10]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import jax.random as jr

import bayesianfiltering_tpu.inference as gf
from bayesianfiltering_tpu.models import zoo
from experiments.common import latex_table, print_summary, run_comparison


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-length", type=int, default=100)
    ap.add_argument("--n-sim", type=int, default=10)
    ap.add_argument("--num-components", type=int, default=20)
    ap.add_argument("--bpf-particles", type=int, default=20_000)
    ap.add_argument("--latex", action="store_true")
    args = ap.parse_args()

    model, params, bpf_params = zoo.stochastic_volatility()
    T = args.seq_length
    # regime switch at T/2: off -> on (ref: adaptive_experiment.py:66-69)
    inputs = jnp.array([0] * (T // 2) + [1] * (T - T // 2))
    M = args.num_components

    def sample_fn(key):
        return model.sample(params, key, T, inputs=inputs)

    def point(post):
        return jnp.einsum("mt,mtd->td", post.weights, post.means)

    filters = {
        "GSF": lambda e, k: point(
            gf.gaussian_sum_filter(params, e, M, 1, inputs)
        ),
        "AGSF": lambda e, k: point(
            gf.augmented_gaussian_sum_filter(
                params, e, [M, 2, 2], k, 1, (0.1, 0.1), inputs
            )[0]
        ),
        "AGSF-opt": lambda e, k: point(
            gf.augmented_gaussian_sum_filter_optimal(
                params, e, [M, 2, 2], k, 1, (0.1, 0.1), inputs
            )[0]
        ),
        "BPF": lambda e, k: gf.bootstrap_particle_filter(
            bpf_params, e, args.bpf_particles, k, inputs, store="summary"
        )["means"],
    }

    summary = run_comparison(sample_fn, filters, n_sim=args.n_sim)
    print_summary(summary, f"MSV regime switch @ T/2, T={T}, M={M}")
    if args.latex:
        print(latex_table(summary, caption="Markov-switching stochastic volatility"))


if __name__ == "__main__":
    main()
