"""ICASSP-2023 scalar quadratic-measurement experiment.

Rebuild of ref: docs/notebooks/Experiment_ICASSP_2023.ipynb (BASELINE.md
rows 1-3): the 1-D model f = 0.8x, g = 0.1x² where the sign of x is
unobservable — a bimodal posterior that defeats the EKF and motivates the
AGSF. Compares EKF / GSF / AGSF / BPF over Monte-Carlo repetitions with the
reference's ARMSE + wall-clock table.

Usage:  python experiments/icassp_experiment.py [--seq-length 100] [--n-sim 10]
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
    ap.add_argument("--num-components", type=int, default=10)
    ap.add_argument("--bpf-particles", type=int, default=10_000)
    ap.add_argument("--latex", action="store_true")
    args = ap.parse_args()

    model, params, bpf_params = zoo.quadratic_measurement()
    T = args.seq_length
    M = args.num_components

    def sample_fn(key):
        return model.sample(params, key, T)

    def point(post):
        return jnp.einsum("mt,mtd->td", post.weights, post.means)

    filters = {
        "EKF": lambda e, k: gf.extended_kalman_filter(params, e).filtered_means,
        "GSF": lambda e, k: point(gf.gaussian_sum_filter(params, e, M, 1)),
        "AGSF": lambda e, k: point(
            gf.augmented_gaussian_sum_filter(
                params, e, [M, 3, 3], k, 1, (0.2, 0.2)
            )[0]
        ),
        "BPF": lambda e, k: gf.bootstrap_particle_filter(
            bpf_params, e, args.bpf_particles, k, store="summary"
        )["means"],
    }

    summary = run_comparison(sample_fn, filters, n_sim=args.n_sim)
    print_summary(summary, f"ICASSP quadratic measurement, T={T}, M={M}")
    if args.latex:
        print(latex_table(summary, caption="Quadratic-measurement model"))


if __name__ == "__main__":
    main()
