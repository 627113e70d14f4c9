"""TSP-2023 benchmark: per-filter RMSE + wall-clock table.

Rebuild of the reference's committed TSP-2023 notebook run
(ref: docs/notebooks/Experiment_TSP_2023.ipynb cells 2/6/9): Lorenz-63
dynamics with the weak quadratic emission y = 0.001·xᵀx, Q = 20·I, R = 0.1,
T = 100, Nsim = 100; GSF/UGSF with M = 2, AGSF/UAGSF with [2,2,2] and
opt_args = (0.8, 0.1), ParamsUKF(1,0,0), BPF with 500k particles.

Reference per-sim wall-clock (MacBook Pro CPU, BASELINE.md TSP row):
GSF 0.21-0.42 s, UGSF 0.48-3.0 s, AGSF 2.2-2.4 s, UAGSF 2.8-3.0 s,
BPF 3.8-4.0 s.

Usage: python experiments/tsp_experiment.py [--n-sim 100] [--seq-length 100]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

import bayesianfiltering_tpu.inference as gf
from bayesianfiltering_tpu.models import zoo
from bayesianfiltering_tpu.ops import ParamsUKF
from experiments.common import latex_table, print_summary, run_comparison


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-length", type=int, default=100)
    ap.add_argument("--n-sim", type=int, default=100)
    ap.add_argument("--num-components", type=int, default=2)
    ap.add_argument("--bpf-particles", type=int, default=500_000)
    ap.add_argument("--latex", action="store_true")
    args = ap.parse_args()

    model, params, bpf_params = zoo.tsp_lorenz63()
    inputs = jnp.zeros(args.seq_length)  # "off" schedule (notebook cell 2)
    M = args.num_components
    uparams = ParamsUKF(1.0, 0.0, 0.0)
    opt_args = (0.8, 0.1)

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
                params, e, [M, 2, 2], k, 1, opt_args, inputs
            )[0]
        ),
        "UAGSF": lambda e, k: point(
            gf.unscented_agsf(
                params, uparams, e, [M, 2, 2], k, 1, opt_args, inputs
            )[0]
        ),
        "BPF": lambda e, k: gf.bootstrap_particle_filter(
            bpf_params, e, args.bpf_particles, k, inputs, store="summary"
        )["means"],
    }

    summary = run_comparison(sample_fn, filters, n_sim=args.n_sim)
    print_summary(
        summary,
        f"TSP-2023 Lorenz-63, T={args.seq_length}, M={M}, "
        f"BPF={args.bpf_particles}, n_sim={args.n_sim}",
    )
    if args.latex:
        print(latex_table(summary, caption="TSP-2023 benchmark"))


if __name__ == "__main__":
    main()
