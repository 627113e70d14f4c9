"""Experiment A: the scalar sin(10x)/quadratic 5-filter comparison.

Rebuild of ref: docs/notebooks/Experiment A.ipynb (BASELINE.md rows 17-18):
the 1-D model f = sin(10x) + q, g = x·x + r (mu0 = 0, Sigma0 = Q = R = 1,
T = 100, zero inputs) with the notebook's 5-filter table —

    GSF (M=5) / U-GSF (M=3) / AGSF [3,2,2] / U-AGSF [3,2,2] / BPF (100)

using the notebook's configs verbatim: ParamsUKF(1, 0, 0), opt_args =
(0.8, 1.0), Nsim = 100. Reference numbers (MacBook CPU, notebook cell 9):
RMSE 3.93±1.76 / 1.31±0.13 / 1.48±0.15 / 1.41±0.16 / 1.34±0.15; time
0.14 / 0.39 / 2.37 / 2.85 / 0.36 s.

Reproduction note (round 4): the committed reference algorithm does NOT
reproduce its own notebook's AGSF row. The committed splitting covariance
is Δ = opt_args[0]·P (ref inference.py:510), which measures 3.3-3.8 RMSE
here — verified with a float64 NumPy replica of the reference's exact step
(3.36 on identical data). The notebook's published 1.48±0.15 matches the
*commented-out* adaptive splitting branch (ref inference.py:512-517,
utils.sdp_opt): with ``--autocov trace`` (our closed-form trace variant of
that branch) this driver measures 1.48. Both configs are first-class here;
the default stays faithful to the committed reference code.

Usage:  python experiments/expa_experiment.py [--n-sim 100]
        [--autocov prop|trace|sdp|eye]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

import bayesianfiltering_tpu.inference as gf
from bayesianfiltering_tpu.inference import ParamsUKF
from bayesianfiltering_tpu.models import zoo
from experiments.common import latex_table, print_summary, run_comparison


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-length", type=int, default=100)
    ap.add_argument("--n-sim", type=int, default=100)
    ap.add_argument("--bpf-particles", type=int, default=100)
    ap.add_argument("--autocov", default="prop",
                    choices=["prop", "eye", "sdp", "trace"],
                    help="splitting-covariance strategy for the A(U)GSF "
                         "rows; 'prop' = the committed reference code, "
                         "'trace' reproduces the notebook's published "
                         "table (see module docstring)")
    ap.add_argument("--latex", action="store_true")
    args = ap.parse_args()

    model, params, bpf_params = zoo.sine_quadratic()
    T = args.seq_length
    uparams = ParamsUKF(1.0, 0.0, 0.0)  # notebook cell 6: ParamsUKF(1,0,0)

    def sample_fn(key):
        return model.sample(params, key, T)

    def point(post):
        return jnp.einsum("mt,mtd->td", post.weights, post.means)

    filters = {
        "GSF": lambda e, k: point(gf.gaussian_sum_filter(params, e, 5, 1)),
        "U-GSF": lambda e, k: point(
            gf.unscented_gaussian_sum_filter(params, uparams, e, 3, 1)),
        "AGSF": lambda e, k: point(
            gf.augmented_gaussian_sum_filter(
                params, e, [3, 2, 2], k, 1, (0.8, 1.0),
                autocov=args.autocov)[0]),
        "U-AGSF": lambda e, k: point(
            gf.unscented_agsf(
                params, uparams, e, [3, 2, 2], k, 1, (0.8, 1.0),
                autocov=args.autocov)[0]),
        "BPF": lambda e, k: gf.bootstrap_particle_filter(
            bpf_params, e, args.bpf_particles, k, store="summary")["means"],
    }

    summary = run_comparison(sample_fn, filters, n_sim=args.n_sim)
    print_summary(summary, f"Experiment A (sin(10x) / x^2), T={T}, "
                           f"Nsim={args.n_sim}")
    if args.latex:
        print(latex_table(summary, caption="Experiment A"))


if __name__ == "__main__":
    main()
