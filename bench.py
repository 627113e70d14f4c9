"""Headline benchmark: EKF filtering throughput at dx=64.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: timesteps/second of a jitted 10k-step EKF on a dx=64 Lorenz-96 model
(BASELINE.json north star: >100_000 steps/sec on one v5e chip —
``vs_baseline`` is measured/100k). Runs on whatever backend jax selects
(TPU under the driver; CPU works too).
"""
import json
import time

import jax
import jax.numpy as jnp
import jax.random as jr

import bayesianfiltering_tpu.inference as gf
from bayesianfiltering_tpu.models import zoo

STATE_DIM = 64
EMISSION_DIM = 32
NUM_STEPS = 10_000
BASELINE_STEPS_PER_SEC = 100_000.0


def main():
    model, params, _ = zoo.lorenz96(STATE_DIM, EMISSION_DIM)

    # Synthesize emissions on-device (cheap linear obs of a model rollout).
    key = jr.PRNGKey(0)
    sample = jax.jit(
        lambda k: model.sample(params, k, NUM_STEPS)[1]
    )
    emissions = jax.block_until_ready(sample(key))

    filt = jax.jit(
        lambda e: gf.extended_kalman_filter(params, e).filtered_means
    )
    # Compile + warm up.
    jax.block_until_ready(filt(emissions))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(filt(emissions))
        best = min(best, time.perf_counter() - t0)

    steps_per_sec = NUM_STEPS / best
    print(json.dumps({
        "metric": "ekf_dx64_timesteps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
