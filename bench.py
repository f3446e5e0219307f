"""Headline benchmark: closed-loop policy env-steps/s per chip.

Runs the lockstep rollout engine (policy forward + on-device robot-PC
resampling + FK success predicate per step, mpinets_tpu.rollout.engine) on
a batch of synthetic problems at full reference input shapes (6272-point
clouds, reference PointNet++ architecture) and reports steady-state
env-steps/s on one chip.

Prints ONE JSON line:
  {"metric": "env_steps_per_s_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N}

``vs_baseline`` is value / 12_500 -- the per-chip share of the BASELINE.json
target (>=100k env-steps/s per v5e host = 8 chips).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

BASELINE_PER_CHIP = 100_000 / 8.0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    from mpinets_tpu.data.synthetic import random_problem_batch
    from mpinets_tpu.model.policy import MotionPolicyNetwork
    from mpinets_tpu.rollout.engine import make_rollout_fn

    model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    problem = random_problem_batch(jax.random.fold_in(rng, 1), args.batch)
    params = model.init(
        rng,
        jnp.zeros((1, 6272, 4)),
        jnp.zeros((1, 7)),
    )

    rollout = make_rollout_fn(
        model,
        max_steps=args.steps,
        stop_on_success=False,       # fixed-length: every env steps every time
        record_trajectory=False,
    )

    # Warmup / compile.
    result = rollout(params, problem, jax.random.fold_in(rng, 2))
    jax.block_until_ready(result)

    best = 0.0
    for r in range(args.repeats):
        key = jax.random.fold_in(rng, 100 + r)
        t0 = time.perf_counter()
        result = rollout(params, problem, key)
        jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        best = max(best, args.batch * args.steps / dt)

    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_per_chip",
                "value": round(best, 1),
                "unit": "steps/s",
                "vs_baseline": round(best / BASELINE_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
