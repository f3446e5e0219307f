"""Headline benchmark: closed-loop policy env-steps/s per chip.

Runs the lockstep rollout engine (policy forward + on-device robot-PC
resampling + FK success predicate per step, mpinets_tpu.rollout.engine) on
a batch of synthetic problems at full reference input shapes (6272-point
clouds, reference PointNet++ architecture) and reports steady-state
env-steps/s on one chip.

Timing is honest under remote-dispatch JAX backends where
``block_until_ready`` can return before device execution finishes: every
measurement forces a device->host transfer of the result, and the reported
rate is the *difference* between a long and a short rollout so that compile,
dispatch, transfer-latency, and point-cloud-assembly overheads cancel out —
only the steady-state per-step cost remains.

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
import numpy as np

BASELINE_PER_CHIP = 100_000 / 8.0


def _run_sync(rollout, params, problem, key) -> float:
    """Run one rollout and force a real device->host sync; returns seconds."""
    t0 = time.perf_counter()
    result = rollout(params, problem, key)
    np.asarray(result.final_q)  # d2h transfer: genuinely blocks
    return time.perf_counter() - t0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--steps-short", type=int, default=10)
    parser.add_argument("--steps-long", type=int, default=60)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    from mpinets_tpu.data.synthetic import random_problem_batch
    from mpinets_tpu.model.policy import MotionPolicyNetwork
    from mpinets_tpu.rollout.engine import make_rollout_fn

    model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    problem = random_problem_batch(jax.random.fold_in(rng, 1), args.batch)
    params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))

    rollouts = {
        n: make_rollout_fn(
            model,
            max_steps=n,
            stop_on_success=False,  # fixed-length: every env steps every time
            record_trajectory=False,
        )
        for n in (args.steps_short, args.steps_long)
    }

    # Warmup / compile both lengths.
    for rollout in rollouts.values():
        _run_sync(rollout, params, problem, jax.random.fold_in(rng, 2))

    best = 0.0
    extra_steps = args.steps_long - args.steps_short
    for r in range(args.repeats):
        key = jax.random.fold_in(rng, 100 + r)
        t_short = _run_sync(rollouts[args.steps_short], params, problem, key)
        t_long = _run_sync(rollouts[args.steps_long], params, problem, key)
        if t_long > t_short:
            best = max(best, args.batch * extra_steps / (t_long - t_short))

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
