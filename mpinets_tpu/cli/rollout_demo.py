"""Rollout demo / smoke driver: one batched lockstep rollout, end to end.

``python -m mpinets_tpu.cli.rollout_demo [--batch 16] [--steps 20]
[--fused] [--checkpoint PATH]``

Builds a batch of synthetic problems, runs the closed-loop rollout engine
(optionally with the fused-Pallas forward and a real checkpoint), and prints
success/step statistics. This is the quickest way to see the whole stack
execute on the current backend (CPU or TPU).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--fused", action="store_true",
                    help="use the Pallas fused forward (TPU)")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args(argv)

    from mpinets_tpu.data.synthetic import random_problem_batch
    from mpinets_tpu.model.policy import MotionPolicyNetwork
    from mpinets_tpu.rollout.engine import make_rollout_fn

    model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    if args.checkpoint:
        from mpinets_tpu.cli.infer import load_params

        params = load_params(args.checkpoint, model)
    else:
        params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))

    apply_fn = None
    if args.fused:
        from mpinets_tpu.model.fused import make_fused_apply

        apply_fn = make_fused_apply(jnp.bfloat16)

    problems = random_problem_batch(jax.random.fold_in(rng, 1), args.batch)
    rollout = make_rollout_fn(model, max_steps=args.steps, apply_fn=apply_fn)

    t0 = time.perf_counter()
    result = jax.block_until_ready(rollout(params, problems, rng))
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    result = jax.block_until_ready(
        rollout(params, problems, jax.random.fold_in(rng, 2))
    )
    steady = time.perf_counter() - t0

    steps = np.asarray(result.num_steps)
    print(f"batch {args.batch} x {args.steps} steps")
    print(f"compile+run {compile_and_run:.1f}s, steady {steady:.3f}s "
          f"({args.batch * args.steps / steady:,.0f} env-steps/s)")
    print(f"success {int(np.asarray(result.success).sum())}/{args.batch}, "
          f"steps min/med/max {steps.min()}/{int(np.median(steps))}/{steps.max()}")
    print(f"final_q finite: {bool(np.isfinite(np.asarray(result.final_q)).all())}")


if __name__ == "__main__":
    main()
