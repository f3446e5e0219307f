"""Headline benchmark: closed-loop policy env-steps/s per chip.

Runs the lockstep rollout engine (fused-Pallas policy forward + on-device
robot-PC resampling + FK success predicate per step,
mpinets_tpu.rollout.engine + mpinets_tpu.model.fused) on a batch of
synthetic problems at full reference input shapes (6272-point clouds,
reference PointNet++ architecture) and reports steady-state env-steps/s on
one chip.

Timing is honest under remote-dispatch JAX backends where
``block_until_ready`` can return before device execution finishes: every
measurement forces a device->host transfer of the result, and the reported
rate is the *difference* between a long and a short rollout so that compile,
dispatch, transfer-latency, and point-cloud-assembly overheads cancel out --
only the steady-state per-step cost remains.

Prints ONE JSON line:
  {"metric": "env_steps_per_s_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N}

``vs_baseline`` is value / 12_500 -- the per-chip share of the BASELINE.json
target (>=100k env-steps/s per v5e host = 8 chips).

``--sweep`` measures several batch sizes (curve to stderr) and reports the
best; the default single batch keeps the driver run bounded.
"""

from __future__ import annotations

import argparse
import json
import sys
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


def measure_batch(model, params, apply_fn, batch, steps_short, steps_long,
                  repeats, rng) -> float:
    from mpinets_tpu.data.synthetic import random_problem_batch
    from mpinets_tpu.rollout.engine import make_rollout_fn

    problem = random_problem_batch(jax.random.fold_in(rng, batch), batch)
    rollouts = {
        n: make_rollout_fn(
            model,
            max_steps=n,
            stop_on_success=False,  # fixed-length: every env steps every time
            record_trajectory=False,
            apply_fn=apply_fn,
        )
        for n in (steps_short, steps_long)
    }
    for rollout in rollouts.values():
        _run_sync(rollout, params, problem, jax.random.fold_in(rng, 2))

    best = 0.0
    extra = steps_long - steps_short
    for r in range(repeats):
        key = jax.random.fold_in(rng, 100 + r)
        t_short = _run_sync(rollouts[steps_short], params, problem, key)
        t_long = _run_sync(rollouts[steps_long], params, problem, key)
        if t_long > t_short:
            best = max(best, batch * extra / (t_long - t_short))
    return best


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--sweep", action="store_true",
                        help="sweep batch sizes and report the best")
    parser.add_argument("--steps-short", type=int, default=5)
    parser.add_argument("--steps-long", type=int, default=30)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--no-fused", action="store_true",
                        help="use the plain-XLA model.apply path")
    parser.add_argument("--bf16-cloud", action="store_true",
                        help="carry coordinates in bf16 through FPS")
    parser.add_argument("--fps-impl", default="v1", choices=("v1", "v2"),
                        help="Pallas FPS kernel variant")
    parser.add_argument("--sa-impl", default="v8", choices=("v3", "v5", "v8"),
                        help="fused SA kernel variant (v8 = r4 default: "
                             "hoisted gather table + MXU recentring bias)")
    parser.add_argument("--fast-grouping", type=int, default=4, metavar="W",
                        help="RELAXED chunk-window grouping at SA0 (each "
                             "centroid searches only its W nearest point "
                             "chunks). Default 4 = the r5 measured best "
                             "(5750 env-steps/s; target-error delta "
                             "+0.021 m, collision rate within the same "
                             "envelope as the r4-accepted fast8 -- tables "
                             "in ONCHIP_EVIDENCE.json and BENCH_NOTES.md). "
                             "Pass 0 for exact CUDA-semantics grouping "
                             "(3,066 env-steps/s after the r5 prefix fix)")
    parser.add_argument("--gather16", action="store_true",
                        help="16-bit in-kernel SA gathers (bf16 data + i16 "
                             "indices); requires Mosaic support")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax profiler trace of one measured "
                             "rollout into DIR")
    args = parser.parse_args()

    if args.gather16 and (args.sa_impl == "v8" or args.fast_grouping):
        print(
            "# WARNING: --gather16 only applies to --sa-impl v3/v5 with "
            "exact grouping; it is IGNORED by the v8 and fast-grouping "
            "kernels (advisor r4)",
            file=sys.stderr, flush=True,
        )

    from mpinets_tpu.model.fused import make_fused_apply
    from mpinets_tpu.model.policy import MotionPolicyNetwork

    model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
    apply_fn = None if args.no_fused else make_fused_apply(
        jnp.bfloat16, bf16_cloud=args.bf16_cloud, fps_impl=args.fps_impl,
        gather16=args.gather16, sa_impl=args.sa_impl,
        fast_grouping=args.fast_grouping,
    )

    if args.profile:
        import contextlib
        prof = lambda: jax.profiler.trace(args.profile)
    else:
        import contextlib
        prof = contextlib.nullcontext

    batches = (64, 256, 512) if args.sweep else (args.batch,)
    best = 0.0
    for b in batches:
      with prof():
        rate = measure_batch(
            model, params, apply_fn, b,
            args.steps_short, args.steps_long, args.repeats, rng,
        )
        print(f"# batch {b}: {rate:,.1f} env-steps/s", file=sys.stderr,
              flush=True)
        best = max(best, rate)

    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_per_chip",
                "value": round(best, 1),
                "unit": "steps/s",
                "vs_baseline": round(best / BASELINE_PER_CHIP, 3),
                # measurement config (advisor r4: a reported number must be
                # distinguishable from an exact-path measurement)
                "config": {
                    "sa_impl": args.sa_impl,
                    "fast_grouping": args.fast_grouping,
                    "fps_impl": args.fps_impl,
                    "batch": max(batches),
                    "fused": not args.no_fused,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
