"""Inference / evaluation CLI.

Mirrors the reference's evaluator driver
(``/root/reference/mpinets/run_inference.py:423-474``)::

    python -m mpinets_tpu.cli.infer <checkpoint> <problems.pkl>
        {tabletop|cubby|merged-cubby|dresser|all}
        {task-oriented|neutral-start|neutral-goal|all}
        [--save-metrics DIR] [--max-problems N] [--batch-size B]

``checkpoint`` may be a PyTorch-Lightning ``.ckpt`` (converted on load,
:mod:`mpinets_tpu.model.checkpoint`) or an orbax checkpoint directory.
Instead of the reference's one-problem-at-a-time GPU loop with per-step
host syncs (``run_inference.py:137-191``), whole problem groups run as
batched lockstep rollouts on device; per-problem planning time is reported
as the batch wall-clock share weighted by each problem's step count.

``--use-depth`` reproduces the reference's depth mode
(``run_inference.py:194-257``) TPU-natively: each primitive scene is
sphere-trace-rendered to a depth cloud on device
(:mod:`mpinets_tpu.geom.depth`) and the POLICY consumes the sensed points
while the metrics keep the true primitives (exactly the reference's
in-place ``p.obstacle_point_cloud`` mutation). Meshcat/PyBullet
visualization remains out of scope (host-GL features).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mpinets_tpu.data import problems as problems_mod
from mpinets_tpu.eval.metrics import Evaluator
from mpinets_tpu.model import checkpoint as ckpt_mod
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.rollout.engine import MAX_ROLLOUT_LENGTH, make_rollout_fn

SCENE_TYPES = ("tabletop", "cubby", "merged-cubby", "dresser")
PROBLEM_TYPES = ("task-oriented", "neutral-start", "neutral-goal")


def load_params(path: str, model: MotionPolicyNetwork, use_ema: bool = False):
    """Load policy params from a Lightning ``.ckpt`` or an orbax dir.

    ``use_ema`` prefers the checkpoint's EMA parameter tree when present
    (r5 trainer states carry one; validation/best-selection are judged on
    it, so eval should be too)."""
    p = Path(path)
    if not p.is_dir():
        return ckpt_mod.load_torch_checkpoint(p)
    step_dir = ckpt_mod.latest_checkpoint(p) or p

    def _pick(tree):
        if isinstance(tree, dict):
            if use_ema and tree.get("ema_params") is not None:
                return tree["ema_params"]
            if "opt_state" in tree or "step" in tree:
                # serialized TrainState dict: {step, params: {params: ...},
                # opt_state[, ema_params]}; the flax variables are the inner
                # "params" tree
                return tree["params"]
            if "params" in tree:
                return tree
        if use_ema and getattr(tree, "ema_params", None) is not None:
            return tree.ema_params
        if hasattr(tree, "params"):
            return tree.params
        return tree

    try:
        return _pick(ckpt_mod.restore_checkpoint(step_dir, None))
    except FileNotFoundError:
        pass
    # ocdbt-layout checkpoints (what our trainer writes) need the target
    # tree; rebuild the TrainState example the trainer saves. r5 states
    # carry an EMA tree; pre-r5 states do not — try both templates.
    from mpinets_tpu.train import learner

    example = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7))
    )
    opt0 = learner.make_optimizer().init(example)
    # NamedTuple templates always carry the ema_params FIELD (even as None),
    # which orbax rejects against pre-r5 checkpoints saved without it — so
    # pre-r5 states restore through a plain-dict template instead.
    templates = [
        learner.TrainState(example, opt0, jnp.zeros((), jnp.int32), example),
        {"params": example, "opt_state": opt0,
         "step": jnp.zeros((), jnp.int32)},
        learner.TrainState(example, opt0, jnp.zeros((), jnp.int32)),
    ]
    last_err = None
    for state in templates:
        try:
            return _pick(ckpt_mod.restore_checkpoint(step_dir, state))
        except FileNotFoundError as e:
            # named (best/last) dirs written by interrupted runs can lack
            # orbax's _METADATA; fall back to the step_* sibling the
            # `<name>.step` marker points at.
            sd = Path(step_dir)
            marker = sd.parent / f"{sd.name}.step"
            if not marker.exists():
                last_err = e
                continue
            sib = sd.parent / f"step_{int(marker.read_text()):08d}"
            try:
                return _pick(ckpt_mod.restore_checkpoint(sib, state))
            except Exception as e2:  # try the next template
                last_err = e2
        except Exception as e:  # structure mismatch: try the next template
            last_err = e
    raise last_err


def evaluate_problem_set(
    params,
    problem_set,
    scene_filter: str = "all",
    type_filter: str = "all",
    batch_size: int = 32,
    max_problems: int | None = None,
    max_steps: int = MAX_ROLLOUT_LENGTH,
    model: MotionPolicyNetwork | None = None,
    use_depth: bool = False,
    fused: bool | None = None,
    fast_grouping: int = 0,
    b1_timing: bool = False,
) -> Evaluator:
    """Batched evaluation of a ProblemSet with the reference's Evaluator
    semantics.

    Timing semantics: the reference measures each problem's planning time as
    the wall-clock of its OWN batch-1 GPU rollout (``run_inference.py:
    287-303``). Lockstep batching amortizes compute, so by default ``time``
    is the batch wall-clock attributed as step-weighted shares (a
    throughput-oriented number, systematically ~batch-size lower than the
    reference's). ``b1_timing=True`` restores the reference semantics: a
    one-off batch-1 long-vs-short differential measures the per-step
    batch-1 cost and ``time_i = num_steps_i * per_step_b1``.
    """
    model = model or MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
    # Fast path by default on TPU: the Pallas fused forward
    # (mpinets_tpu.model.fused) replaces the plain model.apply inside the
    # rollout; on CPU backends Pallas is unavailable, so fall back to XLA.
    if fused is None:
        fused = jax.default_backend() not in ("cpu",)
    apply_fn = None
    if fused:
        from mpinets_tpu.model.fused import make_fused_apply

        apply_fn = make_fused_apply(
            model.compute_dtype, sa_npoints=model.sa_npoints,
            fast_grouping=fast_grouping,
        )
    print(
        f"# rollout path: {'fused-pallas' if fused else 'xla'}"
        f"{f'+fast{fast_grouping}' if fused and fast_grouping else ''} "
        f"({model.compute_dtype.__name__})",
        flush=True,
    )
    rollout = make_rollout_fn(model, max_steps=max_steps, apply_fn=apply_fn)
    evaluator = Evaluator()
    rng = jax.random.PRNGKey(0)

    per_step_b1 = None
    if b1_timing:
        from mpinets_tpu.data.synthetic import random_problem_batch

        cal_prob = random_problem_batch(jax.random.fold_in(rng, 999), 1)
        short = make_rollout_fn(model, max_steps=5, stop_on_success=False,
                                record_trajectory=False, apply_fn=apply_fn)
        long = make_rollout_fn(model, max_steps=25, stop_on_success=False,
                               record_trajectory=False, apply_fn=apply_fn)
        for fn in (short, long):  # compile + settle
            np.asarray(fn(params, cal_prob, rng).final_q)
        t0 = time.perf_counter()
        np.asarray(short(params, cal_prob, rng).final_q)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(long(params, cal_prob, rng).final_q)
        t_l = time.perf_counter() - t0
        per_step_b1 = max((t_l - t_s) / 20.0, 1e-6)
        print(f"# batch-1 per-step time: {per_step_b1*1e3:.2f} ms", flush=True)

    for scene_type, by_type in problem_set.items():
        if scene_filter != "all" and scene_type != scene_filter:
            continue
        for problem_type, problems in by_type.items():
            if type_filter != "all" and problem_type != type_filter:
                continue
            if max_problems is not None:
                problems = problems[:max_problems]
            if not problems:
                continue
            group_key = f"{scene_type}_{problem_type}"
            evaluator.create_new_group(group_key)
            print(f"== group {group_key}: {len(problems)} problems", flush=True)

            for lo in range(0, len(problems), batch_size):
                chunk = problems[lo : lo + batch_size]
                batch = problems_mod.problems_to_batch(chunk)
                problem = batch["problem"]
                if use_depth and problem.obstacle_points is None:
                    from mpinets_tpu.geom.depth import scene_to_point_cloud

                    keys = jax.random.split(
                        jax.random.fold_in(rng, 7000 + lo), problem.q0.shape[0]
                    )
                    pts = jax.vmap(
                        lambda s, k: scene_to_point_cloud(s, k, 4096)
                    )(problem.scene, keys)
                    # policy sees the sensed cloud; metrics keep primitives
                    problem = problem._replace(obstacle_points=pts)
                t0 = time.perf_counter()
                result = jax.block_until_ready(
                    rollout(params, problem, jax.random.fold_in(rng, lo))
                )
                wall = time.perf_counter() - t0
                num_steps = np.asarray(result.num_steps)
                total_steps = max(int(num_steps.sum()), 1)
                if per_step_b1 is not None:
                    times = num_steps * per_step_b1  # reference B=1 semantics
                else:
                    times = wall * num_steps / total_steps
                evaluator.evaluate_batch(
                    np.asarray(result.trajectories),
                    num_steps,
                    np.asarray(problem.target_rot),
                    np.asarray(problem.target_trans),
                    problem.scene,
                    batch["target_volumes"],
                    batch["negative_volumes"],
                    times=times,
                )
            evaluator.print_group_metrics(group_key)
    return evaluator


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint")
    parser.add_argument("problems")
    parser.add_argument("scene_type", choices=SCENE_TYPES + ("all",))
    parser.add_argument("problem_type", choices=PROBLEM_TYPES + ("all",))
    parser.add_argument("--save-metrics", default=None, metavar="DIR")
    parser.add_argument("--max-problems", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--fp32", action="store_true",
                        help="evaluate in fp32 instead of bf16")
    parser.add_argument("--use-depth", action="store_true",
                        help="policy consumes depth-rendered obstacle clouds")
    parser.add_argument("--fast-grouping", type=int, default=0,
                        metavar="W",
                        help="RELAXED chunk-window SA0 grouping (each "
                             "centroid searches only its W nearest point "
                             "chunks; measured deltas in "
                             "ONCHIP_EVIDENCE.json). 0 = exact semantics")
    parser.add_argument("--no-fused", action="store_true",
                        help="force the plain-XLA model.apply rollout path "
                             "(default: fused Pallas kernels on TPU)")
    parser.add_argument("--use-ema", action="store_true",
                        help="evaluate the checkpoint's EMA parameter tree "
                             "when present (r5 trainer states)")
    parser.add_argument("--b1-timing", action="store_true",
                        help="report per-problem 'time' with the reference's "
                             "batch-1 wall-clock semantics (one extra "
                             "calibration compile)")
    args = parser.parse_args(argv)

    if args.fp32:
        # Exact-parity mode: TPU "f32" matmuls otherwise run as bf16 MXU
        # passes (r3 on-chip measurement: 4e-3 output divergence between two
        # algebraically identical f32 paths at default precision).
        jax.config.update("jax_default_matmul_precision", "highest")
    model = MotionPolicyNetwork(
        compute_dtype=jnp.float32 if args.fp32 else jnp.bfloat16
    )
    params = load_params(args.checkpoint, model, use_ema=args.use_ema)
    problem_set = problems_mod.load_problems(args.problems)
    evaluator = evaluate_problem_set(
        params, problem_set, args.scene_type, args.problem_type,
        batch_size=args.batch_size, max_problems=args.max_problems, model=model,
        use_depth=args.use_depth, fused=False if args.no_fused else None,
        fast_grouping=args.fast_grouping,
        b1_timing=args.b1_timing,
    )
    print("\n== overall ==")
    evaluator.print_overall_metrics()
    if args.save_metrics:
        Path(args.save_metrics).mkdir(parents=True, exist_ok=True)
        evaluator.save(args.save_metrics, "mpinets_tpu_eval")


if __name__ == "__main__":
    main()
