"""Expert data-generation driver: exhaust procedural environments into
reference-schema datasets.

The TPU-native analogue of ``gen_data.py``'s scene fan-out
(``/root/reference/mpinets/data_pipeline/gen_data.py:531-795``): instead of
a multiprocessing pool of CPU planners, every scene's candidate pairs are
planned as ONE vmapped batch (smooth family + SDF-cost trajectory
optimization, :mod:`mpinets_tpu.pipeline.expert`), verified on device, and
written in the exact on-disk schema (``gen_data.py:675-762``). Both
directions of each pair are attempted (``forward_backward``,
``gen_data.py:433-528``), and inference problems get the reference's
hindsight goal revision — the stored target is the FK pose of the planned
trajectory's FINAL configuration (``gen_data.py:832-836,888-893``), which
makes every stored problem solvable by construction.

CLI::

    python -m mpinets_tpu.pipeline.gen {tabletop|cubby|merged-cubby|dresser}
        --output DIR [--num-scenes N] [--candidates-per-scene K] [--neutral]
        [--for-inference PKL] [--seed S]

Prints per-scene and overall valid-plan rates (the pipeline health metric
the reference tracks via its error-code tallies, ``gen_data.py:419-430``).
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from mpinets_tpu import types as T
from mpinets_tpu.data import writer
from mpinets_tpu.data.process import merge_files
from mpinets_tpu.envs.base import Environment
from mpinets_tpu.envs.cubby import CubbyEnvironment, MergedCubbyEnvironment
from mpinets_tpu.envs.dresser import DresserEnvironment
from mpinets_tpu.envs.tabletop import TabletopEnvironment
from mpinets_tpu.kernels import kinematics
from mpinets_tpu.pipeline import expert

ENVS = {
    "tabletop": TabletopEnvironment,
    "cubby": CubbyEnvironment,
    "merged-cubby": MergedCubbyEnvironment,
    "dresser": DresserEnvironment,
}


def _candidate_pairs(cands_a, cands_b):
    """All directed pairs, each direction exactly once (forward_backward
    style, ``gen_data.py:433-528``). r5 fix: the r2-r4 version appended
    (a, b) AND (b, a) from *every* ordered iteration, planning each directed
    pair twice — identical deterministic plans, so half the batch was
    wasted compute and duplicated rows in the dataset."""
    pairs = []
    for i, a in enumerate(cands_a):
        for b in cands_b[i + 1:]:
            if a is b:
                continue
            pairs.append((a, b))
            pairs.append((b, a))
    return pairs


def plan_scene(
    env: Environment,
    rng: np.random.Generator,
    candidates_per_scene: int,
    include_neutral: bool,
    pair_bucket: int | None = None,
    plan_kwargs: dict | None = None,
):
    """Plan all candidate pairs of one generated scene in one device batch.

    ``pair_bucket`` pads the pair batch to a FIXED width (repeating the
    first pair; padded results are masked out) so that every scene shares
    one jit executable — on TPU a fresh vmap width would recompile the full
    optimizer program (~minutes) per distinct candidate count.

    Returns (trajectories [V, 50, 7], scene arrays dict, stats dict).
    """
    extra = env.gen_candidates(rng, candidates_per_scene)
    cands = list(env.demo_candidates) + extra
    if include_neutral:
        cands += env.gen_neutral_candidates(
            max(2, candidates_per_scene // 2), rng
        )
    pairs = _candidate_pairs(cands, cands)
    if not pairs:
        return np.zeros((0, expert.SEQUENCE_LENGTH, 7)), {}, {"pairs": 0, "valid": 0}
    n_real = len(pairs)
    if pair_bucket is not None:
        n_real = min(n_real, pair_bucket)
        pairs = pairs[:pair_bucket] + [pairs[0]] * (pair_bucket - n_real)

    q_starts = np.stack([a.config for a, _ in pairs]).astype(np.float32)
    q_goals = np.stack([b.config for _, b in pairs]).astype(np.float32)
    rots = np.stack([b.pose.matrix[:3, :3] for _, b in pairs]).astype(np.float32)
    trans = np.stack([b.pose.position for _, b in pairs]).astype(np.float32)
    scene = jax.tree_util.tree_map(lambda x: x[0], env.scene_set())

    import functools

    plan = jax.vmap(
        functools.partial(expert.plan_pair_optimized, **(plan_kwargs or {})),
        in_axes=(0, 0, 0, 0, None),
    )
    res = plan(
        jnp.asarray(q_starts), jnp.asarray(q_goals),
        jnp.asarray(rots), jnp.asarray(trans), scene,
    )
    valid = np.array(res.valid)
    valid[n_real:] = False
    trajs = np.asarray(res.trajectory)[valid]
    # Per-pair failure tallies on the final trajectories (the reference's
    # error-code convention, gen_data.py:91-103,419-430).
    ver = jax.vmap(
        expert.verify_trajectory, in_axes=(0, 0, 0, None)
    )(res.trajectory, jnp.asarray(rots), jnp.asarray(trans), scene)
    ver = jax.tree_util.tree_map(lambda x: np.asarray(x)[:n_real], ver)
    stats = {
        "pairs": n_real,
        "valid": int(valid.sum()),
        "miss": int((ver.miss > expert.MISS_TOLERANCE).sum()),
        "jerk": int((ver.max_jerk > expert.MAX_JERK).sum()),
        "self_collision": int(ver.has_self_collision.sum()),
        "env_collision": int(ver.has_env_collision.sum()),
        "limit_violation": int((~ver.within_limits).sum()),
    }
    return trajs, _scene_arrays(env, len(trajs)), stats


def _scene_arrays(env: Environment, n: int) -> dict:
    """Replicate the scene's primitive arrays for each of n trajectories."""
    cubs = env.cuboids
    cyls = env.cylinders
    mc = max(len(cubs), 1)
    my = max(len(cyls), 1)
    out = {
        "cuboid_dims": np.zeros((n, mc, 3)),
        "cuboid_centers": np.zeros((n, mc, 3)),
        "cuboid_quats": np.zeros((n, mc, 4)),
        "cylinder_radii": np.zeros((n, my, 1)),
        "cylinder_heights": np.zeros((n, my, 1)),
        "cylinder_centers": np.zeros((n, my, 3)),
        "cylinder_quats": np.zeros((n, my, 4)),
    }
    for i, c in enumerate(cubs):
        out["cuboid_dims"][:, i] = c.dims
        out["cuboid_centers"][:, i] = c.center
        out["cuboid_quats"][:, i] = c.quaternion
    for i, c in enumerate(cyls):
        out["cylinder_radii"][:, i, 0] = c.radius
        out["cylinder_heights"][:, i, 0] = c.height
        out["cylinder_centers"][:, i] = c.center
        out["cylinder_quats"][:, i] = c.quaternion
    return out


def hindsight_problems(trajs: np.ndarray, env: Environment) -> List[T.PlanningProblem]:
    """Inference problems with hindsight goal revision: target := FK pose of
    each trajectory's final configuration (``gen_data.py:832-836``)."""
    if len(trajs) == 0:
        return []
    # pad to a multiple of 8 so long generation runs reuse a few jit
    # executables instead of compiling per distinct valid-count
    m = -(-len(trajs) // 8) * 8
    q_final = np.concatenate(
        [trajs[:, -1]] + [trajs[:1, -1]] * (m - len(trajs)), axis=0
    )
    rot, trans = jax.jit(kinematics.eff_pose)(jnp.asarray(q_final))
    rot = np.asarray(rot, np.float64)[: len(trajs)]
    trans = np.asarray(trans, np.float64)[: len(trajs)]
    problems = []
    for i in range(len(trajs)):
        quat = T.matrix_to_quat_np(rot[i])
        problems.append(
            T.PlanningProblem(
                target=T.Pose(trans[i], quat),
                target_volume=T.Cuboid(
                    trans[i], (0.1, 0.1, 0.1), (1.0, 0.0, 0.0, 0.0)
                ),
                q0=np.asarray(trajs[i, 0], np.float64),
                obstacles=list(env.obstacles),
            )
        )
    return problems


def gen(
    scene_type: str,
    output_dir,
    num_scenes: int = 10,
    candidates_per_scene: int = 4,
    include_neutral: bool = False,
    seed: int = 0,
    inference_pkl=None,
    time_budget_s: float | None = None,
    pair_bucket: int | None = None,
    clear_every: int = 10,
    eval_every: int = 0,
    scene_pad: tuple | None = None,
    plan_kwargs: dict | None = None,
) -> dict:
    """Generate ``num_scenes`` scenes worth of verified expert data into
    ``output_dir/all_data.hdf5``; optionally dump hindsight inference
    problems. Returns overall stats.

    ``pair_bucket`` fixes the planner vmap width (see :func:`plan_scene`) —
    required for TPU-resident runs. ``clear_every`` bounds XLA:CPU JIT code
    accumulation (0 = never clear; TPU runs with fixed buckets don't need
    it). ``eval_every`` > 0 makes every N-th successful scene EVAL-ONLY:
    its trajectories feed the hindsight problem pkl instead of the training
    dataset, giving a scene-level held-out split (the reference evaluates on
    problems from fresh scenes, gen_data.py:832-845)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    scene_files = []
    problems: List[T.PlanningProblem] = []
    total = {"scenes": 0, "pairs": 0, "valid": 0, "eval_scenes": 0,
             "eval_problems": 0}
    import time as _time
    t_start = _time.time()

    for s in range(num_scenes):
        if time_budget_s is not None and _time.time() - t_start > time_budget_s:
            print(f"wall-clock budget reached after {total['scenes']} scenes",
                  flush=True)
            break
        if clear_every and total["scenes"] and total["scenes"] % clear_every == 0:
            # bound XLA:CPU JIT code accumulation over long runs (each new
            # padded scene shape compiles fresh executables)
            jax.clear_caches()
        env = ENVS[scene_type]()
        if scene_pad is not None:
            env.SCENE_PAD = scene_pad
        ok = env.gen(rng)
        # Funnel accounting BEFORE the failure continue (advisor r4): scenes
        # whose generation failed already ran the pose->IK candidate
        # machinery, and dropping them biased the scene-yield diagnostic.
        for k, v in env.funnel.items():
            total[f"funnel_{k}"] = total.get(f"funnel_{k}", 0) + v
        if not ok:
            continue
        funnel_pre = dict(env.funnel)
        trajs, scene_arrays, stats = plan_scene(
            env, rng, candidates_per_scene, include_neutral,
            pair_bucket=pair_bucket, plan_kwargs=plan_kwargs,
        )
        total["scenes"] += 1
        total["pairs"] += stats["pairs"]
        total["valid"] += stats["valid"]
        for k, v in env.funnel.items():
            total[f"funnel_{k}"] = (
                total.get(f"funnel_{k}", 0) + v - funnel_pre.get(k, 0)
            )
        for k, v in stats.items():
            if k not in ("pairs", "valid"):
                total[k] = total.get(k, 0) + v
        fails = {k: v for k, v in stats.items()
                 if k not in ("pairs", "valid") and v}
        print(
            f"scene {s}: {stats['valid']}/{stats['pairs']} plans valid"
            + (f" (fails: {fails})" if fails else ""),
            flush=True,
        )
        if len(trajs) == 0:
            continue
        is_eval = bool(eval_every) and (total["scenes"] % eval_every == 0)
        if is_eval:
            if inference_pkl is not None:
                new = hindsight_problems(trajs, env)
                problems.extend(new)
                total["eval_scenes"] += 1
                total["eval_problems"] += len(new)
            continue
        arrays = {
            "global_solutions": trajs,
            "hybrid_solutions": trajs,
            **scene_arrays,
        }
        path = out / f"scene_{s:05d}.hdf5"
        writer.write_dataset(path, arrays)
        scene_files.append(path)
        if inference_pkl is not None and not eval_every:
            problems.extend(hindsight_problems(trajs, env))

    if scene_files:
        # overwrite: re-running a family into the same directory must not
        # strand a whole run behind a stale all_data.hdf5 (r4 at-scale:
        # merged-cubby lost its merge to a leftover previous-round file)
        merge_files(scene_files, out / "all_data.hdf5", overwrite=True)
        for f in scene_files:
            f.unlink()
    if inference_pkl is not None:
        pset = {scene_type: {"task-oriented": problems}}
        with open(inference_pkl, "wb") as f:
            pickle.dump(pset, f)
    rate = total["valid"] / max(total["pairs"], 1)
    print(
        f"TOTAL: {total['scenes']}/{num_scenes} scenes, "
        f"{total['valid']}/{total['pairs']} plans valid ({100*rate:.1f}%)",
        flush=True,
    )
    if total.get("funnel_poses"):
        fp = total
        print(
            "candidate-IK funnel: "
            f"{fp['funnel_poses']} poses -> {fp['funnel_ik_solved']} accurate IK "
            f"({100*fp['funnel_ik_solved']/fp['funnel_poses']:.1f}%) -> "
            f"{fp['funnel_free']} collision-free "
            f"({100*fp['funnel_free']/max(fp['funnel_ik_solved'],1):.1f}% of solved) -> "
            f"{fp['funnel_kept']} kept",
            flush=True,
        )
    return total


def visualize_scene(scene_type: str, out_html, seed: int = 0) -> None:
    """The reference's ``test-environment`` mode analog
    (``gen_data.py:798-815`` ``visualize_single_env`` + the CLI mode at
    ``:1089-1098``): generate one scene, plan its demo candidate pair, and
    write the trajectory + primitives to a standalone HTML viewer
    (:mod:`mpinets_tpu.eval.visualize` -- the PyBullet-GUI stand-in)."""
    from mpinets_tpu.eval.visualize import write_html

    rng = np.random.default_rng(seed)
    env = ENVS[scene_type]()
    for attempt in range(10):
        if env.gen(rng):
            break
    else:
        raise SystemExit("could not generate a valid scene in 10 attempts")
    a, b = env.demo_candidates[0], env.demo_candidates[1]
    scene = jax.tree_util.tree_map(lambda x: x[0], env.scene_set())
    res = expert.plan_pair_optimized(
        jnp.asarray(a.config, jnp.float32),
        jnp.asarray(b.config, jnp.float32),
        jnp.asarray(b.pose.matrix[:3, :3], jnp.float32),
        jnp.asarray(b.pose.position, jnp.float32),
        scene,
    )
    traj = np.asarray(res.trajectory)
    print(f"scene generated; demo plan valid={bool(res.valid)} "
          f"(family code {int(res.which)})")
    path = write_html(
        out_html, traj, cuboids=env.cuboids, cylinders=env.cylinders,
        target_position=np.asarray(b.pose.position),
    )
    print(f"wrote {path}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scene_type", choices=sorted(ENVS))
    ap.add_argument("--output", required=True)
    ap.add_argument("--num-scenes", type=int, default=10)
    ap.add_argument("--candidates-per-scene", type=int, default=4)
    ap.add_argument("--neutral", action="store_true")
    ap.add_argument("--for-inference", default=None, metavar="PKL")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--visualize-scene", default=None, metavar="HTML",
                    help="test-environment mode (gen_data.py:798-815,"
                         "1089-1098): generate ONE scene, plan its demo "
                         "pair, and write an interactive HTML trajectory "
                         "viewer instead of a dataset")
    args = ap.parse_args(argv)
    if args.visualize_scene:
        visualize_scene(args.scene_type, args.visualize_scene, args.seed)
        return
    gen(
        args.scene_type, args.output,
        num_scenes=args.num_scenes,
        candidates_per_scene=args.candidates_per_scene,
        include_neutral=args.neutral,
        seed=args.seed,
        inference_pkl=args.for_inference,
    )


if __name__ == "__main__":
    main()
