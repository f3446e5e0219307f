"""Interactive planning server: the TPU-native stand-in for the reference's
ROS demo planning node.

The reference's deployment example is a ROS1 node pair
(``/root/reference/interactive_demo/mpinets_ros/nodes/planning_node.py``):
it loads the policy + a real scanned point cloud (``.npy``), crops the scan
to the workspace and downsamples to 4096 obstacle points
(``planning_node.py:186-228``), plans with <=75 policy steps at the
0.01 m / 15 deg stop rule (``planning_node.py:44-47,127-151``), and
publishes a ``JointTrajectory`` with 0.12 s point spacing
(``planning_node.py:334-346``). SURVEY.md §2.2 scopes the ROS transport
out; this module provides the same planner surface over JSON lines
(stdin/stdout or a file), so any host bridge — including an actual ROS
relay — can drive the TPU planner.

Request (one JSON object per line)::

    {"q0": [7 floats],
     "target_position": [x, y, z],
     "target_quaternion": [w, x, y, z]}

Response::

    {"success": bool, "num_steps": int,
     "trajectory": [[7 floats], ...],            # q0 first
     "times": [0.0, 0.12, 0.24, ...]}            # 0.12 s spacing

Usage::

    python -m mpinets_tpu.cli.serve <checkpoint> <scan.npy> [--max-steps 75]
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpinets_tpu import types as T
from mpinets_tpu.data.problems import problems_to_batch
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.rollout.engine import make_rollout_fn

#: planning_node.py:44-47
MAX_ROLLOUT_LENGTH = 75
NUM_OBSTACLE_POINTS = 4096
#: trajectory point spacing seconds (planning_node.py:340)
POINT_SPACING = 0.12


def clean_point_cloud(
    xyz: np.ndarray, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Workspace crop + downsample to 4096 points
    (``planning_node.py:186-228`` masks, exactly)."""
    rng = rng or np.random.default_rng(0)
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    task_tabletop = (
        (x > 0.25) & (x < 1.35) & (y > -0.3) & (y < 1.6)
        & (z > -0.05) & (z < 0.35)
    )
    mount_table = (
        (x > -0.35) & (x < 0.30) & (y > -0.5) & (y < 0.5)
        & (z > -0.05) & (z < 0.05)
    )
    xyz = xyz[task_tabletop | mount_table]
    pick = rng.choice(len(xyz), size=NUM_OBSTACLE_POINTS,
                      replace=len(xyz) < NUM_OBSTACLE_POINTS)
    return xyz[pick].astype(np.float32)


class Planner:
    """Loads the policy once; plans one problem per call
    (``planning_node.py:78-151`` equivalent)."""

    def __init__(self, params, scan_xyz: np.ndarray,
                 max_steps: int = MAX_ROLLOUT_LENGTH, model=None,
                 fused: bool | None = None, fast_grouping: int = 0):
        self.model = model or MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
        self.params = params
        self.obstacle_points = clean_point_cloud(scan_xyz)
        # Fused Pallas forward by default on TPU (plain XLA on CPU backends).
        if fused is None:
            fused = jax.default_backend() not in ("cpu",)
        apply_fn = None
        if fused:
            from mpinets_tpu.model.fused import make_fused_apply

            apply_fn = make_fused_apply(
                self.model.compute_dtype, sa_npoints=self.model.sa_npoints,
                fast_grouping=fast_grouping,
            )
        print(f"# rollout path: {'fused-pallas' if fused else 'xla'}",
              file=sys.stderr, flush=True)
        self.rollout = make_rollout_fn(
            self.model, max_steps=max_steps, stop_on_success=True,
            apply_fn=apply_fn,
        )
        self._key = jax.random.PRNGKey(0)

    def plan(self, q0, target_position, target_quaternion):
        problem = T.PlanningProblem(
            target=T.Pose(np.asarray(target_position, np.float64),
                          np.asarray(target_quaternion, np.float64)),
            target_volume=T.Cuboid(
                np.asarray(target_position, np.float64),
                (0.2, 0.2, 0.2), (1.0, 0.0, 0.0, 0.0),
            ),
            q0=np.asarray(q0, np.float64),
            obstacles=None,
            obstacle_point_cloud=self.obstacle_points,
        )
        batch = problems_to_batch([problem])
        self._key, sub = jax.random.split(self._key)
        result = jax.block_until_ready(
            self.rollout(self.params, batch["problem"], sub)
        )
        steps = int(result.num_steps[0])
        traj = np.asarray(result.trajectories[0, : steps + 1])
        return {
            "success": bool(result.success[0]),
            "num_steps": steps,
            "trajectory": traj.tolist(),
            "times": [POINT_SPACING * i for i in range(len(traj))],
        }


def serve(planner: Planner, infile=sys.stdin, outfile=sys.stdout) -> None:
    for line in infile:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            resp = planner.plan(
                req["q0"], req["target_position"], req["target_quaternion"]
            )
        except Exception as e:  # malformed request -> error response
            resp = {"success": False, "error": str(e)}
        outfile.write(json.dumps(resp) + "\n")
        outfile.flush()


def main(argv=None) -> None:
    from mpinets_tpu.cli.infer import load_params

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint")
    ap.add_argument("scan", help=".npy point cloud [N, 3] (or [N, >=3])")
    ap.add_argument("--max-steps", type=int, default=MAX_ROLLOUT_LENGTH)
    ap.add_argument("--no-fused", action="store_true",
                    help="force the plain-XLA rollout path")
    args = ap.parse_args(argv)

    model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
    params = load_params(args.checkpoint, model)
    scan = np.load(args.scan)[:, :3]
    planner = Planner(params, scan, max_steps=args.max_steps, model=model,
                      fused=False if args.no_fused else None)
    print("ready", file=sys.stderr, flush=True)
    serve(planner)


if __name__ == "__main__":
    main()
