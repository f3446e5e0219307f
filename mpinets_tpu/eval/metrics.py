"""Batched trajectory evaluation: the TPU-native ``Evaluator``.

Re-design of the reference's ``mpinets/metrics.py:50-763``. The reference
evaluates one trajectory at a time with PyBullet mesh collision checks; here
a whole batch of trajectories is checked in ONE jitted computation:

* env collision: the 57-sphere collision model under batched FK vs. the
  scene SDF (the reference's own training-time collision signal,
  ``mpinets/model.py:293-314``; its *eval*-time signal is PyBullet hd AND ld
  mesh checks, ``metrics.py:270-291`` -- the sphere model is slightly
  conservative; calibrated in :mod:`mpinets_tpu.eval.calibration` against an
  INDEPENDENT proxy (arm capsules off the URDF joint-origin chain + surface
  samples of the real half_open_gripper.stl mesh,
  :mod:`mpinets_tpu.eval.hull_proxy`) over 1024 random scene/config pairs
  at a 0.9/1.0/1.1 capsule-inflate envelope: recall 0.96-0.98 (a few
  thin-feature contacts slip between spheres), precision 0.86-0.90
  (conservative false alarms), ~97% agreement. The earlier recall-1.00 claim
  came from a proxy derived from the sphere model itself and overstated
  coverage),
* collision depths (sphere penetration, ``metrics.py:293-311`` equivalent),
* self-collision via the sphere pair table (``metrics.py:255-268``; the
  reference ORs PyBullet mesh checks with this same sphere model because
  the spheres alone under-report. r4 depth study
  (``scripts/selfcc_calibration.py``): vs the independent capsule proxy,
  recall rises monotonically with proxy penetration depth (0.05 at <0.5 cm
  to 0.65 at >5 cm, precision 0.84) and ~95% of the deep (>2 cm)
  proxy-only positives concentrate at the forearm-capsule/gripper junction
  where the sphere model's own minimum pair clearance is 10-28 cm — i.e.
  they are capsule-overfill FALSE POSITIVES of the proxy, not genuine
  sphere misses. Without link meshes the sphere table (NVIDIA-tuned, from
  the reference's lula config) remains the best available self-collision
  signal; residual under-reporting vs a mesh checker is bounded by the
  shallow-contact band),
* joint limits (``metrics.py:311-322``),
* final position error in **cm** / orientation error in degrees
  (``metrics.py:340-362``),
* target-region membership incl. corrected negative volumes
  (``metrics.py:364-384``, correction at ``metrics.py:507-512``),
* end-effector path lengths (``metrics.py:411-434``),
* success = pos < 1 cm AND ori < 15 deg AND region AND no physical
  violation (``metrics.py:514-519``).

Lockstep rollouts produce fixed-length [B, T, 7] trajectories with frozen
tails after per-env success; a per-step validity mask confines every check
to the live prefix so results match the reference's variable-length
sequential semantics. SPARC smoothness (data-dependent profile lengths) runs
on host via :func:`mpinets_tpu.eval.sparc.sparc`, exactly like the
reference's (``metrics.py:386-409``).
"""

from __future__ import annotations

import functools
import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mpinets_tpu.eval.sparc import sparc
from mpinets_tpu.geom.scene import SceneSet
from mpinets_tpu.kernels import kinematics, sdf
from mpinets_tpu.robot import franka

#: Evaluation control-rate timestep (12 Hz; ``run_inference.py:297``).
EVAL_DT = 0.08
#: SPARC smoothness threshold (``metrics.py:589-594``).
SMOOTHNESS_THRESHOLD = -1.6


def percent_true(arr: Sequence) -> float:
    """Percent of true/nonzero entries (``metrics.py:50-57``)."""
    a = np.asarray(arr)
    return 100.0 * np.count_nonzero(a) / len(a)


def _quat_angle_deg(rot_a: jnp.ndarray, rot_b: jnp.ndarray) -> jnp.ndarray:
    """Geodesic SO(3) angle in degrees between matrix batches.

    Equivalent to the reference's |(q1 * q2.conjugate).radians| in degrees
    (``metrics.py:356-362``)."""
    tr = jnp.einsum("...ij,...ij->...", rot_a, rot_b)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


@jax.jit
def check_trajectories(
    trajectories: jnp.ndarray,  # [B, T, 7] configs incl. start
    num_steps: jnp.ndarray,  # [B] int32: index of the final live config
    target_rot: jnp.ndarray,  # [B, 3, 3]
    target_trans: jnp.ndarray,  # [B, 3]
    scene: SceneSet,  # batched [B, ...]
    target_volumes: SceneSet,  # batched [B, ...] (one live primitive each)
    negative_volumes: SceneSet,  # batched [B, ...] (padded)
) -> Dict[str, jnp.ndarray]:
    """All on-device per-trajectory checks for a batch. Returns a dict of
    [B]-shaped arrays (plus [B, T, 57] collision depths for reporting)."""
    b, t, _ = trajectories.shape
    valid = jnp.arange(t)[None, :] <= num_steps[:, None]  # [B, T]

    # --- physical violations over the live prefix -------------------------
    # with_base_link=False convention (mpinets/model.py:270): the base
    # sphere is excluded from scene checks.
    centers = kinematics.scene_collision_spheres(trajectories)
    radii = jnp.asarray(franka.SCENE_SPHERE_RADII, trajectories.dtype)
    sdf_vals = sdf.scene_sdf_sequence(
        centers.reshape(b, t, -1, 3), scene
    ).reshape(b, t, -1)  # [B, T, 57]
    step_collision = jnp.any(sdf_vals <= radii, axis=-1)  # [B, T]
    in_collision = jnp.any(step_collision & valid, axis=-1)
    depth = jnp.maximum(0.0, radii - sdf_vals)  # [B, T, 57] penetration (m)
    depth = jnp.where(valid[..., None], depth, 0.0)

    self_collision = jnp.any(
        kinematics.self_collision(trajectories) & valid, axis=-1
    )
    limit_violation = jnp.any(
        ~kinematics.within_limits(trajectories) & valid, axis=-1
    )
    physical = in_collision | self_collision | limit_violation

    # --- final-pose errors -------------------------------------------------
    final_q = jnp.take_along_axis(
        trajectories, num_steps[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    final_rot, final_pos = kinematics.eff_pose(final_q)
    position_error_cm = 100.0 * jnp.linalg.norm(final_pos - target_trans, axis=-1)
    orientation_error = _quat_angle_deg(final_rot, target_rot)

    # --- target-region check (metrics.py:364-384,507-512) ------------------
    in_volume = (
        sdf.scene_sdf(final_pos[:, None, :], target_volumes)[:, 0] <= 0.0
    )
    neg_at_final = sdf.scene_sdf_per_primitive(
        final_pos[:, None, :], negative_volumes
    )[..., 0]  # [B, Mn]
    neg_at_target = sdf.scene_sdf_per_primitive(
        target_trans[:, None, :], negative_volumes
    )[..., 0]
    # A negative volume that contains the target itself is "bad" and dropped
    # from the check (metrics.py:507-512). Padding gives +inf > 0 = kept but
    # trivially satisfied.
    kept = neg_at_target > 0.0
    outside_negatives = jnp.all(jnp.where(kept, neg_at_final > 0.0, True), axis=-1)
    correct_region = in_volume & outside_negatives

    # --- path lengths over the live prefix (metrics.py:411-434) ------------
    rots, transs = kinematics.eff_pose(trajectories)  # [B, T, 3, 3], [B, T, 3]
    seg_valid = valid[:, 1:]  # segment i-1 -> i live iff config i live
    pos_steps = jnp.linalg.norm(jnp.diff(transs, axis=1), axis=-1)
    eff_position_path = jnp.sum(jnp.where(seg_valid, pos_steps, 0.0), axis=-1)
    ang_steps = _quat_angle_deg(rots[:, :-1], rots[:, 1:])
    eff_orientation_path = jnp.sum(jnp.where(seg_valid, ang_steps, 0.0), axis=-1)

    # --- speed profiles for host-side SPARC --------------------------------
    config_speed = jnp.linalg.norm(jnp.diff(trajectories, axis=1), axis=-1) / EVAL_DT
    eff_speed = pos_steps / EVAL_DT

    success = (
        (position_error_cm < 1.0)
        & correct_region
        & (orientation_error < 15.0)
        & ~physical
    )

    return {
        "collision": in_collision,
        "collision_depths": depth,
        "self_collision": self_collision,
        "joint_limit_violation": limit_violation,
        "physical_violations": physical,
        "position_error": position_error_cm,
        "orientation_error": orientation_error,
        "correct_region": correct_region,
        "eff_position_path_length": eff_position_path,
        "eff_orientation_path_length": eff_orientation_path,
        "config_speed": config_speed,
        "eff_speed": eff_speed,
        "success": success,
    }


class Evaluator:
    """Group-structured metric accumulation with reference-parity reporting
    (``metrics.py:60-763``). Feed it whole batches; read out the same metric
    dictionary/printout as the reference's ``Evaluator.metrics``."""

    def __init__(self):
        self.groups: Dict[str, Dict[str, list]] = {}
        self.current_group: Optional[Dict[str, list]] = None
        self.current_group_key: Optional[str] = None

    def create_new_group(self, key: str) -> None:
        self.groups[key] = {}
        self.current_group_key = key
        self.current_group = self.groups[key]

    def _add(self, key: str, values) -> None:
        assert self.current_group is not None, "create_new_group first"
        self.current_group.setdefault(key, []).extend(values)

    def evaluate_batch(
        self,
        trajectories: np.ndarray,  # [B, T, 7]
        num_steps: np.ndarray,  # [B] final live index
        target_rot: np.ndarray,  # [B, 3, 3]
        target_trans: np.ndarray,  # [B, 3]
        scene: SceneSet,
        target_volumes: SceneSet,
        negative_volumes: SceneSet,
        times: np.ndarray,  # [B] wall-clock seconds per problem
        skip_mask: Optional[np.ndarray] = None,  # [B] hard failures
    ) -> None:
        """Evaluate a batch and append per-problem rows to the current group
        (``evaluate_trajectory``, ``metrics.py:436-563``, batched)."""
        out = jax.device_get(
            check_trajectories(
                jnp.asarray(trajectories),
                jnp.asarray(num_steps, jnp.int32),
                jnp.asarray(target_rot),
                jnp.asarray(target_trans),
                scene,
                target_volumes,
                negative_volumes,
            )
        )
        b = trajectories.shape[0]
        num_steps = np.asarray(num_steps)
        skip_mask = (
            np.zeros(b, bool) if skip_mask is None else np.asarray(skip_mask)
        )

        for i in range(b):
            if skip_mask[i]:
                # Hard-failure convention (metrics.py:464-468).
                self._add("success", [False])
                self._add("time", [np.inf])
                self._add("skips", [True])
                continue
            n = int(num_steps[i])
            depths_i = out["collision_depths"][i, : n + 1]
            depths_i = depths_i[depths_i > 0.0]
            self._add("collision_depths", [depths_i.tolist()])
            self._add("collision", [bool(out["collision"][i])])
            self._add(
                "joint_limit_violation", [bool(out["joint_limit_violation"][i])]
            )
            self._add("self_collision", [bool(out["self_collision"][i])])
            self._add(
                "physical_violations", [bool(out["physical_violations"][i])]
            )
            self._add("position_error", [float(out["position_error"][i])])
            self._add("orientation_error", [float(out["orientation_error"][i])])
            # SPARC over the live prefix only (variable length => host).
            config_sparc = sparc(out["config_speed"][i, :n], 1.0 / EVAL_DT) if n else 0.0
            eff_sparc = sparc(out["eff_speed"][i, :n], 1.0 / EVAL_DT) if n else 0.0
            self._add("config_smoothness", [config_sparc])
            self._add("eff_smoothness", [eff_sparc])
            self._add(
                "eff_position_path_length",
                [float(out["eff_position_path_length"][i])],
            )
            self._add(
                "eff_orientation_path_length",
                [float(out["eff_orientation_path_length"][i])],
            )
            self._add("success", [bool(out["success"][i])])
            self._add("time", [float(times[i])])
            self._add("num_steps", [n + 1])

    # -- aggregation (metrics.py:565-663) -----------------------------------

    @staticmethod
    def metrics(group: Dict[str, Any]) -> Dict[str, Any]:
        """Group summary with the reference's exact key set and semantics."""
        success = percent_true(group["success"])
        pos = np.asarray(group["position_error"])
        ori = np.asarray(group["orientation_error"])
        all_times = np.asarray(group["time"])

        skips: List = []
        if "skips" in group:
            successes = np.asarray(group["success"])
            unskipped_successes = successes[~np.isinf(all_times)]
            skips = group["skips"]
        else:
            unskipped_successes = np.asarray(group["success"])

        pos_paths = np.asarray(group["eff_position_path_length"])
        ori_paths = np.asarray(group["eff_orientation_path_length"])
        success_pos_paths = pos_paths[unskipped_successes]
        success_ori_paths = ori_paths[unskipped_successes]
        success_times = all_times[np.asarray(group["success"])]
        num_steps = np.asarray(group["num_steps"])
        success_num_steps = num_steps[unskipped_successes]

        depths = np.array(
            [d for row in group["collision_depths"] for d in row]
        )
        with np.errstate(invalid="ignore"):
            mean_depth = 100 * np.mean(depths) if depths.size else np.nan
            median_depth = 100 * np.median(depths) if depths.size else np.nan

        return {
            "success": success,
            "total": len(group["success"]),
            "skips": len(skips),
            "time": (np.mean(success_times), np.std(success_times)),
            "step time": (
                np.mean(success_times / success_num_steps)
                if success_num_steps.size
                else np.nan,
                np.std(success_times / success_num_steps)
                if success_num_steps.size
                else np.nan,
            ),
            "env collision": percent_true(group["collision"]),
            "self collision": percent_true(group["self_collision"]),
            "joint violation": percent_true(group["joint_limit_violation"]),
            "physical violations": percent_true(group["physical_violations"]),
            "average collision depth": mean_depth,
            "median collision depth": median_depth,
            "1 cm": percent_true(pos < 1),
            "5 cm": percent_true(pos < 5),
            "15 deg": percent_true(ori < 15),
            "30 deg": percent_true(ori < 30),
            "165 deg": percent_true(ori > 165),
            "is smooth": percent_true(
                np.logical_and(
                    np.asarray(group["config_smoothness"]) < SMOOTHNESS_THRESHOLD,
                    np.asarray(group["eff_smoothness"]) < SMOOTHNESS_THRESHOLD,
                )
            ),
            "average config sparc": np.mean(group["config_smoothness"]),
            "average eff sparc": np.mean(group["eff_smoothness"]),
            "eff position path length": (
                np.mean(success_pos_paths) if success_pos_paths.size else np.nan,
                np.std(success_pos_paths) if success_pos_paths.size else np.nan,
            ),
            "eff orientation path length": (
                np.mean(success_ori_paths) if success_ori_paths.size else np.nan,
                np.std(success_ori_paths) if success_ori_paths.size else np.nan,
            ),
        }

    # -- reporting (metrics.py:665-763) --------------------------------------

    @staticmethod
    def print_metrics(group: Dict[str, Any]) -> None:
        m = Evaluator.metrics(group)
        print(f"Total problems: {m['total']}")
        print(f"# Skips (Hard Failures): {m['skips']}")
        print(f"% Success: {m['success']:4.2f}")
        print(f"% Within 1cm: {m['1 cm']:4.2f}")
        print(f"% Within 5cm: {m['5 cm']:4.2f}")
        print(f"% Within 15deg: {m['15 deg']:4.2f}")
        print(f"% Within 30deg: {m['30 deg']:4.2f}")
        print(f"% Within 15deg of 180: {m['165 deg']:4.2f}")
        print(f"% With Environment Collision: {m['env collision']:4.2f}")
        print(f"% With Self Collision: {m['self collision']:4.2f}")
        print(f"% With Joint Limit Violations: {m['joint violation']:4.2f}")
        print(f"Average Collision Depth (cm): {m['average collision depth']}")
        print(f"Median Collision Depth (cm): {m['median collision depth']}")
        print(f"% With Physical Violations: {m['physical violations']:4.2f}")
        print(f"Average Config SPARC: {m['average config sparc']:4.2f}")
        print(f"Average End Eff SPARC: {m['average eff sparc']:4.2f}")
        print(f"% Smooth: {m['is smooth']:4.2f}")
        print(
            "Average End Eff Position Path Length:"
            f" {m['eff position path length'][0]:4.2f}"
            f" ± {m['eff position path length'][1]:4.2f}"
        )
        print(
            "Average End Eff Orientation Path Length:"
            f" {m['eff orientation path length'][0]:4.2f}"
            f" ± {m['eff orientation path length'][1]:4.2f}"
        )
        print(f"Average Time: {m['time'][0]:4.2f} ± {m['time'][1]:4.2f}")
        print(
            "Average Time Per Step (Not Always Valuable):"
            f" {m['step time'][0]:4.6f}"
            f" ± {m['step time'][1]:4.6f}"
        )

    def print_group_metrics(self, key: Optional[str] = None) -> None:
        if key is not None:
            self.current_group = self.groups[key]
            self.current_group_key = key
        assert self.current_group is not None
        self.print_metrics(self.current_group)

    def print_overall_metrics(self) -> None:
        supergroup: Dict[str, list] = {}
        keys = set()
        for group in self.groups.values():
            keys.update(group.keys())
        for key in keys:
            rows: list = []
            for group in self.groups.values():
                rows.extend(group.get(key, []))
            supergroup[key] = rows
        self.print_metrics(supergroup)

    def save_group(
        self, directory: str, test_name: str, key: Optional[str] = None
    ) -> None:
        group = self.current_group if key is None else self.groups[key]
        path = Path(directory) / f"{test_name}_{self.current_group_key}.pkl"
        with open(path, "wb") as f:
            pickle.dump(group, f)

    def save(self, directory: str, test_name: str) -> None:
        path = Path(directory) / f"{test_name}_metrics.pkl"
        with open(path, "wb") as f:
            pickle.dump(self.groups, f)
