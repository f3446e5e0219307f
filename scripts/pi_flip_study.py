"""Quantify the right_gripper pi-yaw ambiguity with the real gripper mesh
(VERDICT r4 #6).

Question: 14-19% of evaluated finals land within 15 deg of a 180-deg-yaw-
FLIPPED target (TRAIN_r4.md). The policy sees the target ONLY as a
128-point cloud; is that cloud actually distinguishable from its pi-flip,
or does the task input genuinely underdetermine the yaw?

Method (reference geometry: the one real mesh on disk,
``interactive_demo/mpinets_ros/meshes/half_open_gripper.stl``, verified to
be in the right_gripper frame):

1. MESH study — what the reference policy sees: sample two independent
   128-point area-weighted surface clouds A, B; chamfer(A, B) is the
   sampling-noise floor. chamfer(A, Rz(pi) B) is the flip signal. Report
   both distributions and the detection rate (fraction of trials where the
   flip distance exceeds the 95th percentile of the noise floor).
2. BANK study — what THIS framework's policy sees: the fixed 128-point
   sphere-union gripper bank (robot/point_banks.py gripper_bank). The bank
   is deterministic, so the flip distance is a single number; scale it
   against the bank's own resolution (mean nearest-neighbor spacing).

Output: one JSON line + human-readable summary, for TRAIN_r5.md.
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from mpinets_tpu.eval.hull_proxy import load_gripper_mesh, sample_mesh_surface
from mpinets_tpu.robot import franka
from mpinets_tpu.robot.point_banks import gripper_bank

FLIP = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)  # Rz(pi)


def chamfer(a: np.ndarray, b: np.ndarray) -> float:
    d2 = np.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return 0.5 * (
        float(np.sqrt(d2.min(axis=1)).mean())
        + float(np.sqrt(d2.min(axis=0)).mean())
    )


def main() -> None:
    rng = np.random.default_rng(0)
    tri = load_gripper_mesh()

    # -- mesh study ---------------------------------------------------------
    K = 200
    d_noise, d_flip = [], []
    for _ in range(K):
        a = sample_mesh_surface(tri, 128, rng)
        b = sample_mesh_surface(tri, 128, rng)
        d_noise.append(chamfer(a, b))
        d_flip.append(chamfer(a, b @ FLIP.T))
    d_noise = np.array(d_noise)
    d_flip = np.array(d_flip)
    thresh = float(np.percentile(d_noise, 95))
    detect = float((d_flip > thresh).mean())

    # Strongest KNOWN discriminator: the hand-body bulge toward +y_rg
    # (r3 mesh audit: triangle-centroid mean y = +0.036 over the body
    # band z in [-0.13, -0.06]). Statistic s = mean(y | z in band); a flip
    # negates it. Detection = P(s > 0) on unflipped clouds (flip symmetric).
    s_vals = []
    for _ in range(K):
        c = sample_mesh_surface(tri, 128, rng)
        band = (c[:, 2] > -0.13) & (c[:, 2] < -0.06)
        s_vals.append(float(c[band, 1].mean()) if band.any() else 0.0)
    s_vals = np.array(s_vals)
    bulge_detect = float((s_vals > 0).mean())

    # -- bank study ---------------------------------------------------------
    bank = gripper_bank(128)
    # express bank points in the right_gripper frame: FK at any q gives the
    # same RELATIVE geometry; use the local frames composed at neutral q and
    # re-express relative to the right_gripper frame.
    import jax.numpy as jnp

    from mpinets_tpu.kernels import kinematics

    q = jnp.asarray(franka.NEUTRAL_Q, jnp.float32)[None]
    rots, trans = kinematics.fk_frames(q)
    rots = np.asarray(rots)[0]    # [F, 3, 3]
    trans = np.asarray(trans)[0]  # [F, 3]
    pts_world = (
        np.einsum("pij,pj->pi", rots[bank.frames], bank.points)
        + trans[bank.frames]
    )
    g_r, g_t = rots[franka.EFF_FRAME], trans[franka.EFF_FRAME]
    pts_rg = (pts_world - g_t) @ g_r  # into right_gripper frame
    bank_flip = chamfer(pts_rg, pts_rg @ FLIP.T)
    nn = np.sqrt(
        np.sort(
            np.sum((pts_rg[:, None] - pts_rg[None]) ** 2, axis=-1), axis=1
        )[:, 1]
    ).mean()

    result = {
        "mesh_noise_chamfer_mm": round(1e3 * float(d_noise.mean()), 3),
        "mesh_noise_p95_mm": round(1e3 * thresh, 3),
        "mesh_flip_chamfer_mm": round(1e3 * float(d_flip.mean()), 3),
        "mesh_flip_detect_rate": detect,
        "bank_flip_chamfer_mm": round(1e3 * bank_flip, 3),
        "bank_nn_spacing_mm": round(1e3 * float(nn), 3),
        "bulge_stat_mean_mm": round(1e3 * float(s_vals.mean()), 3),
        "bulge_stat_std_mm": round(1e3 * float(s_vals.std()), 3),
        "bulge_detect_rate": bulge_detect,
        "trials": K,
    }
    print(json.dumps(result))
    print(
        f"\nmesh: noise floor {result['mesh_noise_chamfer_mm']} mm "
        f"(p95 {result['mesh_noise_p95_mm']}), flip "
        f"{result['mesh_flip_chamfer_mm']} mm, detection rate "
        f"{100*detect:.0f}%"
    )
    print(
        f"bank: flip chamfer {result['bank_flip_chamfer_mm']} mm vs "
        f"nn spacing {result['bank_nn_spacing_mm']} mm"
    )


if __name__ == "__main__":
    main()
