"""Self-collision checker calibration against the independent capsule proxy.

The 57-sphere self-collision pair table (robot/franka.py) mimics robofin's
FrankaSelfCollisionChecker but its exclusion set was hand-derived (VERDICT
r2: "never validated against robofin's tuned model"). This script measures
its agreement with an INDEPENDENT proxy: segment-segment distances between
the arm capsules of eval/hull_proxy.py (axes from the URDF joint-origin
chain) plus the real gripper-mesh bounding capsule, for all link pairs at
least 2 joints apart. Run on CPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import sys

sys.path.insert(0, "/root/repo")

import itertools

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mpinets_tpu.data.synthetic import random_configuration
from mpinets_tpu.eval import hull_proxy
from mpinets_tpu.kernels import kinematics
from mpinets_tpu.robot import franka


def _seg_seg_dist(p1, q1, p2, q2):
    """Min distance between segments [p1,q1] and [p2,q2] (batched)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-12), 0, 1), 0.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, 1e-12), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    c1 = p1 + s[..., None] * d1
    c2 = p2 + t[..., None] * d2
    return jnp.linalg.norm(c1 - c2, axis=-1)


# capsules in link frames (hull_proxy) + a gripper capsule in right_gripper
CAPS = [
    (franka.FRAME_INDEX[f], np.asarray(p0), np.asarray(p1), r)
    for f, p0, p1, r in hull_proxy.ARM_CAPSULES
] + [
    (franka.FRAME_INDEX["right_gripper"],
     np.array([0.0, -0.09, -0.09]), np.array([0.0, 0.09, -0.09]), 0.04),
]
# physical chain depth of each capsule's frame (driving-joint count):
# link8/hand/fingers/right_gripper are all rigidly attached past joint 7,
# so frame-index distance is NOT physical adjacency.
CHAIN_DEPTH = {
    "panda_link0": 0, "panda_link1": 1, "panda_link2": 2, "panda_link3": 3,
    "panda_link4": 4, "panda_link5": 5, "panda_link6": 6, "panda_link7": 7,
    "panda_link8": 8, "panda_hand": 8, "panda_leftfinger": 8,
    "panda_rightfinger": 8, "panda_leftfingertip": 8,
    "panda_rightfingertip": 8, "right_gripper": 8,
}


def capsule_self_collision(q):
    rots, transs = kinematics.fk_frames(q)
    ends = []
    for f, p0, p1, r in CAPS:
        R = rots[..., f, :, :]
        t = transs[..., f, :]
        ends.append((
            jnp.einsum("...ij,j->...i", R, jnp.asarray(p0, q.dtype)) + t,
            jnp.einsum("...ij,j->...i", R, jnp.asarray(p1, q.dtype)) + t,
            r,
            f,
        ))
    hit = jnp.zeros(q.shape[:-1], bool)
    for i, j in itertools.combinations(range(len(ends)), 2):
        fi, fj = ends[i][3], ends[j][3]
        di = CHAIN_DEPTH[franka.FRAMES[fi]]
        dj = CHAIN_DEPTH[franka.FRAMES[fj]]
        if abs(di - dj) < 4:
            # adjacent bodies legitimately touch; the long forearm capsule
            # (depth 4, spanning joints 4-5) physically reaches the wrist
            # bodies (depth 6-7), so the margin is 4 joints, not 3
            continue
        d = _seg_seg_dist(ends[i][0], ends[i][1], ends[j][0], ends[j][1])
        hit = hit | (d < ends[i][2] + ends[j][2])
    return hit


def main():
    n = 4096
    qs = random_configuration(jax.random.PRNGKey(0), (n,))
    sphere = np.asarray(jax.jit(kinematics.self_collision)(qs)).any(-1) \
        if jax.jit(kinematics.self_collision)(qs).ndim > 1 \
        else np.asarray(jax.jit(kinematics.self_collision)(qs))
    caps = np.asarray(jax.jit(capsule_self_collision)(qs))
    both = int((sphere & caps).sum())
    print(f"samples {n}: sphere rate {sphere.mean():.3f}, "
          f"capsule-proxy rate {caps.mean():.3f}")
    print(f"agreement {100*(sphere == caps).mean():.1f}%  "
          f"recall(sphere finds proxy hits) {both/max(caps.sum(),1):.3f}  "
          f"precision {both/max(sphere.sum(),1):.3f}")


if __name__ == "__main__":
    main()
