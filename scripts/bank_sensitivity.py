"""Sphere-bank geometry sensitivity study (VERDICT r2 #8).

The robot surface banks are sphere-union samples because no Panda link
meshes exist in this environment (robot/point_banks.py). This script bounds
how much that approximation can matter: it perturbs every bank point along
its radial direction by the sphere-fit error scale and measures the induced
drift in (a) the point-match loss between random config pairs and (b) the
policy output (delta-q) when the robot segment of the input cloud comes
from the perturbed bank. Run on CPU; results are recorded in
robot/point_banks.py's docstring.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mpinets_tpu.robot import franka, point_banks, sampler
from mpinets_tpu.data.synthetic import random_configuration

RNG = np.random.default_rng(0)


def perturbed_bank_cloud(q, delta: float, seed: int = 0):
    """World cloud from a bank whose points are displaced radially (away
    from each point's sphere center) by N(0, delta) -- the sphere-fit error
    model: real mesh surfaces sit within ~delta of the sphere union."""
    bank = point_banks.full_robot_bank(point_banks.DEFAULT_BANK_SIZE, 0)
    rng = np.random.default_rng(seed)
    pts = bank.points.copy()
    # radial direction: from the nearest sphere center in the same frame
    for fi in np.unique(bank.frames):
        m = bank.frames == fi
        sm = franka.SPHERE_FRAMES == fi
        if not sm.any():
            continue
        centers = franka.SPHERE_CENTERS[sm]
        d = np.linalg.norm(
            pts[m][:, None, :] - centers[None], axis=-1
        )
        nearest = centers[np.argmin(d, axis=1)]
        dirs = pts[m] - nearest
        dirs /= np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        pts[m] = pts[m] + dirs * rng.normal(0.0, delta, (m.sum(), 1))
    from mpinets_tpu.robot.sampler import _group_slices

    order, groups = _group_slices(bank.frames)
    points = pts[order]
    from mpinets_tpu.kernels import kinematics

    rots, transs = kinematics.fk_frames(q)
    chunks = []
    for frame, a, b in groups:
        r = rots[..., frame, :, :]
        t = transs[..., frame, :]
        chunks.append(
            jnp.einsum("...ij,pj->...pi", r, jnp.asarray(points[a:b], q.dtype))
            + t[..., None, :]
        )
    return jnp.concatenate(chunks, axis=-2)


def main():
    qs = random_configuration(jax.random.PRNGKey(1), (64,))
    qs2 = random_configuration(jax.random.PRNGKey(2), (64,))

    base = sampler.bank_point_cloud(qs, "full")
    base2 = sampler.bank_point_cloud(qs2, "full")
    # pointwise "loss" distance between two configs, reference point-match
    # structure (loss.py:31-44): mean L2 between corresponding points
    ref_gap = float(jnp.mean(jnp.linalg.norm(base - base2, axis=-1)))

    print(f"baseline inter-config point-match scale: {ref_gap*100:.2f} cm")
    for delta in (0.002, 0.005, 0.010):
        pert = perturbed_bank_cloud(qs, delta, seed=3)
        drift = float(jnp.mean(jnp.linalg.norm(base - pert, axis=-1)))
        rel = drift / ref_gap
        print(
            f"delta={delta*1000:.0f} mm: loss-metric drift "
            f"{drift*100:.3f} cm = {100*rel:.1f}% of the inter-config scale"
        )

    # policy-output sensitivity: random-weight policy, robot segment swapped
    from mpinets_tpu.model.policy import MotionPolicyNetwork

    model = MotionPolicyNetwork(compute_dtype=jnp.float32)
    key = jax.random.PRNGKey(5)
    params = model.init(key, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
    nrob = 2048
    obstacle = jax.random.uniform(
        jax.random.fold_in(key, 1), (8, 4224, 3), minval=-0.7, maxval=0.7
    )
    labels = jnp.concatenate(
        [jnp.zeros((8, nrob, 1)), jnp.ones((8, 4096, 1)),
         2.0 * jnp.ones((8, 128, 1))], axis=1
    )
    qb = random_configuration(jax.random.PRNGKey(7), (8,))
    qn = jnp.zeros((8, 7))

    def dq_with(robot_pts):
        cloud = jnp.concatenate(
            [jnp.concatenate([robot_pts[:, :nrob], obstacle], axis=1), labels],
            axis=-1,
        )
        return model.apply(params, cloud, qn)

    dq0 = dq_with(sampler.bank_point_cloud(qb, "full"))
    scale = float(jnp.mean(jnp.abs(dq0)))
    for delta in (0.002, 0.005, 0.010):
        dq1 = dq_with(perturbed_bank_cloud(qb, delta, seed=4))
        d = float(jnp.mean(jnp.abs(dq1 - dq0)))
        print(
            f"delta={delta*1000:.0f} mm: policy |ddq| {d:.5f} "
            f"({100*d/scale:.1f}% of mean |dq| {scale:.5f})"
        )


if __name__ == "__main__":
    main()
