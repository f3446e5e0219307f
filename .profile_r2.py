"""Round-2 profiling: per-stage cost of the policy forward + rollout step
on the real chip, swept over batch size. Times K-iteration jitted loops and
reports per-iteration µs (long/short differencing removes dispatch cost).

Usage: python .profile_r2.py [--batches 32,128,512]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpinets_tpu.kernels import pointnet
from mpinets_tpu.robot import sampler


def timed_loop(fn, feedback, iters):
    """Build jit'd loop running fn `iters` times with a serial dependency.

    fn: x -> y; feedback: (x, y) -> x' (cheap, keeps iterations serial).
    """

    def run(x):
        def body(x, _):
            y = fn(x)
            return feedback(x, y), None

        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x

    return jax.jit(run)


def measure(name, fn, feedback, x, iters=24, iters_short=4):
    long = timed_loop(fn, feedback, iters)
    short = timed_loop(fn, feedback, iters_short)
    # compile both
    jax.block_until_ready(long(x))
    jax.block_until_ready(short(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(long(x))[0])[..., :1]
        t_long = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(short(x))[0])[..., :1]
        t_short = time.perf_counter() - t0
        if t_long > t_short:
            best = min(best, (t_long - t_short) / (iters - iters_short))
    print(f"  {name:36s} {best * 1e6:10.1f} us/iter")
    return best


def fb_perturb(x, y):
    """Generic feedback: x + tiny function of y (keeps serial dependency)."""
    s = jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)) * 1e-20
    return jax.tree_util.tree_map(lambda a: a + s.astype(a.dtype), x)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="64,256")
    p.add_argument("--dtype", type=str, default="float32")
    args = p.parse_args()
    dt = jnp.dtype(args.dtype)

    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}, dtype={dt}")

    for b in [int(x) for x in args.batches.split(",")]:
        print(f"\n=== batch {b} ===")
        xyz = jax.random.normal(key, (b, 6272, 3), dt) * 0.5
        feat = jax.random.uniform(key, (b, 6272, 1), dt)

        # --- FPS stage 0: 6272 -> 512
        measure(
            "fps0 (6272->512)",
            lambda x: pointnet.furthest_point_sample(x, 512),
            lambda x, y: x + jnp.sum(y).astype(dt) * 1e-20,
            xyz,
            iters=12,
            iters_short=2,
        )

        cent = xyz[:, :512]

        # --- ball query stage 0
        measure(
            "bq0 (512 x 6272, r=.05, ns=128)",
            lambda c: pointnet.ball_query(c, xyz, 0.05, 128),
            fb_perturb,
            cent,
            iters=12,
            iters_short=2,
        )

        # --- query_and_group stage 0 (bq + gather + concat)
        measure(
            "group0 (bq+gather)",
            lambda c: pointnet.query_and_group(c, xyz, feat, 0.05, 128),
            fb_perturb,
            cent,
            iters=12,
            iters_short=2,
        )

        # --- SA0 MLP chain + max: [B,512,128,4] -> [B,512,64]
        w = [
            jax.random.normal(key, s, dt) * 0.1
            for s in ((4, 64), (64, 64), (64, 64))
        ]

        def mlp0(g):
            x = g
            for wi in w:
                x = jax.nn.relu(x @ wi)
            return jnp.max(x, axis=-2)

        grouped = jax.random.normal(key, (b, 512, 128, 4), dt)
        measure("mlp0+max ([B,512,128,4]->64)", mlp0, fb_perturb, grouped)

        # --- SA1 pieces
        xyz1 = xyz[:, :512]
        cent1 = xyz[:, :128]
        measure(
            "fps1 (512->128)",
            lambda x: pointnet.furthest_point_sample(x, 128),
            lambda x, y: x + jnp.sum(y).astype(dt) * 1e-20,
            xyz1,
            iters=12,
            iters_short=2,
        )
        feat1 = jax.random.normal(key, (b, 512, 64), dt)
        measure(
            "group1 (128 x 512, r=.3)",
            lambda c: pointnet.query_and_group(c, xyz1, feat1, 0.3, 128),
            fb_perturb,
            cent1,
            iters=12,
            iters_short=2,
        )
        w1 = [
            jax.random.normal(key, s, dt) * 0.1
            for s in ((67, 128), (128, 128), (128, 256))
        ]

        def mlp1(g):
            x = g
            for wi in w1:
                x = jax.nn.relu(x @ wi)
            return jnp.max(x, axis=-2)

        grouped1 = jax.random.normal(key, (b, 128, 128, 67), dt)
        measure("mlp1+max ([B,128,128,67]->256)", mlp1, fb_perturb, grouped1)

        # --- global SA + FC head
        wg = [
            jax.random.normal(key, s, dt) * 0.05
            for s in ((259, 512), (512, 512), (512, 1024))
        ]
        wf = [
            jax.random.normal(key, s, dt) * 0.02
            for s in ((1024, 4096), (4096, 2048), (2048, 2048))
        ]

        def tail(g):
            x = g
            for wi in wg:
                x = jax.nn.relu(x @ wi)
            x = jnp.max(x, axis=-2)
            for wi in wf:
                x = jax.nn.leaky_relu(x @ wi)
            return x

        gg = jax.random.normal(key, (b, 128, 259), dt)
        measure("globalSA+FChead", tail, fb_perturb, gg)

        # --- robot point resampling
        q = jax.random.uniform(key, (b, 7), dt) - 0.5

        def resample(qq):
            return sampler.sample_robot_points(qq, jax.random.PRNGKey(1), 2048)

        measure("sample_robot_points(2048)", resample, fb_perturb, q)

        # --- full policy forward
        from mpinets_tpu.model.policy import MotionPolicyNetwork

        model = MotionPolicyNetwork(compute_dtype=dt)
        params = model.init(key, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
        pc = jnp.concatenate([xyz, feat], axis=-1)
        qn = jax.random.uniform(key, (b, 7), jnp.float32) - 0.5

        def fwd(x):
            return model.apply(params, x, qn)

        us = measure("FULL forward", fwd, fb_perturb, pc, iters=8, iters_short=2)
        print(f"  -> forward-only rate: {b / us:,.0f} samples/s")


if __name__ == "__main__":
    main()
