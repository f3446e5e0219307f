"""One-shot on-chip sweep: FPS v1/v2 micro + fused rollout, incremental log.

Single process (axon tunnel discipline: never kill; this script bounds its
own work). Writes progress lines to .bench_r2b.log as it goes.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

LOG = open(".bench_r2b.log", "a", buffering=1)


def log(msg):
    print(msg, file=LOG)
    print(msg, flush=True)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # force d2h
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / reps


def fps_micro():
    from mpinets_tpu.kernels import pallas_ops

    B = 256
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (B, 6272, 3), minval=-1, maxval=1)
    xyz_small = jax.random.uniform(key, (B, 512, 3), minval=-1, maxval=1)
    for n, npoint, pts in ((6272, 512, xyz), (512, 128, xyz_small)):
        for impl in ("v1", "v2"):
            for tile in (32, 64):
                for dt in ("f32", "bf16"):
                    p = pts.astype(jnp.bfloat16) if dt == "bf16" else pts
                    try:
                        f = functools.partial(
                            pallas_ops.furthest_point_sample_with_coords,
                            npoint=npoint, batch_tile=tile, impl=impl,
                        )
                        dtm = timeit(f, p, reps=5)
                        log(f"FPS {n}->{npoint} {impl} tile={tile} {dt}: "
                            f"{dtm*1e3:.2f} ms  ({dtm/B*1e6:.1f} us/sample)")
                    except Exception as e:  # noqa
                        log(f"FPS {n}->{npoint} {impl} tile={tile} {dt}: "
                            f"FAIL {type(e).__name__}: {e}")


def sa_micro():
    from mpinets_tpu.kernels import pallas_ops

    B = 64
    key = jax.random.PRNGKey(0)
    # SA0 shapes
    xyz = jax.random.uniform(key, (B, 6272, 3), minval=-0.9, maxval=0.9)
    feat = jax.random.uniform(key, (B, 6272, 1))
    cent = xyz[:, :512]
    mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.1
    w1, b1 = mk(1, (4, 64)), mk(2, (64,))
    w2, b2 = mk(3, (64, 64)), mk(4, (64,))
    w3, b3 = mk(5, (64, 64)), mk(6, (64,))
    for ts in (16, 32, 64, 128):
        try:
            f = functools.partial(
                pallas_ops.sa_stage, radius=0.05, nsample=128,
                compute_dtype=jnp.bfloat16, tile_s=ts,
            )
            dt = timeit(lambda: f(xyz, feat, cent, w1, b1, w2, b2, w3, b3),
                        reps=5)
            log(f"SA0 B={B} ts={ts}: {dt*1e3:.2f} ms ({dt/B*1e6:.0f} us/sample)")
        except Exception as e:  # noqa
            log(f"SA0 ts={ts}: FAIL {type(e).__name__}: {e}")
    # SA1 shapes
    xyz1 = jax.random.uniform(key, (B, 512, 3), minval=-0.9, maxval=0.9)
    feat1 = jax.random.uniform(key, (B, 512, 64))
    cent1 = xyz1[:, :128]
    w1b = mk(7, (67, 128))
    w2b, w3b = mk(8, (128, 128)), mk(9, (128, 256))
    b1b, b2b, b3b = mk(10, (128,)), mk(11, (128,)), mk(12, (256,))
    for ts in (16, 32, 64, 128):
        try:
            f = functools.partial(
                pallas_ops.sa_stage, radius=0.3, nsample=128,
                compute_dtype=jnp.bfloat16, tile_s=ts,
            )
            dt = timeit(
                lambda: f(xyz1, feat1, cent1, w1b, b1b, w2b, b2b, w3b, b3b),
                reps=5,
            )
            log(f"SA1 B={B} ts={ts}: {dt*1e3:.2f} ms ({dt/B*1e6:.0f} us/sample)")
        except Exception as e:  # noqa
            log(f"SA1 ts={ts}: FAIL {type(e).__name__}: {e}")


def forward_micro():
    from mpinets_tpu.model.fused import make_fused_apply
    from mpinets_tpu.model.policy import MotionPolicyNetwork

    model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
    B = 256
    pc = jax.random.uniform(rng, (B, 6272, 4))
    q = jax.random.uniform(rng, (B, 7), minval=-1, maxval=1)
    for bf16_cloud in (False, True):
        for impl in ("v1", "v2"):
            f = jax.jit(make_fused_apply(
                jnp.bfloat16, bf16_cloud=bf16_cloud, fps_impl=impl
            ))
            dt = timeit(f, params, pc, q, reps=5)
            log(f"FWD B={B} bf16_cloud={bf16_cloud} fps={impl}: "
                f"{dt*1e3:.2f} ms ({dt/B*1e6:.0f} us/sample)")


def rollout_bench():
    from mpinets_tpu.data.synthetic import random_problem_batch
    from mpinets_tpu.model.fused import make_fused_apply
    from mpinets_tpu.model.policy import MotionPolicyNetwork
    from mpinets_tpu.rollout.engine import make_rollout_fn

    model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))

    for bf16_cloud in (False, True):
        for fps_impl in ("v1", "v2"):
            apply_fn = make_fused_apply(
                jnp.bfloat16, bf16_cloud=bf16_cloud, fps_impl=fps_impl
            )
            for b in (256, 512):
                problem = random_problem_batch(jax.random.fold_in(rng, b), b)
                rolls = {
                    n: make_rollout_fn(
                        model, max_steps=n, stop_on_success=False,
                        record_trajectory=False, apply_fn=apply_fn,
                    )
                    for n in (5, 30)
                }
                ts = {}
                for n, r in rolls.items():
                    r(params, problem, rng).final_q.block_until_ready()
                    np.asarray(r(params, problem, rng).final_q)
                best = 0.0
                for rep in range(3):
                    k = jax.random.fold_in(rng, 50 + rep)
                    t5 = time.perf_counter()
                    np.asarray(rolls[5](params, problem, k).final_q)
                    t5 = time.perf_counter() - t5
                    t30 = time.perf_counter()
                    np.asarray(rolls[30](params, problem, k).final_q)
                    t30 = time.perf_counter() - t30
                    if t30 > t5:
                        best = max(best, b * 25 / (t30 - t5))
                log(f"ROLLOUT bf16_cloud={bf16_cloud} fps={fps_impl} B={b}: "
                    f"{best:,.0f} env-steps/s")


if __name__ == "__main__":
    log(f"=== bench_r2b start {time.strftime('%H:%M:%S')} on "
        f"{jax.devices()[0].platform} ===")
    sa_micro()
    fps_micro()
    forward_micro()
    rollout_bench()
    log("=== done ===")
