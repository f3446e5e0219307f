"""v3 session: SA stages + full forward + rollout with the batched-matmul
kernel, tiles (32, 32), FPS tile 32; f32 and bf16-cloud variants."""
import time, sys
import jax, jax.numpy as jnp, numpy as np

def bench(name, f, *args, n=8):
    try:
        r = f(*args); jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / n
        print(f"{name:36s} {dt*1e3:9.2f} ms", flush=True)
        return dt
    except Exception as e:
        msg = str(e); i = max(msg.find("Mosaic"), 0)
        print(f"{name:36s} FAIL {msg[i:i+160]}", flush=True)
        return None

from mpinets_tpu.kernels import pallas_ops
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.model.fused import make_fused_apply
from mpinets_tpu.rollout.engine import make_rollout_fn
from mpinets_tpu.data.synthetic import random_problem_batch

key = jax.random.PRNGKey(0)
B = 256
mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2

xyz = jax.random.uniform(key, (B, 6272, 3), minval=-0.7, maxval=0.7)
feat = jax.random.uniform(key, (B, 6272, 1))
cent = xyz[:, :512]
w = [mk(1,(4,64)), mk(2,(64,)), mk(3,(64,64)), mk(4,(64,)), mk(5,(64,64)), mk(6,(64,))]
for ts in (8, 32):
    bench(f"SA0 v3 B={B} ts={ts}",
        jax.jit(lambda *a, ts=ts: pallas_ops.sa_stage(
            *a, radius=0.05, nsample=128, tile_s=ts)),
        xyz, feat, cent, *w)

model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
pc = jnp.concatenate([xyz, feat], axis=-1)
qn = jax.random.uniform(key, (B, 7), minval=-1, maxval=1)
variables = model.init(jax.random.fold_in(key, 3), pc[:1], qn[:1])
for label, kw in (("std", {}), ("bf16cloud", {"bf16_cloud": True})):
    fused = jax.jit(make_fused_apply(jnp.bfloat16, **kw))
    dt = bench(f"FULL v3 fwd B={B} {label}", fused, variables, pc, qn)
    if dt:
        print(f"  -> {B/dt:,.0f} forwards/s", flush=True)

prob = random_problem_batch(jax.random.fold_in(key, 4), B)
for label, kw in (("std", {}), ("bf16cloud", {"bf16_cloud": True})):
    ros = make_rollout_fn(model, max_steps=5, stop_on_success=False,
                          record_trajectory=False,
                          apply_fn=make_fused_apply(jnp.bfloat16, **kw))
    rol = make_rollout_fn(model, max_steps=30, stop_on_success=False,
                          record_trajectory=False,
                          apply_fn=make_fused_apply(jnp.bfloat16, **kw))
    ts_ = bench(f"rollout5 {label}", ros, variables, prob, key, n=3)
    tl_ = bench(f"rollout30 {label}", rol, variables, prob, key, n=3)
    if ts_ and tl_ and tl_ > ts_:
        rate = B * 25 / (tl_ - ts_)
        print(f"  -> {label}: {rate:,.0f} env-steps/s (vs_baseline {rate/12500:.3f})", flush=True)
