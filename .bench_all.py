"""Consolidated TPU bench: FPS, SA stages, full fused forward, rollout rate.
Run everything in ONE process to minimize tunnel churn."""
import time, sys
import jax, jax.numpy as jnp, numpy as np

def bench(name, f, *args, n=5):
    try:
        r = f(*args); jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / n
        print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
        return dt
    except Exception as e:
        msg = str(e)
        i = msg.find("Not implemented")
        j = msg.find("Mosaic")
        print(f"{name:34s} FAIL {msg[max(i,j,0):max(i,j,0)+120]}", flush=True)
        return None

from mpinets_tpu.kernels import pallas_ops
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.model.fused import make_fused_apply

key = jax.random.PRNGKey(0)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2

# --- FPS (batch-tile sweep)
xyz = jax.random.uniform(key, (B, 6272, 3), minval=-0.7, maxval=0.7)
for tb in (8, 16, 32):
    bench(f"fps0 B={B} tb={tb}",
          jax.jit(lambda x, tb=tb: pallas_ops.furthest_point_sample_with_coords(
              x, 512, batch_tile=tb)), xyz)

# --- SA stages
feat = jax.random.uniform(key, (B, 6272, 1))
cent = xyz[:, :512]
w = [mk(1,(4,64)), mk(2,(64,)), mk(3,(64,64)), mk(4,(64,)), mk(5,(64,64)), mk(6,(64,))]
t0 = bench(f"SA0 fused B={B}",
    jax.jit(lambda *a: pallas_ops.sa_stage(*a, radius=0.05, nsample=128)),
    xyz, feat, cent, *w)
xyz1, feat1, cent1 = xyz[:, :512], jax.random.normal(key, (B, 512, 64)), xyz[:, :128]
w1 = [mk(7,(67,128)), mk(8,(128,)), mk(9,(128,128)), mk(10,(128,)), mk(11,(128,256)), mk(12,(256,))]
bench(f"SA1 fused B={B}",
    jax.jit(lambda *a: pallas_ops.sa_stage(*a, radius=0.3, nsample=128)),
    xyz1, feat1, cent1, *w1)

# --- full fused forward
model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
pc = jnp.concatenate([xyz, feat], axis=-1)
qn = jax.random.uniform(key, (B, 7), minval=-1, maxval=1)
variables = model.init(jax.random.fold_in(key, 3), pc[:1], qn[:1])
fused = jax.jit(make_fused_apply(compute_dtype=jnp.bfloat16))
dt = bench(f"FULL fused forward B={B}", fused, variables, pc, qn)
if dt:
    print(f"  -> {B/dt:,.0f} forwards/s", flush=True)

# --- rollout steady-state rate with fused apply
from mpinets_tpu.rollout.engine import make_rollout_fn
from mpinets_tpu.data.synthetic import random_problem_batch
prob = random_problem_batch(jax.random.fold_in(key, 4), B)
for steps in (10, 40):
    globals()[f"ro{steps}"] = make_rollout_fn(
        model, max_steps=steps, stop_on_success=False,
        record_trajectory=False, apply_fn=make_fused_apply(jnp.bfloat16))
t_s = bench(f"rollout 10 steps B={B}", globals()["ro10"], variables, prob, key, n=3)
t_l = bench(f"rollout 40 steps B={B}", globals()["ro40"], variables, prob, key, n=3)
if t_s and t_l and t_l > t_s:
    rate = B * 30 / (t_l - t_s)
    print(f"  -> steady-state env-steps/s/chip: {rate:,.0f} (vs_baseline {rate/12500:.3f})", flush=True)
