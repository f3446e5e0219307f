"""On-chip session r4g: residual tuning probes for the fast8 config.

* SA1 tile_s 16/32/64 (fewer grid steps per sample at SA1),
* FPS v1 vs v2 under fast8,
* rollout at B=384.
Self-bounding; JSONL to .onchip_r4g.jsonl.
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

LOG = open("/root/repo/.onchip_r4g.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:250], file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"))

from mpinets_tpu.model.fused import make_fused_apply
from mpinets_tpu.model.policy import MotionPolicyNetwork

model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
kb = jax.random.PRNGKey(7)
BB = 256
pc_b = jnp.concatenate(
    [
        jax.random.uniform(kb, (BB, 6272, 3), minval=-0.8, maxval=0.8),
        jax.random.randint(jax.random.fold_in(kb, 1), (BB, 6272, 1), 0, 3
                           ).astype(jnp.float32),
    ],
    axis=-1,
)
q_b = jax.random.uniform(jax.random.fold_in(kb, 2), (BB, 7), minval=-1,
                         maxval=1)


def diff_time(name, apply_fn):
    try:
        def mk(k):
            @jax.jit
            def loop():
                def body(i, c):
                    out = apply_fn(params, pc_b + (c * 1e-9).astype(jnp.float32),
                                   q_b)
                    return c + jnp.sum(out) * 1e-6
                return jax.lax.fori_loop(0, k, body, 0.0)
            return loop
        fns = {k: mk(k) for k in (2, 10)}
        for f in fns.values():
            float(f())
        ts = {}
        for k, f in fns.items():
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(f())
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        per = (ts[10] - ts[2]) / 8
        emit(kind="time", name=name, us_per_sample=round(per * 1e6 / BB, 2))
    except Exception:
        emit(kind="time", name=name, err=traceback.format_exc()[-300:])


for ts1 in (16, 32, 64):
    diff_time(
        f"fast8_sa1ts{ts1}",
        make_fused_apply(jnp.bfloat16, sa_impl="v8", fast_grouping=8,
                         sa_tiles=(16, ts1)),
    )
diff_time(
    "fast8_fpsv2",
    make_fused_apply(jnp.bfloat16, sa_impl="v8", fast_grouping=8,
                     fps_impl="v2"),
)

from mpinets_tpu.data.synthetic import random_problem_batch
from mpinets_tpu.rollout.engine import make_rollout_fn

try:
    bb = 384
    apply_fn = make_fused_apply(jnp.bfloat16, sa_impl="v8", fast_grouping=8)
    problem = random_problem_batch(jax.random.fold_in(rng, 3), bb)
    rollouts = {
        n: make_rollout_fn(model, max_steps=n, stop_on_success=False,
                           record_trajectory=False, apply_fn=apply_fn)
        for n in (5, 30)
    }
    times = {}
    for n, r in rollouts.items():
        np.asarray(r(params, problem, rng).final_q)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(r(params, problem, rng).final_q)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    rate = bb * 25 / (times[30] - times[5])
    emit(kind="rollout", name="fast8_b384", env_steps_per_s=round(rate, 1))
except Exception:
    emit(kind="rollout", name="fast8_b384", err=traceback.format_exc()[-300:])

emit(kind="done", t=time.strftime("%H:%M:%S"))
