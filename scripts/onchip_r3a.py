"""On-chip session r3a: AOT compile gate + Mosaic parity + stage timings.

Self-bounding (fixed config list, no external timeout — see tunnel notes in
.claude/skills/verify/SKILL.md). Appends JSONL records to .onchip_r3a.jsonl.

Run from /root/repo:  python scripts/onchip_r3a.py  (background, ~20-40 min)
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

LOG = open("/root/repo/.onchip_r3a.jsonl", "a", buffering=1)


def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), file=sys.stderr, flush=True)


emit(kind="start", t=time.strftime("%H:%M:%S"), devices=str(jax.devices()))

from mpinets_tpu.model.fused import fused_policy_apply, make_fused_apply
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.kernels import pallas_ops

B = 256
model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = jax.device_put(
    model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
)

# ---------------------------------------------------------------- 1. gates
PC = jax.ShapeDtypeStruct((B, 6272, 4), jnp.float32)
Q = jax.ShapeDtypeStruct((B, 7), jnp.float32)

GATES = [
    ("bf16_default", dict(compute_dtype=jnp.bfloat16)),
    ("f32", dict(compute_dtype=jnp.float32)),
    ("bf16_g16", dict(compute_dtype=jnp.bfloat16, gather16=True)),
    ("bf16_cloud", dict(compute_dtype=jnp.bfloat16, bf16_cloud=True)),
    ("bf16_cloud_g16",
     dict(compute_dtype=jnp.bfloat16, bf16_cloud=True, gather16=True)),
    ("bf16_fpsv2", dict(compute_dtype=jnp.bfloat16, fps_impl="v2")),
    ("bf16_ts16", dict(compute_dtype=jnp.bfloat16, sa_tiles=(16, 16))),
    ("bf16_ts64", dict(compute_dtype=jnp.bfloat16, sa_tiles=(64, 64))),
    ("bf16_ts64_g16",
     dict(compute_dtype=jnp.bfloat16, sa_tiles=(64, 64), gather16=True)),
]
gate_ok = {}
for name, kw in GATES:
    try:
        t0 = time.perf_counter()
        fused_policy_apply.lower(params, PC, Q, **kw).compile()
        gate_ok[name] = True
        emit(kind="gate", name=name, ok=True,
             secs=round(time.perf_counter() - t0, 1))
    except Exception as e:
        gate_ok[name] = False
        emit(kind="gate", name=name, ok=False,
             err=traceback.format_exc()[-800:])

# ------------------------------------------------- 2. on-chip Mosaic parity
# Small shapes, REAL compile (no interpret): catches Mosaic miscompiles that
# interpret-mode CPU tests cannot see.
try:
    npoints = (16, 8)
    small = MotionPolicyNetwork(sa_npoints=npoints)
    key = jax.random.PRNGKey(3)
    pc = jnp.concatenate(
        [
            jax.random.uniform(key, (8, 384, 3), minval=-0.7, maxval=0.7),
            jax.random.randint(key, (8, 384, 1), 0, 3).astype(jnp.float32),
        ],
        axis=-1,
    )
    q = jax.random.uniform(jax.random.fold_in(key, 1), (8, 7),
                           minval=-1, maxval=1)
    sv = small.init(jax.random.fold_in(key, 2), pc, q)
    ref = np.asarray(jax.jit(small.apply)(sv, pc, q))
    fused32 = np.asarray(
        make_fused_apply(jnp.float32, sa_npoints=npoints)(sv, pc, q)
    )
    err = float(np.abs(fused32 - ref).max())
    emit(kind="parity", name="fused_f32_vs_flax", max_abs_err=err,
         ok=bool(err < 2e-5))
    b16a = np.asarray(
        make_fused_apply(jnp.bfloat16, sa_npoints=npoints)(sv, pc, q)
    )
    if gate_ok.get("bf16_g16"):
        b16b = np.asarray(
            make_fused_apply(jnp.bfloat16, sa_npoints=npoints,
                             gather16=True)(sv, pc, q)
        )
        emit(kind="parity", name="g16_vs_g32_bf16",
             bitwise=bool((b16a == b16b).all()),
             max_abs_err=float(np.abs(b16a - b16b).max()))
except Exception:
    emit(kind="parity", name="EXC", err=traceback.format_exc()[-800:])

# ------------------------------------------------------ 3. stage timings
key = jax.random.PRNGKey(7)
xyz = jax.random.uniform(key, (B, 6272, 3), minval=-0.8, maxval=0.8)
feat = jax.random.randint(
    jax.random.fold_in(key, 1), (B, 6272, 1), 0, 3
).astype(jnp.float32)
pc_full = jnp.concatenate([xyz, feat], axis=-1)
qb = jax.random.uniform(jax.random.fold_in(key, 2), (B, 7),
                        minval=-1, maxval=1)
enc = params["params"]["point_cloud_encoder"]


def mlp_params(tree):
    return tuple(
        (tree[f"conv{i}"]["kernel"], tree[f"conv{i}"]["bias"])
        for i in range(3)
    )


def diff_time(name, make_loop, ks=(2, 12)):
    """make_loop(k) -> jitted zero-arg fn returning a scalar."""
    try:
        fns = {k: make_loop(k) for k in ks}
        for f in fns.values():
            float(f())  # compile + settle
        ts = {}
        for k, f in fns.items():
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(f())
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        per_call = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0])
        emit(kind="time", name=name, us_per_call=round(per_call * 1e6, 1),
             us_per_sample=round(per_call * 1e6 / B, 2))
    except Exception:
        emit(kind="time", name=name, err=traceback.format_exc()[-800:])


def fps_loop(k, impl="v1", tile=32, dtype=jnp.float32):
    x = xyz.astype(dtype)

    @jax.jit
    def run():
        def body(i, acc):
            _, c = pallas_ops.furthest_point_sample_with_coords(
                x + i * 1e-6, 512, batch_tile=tile, impl=impl
            )
            return acc + jnp.sum(c.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


def sa0_loop(k, ts=32, cdt=jnp.bfloat16, g16=False):
    (w1, b1), (w2, b2), (w3, b3) = mlp_params(enc["sa0"]["mlp"])
    cent = xyz[:, :512]

    @jax.jit
    def run():
        def body(i, acc):
            f, _ = pallas_ops.sa_stage(
                xyz + i * 1e-6, feat, cent, w1, b1, w2, b2, w3, b3,
                radius=0.05, nsample=128, compute_dtype=cdt,
                tile_s=ts, gather16=g16,
            )
            return acc + jnp.sum(f)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


def sa1_loop(k, ts=32, cdt=jnp.bfloat16, g16=False):
    (w1, b1), (w2, b2), (w3, b3) = mlp_params(enc["sa1"]["mlp"])
    c0 = xyz[:, :512]
    f0 = jax.random.normal(jax.random.fold_in(key, 9), (B, 512, 64))
    c1 = xyz[:, :128]

    @jax.jit
    def run():
        def body(i, acc):
            f, _ = pallas_ops.sa_stage(
                c0 + i * 1e-6, f0, c1, w1, b1, w2, b2, w3, b3,
                radius=0.3, nsample=128, compute_dtype=cdt,
                tile_s=ts, gather16=g16,
            )
            return acc + jnp.sum(f)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


def fwd_loop(k, **kw):
    @jax.jit
    def run():
        def body(i, acc):
            dq = fused_policy_apply(
                params, pc_full.at[0, 0, 0].add(i * 1e-6), qb, **kw
            )
            return acc + jnp.sum(dq)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run


diff_time("fps_v1_f32_t32", lambda k: fps_loop(k))
diff_time("fps_v1_bf16_t32",
          lambda k: fps_loop(k, dtype=jnp.bfloat16))
diff_time("fps_v1_f32_t64", lambda k: fps_loop(k, tile=64))
diff_time("fps_v2_f32_t32", lambda k: fps_loop(k, impl="v2"))
diff_time("sa0_ts16", lambda k: sa0_loop(k, ts=16))
diff_time("sa0_ts32", lambda k: sa0_loop(k, ts=32))
if gate_ok.get("bf16_ts64"):
    diff_time("sa0_ts64", lambda k: sa0_loop(k, ts=64))
if gate_ok.get("bf16_g16"):
    diff_time("sa0_ts32_g16", lambda k: sa0_loop(k, ts=32, g16=True))
    if gate_ok.get("bf16_ts64_g16"):
        diff_time("sa0_ts64_g16", lambda k: sa0_loop(k, ts=64, g16=True))
diff_time("sa1_ts32", lambda k: sa1_loop(k, ts=32))
if gate_ok.get("bf16_g16"):
    diff_time("sa1_ts32_g16", lambda k: sa1_loop(k, ts=32, g16=True))
diff_time("fused_fwd_default", lambda k: fwd_loop(k))
if gate_ok.get("bf16_g16"):
    diff_time("fused_fwd_g16", lambda k: fwd_loop(k, gather16=True))
if gate_ok.get("bf16_cloud_g16"):
    diff_time("fused_fwd_cloud_g16",
              lambda k: fwd_loop(k, bf16_cloud=True, gather16=True))

# ------------------------------------------------------- 4. mini rollout bench
try:
    from mpinets_tpu.data.synthetic import random_problem_batch
    from mpinets_tpu.rollout.engine import make_rollout_fn

    problem = random_problem_batch(jax.random.fold_in(rng, B), B)
    for name, kw in [
        ("default", {}),
        ("g16", dict(gather16=True)),
        ("cloud_g16", dict(bf16_cloud=True, gather16=True)),
    ]:
        if "gather16" in kw and not gate_ok.get("bf16_g16"):
            continue
        apply_fn = make_fused_apply(jnp.bfloat16, **kw)
        rolls = {
            n: make_rollout_fn(model, max_steps=n, stop_on_success=False,
                               record_trajectory=False, apply_fn=apply_fn)
            for n in (5, 30)
        }
        for r in rolls.values():
            np.asarray(r(params, problem, rng).final_q)
        best = 0.0
        for rep in range(3):
            t = {}
            for n, r in rolls.items():
                t0 = time.perf_counter()
                np.asarray(
                    r(params, problem, jax.random.fold_in(rng, rep)).final_q
                )
                t[n] = time.perf_counter() - t0
            if t[30] > t[5]:
                best = max(best, B * 25 / (t[30] - t[5]))
        emit(kind="rollout", name=name, env_steps_per_s=round(best, 1))
except Exception:
    emit(kind="rollout", name="EXC", err=traceback.format_exc()[-800:])

emit(kind="done", t=time.strftime("%H:%M:%S"))
