"""On-chip session r3j: centroids_in_cloud fast path — parity + timing."""
import json, sys, time, traceback
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
LOG = open("/root/repo/.onchip_r3j.jsonl", "a", buffering=1)
def emit(**kw):
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw)[:200], file=sys.stderr, flush=True)
emit(kind="start", t=time.strftime("%H:%M:%S"))
from mpinets_tpu.kernels import pointnet, pallas_ops
from mpinets_tpu.model.fused import make_fused_apply
from mpinets_tpu.model.policy import MotionPolicyNetwork

key = jax.random.PRNGKey(3)
B, N = 8, 384
xyz = jax.random.uniform(key, (B, N, 3), minval=-0.7, maxval=0.7)
feat = jax.random.randint(jax.random.fold_in(key, 5), (B, N, 1), 0, 3).astype(jnp.float32)
try:
    S, NS, C1 = 16, 128, 32
    cent = xyz[:, :S]
    mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2
    w1, b1 = mk(2, (4, C1)), mk(3, (C1,))
    w2, b2 = mk(4, (C1, 32)), mk(5, (32,))
    w3, b3 = mk(6, (32, 48)), mk(7, (48,))
    for radius in (0.05, 0.3):
        idx0 = pointnet.ball_query(cent, xyz, radius, NS)
        g = jnp.concatenate([pointnet.gather_points(xyz, idx0) - cent[:, :, None, :],
                             pointnet.gather_points(feat, idx0)], -1)
        hp = jax.lax.Precision.HIGHEST
        h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", g, w1, precision=hp) + b1, 0)
        h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", h, w2, precision=hp) + b2, 0)
        h = jnp.maximum(jnp.einsum("bsnc,cd->bsnd", h, w3, precision=hp) + b3, 0)
        ref_f = jnp.max(h, axis=2)
        out_f, out_i = pallas_ops.sa_stage(
            xyz, feat, cent, w1, b1, w2, b2, w3, b3,
            radius=radius, nsample=NS, compute_dtype=jnp.float32,
            tile_s=16, impl="v5", pad_chunks=True, centroids_in_cloud=True)
        emit(kind="parity", name=f"cic_r{radius}",
             feat_err=float(np.abs(np.asarray(out_f) - np.asarray(ref_f)).max()))
except Exception:
    emit(kind="parity", name="EXC", err=traceback.format_exc()[-400:])

BB = 256
kb = jax.random.PRNGKey(7)
xyzb = jax.random.uniform(kb, (BB, 6272, 3), minval=-0.8, maxval=0.8)
featb = jax.random.randint(jax.random.fold_in(kb, 1), (BB, 6272, 1), 0, 3).astype(jnp.float32)
centb = xyzb[:, :512]
mk = lambda i, s: jax.random.normal(jax.random.fold_in(kb, 10 + i), s) * 0.2
w1b, b1b = mk(0, (4, 64)), mk(1, (64,))
w2b, b2b = mk(2, (64, 64)), mk(3, (64,))
w3b, b3b = mk(4, (64, 64)), mk(5, (64,))

def diff_time(name, make_loop, ks=(2, 10)):
    try:
        fns = {k: make_loop(k) for k in ks}
        for f in fns.values():
            float(f())
        ts = {}
        for k, f in fns.items():
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter(); float(f())
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        per = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0])
        emit(kind="time", name=name, us_per_sample=round(per * 1e6 / BB, 2))
    except Exception:
        emit(kind="time", name=name, err=traceback.format_exc()[-300:])

def sa0_loop(k, cic):
    @jax.jit
    def run():
        def body(i, acc):
            f, _ = pallas_ops.sa_stage(
                xyzb + i * 1e-6, featb, centb, w1b, b1b, w2b, b2b, w3b, b3b,
                radius=0.05, nsample=128, compute_dtype=jnp.bfloat16,
                tile_s=16, impl="v5", pad_chunks=True, centroids_in_cloud=cic)
            return acc + jnp.sum(f)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return run

diff_time("sa0_cic0", lambda k: sa0_loop(k, False))
diff_time("sa0_cic1", lambda k: sa0_loop(k, True))

model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))
try:
    from mpinets_tpu.data.synthetic import random_problem_batch
    from mpinets_tpu.rollout.engine import make_rollout_fn
    problem = random_problem_batch(jax.random.fold_in(rng, BB), BB)
    apply_fn = make_fused_apply(jnp.bfloat16)
    rolls = {n: make_rollout_fn(model, max_steps=n, stop_on_success=False,
                                record_trajectory=False, apply_fn=apply_fn)
             for n in (5, 30)}
    for r in rolls.values():
        np.asarray(r(params, problem, rng).final_q)
    best = 0.0
    for rep in range(4):
        t = {}
        for n, r in rolls.items():
            t0 = time.perf_counter()
            np.asarray(r(params, problem, jax.random.fold_in(rng, rep)).final_q)
            t[n] = time.perf_counter() - t0
        if t[30] > t[5]:
            best = max(best, BB * 25 / (t[30] - t[5]))
    emit(kind="rollout", name="cic_b256", env_steps_per_s=round(best, 1))
except Exception:
    emit(kind="rollout", name="EXC", err=traceback.format_exc()[-300:])
emit(kind="done", t=time.strftime("%H:%M:%S"))
