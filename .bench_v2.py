"""v2 session: SA tile sweep with VMEM centroids, then fused forward +
rollout at the best tile."""
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
        msg = str(e); i = max(msg.find("Mosaic"), 0)
        print(f"{name:34s} FAIL {msg[i:i+200]}", flush=True)
        return None

from mpinets_tpu.kernels import pallas_ops

key = jax.random.PRNGKey(0)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2

xyz = jax.random.uniform(key, (B, 6272, 3), minval=-0.7, maxval=0.7)
feat = jax.random.uniform(key, (B, 6272, 1))
cent = xyz[:, :512]
w = [mk(1,(4,64)), mk(2,(64,)), mk(3,(64,64)), mk(4,(64,)), mk(5,(64,64)), mk(6,(64,))]
best_ts, best_dt = 8, 1e9
for ts in (8, 16, 32, 64):
    dt = bench(f"SA0 v2 B={B} ts={ts}",
        jax.jit(lambda *a, ts=ts: pallas_ops.sa_stage(
            *a, radius=0.05, nsample=128, tile_s=ts)),
        xyz, feat, cent, *w)
    if dt and dt < best_dt:
        best_ts, best_dt = ts, dt
print(f"# best SA0 tile: {best_ts}", flush=True)

xyz1, feat1, cent1 = xyz[:, :512], jax.random.normal(key, (B, 512, 64)), xyz[:, :128]
w1 = [mk(7,(67,128)), mk(8,(128,)), mk(9,(128,128)), mk(10,(128,)), mk(11,(128,256)), mk(12,(256,))]
for ts in (8, 16, 32):
    bench(f"SA1 v2 B={B} ts={ts}",
        jax.jit(lambda *a, ts=ts: pallas_ops.sa_stage(
            *a, radius=0.3, nsample=128, tile_s=ts)),
        xyz1, feat1, cent1, *w1)
