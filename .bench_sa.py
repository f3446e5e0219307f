import time, jax, jax.numpy as jnp, numpy as np
from mpinets_tpu.kernels import pallas_ops

key = jax.random.PRNGKey(0)

def bench(f, *args, n=5):
    r = f(*args); jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n

mk = lambda i, s: jax.random.normal(jax.random.fold_in(key, i), s) * 0.2
for b in (64, 256):
    xyz = jax.random.uniform(key, (b, 6272, 3), minval=-0.7, maxval=0.7)
    feat = jax.random.uniform(key, (b, 6272, 1))
    cent = xyz[:, :512]
    w1, b1 = mk(1,(4,64)), mk(2,(64,))
    w2, b2 = mk(3,(64,64)), mk(4,(64,))
    w3, b3 = mk(5,(64,64)), mk(6,(64,))
    f0 = jax.jit(lambda *a: pallas_ops.sa_stage(*a, radius=0.05, nsample=128))
    t = bench(f0, xyz, feat, cent, w1, b1, w2, b2, w3, b3)
    print(f"B={b} SA0 fused: {t*1e3:8.1f} ms  ({t/b*1e6:.0f} us/sample)", flush=True)

    xyz1 = xyz[:, :512]
    feat1 = jax.random.normal(key, (b, 512, 64))
    cent1 = xyz[:, :128]
    w1b, b1b = mk(7,(67,128)), mk(8,(128,))
    w2b, b2b = mk(9,(128,128)), mk(10,(128,))
    w3b, b3b = mk(11,(128,256)), mk(12,(256,))
    f1 = jax.jit(lambda *a: pallas_ops.sa_stage(*a, radius=0.3, nsample=128))
    t = bench(f1, xyz1, feat1, cent1, w1b, b1b, w2b, b2b, w3b, b3b)
    print(f"B={b} SA1 fused: {t*1e3:8.1f} ms  ({t/b*1e6:.0f} us/sample)", flush=True)
