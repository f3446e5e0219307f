import time, jax, jax.numpy as jnp, numpy as np
from mpinets_tpu.kernels import pointnet, pallas_ops

key = jax.random.PRNGKey(0)
for b in (64, 256):
    xyz = jax.random.normal(key, (b, 6272, 3), jnp.float32) * 0.5
    for name, fn in (("xla", pointnet.furthest_point_sample),
                     ("pallas", pallas_ops.furthest_point_sample)):
        f = jax.jit(lambda x, fn=fn: fn(x, 512))
        r = f(xyz); np.asarray(r)
        t0 = time.perf_counter(); n = 3
        for _ in range(n):
            r = f(xyz)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / n
        print(f"B={b} {name:7s} {dt*1e3:9.1f} ms")
    a = np.asarray(jax.jit(lambda x: pointnet.furthest_point_sample(x, 512))(xyz[:8]))
    c = np.asarray(jax.jit(lambda x: pallas_ops.furthest_point_sample(x, 512))(xyz[:8]))
    print("  match:", np.array_equal(a, c), flush=True)
