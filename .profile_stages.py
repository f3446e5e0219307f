import time, functools
import jax, jax.numpy as jnp
from mpinets_tpu.kernels import pointnet

B, N = 32, 6272
xyz = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3))
feat = jax.random.uniform(jax.random.PRNGKey(1), (B, N, 1))

def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / 5
    print(f"{name:30s} {dt*1000:8.2f} ms")
    return out

fps = jax.jit(functools.partial(pointnet.furthest_point_sample, npoint=512))
idx = timeit("fps(512 of 6272)", fps, xyz)
centroids = jax.block_until_ready(jax.jit(pointnet.gather_points)(xyz, idx))

bq = jax.jit(functools.partial(pointnet.ball_query, radius=0.05, nsample=128))
timeit("ball_query(512c,6272p,128)", bq, centroids, xyz)

qg = jax.jit(functools.partial(pointnet.query_and_group, radius=0.05, nsample=128))
grouped = timeit("query_and_group sa1", qg, centroids, xyz, feat)

# stage 2 sizes
xyz2 = centroids
feat2 = jax.random.uniform(jax.random.PRNGKey(2), (B, 512, 64))
fps2 = jax.jit(functools.partial(pointnet.furthest_point_sample, npoint=128))
idx2 = timeit("fps(128 of 512)", fps2, xyz2)
c2 = jax.block_until_ready(jax.jit(pointnet.gather_points)(xyz2, idx2))
qg2 = jax.jit(functools.partial(pointnet.query_and_group, radius=0.3, nsample=128))
timeit("query_and_group sa2", qg2, c2, xyz2, feat2)

# full policy forward for reference
from mpinets_tpu.model.policy import MotionPolicyNetwork
model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
pc = jax.random.uniform(jax.random.PRNGKey(3), (B, N, 4))
q = jax.random.uniform(jax.random.PRNGKey(4), (B, 7))
params = model.init(jax.random.PRNGKey(5), pc, q)
fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))
timeit("full forward B=32", fwd, params, pc, q)
