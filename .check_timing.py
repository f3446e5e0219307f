import time
import jax, jax.numpy as jnp
from mpinets_tpu.data.synthetic import random_problem_batch
from mpinets_tpu.model.policy import MotionPolicyNetwork
from mpinets_tpu.rollout.engine import make_rollout_fn

rng = jax.random.PRNGKey(0)
model = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
problem = random_problem_batch(jax.random.fold_in(rng, 1), 32)
params = model.init(rng, jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7)))

for steps in (10, 40, 160):
    rollout = make_rollout_fn(model, max_steps=steps, stop_on_success=False, record_trajectory=False)
    r = rollout(params, problem, rng); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(3):
        r = rollout(params, problem, jax.random.fold_in(rng, i))
    f = jax.device_get(r.final_q)  # force full sync incl. data readback
    dt = (time.perf_counter() - t0) / 3
    print(f"steps={steps:4d}: {dt*1000:9.2f} ms/call -> {32*steps/dt:12.0f} env-steps/s")
