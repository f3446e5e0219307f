import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_compile(name, shape, dim, dtype=jnp.float32):
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=dim)
    try:
        f = lambda t, i: pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )(t, i)
        jax.jit(f).lower(jnp.zeros(shape, dtype), jnp.zeros(shape, jnp.int32)).compile()
        print(f"{name}: COMPILE OK")
    except Exception as e:
        msg = str(e)
        key = "Not implemented" if "Not implemented" in msg else msg[:80]
        i = msg.find("Not implemented")
        print(f"{name}: FAIL {msg[i:i+80] if i>=0 else msg[:80]}")

try_compile("lane [8,128]", (8,128), 1)
try_compile("lane [8,6272]", (8,6272), 1)
try_compile("lane [392,128]", (392,128), 1)
try_compile("sublane [8,128]", (8,128), 0)
try_compile("sublane [64,128]", (64,128), 0)
try_compile("sublane bf16 idx32... skip", (16,128), 0)
