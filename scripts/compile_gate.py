"""TPU AOT-compile gate for the fused performance path (VERDICT r2 #1).

Lowers + compiles the DEFAULT fused forward configuration (the one
bench.py, cli.infer, cli.serve, and train-time validation use) against the
real backend at full reference shapes WITHOUT executing anything. Run this
before every snapshot commit that touches kernel code: interpret-mode CPU
tests prove semantics, not Mosaic legality — round 2 shipped a kernel that
was CPU-green and did not compile on hardware.

Exit 0 = the product path compiles on this backend; nonzero = it does not
(the Mosaic error is printed).

Usage: python scripts/compile_gate.py  [--fp32]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    from mpinets_tpu.model.fused import fused_policy_apply
    from mpinets_tpu.model.policy import MotionPolicyNetwork

    backend = jax.default_backend()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = MotionPolicyNetwork(compute_dtype=dtype)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 6272, 4)), jnp.zeros((1, 7))
    )
    pc = jax.ShapeDtypeStruct((256, 6272, 4), jnp.float32)
    q = jax.ShapeDtypeStruct((256, 7), jnp.float32)
    t0 = time.perf_counter()
    try:
        fused_policy_apply.lower(
            params, pc, q, compute_dtype=dtype
        ).compile()
    except Exception as e:
        print(f"COMPILE GATE FAILED on backend '{backend}':\n{e}")
        return 1
    print(
        f"compile gate OK: default fused path compiles on '{backend}' "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
