"""Shape/behavior tests for the MotionPolicyNetwork flax module."""

import numpy as np
import jax
import jax.numpy as jnp

from mpinets_tpu.model.policy import MotionPolicyNetwork


def _toy_inputs(b=2, n=256):
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-0.5, 0.5, (b, n, 4)).astype(np.float32)
    xyz[..., 3] = rng.integers(0, 3, (b, n))
    q = rng.uniform(-1, 1, (b, 7)).astype(np.float32)
    return jnp.asarray(xyz), jnp.asarray(q)


def test_policy_forward_shapes_and_determinism():
    xyz, q = _toy_inputs()
    mdl = MotionPolicyNetwork()
    params = mdl.init(jax.random.PRNGKey(0), xyz, q)
    out1 = mdl.apply(params, xyz, q)
    out2 = mdl.apply(params, xyz, q)
    assert out1.shape == (2, 7)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_policy_param_count_matches_reference():
    """The reference model is ~19M params; layer-by-layer the counts are
    fully determined by the architecture (model.py:35-91,355-393)."""
    xyz, q = _toy_inputs()
    mdl = MotionPolicyNetwork()
    params = mdl.init(jax.random.PRNGKey(0), xyz, q)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    def mlp_params(sizes):
        return sum((a + 1) * b for a, b in zip(sizes[:-1], sizes[1:]))

    expected = (
        # SA stages: conv weights on (3 + C_in) channels
        mlp_params([4, 64, 64, 64])
        + mlp_params([67, 128, 128, 256])
        + mlp_params([259, 512, 512, 1024])
        # FC head + 2 group norms (scale + bias)
        + mlp_params([1024, 4096, 2048, 2048]) + 2 * 4096 + 2 * 2048
        # q encoder and decoder
        + mlp_params([7, 32, 64, 128, 128, 64])
        + mlp_params([2048 + 64, 512, 256, 128, 7])
    )
    assert n_params == expected, (n_params, expected)


def test_policy_sensitive_to_both_inputs():
    xyz, q = _toy_inputs()
    mdl = MotionPolicyNetwork()
    params = mdl.init(jax.random.PRNGKey(0), xyz, q)
    base = np.asarray(mdl.apply(params, xyz, q))
    out_q = np.asarray(mdl.apply(params, xyz, q + 0.1))
    out_pc = np.asarray(mdl.apply(params, xyz.at[..., :3].add(0.05), q))
    assert np.abs(out_q - base).max() > 1e-6
    assert np.abs(out_pc - base).max() > 1e-6


def test_policy_bf16_compute_close_to_fp32():
    xyz, q = _toy_inputs()
    f32 = MotionPolicyNetwork()
    bf16 = MotionPolicyNetwork(compute_dtype=jnp.bfloat16)
    params = f32.init(jax.random.PRNGKey(0), xyz, q)
    a = np.asarray(f32.apply(params, xyz, q))
    b = np.asarray(bf16.apply(params, xyz, q))
    assert b.dtype == np.float32  # cast back at the head
    np.testing.assert_allclose(a, b, atol=0.1)
