"""Torch-oracle parity harness (the exact-match contract, SURVEY.md §7).

Initializes the pure-torch oracle of the reference ``MotionPolicyNetwork``
(:mod:`tests.torch_oracle`) and the flax model from ONE shared state_dict via
``convert_torch_state_dict``, then asserts:

* kernel-level parity: FPS / ball-query index selections are identical,
* layer-by-layer activation parity through every SA stage and head,
* full-forward parity at fp32 tolerances,
* closed-loop parity: both models rolled out on an identical point-cloud
  stream stay within tolerance over compounding steps.

Reference anchors: ``/root/reference/mpinets/model.py:355-426`` (network),
``run_inference.py:137-191`` (rollout loop).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

import torch_oracle  # noqa: E402  (tests dir is on sys.path under pytest)

from mpinets_tpu.kernels import pointnet  # noqa: E402
from mpinets_tpu.model import checkpoint as ckpt  # noqa: E402
from mpinets_tpu.model.policy import MotionPolicyNetwork  # noqa: E402
from mpinets_tpu.utils.normalization import unnormalize_franka_joints  # noqa: E402
from mpinets_tpu.robot import sampler  # noqa: E402


def _rand_cloud(seed: int, b: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-0.8, 0.8, size=(b, n, 3)).astype(np.float32)
    seg = rng.integers(0, 3, size=(b, n, 1)).astype(np.float32)
    return np.concatenate([xyz, seg], axis=-1)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(7)
    oracle = torch_oracle.MotionPolicyNetwork().eval()
    variables = ckpt.convert_torch_state_dict(oracle.state_dict())
    model = MotionPolicyNetwork()
    return oracle, model, variables


def test_fps_matches_oracle():
    pc = _rand_cloud(0, 3, 700)[..., :3]
    ours = np.asarray(pointnet.furthest_point_sample(jnp.asarray(pc), 128))
    ref = torch_oracle.furthest_point_sample(torch.from_numpy(pc), 128).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_ball_query_matches_oracle():
    pc = _rand_cloud(1, 2, 900)[..., :3]
    cent = pc[:, :100]
    for radius, ns in ((0.05, 16), (0.3, 64), (1.0, 32)):
        ours = np.asarray(
            pointnet.ball_query(jnp.asarray(cent), jnp.asarray(pc), radius, ns)
        )
        ref = torch_oracle.ball_query(
            torch.from_numpy(cent), torch.from_numpy(pc), radius, ns
        ).numpy()
        np.testing.assert_array_equal(ours, ref, err_msg=f"r={radius}")


@pytest.mark.slow
def test_layerwise_and_full_forward_parity(models):
    """Full reference architecture (512/128 centroids) on a 1024-point cloud:
    every SA stage, the FC head, and the final output must match the torch
    oracle to fp32 tolerance."""
    oracle, model, variables = models
    pc = _rand_cloud(2, 2, 1024)
    qn = np.random.default_rng(3).uniform(-1, 1, size=(2, 7)).astype(np.float32)

    tpc, tq = torch.from_numpy(pc), torch.from_numpy(qn)
    with torch.no_grad():
        # stage-by-stage oracle activations
        xyz_t = tpc[..., :3].contiguous()
        feat_t = tpc[..., 3:].transpose(1, 2).contiguous()
        acts_t = []
        enc = oracle.point_cloud_encoder
        for m in enc.SA_modules:
            xyz_t, feat_t = m(xyz_t, feat_t)
            acts_t.append(feat_t.clone())
        emb_t = enc.fc_layer(feat_t.squeeze(-1))
        out_t = oracle(tpc, tq).numpy()

    out_j, inter = model.apply(
        variables, jnp.asarray(pc), jnp.asarray(qn), capture_intermediates=True
    )
    inter = inter["intermediates"]["point_cloud_encoder"]

    for i in range(3):
        ours = np.asarray(inter[f"sa{i}"]["__call__"][0][1] if i < 2
                          else inter["sa2"]["__call__"][0])
        ref = acts_t[i].numpy()
        if ref.ndim == 3:  # torch is channel-first [B, C, S]
            ref = np.swapaxes(ref, 1, 2)
            if i == 2:
                ref = ref[:, 0]
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4,
                                   err_msg=f"SA stage {i}")

    emb_j = np.asarray(inter["__call__"][0])
    np.testing.assert_allclose(emb_j, emb_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_closed_loop_rollout_parity(models):
    """15 compounding policy steps on an identical point-cloud stream: the
    oracle's and the flax model's q trajectories must stay within fp32 drift
    (rollout semantics of run_inference.py:137-191, with both models fed the
    same robot-point resampling stream)."""
    oracle, model, variables = models
    pc = _rand_cloud(4, 2, 1024)
    rng = np.random.default_rng(5)
    qn_j = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 7)).astype(np.float32))
    qn_t = torch.from_numpy(np.asarray(qn_j))

    apply = jax.jit(model.apply)
    xyz = jnp.asarray(pc)
    key = jax.random.PRNGKey(11)
    for step in range(15):
        delta_j = apply(variables, xyz, qn_j)
        with torch.no_grad():
            delta_t = oracle(torch.from_numpy(np.asarray(xyz)), qn_t)
        qn_j = jnp.clip(qn_j + delta_j, -1.0, 1.0)
        qn_t = torch.clamp(qn_t + delta_t, -1.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(qn_j), qn_t.numpy(), atol=5e-4,
            err_msg=f"q diverged at step {step}",
        )
        # identical robot-point update stream for both models, driven by the
        # jax-side q (keeps FPS/ball-query selections shared)
        key, sub = jax.random.split(key)
        robot = sampler.sample_robot_points(
            unnormalize_franka_joints(qn_j), sub, 256
        )
        xyz = xyz.at[:, :256, :3].set(robot)


@pytest.mark.slow
def test_closed_loop_rollout_parity_deep_tiered(models):
    """The SURVEY §7 tolerance ladder over a DEEP compounding rollout
    (40 steps, 2048-point clouds): per-step q drift is checked against three
    tiers — bitwise, 1e-5, and a metric-level bound — and the test reports
    which tier each step lands in. The exact-match contract with the
    published checkpoint is 150 steps at 6272 points; this pins the
    compounding behavior at the largest CPU-feasible shape."""
    oracle, model, variables = models
    pc = _rand_cloud(6, 2, 2048)
    rng = np.random.default_rng(7)
    qn_j = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 7)).astype(np.float32))
    qn_t = torch.from_numpy(np.asarray(qn_j))

    apply = jax.jit(model.apply)
    xyz = jnp.asarray(pc)
    key = jax.random.PRNGKey(13)
    tiers = []  # per-step: 0 = bitwise, 1 = <=1e-5, 2 = <=metric bound
    METRIC_BOUND = 2e-3  # ~0.006 rad ~ 0.35 deg per joint: far below the
    # 1 cm / 15 deg success tolerances the metrics quantize to
    for step in range(40):
        delta_j = apply(variables, xyz, qn_j)
        with torch.no_grad():
            delta_t = oracle(torch.from_numpy(np.asarray(xyz)), qn_t)
        qn_j = jnp.clip(qn_j + delta_j, -1.0, 1.0)
        qn_t = torch.clamp(qn_t + delta_t, -1.0, 1.0)
        err = float(np.abs(np.asarray(qn_j) - qn_t.numpy()).max())
        if err == 0.0:
            tiers.append(0)
        elif err <= 1e-5:
            tiers.append(1)
        else:
            tiers.append(2)
            assert err <= METRIC_BOUND, (
                f"step {step}: drift {err:.2e} beyond the metric tier"
            )
        key, sub = jax.random.split(key)
        robot = sampler.sample_robot_points(
            unnormalize_franka_joints(qn_j), sub, 512
        )
        xyz = xyz.at[:, :512, :3].set(robot)
    # early steps must hold the tight tier; report the ladder profile
    assert all(t <= 1 for t in tiers[:5]), tiers[:5]
    print("tier profile (0=bitwise,1=1e-5,2=metric):", tiers)
