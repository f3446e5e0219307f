"""Checkpoint interop tests: torch->flax conversion parity and orbax
save/restore roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from mpinets_tpu.model import checkpoint as ckpt
from mpinets_tpu.model.policy import MotionPolicyNetwork


def _reference_torch_state_dict(seed=0):
    """Build a state_dict with the reference's exact key layout
    (model.py:35-66,355-393) using plain torch modules (pointnet2_ops'
    SharedMLP convs are 1x1 Conv2d, reproduced here)."""
    torch.manual_seed(seed)
    import torch.nn as nn

    fe = nn.Sequential(
        nn.Linear(7, 32), nn.LeakyReLU(), nn.Linear(32, 64), nn.LeakyReLU(),
        nn.Linear(64, 128), nn.LeakyReLU(), nn.Linear(128, 128),
        nn.LeakyReLU(), nn.Linear(128, 64),
    )
    dec = nn.Sequential(
        nn.Linear(2048 + 64, 512), nn.LeakyReLU(), nn.Linear(512, 256),
        nn.LeakyReLU(), nn.Linear(256, 128), nn.LeakyReLU(), nn.Linear(128, 7),
    )
    fc = nn.Sequential(
        nn.Linear(1024, 4096), nn.GroupNorm(16, 4096), nn.LeakyReLU(),
        nn.Linear(4096, 2048), nn.GroupNorm(16, 2048), nn.LeakyReLU(),
        nn.Linear(2048, 2048),
    )
    sd = {}
    for name, mod in (("feature_encoder", fe), ("decoder", dec)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    for k, v in fc.state_dict().items():
        sd[f"point_cloud_encoder.fc_layer.{k}"] = v
    mlps = ((4, 64, 64, 64), (64 + 3, 128, 128, 256), (256 + 3, 512, 512, 1024))
    for i, spec in enumerate(mlps):
        for j in range(3):
            conv = nn.Conv2d(spec[j], spec[j + 1], kernel_size=(1, 1))
            base = f"point_cloud_encoder.SA_modules.{i}.mlps.0.layer{j}.conv"
            sd[f"{base}.weight"] = conv.weight.detach()
            sd[f"{base}.bias"] = conv.bias.detach()
    return sd, fe, dec, fc


def test_conversion_shapes_and_full_forward():
    sd, *_ = _reference_torch_state_dict()
    variables = ckpt.convert_torch_state_dict(sd)
    model = MotionPolicyNetwork()
    xyz = jax.random.uniform(jax.random.PRNGKey(0), (2, 600, 4))
    q = jax.random.uniform(jax.random.PRNGKey(1), (2, 7), minval=-1, maxval=1)
    # Structure must match model.init exactly.
    ref = model.init(jax.random.PRNGKey(2), xyz, q)
    conv_shapes = jax.tree.map(lambda x: x.shape, variables)
    init_shapes = jax.tree.map(lambda x: x.shape, ref)
    assert conv_shapes == init_shapes
    out = model.apply(variables, xyz, q)
    assert out.shape == (2, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_mlp_parity_vs_torch():
    """The dense parts (q-encoder, decoder, fc head) must match torch
    numerically after conversion."""
    sd, fe, dec, fc = _reference_torch_state_dict(seed=1)
    variables = ckpt.convert_torch_state_dict(sd)
    params = variables["params"]
    model = MotionPolicyNetwork()

    q = np.random.default_rng(0).uniform(-1, 1, (4, 7)).astype(np.float32)
    with torch.no_grad():
        torch_fe = fe(torch.from_numpy(q)).numpy()

    # Rebuild the q-encoder path exactly as the flax model does.
    import flax.linen as nn_flax

    x = jnp.asarray(q)
    for i, _ in enumerate((32, 64, 128, 128)):
        p = params[f"feature_encoder_{i}"]
        x = x @ p["kernel"] + p["bias"]
        x = nn_flax.leaky_relu(x)
    p = params["feature_encoder_4"]
    x = x @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(np.asarray(x), torch_fe, atol=2e-5)

    # fc head (with GroupNorm) vs torch.
    feat = np.random.default_rng(1).normal(size=(4, 1024)).astype(np.float32)
    with torch.no_grad():
        torch_fc = fc(torch.from_numpy(feat)).numpy()
    y = jnp.asarray(feat)
    y = y @ params["point_cloud_encoder"]["fc0"]["kernel"] + params[
        "point_cloud_encoder"]["fc0"]["bias"]
    gn = params["point_cloud_encoder"]["gn0"]
    y = nn_flax.GroupNorm(num_groups=16, epsilon=1e-5).apply(
        {"params": {"scale": gn["scale"], "bias": gn["bias"]}}, y
    )
    y = nn_flax.leaky_relu(y)
    y = y @ params["point_cloud_encoder"]["fc1"]["kernel"] + params[
        "point_cloud_encoder"]["fc1"]["bias"]
    gn = params["point_cloud_encoder"]["gn1"]
    y = nn_flax.GroupNorm(num_groups=16, epsilon=1e-5).apply(
        {"params": {"scale": gn["scale"], "bias": gn["bias"]}}, y
    )
    y = nn_flax.leaky_relu(y)
    y = y @ params["point_cloud_encoder"]["fc2"]["kernel"] + params[
        "point_cloud_encoder"]["fc2"]["bias"]
    np.testing.assert_allclose(np.asarray(y), torch_fc, atol=5e-4)


def test_lightning_ckpt_roundtrip(tmp_path):
    sd, *_ = _reference_torch_state_dict(seed=2)
    # Wrap like Lightning: state_dict nested + "mdl." style prefixes seen in
    # some exports.
    wrapped = {"state_dict": {f"mdl.{k}": v for k, v in sd.items()}}
    path = tmp_path / "expert.ckpt"
    torch.save(wrapped, path)
    variables = ckpt.load_torch_checkpoint(path)
    assert "point_cloud_encoder" in variables["params"]


def test_orbax_roundtrip(tmp_path):
    from mpinets_tpu.train import learner
    from mpinets_tpu.data.synthetic import training_batch
    from mpinets_tpu.geom.assembly import PointCloudSizes

    model = MotionPolicyNetwork(
        sa_npoints=(16, 8), sa_nsamples=(8, 8), sa_radii=(0.05, 0.3)
    )
    batch = training_batch(
        jax.random.PRNGKey(0), 2, sizes=PointCloudSizes(64, 96, 32)
    )
    state = learner.init_state(model, jax.random.PRNGKey(0), batch)
    ckpt.save_checkpoint(tmp_path, 7, state)
    found = ckpt.latest_checkpoint(tmp_path)
    assert found is not None and found.name == "step_00000007"
    restored = ckpt.restore_checkpoint(found, state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
