"""Motion Policy Network in flax.linen: PointNet++ point-cloud encoder +
configuration MLP + decoder, architecture-identical to the reference
(``/root/reference/mpinets/model.py:35-91,355-426``):

* 3 set-abstraction stages ``(npoint=512, r=0.05, ns=128, mlp=[1,64,64,64])``,
  ``(npoint=128, r=0.3, ns=128, mlp=[64,128,128,256])``, global
  ``mlp=[256,512,512,1024]``, all without batchnorm (``model.py:364-383``);
  SA MLPs use ReLU after every conv (pointnet2_ops SharedMLP default) and
  prepend relative xyz to features (``use_xyz=True``).
* FC head 1024→4096→2048→2048 with GroupNorm(16) + LeakyReLU
  (``model.py:385-393``).
* q-encoder 7→32→64→128→128→64 (LeakyReLU between layers,
  ``model.py:47-57``); decoder concat(2048, 64)→512→256→128→7
  (``model.py:58-66``).

The hot set-abstraction ops come from
:mod:`mpinets_tpu.kernels.pointnet` (XLA-native FPS/ball-query/grouping).
A ``compute_dtype`` knob runs the matmuls in bf16 on TPU while keeping
parameters in fp32.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mpinets_tpu.kernels import pointnet


class SharedMLP(nn.Module):
    """Stack of 1x1 convs (= pointwise Dense) with ReLU after every layer,
    matching pointnet2_ops' SharedMLP with ``bn=False``."""

    features: Sequence[int]
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.compute_dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        return x


class SetAbstraction(nn.Module):
    """One PointNet++ SA stage: FPS centroids -> ball-query grouping ->
    shared MLP -> max-pool over the neighborhood."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, features: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xyz: [B, N, 3]; features: [B, N, C] -> ([B, S, 3], [B, S, mlp[-1]])."""
        idx = pointnet.furthest_point_sample(xyz, self.npoint)
        centroids = pointnet.gather_points(xyz, idx)
        grouped = pointnet.query_and_group(
            centroids, xyz, features, self.radius, self.nsample
        )  # [B, S, ns, 3 + C]
        out = SharedMLP(self.mlp, self.compute_dtype, name="mlp")(grouped)
        return centroids, jnp.max(out, axis=-2)


class GlobalSetAbstraction(nn.Module):
    """The final group-all SA stage (npoint=None in the reference)."""

    mlp: Sequence[int]
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
        grouped = pointnet.group_all(xyz, features)  # [B, 1, N, 3 + C]
        out = SharedMLP(self.mlp, self.compute_dtype, name="mlp")(grouped)
        return jnp.max(out, axis=-2)[:, 0]  # [B, mlp[-1]]


class MPiNetsPointNet(nn.Module):
    """Point-cloud encoder (``model.py:355-426``).

    ``sa_npoints``/``sa_nsamples`` default to the reference architecture
    (512/128 centroids, 128 neighbors); they are configurable so tests can
    run tiny clouds and scaling studies can sweep the stage sizes.
    """

    compute_dtype: jnp.dtype = jnp.float32
    sa_npoints: Tuple[int, int] = (512, 128)
    sa_nsamples: Tuple[int, int] = (128, 128)
    sa_radii: Tuple[float, float] = (0.05, 0.3)

    @nn.compact
    def __call__(self, point_cloud: jnp.ndarray) -> jnp.ndarray:
        """point_cloud: [B, N, 4] (xyz + segmentation) -> [B, 2048]."""
        xyz = point_cloud[..., :3]
        features = point_cloud[..., 3:]  # segmentation label as 1 feature

        xyz, features = SetAbstraction(
            npoint=self.sa_npoints[0],
            radius=self.sa_radii[0],
            nsample=self.sa_nsamples[0],
            mlp=(64, 64, 64),
            compute_dtype=self.compute_dtype,
            name="sa0",
        )(xyz, features)
        xyz, features = SetAbstraction(
            npoint=self.sa_npoints[1],
            radius=self.sa_radii[1],
            nsample=self.sa_nsamples[1],
            mlp=(128, 128, 256),
            compute_dtype=self.compute_dtype,
            name="sa1",
        )(xyz, features)
        features = GlobalSetAbstraction(
            mlp=(512, 512, 1024), compute_dtype=self.compute_dtype, name="sa2"
        )(xyz, features)

        x = nn.Dense(4096, dtype=self.compute_dtype, name="fc0")(features)
        x = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=jnp.float32, name="gn0")(x)
        x = nn.leaky_relu(x)
        x = nn.Dense(2048, dtype=self.compute_dtype, name="fc1")(x)
        x = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=jnp.float32, name="gn1")(x)
        x = nn.leaky_relu(x)
        return nn.Dense(2048, dtype=self.compute_dtype, name="fc2")(x)


class MotionPolicyNetwork(nn.Module):
    """The full policy: Δq_norm = f(xyz [B, N, 4], q_norm [B, 7])
    (``model.py:35-91``)."""

    compute_dtype: jnp.dtype = jnp.float32
    sa_npoints: Tuple[int, int] = (512, 128)
    sa_nsamples: Tuple[int, int] = (128, 128)
    sa_radii: Tuple[float, float] = (0.05, 0.3)

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, q_norm: jnp.ndarray) -> jnp.ndarray:
        pc_encoding = MPiNetsPointNet(
            self.compute_dtype,
            self.sa_npoints,
            self.sa_nsamples,
            self.sa_radii,
            name="point_cloud_encoder",
        )(xyz)

        x = q_norm
        for i, f in enumerate((32, 64, 128, 128)):
            x = nn.Dense(f, dtype=self.compute_dtype, name=f"feature_encoder_{i}")(x)
            x = nn.leaky_relu(x)
        feature_encoding = nn.Dense(
            64, dtype=self.compute_dtype, name="feature_encoder_4"
        )(x)

        x = jnp.concatenate([pc_encoding, feature_encoding], axis=-1)
        for i, f in enumerate((512, 256, 128)):
            x = nn.Dense(f, dtype=self.compute_dtype, name=f"decoder_{i}")(x)
            x = nn.leaky_relu(x)
        out = nn.Dense(7, dtype=self.compute_dtype, name="decoder_3")(x)
        return out.astype(jnp.float32)


def make_policy(compute_dtype: Optional[jnp.dtype] = None) -> MotionPolicyNetwork:
    return MotionPolicyNetwork(compute_dtype=compute_dtype or jnp.float32)
