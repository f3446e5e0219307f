"""Pure-torch (CPU) oracle of the reference MotionPolicyNetwork.

Re-implements, in plain torch, exactly what the reference computes on GPU:

* ``pointnet2_ops.furthest_point_sample`` CUDA kernel semantics: start from
  index 0, greedily take the point with the largest min-distance to the
  selected set (first-index tie-breaking).
* ``pointnet2_ops.ball_query`` CUDA semantics: per centroid, the first
  ``nsample`` point indices (in index order) within ``radius``; remaining
  slots repeat the first found index; index 0 if none found.
* ``PointnetSAModule`` (grouping with recentered xyz prepended, shared 1x1
  conv MLP with ReLU after every layer, max-pool over the neighborhood) and
  the full ``MotionPolicyNetwork`` (reference
  ``/root/reference/mpinets/model.py:35-91,355-426``), with state_dict key
  names matching the published checkpoint layout so
  ``mpinets_tpu.model.checkpoint.convert_torch_state_dict`` applies directly.

This is the parity anchor demanded by the exact-match contract: the flax/TPU
model must reproduce this oracle's activations layer by layer.
"""

from __future__ import annotations

from typing import List, Tuple

import torch
import torch.nn as nn


def furthest_point_sample(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    """xyz: [B, N, 3] -> int64 [B, npoint]."""
    b, n, _ = xyz.shape
    out = torch.zeros(b, npoint, dtype=torch.long)
    min_d2 = torch.full((b, n), float("inf"))
    last = torch.zeros(b, dtype=torch.long)
    for i in range(1, npoint):
        lp = xyz[torch.arange(b), last]  # [B, 3]
        d2 = ((xyz - lp[:, None, :]) ** 2).sum(-1)
        min_d2 = torch.minimum(min_d2, d2)
        last = min_d2.argmax(-1)
        out[:, i] = last
    return out


def ball_query(
    centroids: torch.Tensor, xyz: torch.Tensor, radius: float, nsample: int
) -> torch.Tensor:
    """centroids: [B, S, 3], xyz: [B, N, 3] -> int64 [B, S, nsample]."""
    b, s, _ = centroids.shape
    n = xyz.shape[1]
    d2 = ((centroids[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
    in_ball = d2 < radius * radius  # [B, S, N]
    key = torch.where(in_ball, torch.arange(n).expand(b, s, n), n)
    first_k = key.sort(dim=-1).values[..., :nsample]
    found = first_k < n
    first = first_k[..., :1]
    fill = torch.where(first < n, first, torch.zeros_like(first))
    return torch.where(found, first_k, fill)


def _gather(points: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    """points: [B, N, C], idx: [B, ...] -> [B, ..., C]."""
    b = points.shape[0]
    flat = idx.reshape(b, -1)
    out = torch.gather(
        points, 1, flat[..., None].expand(-1, -1, points.shape[-1])
    )
    return out.reshape(*idx.shape, points.shape[-1])


def _shared_mlp(channels: List[int]) -> nn.Sequential:
    """pointnet2_ops build_shared_mlp with bn=False: Conv2d(bias=True) + ReLU
    per layer. Input layout [B, C, npoint, nsample]."""
    layers: List[nn.Module] = []
    for i in range(1, len(channels)):
        layers.append(nn.Conv2d(channels[i - 1], channels[i], 1, bias=True))
        layers.append(nn.ReLU(True))
    return nn.Sequential(*layers)


class PointnetSAModule(nn.Module):
    """One set-abstraction stage (pointnet2_ops semantics, use_xyz=True)."""

    def __init__(self, mlp, npoint=None, radius=None, nsample=None, bn=False):
        super().__init__()
        assert not bn
        self.npoint, self.radius, self.nsample = npoint, radius, nsample
        spec = list(mlp)
        spec[0] += 3  # use_xyz prepends relative coordinates
        self.mlps = nn.ModuleList([_shared_mlp(spec)])

    def forward(
        self, xyz: torch.Tensor, features: torch.Tensor
    ) -> Tuple[torch.Tensor, torch.Tensor]:
        """xyz: [B, N, 3]; features: [B, C, N] (channel-first, as in the
        reference) -> (new_xyz [B, S, 3], new_features [B, C', S])."""
        if self.npoint is not None:
            idx = furthest_point_sample(xyz, self.npoint)
            new_xyz = _gather(xyz, idx)  # [B, S, 3]
            nidx = ball_query(new_xyz, xyz, self.radius, self.nsample)
            grouped_xyz = _gather(xyz, nidx) - new_xyz[:, :, None, :]
            grouped_feat = _gather(features.transpose(1, 2), nidx)
            grouped = torch.cat([grouped_xyz, grouped_feat], dim=-1)
            # -> [B, C+3, S, nsample] for the conv MLP
            grouped = grouped.permute(0, 3, 1, 2)
        else:
            new_xyz = None
            grouped = torch.cat([xyz.transpose(1, 2), features], dim=1)
            grouped = grouped.unsqueeze(2)  # [B, C+3, 1, N]
        out = self.mlps[0](grouped)
        out = out.max(dim=-1).values  # max over the neighborhood
        return new_xyz, out


class MPiNetsPointNet(nn.Module):
    """Reference encoder (``model.py:355-426``)."""

    def __init__(self):
        super().__init__()
        self.SA_modules = nn.ModuleList(
            [
                PointnetSAModule(
                    npoint=512, radius=0.05, nsample=128, mlp=[1, 64, 64, 64]
                ),
                PointnetSAModule(
                    npoint=128, radius=0.3, nsample=128, mlp=[64, 128, 128, 256]
                ),
                PointnetSAModule(mlp=[256, 512, 512, 1024]),
            ]
        )
        self.fc_layer = nn.Sequential(
            nn.Linear(1024, 4096),
            nn.GroupNorm(16, 4096),
            nn.LeakyReLU(inplace=True),
            nn.Linear(4096, 2048),
            nn.GroupNorm(16, 2048),
            nn.LeakyReLU(inplace=True),
            nn.Linear(2048, 2048),
        )

    def forward(self, point_cloud: torch.Tensor) -> torch.Tensor:
        xyz = point_cloud[..., 0:3].contiguous()
        features = point_cloud[..., 3:].transpose(1, 2).contiguous()
        for module in self.SA_modules:
            xyz, features = module(xyz, features)
        return self.fc_layer(features.squeeze(-1))


class MotionPolicyNetwork(nn.Module):
    """Reference policy (``model.py:35-91``)."""

    def __init__(self):
        super().__init__()
        self.point_cloud_encoder = MPiNetsPointNet()
        self.feature_encoder = nn.Sequential(
            nn.Linear(7, 32),
            nn.LeakyReLU(),
            nn.Linear(32, 64),
            nn.LeakyReLU(),
            nn.Linear(64, 128),
            nn.LeakyReLU(),
            nn.Linear(128, 128),
            nn.LeakyReLU(),
            nn.Linear(128, 64),
        )
        self.decoder = nn.Sequential(
            nn.Linear(2048 + 64, 512),
            nn.LeakyReLU(),
            nn.Linear(512, 256),
            nn.LeakyReLU(),
            nn.Linear(256, 128),
            nn.LeakyReLU(),
            nn.Linear(128, 7),
        )

    def forward(self, xyz: torch.Tensor, q: torch.Tensor) -> torch.Tensor:
        pc_encoding = self.point_cloud_encoder(xyz)
        feature_encoding = self.feature_encoder(q)
        return self.decoder(torch.cat((pc_encoding, feature_encoding), dim=1))
