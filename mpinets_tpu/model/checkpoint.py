"""Checkpoint interop: PyTorch-Lightning -> flax import, and orbax-backed
native checkpointing.

The published ``mpinets_hybrid_expert.ckpt`` is a PyTorch Lightning
checkpoint of the reference's ``MotionPolicyNetwork``
(``/root/reference/mpinets/model.py:35-91,355-426``; loaded by the reference
at ``run_inference.py:262``). :func:`convert_torch_state_dict` maps its
``state_dict`` onto our flax parameter pytree
(:class:`mpinets_tpu.model.policy.MotionPolicyNetwork`):

* torch ``nn.Linear`` ``weight [out, in]`` -> flax ``Dense`` ``kernel
  [in, out]`` (transpose),
* pointnet2_ops ``SharedMLP`` 1x1 ``Conv2d`` ``weight [out, in, 1, 1]`` ->
  ``Dense`` ``kernel [in, out]`` (squeeze + transpose; the conv is pointwise
  so it IS a dense layer over the channel axis),
* ``nn.GroupNorm`` ``weight``/``bias`` -> ``scale``/``bias``.

Key layout of the torch model (state_dict names):
``point_cloud_encoder.SA_modules.{0,1,2}.mlps.0.layer{j}.conv.weight|bias``,
``point_cloud_encoder.fc_layer.{0,3,6}.weight|bias`` (Linear) and
``fc_layer.{1,4}`` (GroupNorm), ``feature_encoder.{0,2,4,6,8}``,
``decoder.{0,2,4,6}``. SA conv key spellings vary slightly across
pointnet2_ops versions, so convs are matched per SA module by regex and
sorted by layer index.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Mapping

import numpy as np


def _strip_prefix(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Drop Lightning wrappers: keep keys from the first occurrence of a
    known top-level module name onward; convert tensors to numpy."""
    tops = ("point_cloud_encoder.", "feature_encoder.", "decoder.")
    out = {}
    for key, value in state_dict.items():
        for top in tops:
            pos = key.find(top)
            if pos >= 0:
                arr = np.asarray(
                    value.detach().cpu().numpy()
                    if hasattr(value, "detach")
                    else value
                )
                out[key[pos:]] = arr
                break
    return out


def _dense(weight: np.ndarray, bias: np.ndarray) -> Dict[str, np.ndarray]:
    w = weight
    if w.ndim == 4:  # 1x1 conv
        assert w.shape[2] == w.shape[3] == 1, w.shape
        w = w[:, :, 0, 0]
    return {"kernel": np.ascontiguousarray(w.T), "bias": bias}


def _groupnorm(weight: np.ndarray, bias: np.ndarray) -> Dict[str, np.ndarray]:
    return {"scale": weight, "bias": bias}


def convert_torch_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Torch state_dict -> flax ``{"params": ...}`` for
    :class:`~mpinets_tpu.model.policy.MotionPolicyNetwork`."""
    sd = _strip_prefix(state_dict)
    params: Dict[str, Any] = {}

    # --- SA modules -------------------------------------------------------
    encoder: Dict[str, Any] = {}
    for sa_idx in range(3):
        pattern = re.compile(
            rf"point_cloud_encoder\.SA_modules\.{sa_idx}\."
            r"(?:mlps?\.0\.)?(?:layer)?(\d+)\.?(?:conv\.)?weight$"
        )
        convs = sorted(
            (int(m.group(1)), key)
            for key in sd
            for m in [pattern.match(key)]
            if m
        )
        assert len(convs) == 3, (
            f"SA module {sa_idx}: expected 3 conv layers, matched {convs}; "
            f"keys: {[k for k in sd if f'SA_modules.{sa_idx}' in k]}"
        )
        mlp = {}
        for out_idx, (_, wkey) in enumerate(convs):
            bkey = wkey[: -len("weight")] + "bias"
            mlp[f"conv{out_idx}"] = _dense(sd[wkey], sd[bkey])
        encoder[f"sa{sa_idx}"] = {"mlp": mlp}

    # --- FC head: Linear at 0/3/6, GroupNorm at 1/4 ------------------------
    fc = "point_cloud_encoder.fc_layer"
    encoder["fc0"] = _dense(sd[f"{fc}.0.weight"], sd[f"{fc}.0.bias"])
    encoder["gn0"] = _groupnorm(sd[f"{fc}.1.weight"], sd[f"{fc}.1.bias"])
    encoder["fc1"] = _dense(sd[f"{fc}.3.weight"], sd[f"{fc}.3.bias"])
    encoder["gn1"] = _groupnorm(sd[f"{fc}.4.weight"], sd[f"{fc}.4.bias"])
    encoder["fc2"] = _dense(sd[f"{fc}.6.weight"], sd[f"{fc}.6.bias"])
    params["point_cloud_encoder"] = encoder

    # --- q encoder (Sequential indices 0,2,4,6,8) ---------------------------
    for out_idx, torch_idx in enumerate((0, 2, 4, 6, 8)):
        params[f"feature_encoder_{out_idx}"] = _dense(
            sd[f"feature_encoder.{torch_idx}.weight"],
            sd[f"feature_encoder.{torch_idx}.bias"],
        )

    # --- decoder (Sequential indices 0,2,4,6) -------------------------------
    for out_idx, torch_idx in enumerate((0, 2, 4, 6)):
        params[f"decoder_{out_idx}"] = _dense(
            sd[f"decoder.{torch_idx}.weight"], sd[f"decoder.{torch_idx}.bias"]
        )

    return {"params": params}


def load_torch_checkpoint(path) -> Dict[str, Any]:
    """Load a Lightning ``.ckpt`` (or bare state_dict ``.pt``) and convert.
    Requires the baked-in CPU torch only for deserialization."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return convert_torch_state_dict(state_dict)


# ---------------------------------------------------------------------------
# Native (orbax) checkpointing -- the Lightning ModelCheckpoint equivalent
# (reference ``run_training.py:85-104``).
# ---------------------------------------------------------------------------

def save_checkpoint(directory, step: int, state) -> None:
    """Save a train state (or bare params pytree) under ``directory/step``."""
    import orbax.checkpoint as ocp

    path = Path(directory).absolute() / f"step_{step:08d}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)


def save_named_checkpoint(directory, name: str, step: int, state) -> None:
    """Overwrite ``directory/name`` (e.g. ``last``/``best``) with the state,
    recording ``step`` alongside -- the Lightning ``save_last`` / monitored
    best-checkpoint semantics (``run_training.py:85-104``)."""
    import shutil

    import orbax.checkpoint as ocp

    base = Path(directory).absolute()
    path = base / name
    tmp = base / f".{name}.tmp"
    if tmp.exists():
        shutil.rmtree(tmp)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, state)
    if path.exists():
        shutil.rmtree(path)
    tmp.rename(path)
    (base / f"{name}.step").write_text(str(step))


def named_checkpoint_step(directory, name: str) -> int | None:
    marker = Path(directory).absolute() / f"{name}.step"
    return int(marker.read_text()) if marker.exists() else None


def latest_checkpoint(directory) -> Path | None:
    """Newest resumable checkpoint: prefers ``last`` (with its recorded
    step) over the highest ``step_*`` directory."""
    base = Path(directory).absolute()
    if (base / "last").exists():
        return base / "last"
    steps = sorted(base.glob("step_*"))
    return steps[-1] if steps else None


def checkpoint_step(path) -> int:
    """Training step a checkpoint directory corresponds to."""
    path = Path(path)
    if path.name.startswith("step_"):
        return int(path.name[len("step_"):])
    marker = path.parent / f"{path.name}.step"
    return int(marker.read_text()) if marker.exists() else 0


def restore_checkpoint(path, example_state):
    """Restore into the structure of ``example_state`` (shapes/dtypes must
    match; pass a freshly-initialized state)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), example_state)
