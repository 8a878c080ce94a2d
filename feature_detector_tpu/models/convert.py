"""Convert public PyTorch checkpoints to Flax params.

The reference ships its NN weights as (absent) ONNX blobs
(.MISSING_LARGE_BLOBS, SURVEY.md C11/H4); the TPU-native equivalents are Flax
param pytrees.  This module maps the public MagicLeap SuperPoint checkpoint
(``superpoint_v1.pth`` layer names conv1a..convDb) and DISK-style U-Net state
dicts onto our modules.  In this zero-egress environment the converters are
exercised with synthetic state dicts of the correct shapes (tests); point
them at real downloaded checkpoints to get production weights.

PyTorch conv weight layout is OIHW; Flax uses HWIO — kernels transpose as
(2, 3, 1, 0).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


_SUPERPOINT_LAYERS = (
    "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b", "conv4a",
    "conv4b", "convPa", "convPb", "convDa", "convDb",
)


def _kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def superpoint_from_torch(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Map a MagicLeap-style SuperPoint state dict ({layer}.weight/.bias,
    OIHW) to the Flax param tree of models.superpoint.SuperPoint.

    VGG blocks wrap their conv as ``{name}/Conv_0``; the 1x1 heads convPb /
    convDb are plain Conv modules.
    """
    params = {}
    for name in _SUPERPOINT_LAYERS:
        w = state_dict[f"{name}.weight"]
        b = state_dict[f"{name}.bias"]
        leaf = {"kernel": _kernel(w).astype(np.float32), "bias": np.asarray(b, np.float32)}
        if name in ("convPb", "convDb"):
            params[name] = leaf
        else:
            params[name] = {"Conv_0": leaf}
    return {"params": params}


def disk_from_torch(
    down: Mapping[int, Mapping[str, np.ndarray]],
    up: Mapping[int, Mapping[str, np.ndarray]],
    head: Mapping[str, np.ndarray],
) -> Dict:
    """Map DISK-style U-Net blocks to models.disk.Disk params.

    ``down[i]`` / ``up[i]`` each provide {"weight", "bias", "norm_scale",
    "norm_bias"}; ``head`` provides the final 1x1 conv.  Because public DISK
    releases vary in internal naming, callers flatten their checkpoint into
    this canonical block structure first.
    """
    params = {}
    for i, blk in down.items():
        params[f"down_{i}"] = _conv_block(blk)
    for i, blk in up.items():
        params[f"up_{i}"] = _conv_block(blk)
    params["head"] = {
        "kernel": _kernel(head["weight"]).astype(np.float32),
        "bias": np.asarray(head["bias"], np.float32),
    }
    return {"params": params}


def _conv_block(blk: Mapping[str, np.ndarray]) -> Dict:
    return {
        "Conv_0": {
            "kernel": _kernel(blk["weight"]).astype(np.float32),
            "bias": np.asarray(blk["bias"], np.float32),
        },
        "GroupNorm_0": {
            "scale": np.asarray(blk["norm_scale"], np.float32),
            "bias": np.asarray(blk["norm_bias"], np.float32),
        },
    }


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into a {name: numpy array} dict (CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
