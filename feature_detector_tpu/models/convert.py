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


_DISK_BLOCKS = (
    "down_0", "down_1", "down_2", "down_3", "down_4",
    "up_0", "up_1", "up_2", "up_3",
)


def disk_from_torch(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Map a cvlab-epfl/disk thin-U-Net state dict onto models.disk.Disk.

    The published DISK U-Net has exactly nine 5x5 convs (down 16/32/64/64/64,
    up 64/64/64/129) and eight per-channel PReLU gates (every block except the
    stem); its InstanceNorms are affine-free and contribute no parameters.
    Public exports differ only in key *prefixes* (``unet.path_down.0...`` vs
    wrapped module names), so the mapping is POSITIONAL-BY-SHAPE, robust to
    renames:

    - 4-D ``*.weight`` tensors, in state-dict order, are the conv kernels of
      down_0..down_4, up_0..up_3; each pairs with its same-prefix ``*.bias``;
    - 1-D ``*.weight`` tensors (torch ``nn.PReLU`` stores its alpha as
      ``weight``), in order, are the gates of down_1..down_4, up_0..up_3.

    Channel counts are validated against the published layout before
    returning.
    """
    convs = [(k, np.asarray(v)) for k, v in state_dict.items() if np.asarray(v).ndim == 4]
    alphas = [np.asarray(v) for k, v in state_dict.items()
              if np.asarray(v).ndim == 1 and k.endswith("weight")]
    if len(convs) != len(_DISK_BLOCKS):
        raise ValueError(f"expected {len(_DISK_BLOCKS)} convs, got {len(convs)}")
    if len(alphas) != len(_DISK_BLOCKS) - 1:
        raise ValueError(f"expected {len(_DISK_BLOCKS) - 1} PReLU gates, got {len(alphas)}")

    expected_out = (16, 32, 64, 64, 64, 64, 64, 64, 129)
    expected_in = (3, 16, 32, 64, 64, 128, 128, 96, 80)
    params: Dict = {}
    for i, (name, (key, w)) in enumerate(zip(_DISK_BLOCKS, convs)):
        if w.shape[0] != expected_out[i] or w.shape[1] != expected_in[i]:
            raise ValueError(
                f"{name}: conv {key} has shape {w.shape}, expected "
                f"[{expected_out[i]}, {expected_in[i]}, 5, 5]"
            )
        b = state_dict[key[: -len("weight")] + "bias"]
        blk = {"conv": {"kernel": _kernel(w).astype(np.float32),
                        "bias": np.asarray(b, np.float32)}}
        if i > 0:
            a = alphas[i - 1]
            if a.shape[0] != expected_in[i]:
                raise ValueError(f"{name}: gate has {a.shape[0]} params, expected {expected_in[i]}")
            blk["gate"] = {"alpha": np.asarray(a, np.float32)}
        params[name] = blk
    return {"params": params}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into a {name: numpy array} dict (CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
