"""SuperPoint detector/descriptor backbone in Flax.

Replaces the reference's ``superpoint.onnx`` / ``superpoint_nms.onnx`` ONNX
Runtime sessions (nn_feature_point_detector.cpp:10-57, SURVEY.md C8-C9) with a
native Flax module whose outputs match the ONNX models' contract:

- heatmap path (2 outputs): full-resolution keypoint heatmap [H, W] and a
  1/8-resolution 256-channel descriptor map, consumed by the host-free
  post-processing in ``frontend/nn_detector.py`` exactly as the reference
  consumes its tensors (SelectKeypointCandidatesFromHeatMap etc.,
  nn_feature_point_detector.cpp:128-193).
- NMS path (3 outputs): in-graph top-K selection returning (keypoints int32
  [K, 2], scores [K], descriptors [K, 256]) mirroring the ``*_nms.onnx``
  contract (nn_feature_point_detector_superpoint.cpp:76-112).

Architecture follows the public SuperPoint design (DeTone et al. 2018,
MagicLeap release): shared VGG encoder (64,64,64,64,128,128,128,128 channels,
3 max-pools), a 65-channel cell-softmax detector head decoded by pixel-shuffle
(8x8 cells + dustbin), and a 256-d descriptor head at stride 8, L2-normalized.
Weights convert from the public PyTorch checkpoint via ``models/convert.py``.
Compute is bfloat16 on the MXU with float32 heads.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class VGGBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return nn.relu(x)


class SuperPoint(nn.Module):
    """Input: [B, H, W, 1] float32 in [0, 1].  H, W divisible by 8."""

    descriptor_dim: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_logits: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        # Encoder: conv1a/1b -> pool -> conv2a/2b -> pool -> conv3a/3b -> pool
        # -> conv4a/4b (stride-8 feature map).
        for i, feats in enumerate((64, 64, 64, 64, 128, 128, 128, 128)):
            x = VGGBlock(feats, self.dtype, name=f"conv{i//2+1}{'ab'[i%2]}")(x)
            if i in (1, 3, 5):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # Detector head: 256 -> 65 (8x8 cell logits + dustbin).
        d = VGGBlock(256, self.dtype, name="convPa")(x)
        logits = nn.Conv(65, (1, 1), dtype=self.dtype, name="convPb")(d)
        logits = logits.astype(jnp.float32)

        # Descriptor head: 256-d at stride 8, L2-normalized.
        e = VGGBlock(256, self.dtype, name="convDa")(x)
        desc = nn.Conv(self.descriptor_dim, (1, 1), dtype=self.dtype, name="convDb")(e)
        desc = desc.astype(jnp.float32)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )
        if return_logits:
            # Training path: raw 65-way cell logits (models/train_superpoint.py).
            return logits, desc

        probs = jax.nn.softmax(logits, axis=-1)[..., :64]  # drop dustbin
        b, hc, wc, _ = probs.shape
        # Pixel-shuffle 8x8 cells back to full resolution.
        heatmap = probs.reshape(b, hc, wc, 8, 8)
        heatmap = heatmap.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)
        return heatmap, desc


def preprocess_gray(image_u8: jnp.ndarray) -> jnp.ndarray:
    """[H, W] uint8 -> [1, H, W, 1] float32 in [0,1] (the ONNX input contract,
    OnnxRuntime::ConvertImageToTensor)."""
    x = image_u8.astype(jnp.float32) / 255.0
    return x[None, :, :, None]


def nms_head(
    heatmap: jnp.ndarray,
    desc_map: jnp.ndarray,
    k: int = 1024,
    min_response: float = 0.005,
    nms_radius: int = 4,
    stride: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """In-graph NMS + top-K head: the ``*_nms.onnx`` model contract.

    The reference's ``superpoint_nms.onnx`` / ``disk_nms.onnx`` return THREE
    tensors — int64 keypoints, scores, descriptors — that the C++ consumes
    with ArgSort + mask-NMS (nn_feature_point_detector_superpoint.cpp:76-112,
    nn_feature_point_detector.cpp:203-230).  This is the TPU-native fused
    equivalent appended to the Flax backbone inside one jit:

    1. local-max NMS over a (2·nms_radius+1)² window (reduce_window max);
    2. response threshold;
    3. ``lax.top_k`` over the suppressed map — scores descending, row-major
       tie-break (quirk Q2/Q10 ordering);
    4. bilinear descriptor sampling at (u/stride, v/stride).

    Args: heatmap [H, W] float32, desc_map [Hc, Wc, D].
    Returns (keypoints int32 [K, 2] as (u, v), scores [K] — 0 marks padding,
    descriptors [K, D]).
    """
    h, w = heatmap.shape
    win = 2 * nms_radius + 1
    local_max = jax.lax.reduce_window(
        heatmap, -jnp.inf, jax.lax.max, (win, win), (1, 1), "SAME"
    )
    keep = (heatmap >= local_max) & (heatmap > min_response)
    suppressed = jnp.where(keep, heatmap, 0.0)
    scores, flat_idx = jax.lax.top_k(suppressed.ravel(), k)
    vv = (flat_idx // w).astype(jnp.int32)
    uu = (flat_idx % w).astype(jnp.int32)
    kpts = jnp.stack([uu, vv], axis=1)
    valid = scores > 0.0
    scores = jnp.where(valid, scores, 0.0)

    from ..frontend.nn_detector import sample_descriptor_grid

    desc = sample_descriptor_grid(desc_map, kpts.astype(jnp.float32), stride)
    desc = desc * valid[:, None].astype(desc.dtype)
    return kpts, scores, desc
