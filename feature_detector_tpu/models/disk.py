"""DISK detector/descriptor U-Net in Flax.

Replaces the reference's ``disk.onnx`` / ``disk_nms.onnx`` sessions
(nn_feature_point_detector.cpp:10-57, SURVEY.md C10).  Output contract matches
the reference's tensors: a full-resolution score heatmap and a 128-channel
full-resolution descriptor map (DISK descriptors are 128-d; the reference's
ExtractDescriptorsForSelectedFeatures samples them at stride 8 like
SuperPoint's, nn_feature_point_detector.cpp:162-193 — preserved by the
frontend post-processing).

Architecture follows the public DISK design (Tyszkiewicz et al. 2020): a
U-Net with depth-4 down/up path whose final head emits descriptor_dim + 1
channels (descriptors + detection logit map).  Input is the gray image
replicated to RGB (OnnxRuntime::ConvertGrayImageToRgbTensor,
nn_feature_point_detector.cpp:96-98).  bfloat16 convs on the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x)
        return nn.relu(x)


class Disk(nn.Module):
    """Input: [B, H, W, 3] float32 in [0, 1]; H, W divisible by 16.

    Returns (heatmap [B, H, W] float32, descriptors [B, H, W, 128] L2-normed).
    """

    descriptor_dim: int = 128
    down: Sequence[int] = (16, 32, 64, 64, 64)
    up: Sequence[int] = (64, 64, 64, 64)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert len(self.up) == len(self.down) - 1, "up path must mirror the pools"
        x = x.astype(self.dtype)
        skips = []
        for i, feats in enumerate(self.down):
            x = ConvBlock(feats, self.dtype, name=f"down_{i}")(x)
            if i < len(self.down) - 1:
                skips.append(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for i, feats in enumerate(self.up):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            skip = skips.pop()
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = ConvBlock(feats, self.dtype, name=f"up_{i}")(x)

        head = nn.Conv(self.descriptor_dim + 1, (1, 1), dtype=self.dtype, name="head")(x)
        head = head.astype(jnp.float32)
        desc = head[..., : self.descriptor_dim]
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        heat = jax.nn.sigmoid(head[..., -1])
        return heat, desc


def preprocess_gray_rgb(image_u8: jnp.ndarray) -> jnp.ndarray:
    """[H, W] uint8 -> [1, H, W, 3] float32 in [0,1], gray replicated to RGB
    (ConvertGrayImageToRgbTensor contract)."""
    x = image_u8.astype(jnp.float32) / 255.0
    return jnp.repeat(x[None, :, :, None], 3, axis=-1)
