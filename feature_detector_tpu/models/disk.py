"""DISK detector/descriptor U-Net in Flax — published block structure.

Replaces the reference's ``disk.onnx`` / ``disk_nms.onnx`` sessions
(nn_feature_point_detector.cpp:10-57, SURVEY.md C10).  Architecture follows
the published DISK model (Tyszkiewicz et al., NeurIPS 2020; cvlab-epfl/disk):
a "thin" U-Net —

- down path channels (16, 32, 64, 64, 64) at scales /1 /2 /4 /8 /16,
- up path channels (64, 64, 64, desc_dim+1) with nearest-neighbor
  ("trivial") upsampling and skip concatenation,
- ONE 5x5 conv per block, PRE-ACTIVATED by InstanceNorm (no affine params)
  + per-channel PReLU; the stem block is a bare conv,
- 2x2 average-pool ("trivial") downsampling,
- final up block emits desc_dim + 1 channels: 128 descriptor channels plus
  one detection-logit channel, both at FULL resolution.

Output contract matches the reference's tensors: heatmap [B, H, W] in [0, 1]
(sigmoid of the logit channel — consumed against kMinResponse=0.1,
nn_feature_point_detector.h:21) and a full-resolution 128-d descriptor map.
Input is the gray image replicated to RGB
(OnnxRuntime::ConvertGrayImageToRgbTensor, nn_feature_point_detector.cpp:96-98).

Descriptor-sampling quirk (conscious divergence): the reference's shared
extractor divides pixel coords by 8 UNCONDITIONALLY
(nn_feature_point_detector.cpp:169-171) — against a full-resolution DISK map
that reads a shrunken location.  The frontend instead average-pools the
full-res map to 1/8 before the same /8 sampling (frontend/nn_detector.py),
which is the geometrically consistent reading; recorded as a Q-series
decision, repeatability-tested rather than tensor-compared.

bfloat16 convs on the MXU; norms/gates in f32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class InstanceNorm(nn.Module):
    """InstanceNorm2d, affine=False (PyTorch default — no learnable params):
    per-sample, per-channel normalization over the spatial axes."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)


class PReLU(nn.Module):
    """Per-channel PReLU (PyTorch nn.PReLU(num_parameters=C), init 0.25)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],), jnp.float32)
        a = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class ThinConv(nn.Module):
    """One pre-activated 5x5 conv: [InstanceNorm -> PReLU ->] Conv.

    ``is_first`` skips norm/gate (the U-Net stem takes raw pixels)."""

    features: int
    kernel: int = 5
    is_first: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if not self.is_first:
            x = InstanceNorm(name="norm")(x)
            x = PReLU(name="gate")(x)
        return nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME",
                       dtype=self.dtype, name="conv")(x)


class Disk(nn.Module):
    """Input: [B, H, W, 3] float32 in [0, 1]; H, W divisible by 16.

    Returns (heatmap [B, H, W] float32 in [0,1], descriptors [B, H, W, 128]
    L2-normalized).
    """

    descriptor_dim: int = 128
    down: Sequence[int] = (16, 32, 64, 64, 64)
    up: Sequence[int] = (64, 64, 64)  # final block emits descriptor_dim + 1
    kernel: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        skips = []
        for i, feats in enumerate(self.down):
            if i > 0:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))  # TrivialDownsample
            x = ThinConv(feats, self.kernel, is_first=(i == 0),
                         dtype=self.dtype, name=f"down_{i}")(x)
            if i < len(self.down) - 1:
                skips.append(x)

        up_feats = tuple(self.up) + (self.descriptor_dim + 1,)
        for i, feats in enumerate(up_feats):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")  # TrivialUpsample
            x = jnp.concatenate([x, skips.pop().astype(x.dtype)], axis=-1)
            x = ThinConv(feats, self.kernel, dtype=self.dtype, name=f"up_{i}")(x)

        head = x.astype(jnp.float32)
        desc = head[..., : self.descriptor_dim]
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        heat = jax.nn.sigmoid(head[..., -1])
        return heat, desc


def preprocess_gray_rgb(image_u8: jnp.ndarray) -> jnp.ndarray:
    """[H, W] uint8 -> [1, H, W, 3] float32 in [0,1], gray replicated to RGB
    (ConvertGrayImageToRgbTensor contract)."""
    x = image_u8.astype(jnp.float32) / 255.0
    return jnp.repeat(x[None, :, :, None], 3, axis=-1)
