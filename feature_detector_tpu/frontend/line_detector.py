"""Line-detector front-end (FeatureLineDetector::DetectGoodFeatures
equivalent, feature_line_detector.h:51).

Like the reference, ``needed_feature_num`` does not cap the number of returned
lines (quirk Q8; only the fixed capacity ``opts.max_lines`` does) — a zero
budget returns an empty set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import LineDetectorOptions
from ..core.types import Lines
from ..kernels import lsd as K


@functools.partial(jax.jit, static_argnames=("needed_feature_num", "opts"))
def detect_good_lines(
    image: jnp.ndarray,
    needed_feature_num: int = 1,
    opts: LineDetectorOptions = LineDetectorOptions(),
) -> Lines:
    if needed_feature_num == 0:
        return Lines.empty(opts.max_lines)
    norm, angle, valid = K.line_level_angle_map(image, opts)
    endpoints, line_valid = K.detect_lines_from_maps(
        norm, angle, valid, image.shape, opts
    )
    return Lines(endpoints=endpoints, valid=line_valid)
