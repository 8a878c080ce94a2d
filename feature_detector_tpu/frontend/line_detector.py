"""Line-detector front-end (FeatureLineDetector::DetectGoodFeatures
equivalent, feature_line_detector.h:51).

Like the reference, ``needed_feature_num`` does not cap the number of returned
lines (quirk Q8; only the fixed capacity ``opts.max_lines`` does) — a zero
budget returns an empty set.
"""

from __future__ import annotations

import dataclasses
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


@dataclasses.dataclass(frozen=True)
class LineDetectorState:
    """Introspection mirror of the reference's accessors
    (feature_line_detector.h:54-63): the demo draws the gradient-norm map,
    validity map, angle map, used-pixels/region map and fitted rectangles
    (test_feature_line_detector.cpp:15-85)."""

    lines: Lines
    norm: jnp.ndarray      # [rows-1, cols-1] gradient norm ("pixels" field)
    angle: jnp.ndarray     # level-line angle map
    valid: jnp.ndarray     # validity map
    labels: jnp.ndarray    # region map (seed flat index; -1 invalid) — the
                           # used-pixels analogue with region identity
    rects: dict            # per-line center/angle/length/width/inlier_ratio/...

    def pixels(self):
        """(norm, angle, valid) grids — PixelParam fields
        (feature_line_detector.h:14-20)."""
        return self.norm, self.angle, self.valid

    def sorted_pixels(self):
        """Valid pixel (row, col) coords sorted by descending gradient norm
        (feature_line_detector.cpp:92-94's seed order)."""
        import numpy as np

        norm = np.asarray(self.norm)
        valid = np.asarray(self.valid)
        rr, cc = np.nonzero(valid)
        order = np.argsort(-norm[rr, cc], kind="stable")
        return np.stack([rr[order], cc[order]], -1)

    def rectangles(self):
        """Fitted rectangle params of the selected lines (RectangleParam,
        feature_line_detector.h:27-38) as a dict of arrays."""
        return self.rects


def detect_good_lines_with_state(
    image: jnp.ndarray, opts: LineDetectorOptions = LineDetectorOptions()
) -> LineDetectorState:
    """Detection plus every intermediate map the reference demo visualizes."""
    norm, angle, valid = K.line_level_angle_map(image, opts)
    endpoints, line_valid, labels, rects = K.detect_lines_with_state(
        norm, angle, valid, image.shape, opts
    )
    return LineDetectorState(
        lines=Lines(endpoints=endpoints, valid=line_valid),
        norm=norm, angle=angle, valid=valid, labels=labels, rects=rects,
    )
