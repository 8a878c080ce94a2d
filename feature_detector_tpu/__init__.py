"""feature_detector_tpu — a TPU-native (JAX/XLA/Pallas) sparse-feature
front-end and distributed SLAM back-end.

Built from scratch with the capabilities of Horizon1026/Feature_Detector
(see SURVEY.md): FAST / Harris / Shi-Tomasi corner detection with greedy
mask suppression and incremental re-detection, steered BRIEF descriptors with
bitpacked Hamming matching, LSD line segments, SuperPoint / DISK Flax
backbones with fused in-graph NMS, and a distributed Schur-complement bundle
adjustment layer over `jax.sharding` meshes.
"""

__version__ = "0.1.0"

from .core.config import (  # noqa: F401
    BAOptions,
    BriefOptions,
    DetectorOptions,
    FastOptions,
    FrontendConfig,
    HarrisOptions,
    LineDetectorOptions,
    MatcherOptions,
    NNDetectorOptions,
    NNModelType,
    ShiTomasiOptions,
)
from .core.types import Descriptors, Features, Lines, Matches  # noqa: F401
