"""Packaged model weights (C11 analogue).

The reference ships trained ONNX blobs (absent from its snapshot,
.MISSING_LARGE_BLOBS); the TPU-native framework packages its weights as npz
param archives under ``models/weights/``.  The default SuperPoint checkpoint
(``superpoint_synth.npz``, ~2.4 MB f16) was trained IN-REPO on the TPU with
models/train_superpoint.py (synthetic corner supervision + homographic-warp
descriptor hinge, 3000 steps) — zero-egress stand-in for the public
MagicLeap checkpoint, which converts via models/convert.superpoint_from_torch
when available.
"""

from __future__ import annotations

import os
from typing import Optional

_WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights")

SUPERPOINT_SYNTH = os.path.join(_WEIGHTS_DIR, "superpoint_synth.npz")
DISK_SYNTH = os.path.join(_WEIGHTS_DIR, "disk_synth.npz")


def load_default_superpoint() -> Optional[dict]:
    """The packaged trained SuperPoint params, or None when absent."""
    if not os.path.exists(SUPERPOINT_SYNTH):
        return None
    from .train_superpoint import load_params_npz

    return load_params_npz(SUPERPOINT_SYNTH)


def load_default_disk() -> Optional[dict]:
    """The packaged trained DISK params (disk_synth.npz, trained in-repo on
    the TPU by models/train_disk.py), or None when absent."""
    if not os.path.exists(DISK_SYNTH):
        return None
    from .train_superpoint import load_params_npz

    return load_params_npz(DISK_SYNTH)
