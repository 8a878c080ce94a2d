"""Device-mesh helpers.

The reference is single-threaded, single-process (SURVEY.md §2 parallelism
table); all parallelism here is new, TPU-native capability:
- ``data`` axis: frames batched across chips (DP for the front-end).
- ``space`` axis: image rows sharded across chips with halo exchange (the CV
  analogue of sequence parallelism; see halo.py).
- the SLAM back-end reduces Schur blocks with psum over these axes (slam/ba.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[Sequence[int]] = None, axis_names=("data",)) -> Mesh:
    """Build a mesh over all available devices.

    make_mesh() -> 1D "data" mesh over every device;
    make_mesh((2, 4), ("data", "space")) -> 2x4 mesh.
    """
    devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/frame) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
