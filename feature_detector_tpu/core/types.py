"""Fixed-shape feature containers.

The reference passes dynamic ``std::vector``s of features between stages; the
TPU-native design replaces those with fixed-capacity arrays plus validity
masks so every stage has static shapes under jit (SURVEY.md H3).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Features:
    """A fixed-capacity set of 2D features.

    Fields
    ------
    uv:       [N, 2] float32, (x, y) pixel coordinates.
    response: [N]    float32, detector response (0 where invalid).
    valid:    [N]    bool, slot occupancy; valid slots are always a prefix.
    """

    uv: jnp.ndarray
    response: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.uv.shape[-2]

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(capacity: int) -> "Features":
        return Features(
            uv=jnp.zeros((capacity, 2), jnp.float32),
            response=jnp.zeros((capacity,), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )

    @staticmethod
    def from_numpy(uv, capacity: int) -> "Features":
        import numpy as np

        uv = np.asarray(uv, dtype=np.float32).reshape(-1, 2)
        n = min(len(uv), capacity)
        out = Features.empty(capacity)
        return out.replace(
            uv=out.uv.at[:n].set(uv[:n]),
            valid=out.valid.at[:n].set(True),
        )

    def to_numpy(self):
        """Returns (uv[count, 2], response[count]) as numpy arrays."""
        import numpy as np

        valid = np.asarray(self.valid)
        return np.asarray(self.uv)[valid], np.asarray(self.response)[valid]


@struct.dataclass
class Lines:
    """Fixed-capacity set of line segments: endpoints [N, 4] = (x1, y1, x2, y2)."""

    endpoints: jnp.ndarray
    valid: jnp.ndarray

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(capacity: int) -> "Lines":
        return Lines(
            endpoints=jnp.zeros((capacity, 4), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )

    def to_numpy(self):
        import numpy as np

        valid = np.asarray(self.valid)
        return np.asarray(self.endpoints)[valid]


@struct.dataclass
class Descriptors:
    """Packed binary descriptors: [N, W] uint32 words + validity."""

    words: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def empty(capacity: int, num_words: int) -> "Descriptors":
        return Descriptors(
            words=jnp.zeros((capacity, num_words), jnp.uint32),
            valid=jnp.zeros((capacity,), bool),
        )


@struct.dataclass
class Matches:
    """Matches from set A to set B: for each A-slot an index into B (or -1)."""

    index: jnp.ndarray  # [Na] int32, -1 when unmatched
    distance: jnp.ndarray  # [Na] int32 (Hamming) or float32 (L2)
    valid: jnp.ndarray  # [Na] bool

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)
