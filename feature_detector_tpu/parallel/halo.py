"""Spatial (row-sharded) image processing with ICI halo exchange.

The CV analogue of sequence/context parallelism (SURVEY.md §5 long-context
row): one large image's rows are sharded over the ``space`` mesh axis; each
device computes its row-slab's response map after exchanging ``halo`` boundary
rows with its neighbors via `jax.lax.ppermute` (rides ICI, not DCN).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def exchange_halo(local_rows: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Append ``halo`` rows from the up/down neighbors around a row slab.

    local_rows: [rows_local, C] on each device.  Returns
    [rows_local + 2*halo, C]; edge devices get zero padding (matching the
    zero-gradient border semantics of the detectors).
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    top = local_rows[:halo]
    bottom = local_rows[-halo:]
    # Send my bottom rows down (they become the lower neighbor's top halo) and
    # my top rows up.
    from_above = jax.lax.ppermute(bottom, axis, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(top, axis, [(i + 1, i) for i in range(n - 1)])
    from_above = jnp.where(idx == 0, 0.0, from_above)
    from_below = jnp.where(idx == n - 1, 0.0, from_below)
    return jnp.concatenate([from_above, local_rows, from_below], axis=0)


def row_sharded_map(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    halo: int,
    axis: str = "space",
):
    """Lift an [H, W] -> [H, W] stencil map (radius <= halo) into a row-sharded
    version running one slab per device with halo exchange.

    The wrapped function must be shift-invariant away from the image border
    and tolerate zero padding at slab edges (true for the gradient/box-sum
    response kernels, whose borders are zero anyway: the interior-region
    masks in kernels/detect.py zero out everything the halo can distort as
    long as slabs are >= halo rows).
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
        check_vma=False,
    )
    def wrapped(local):
        padded = exchange_halo(local.astype(jnp.float32), halo, axis)
        out = fn(padded)
        return out[halo:-halo]

    return wrapped
