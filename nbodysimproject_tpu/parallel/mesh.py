"""Device-mesh helpers.

The reference has no distributed backend at all (SURVEY.md section 2
parallelism table: batch = serial Python loop).  Here the batch axis is
data-parallel over a 1-D ``jax.sharding.Mesh``; systems are
independent, so the only collectives are dataset-level reductions
(psum of batch statistics) riding ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def shard_batch(tree, mesh: Mesh):
    """Place a batched PyTree with the leading axis sharded over the
    data axis of the mesh (XLA inserts any needed collectives)."""
    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def pad_to_multiple(tree, multiple: int):
    """Pad the leading batch axis to a multiple of the device count,
    returning (padded_tree, original_B)."""
    leaves = jax.tree_util.tree_leaves(tree)
    B = leaves[0].shape[0]
    rem = (-B) % multiple
    if rem == 0:
        return tree, B

    def pad(x):
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, mode="edge")

    return jax.tree_util.tree_map(pad, tree), B
