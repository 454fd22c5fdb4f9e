"""Device mesh + sharding helpers — the framework's parallelism layer.

The reference is single-device with eager execution and no collectives
(SURVEY §2.7).  Here parallelism is declarative: a ``jax.sharding.Mesh`` with
``("data", "model")`` axes, batch arrays sharded over ``data``, parameters
replicated (the model fits one chip at reference scale; the ``model`` axis is
reserved for tensor parallelism on larger configs).  XLA/GSPMD inserts the
gradient ``psum`` and cross-replica BatchNorm reductions over ICI — there is
no hand-written communication anywhere, by design.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = 0, n_model: int = 1, devices=None
) -> Mesh:
    """Build a ("data", "model") mesh.  ``n_data=0`` uses every device."""
    devices = devices if devices is not None else jax.devices()
    if n_data <= 0:
        n_data = len(devices) // n_model
    n = n_data * n_model
    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis split across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh):
    """Replicate the train state across the mesh (DP layout)."""
    return jax.device_put(state, replicated(mesh))


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, data_sharding(mesh))
