"""Mesh and sharding-rule management (SURVEY.md §2.5).

The reference has NO distribution layer (single device everywhere,
`ncl.py:16`); this module is the new-design communication backend mandated by
BASELINE.json: a ``(data, model)`` device mesh where

  * ``data``  — batch dimension (DP): batches sharded, gradients psum'd by
    XLA under pjit;
  * ``model`` — table rows (the rec-sys analog of TP/EP): user/item embedding
    tables row-sharded; lookups/gathers and top-k merges ride ICI
    collectives inserted by GSPMD or written explicitly in
    ``parallel/embedding.py`` / ``parallel/collectives.py``.

No NCCL/MPI analog exists or is needed — the XLA runtime owns transport.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int
    model: int

    @property
    def n_devices(self) -> int:
        return self.data * self.model


def default_mesh_shape(n_devices: int) -> MeshSpec:
    """Split devices ~evenly: model axis gets the largest power-of-two
    ≤ √n, data gets the rest. 8 devices → (data=4, model=2)."""
    model = 1
    while model * 2 <= max(1, int(np.sqrt(n_devices))) and n_devices % (model * 2) == 0:
        model *= 2
    return MeshSpec(data=n_devices // model, model=model)


def make_mesh(
    shape: Optional[MeshSpec] = None, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = default_mesh_shape(len(devices))
    elif devices is not None and len(devices) > shape.n_devices:
        # explicit shape smaller than the visible device count: use a prefix
        devices = devices[: shape.n_devices]
    assert shape.n_devices == len(devices), (shape, len(devices))
    arr = np.asarray(devices).reshape(shape.data, shape.model)
    return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Embedding tables: rows sharded over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Per-step batch arrays: sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, table_keys=("user_emb", "item_emb")):
    """Place a model's param pytree: embedding tables row-sharded, everything
    else replicated."""
    tab = table_sharding(mesh)
    rep = replicated(mesh)

    def place(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in table_keys and getattr(x, "ndim", 0) == 2:
            return jax.device_put(x, tab)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(place, params)
