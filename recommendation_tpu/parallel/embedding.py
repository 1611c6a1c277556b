"""Row-sharded embedding-table lookup (the all-to-all exchange component).

BASELINE.json north star: "user/item embedding tables row-sharded across a
pod slice with all-to-all lookup exchange". Two implementations:

  * **GSPMD path** (default): just index a row-sharded table under pjit —
    XLA lowers the gather to an ICI collective automatically. Zero code,
    usually optimal; this is what the trainers use.
  * **explicit shard_map path** (this module): each shard masks the global
    ids to its row range, gathers locally, and the full rows are recovered
    with a ``psum`` over the model axis. Used where manual control beats
    GSPMD (fused lookup+loss kernels) and to TEST the sharding semantics
    against the single-device oracle on the CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from recommendation_tpu.parallel.mesh import MODEL_AXIS


def sharded_embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Gather rows of a model-axis row-sharded table for replicated ids.

    table: f32[n_rows, d] sharded P(model, None) — n_rows must divide evenly
    by the model axis size (pad tables at build time).
    ids: i32[B] replicated. Returns f32[B, d] replicated.
    """
    n_shards = mesh.shape[MODEL_AXIS]
    n_rows = table.shape[0]
    assert n_rows % n_shards == 0, "pad table rows to a multiple of the model axis"
    rows_per_shard = n_rows // n_shards

    def local_lookup(local_table, ids):
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = shard * rows_per_shard
        local = ids - offset
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = local_table[safe] * in_range[:, None].astype(local_table.dtype)
        return jax.lax.psum(rows, MODEL_AXIS)

    return jax.shard_map(
        local_lookup,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
    )(table, ids)


def pad_rows_to(table: jnp.ndarray, multiple: int) -> jnp.ndarray:
    n = table.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return table
    return jnp.concatenate([table, jnp.zeros((pad,) + table.shape[1:], table.dtype)])
