"""Batch row gathers with an MXU backward.

Every model's loss gathers batch rows from the propagated tables
(``user_all[batch.users]`` — the jax spelling of the reference's
``self.user_emb[users]`` lookups, e.g. `directau.py:300-304`). XLA's VJP
for a gather is a scatter-add, which serializes badly on TPU: the
headline-bench ablation (tools/ablate_step.py) measured the batch
gather+scatter grad at ~61 us/step — 3× the whole propagation. For small
tables the scatter is replaced here by a one-hot matmul,

    d_table = onehotᵀ(idx) @ g            (onehot: [B, n] from an iota
                                           compare — never materialized in
                                           HBM at rest, built per step)

which runs on the MXU and is numerically EXACT (each output row is a sum
of f32 g-rows; measured bit-equal to the scatter path on TPU v5e, and
~1.5× faster end-to-end on the bench step). Tables larger than
``ONEHOT_BWD_MAX_ROWS`` keep the scatter VJP — the one-hot's B·n compare
grows linearly in table size while scatter stays O(B·d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# One-hot backward pays O(B·n) compare + matmul FLOPs; past ~8k rows the
# scatter-add wins back. (Headline regime: n ≤ 1682.)
ONEHOT_BWD_MAX_ROWS = 8192


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _take_onehot_bwd(table: jnp.ndarray, idx: jnp.ndarray, n: int) -> jnp.ndarray:
    return table[idx]


def _take_fwd(table, idx, n):
    return table[idx], idx


def _take_bwd(n, idx, g):
    oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(g.dtype)
    d_table = jax.lax.dot_general(oh, g, (((0,), (0,)), ((), ())))
    return d_table, None


_take_onehot_bwd.defvjp(_take_fwd, _take_bwd)


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` with the TPU-friendly backward described above.

    Identical forward to plain indexing; gradient identical in value
    (scatter-add and one-hot matmul compute the same f32 sums).

    PRECONDITION: ``0 <= idx < table.shape[0]``. Out-of-range / negative
    indices silently diverge from plain indexing on the one-hot path: the
    forward wraps/clamps like a gather, but the backward drops their
    cotangents (no iota match -> zero grad row) where the scatter VJP would
    accumulate them. Callers with padded/-1 indices must clamp first.
    >1-D indices or big tables fall through to plain indexing (scatter VJP).
    """
    if idx.ndim != 1 or table.shape[0] > ONEHOT_BWD_MAX_ROWS:
        return table[idx]
    return _take_onehot_bwd(table, idx, table.shape[0])
