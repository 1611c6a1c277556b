"""Collective compute patterns: sharded MIPS top-k, ring item-block losses.

BASELINE.json north star components (SURVEY.md §2.5 table):
  * sharded top-k retrieval — each model shard scores its item rows, takes a
    local ``lax.top_k``, and the per-shard (score, global-id) candidates are
    all-gathered and merged with one final top-k;
  * ring/blockwise streaming — in-batch-softmax and uniformity losses over
    item blocks without materializing B×N, via log-sum-exp accumulation
    across shards (`ssl4rec.py:25-30`, `directau.py:248-251` made shardable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from recommendation_tpu.parallel.mesh import MODEL_AXIS


def sharded_topk(
    user_emb: jnp.ndarray, item_emb: jnp.ndarray, k: int, mesh: Mesh
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over a row-sharded item table.

    user_emb: f32[B, d] replicated; item_emb: f32[n_items_padded, d] sharded
    P(model, None). Returns (scores f32[B,k], global ids i32[B,k]).
    Per shard: local MXU matmul + local top-k (k candidates each), then an
    all-gather of k·n_shards candidates and one final merge — the cross-host
    merge is O(B·k·S), never O(B·N).
    """
    n_shards = mesh.shape[MODEL_AXIS]
    n_items = item_emb.shape[0]
    assert n_items % n_shards == 0
    rows_per_shard = n_items // n_shards
    # a shard can contribute at most its own rows; the merge still recovers
    # the global top-k as long as k ≤ Σ local_k
    local_k = min(k, rows_per_shard)
    k = min(k, n_items)
    assert k <= local_k * n_shards

    def local_topk(u, local_items):
        shard = jax.lax.axis_index(MODEL_AXIS)
        scores = jnp.dot(u, local_items.T, preferred_element_type=jnp.float32)
        s, i = jax.lax.top_k(scores, local_k)
        gids = i + shard * rows_per_shard
        all_s = jax.lax.all_gather(s, MODEL_AXIS, axis=1)  # [B, S, local_k]
        all_i = jax.lax.all_gather(gids, MODEL_AXIS, axis=1)
        all_s = all_s.reshape(u.shape[0], -1)
        all_i = all_i.reshape(u.shape[0], -1)
        ms, mi = jax.lax.top_k(all_s, k)
        return ms, jnp.take_along_axis(all_i, mi, axis=1)

    return jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None)),
        out_specs=(P(), P()),
        # outputs are replicated by construction (post-all_gather merge); the
        # varying-axes checker can't prove it through take_along_axis.
        check_vma=False,
    )(user_emb, item_emb)


def sharded_batch_softmax_denominator(
    user_emb: jnp.ndarray, item_emb: jnp.ndarray, temperature: float, mesh: Mesh
) -> jnp.ndarray:
    """log Σ_j exp(u·v_j/τ) with the item axis sharded — the streaming
    log-sum-exp building block for full-catalog InfoNCE denominators
    (`ncl.py:363-366`) and global in-batch softmax.

    Returns f32[B] replicated. Numerically equal to the single-device
    logsumexp (stable: per-shard max then global max correction)."""

    def local_lse(u, local_items):
        scores = jnp.dot(u, local_items.T, preferred_element_type=jnp.float32) / temperature
        local_max = jnp.max(scores, axis=1)
        global_max = jax.lax.pmax(local_max, MODEL_AXIS)
        local_sum = jnp.sum(jnp.exp(scores - global_max[:, None]), axis=1)
        total = jax.lax.psum(local_sum, MODEL_AXIS)
        return global_max + jnp.log(total)

    return jax.shard_map(
        local_lse,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None)),
        out_specs=P(),
    )(user_emb, item_emb)


def sharded_uniformity(
    x: jnp.ndarray, mesh: Mesh, t: float = 2.0
) -> jnp.ndarray:
    """DirectAU uniformity log-mean-exp over ALL pairs with x row-sharded:
    each shard computes its block-row of exp(−t·d²) against the full
    (all-gathered) matrix; psum accumulates the sum. Equals the dense
    `directau.py:248-251` value including pair bookkeeping (i<j, no self)."""

    n = x.shape[0]

    def local(x_local):
        shard = jax.lax.axis_index(MODEL_AXIS)
        rows = x_local.shape[0]
        full = jax.lax.all_gather(x_local, MODEL_AXIS, axis=0).reshape(-1, x_local.shape[1])
        xn_l = x_local / jnp.maximum(jnp.linalg.norm(x_local, axis=1, keepdims=True), 1e-12)
        xn_f = full / jnp.maximum(jnp.linalg.norm(full, axis=1, keepdims=True), 1e-12)
        d2 = (
            jnp.sum(xn_l * xn_l, axis=1)[:, None]
            + jnp.sum(xn_f * xn_f, axis=1)[None, :]
            - 2.0 * (xn_l @ xn_f.T)
        )
        d2 = jnp.maximum(d2, 0.0)
        gidx = shard * rows + jnp.arange(rows)
        mask = gidx[:, None] < jnp.arange(full.shape[0])[None, :]
        local_sum = jnp.sum(jnp.where(mask, jnp.exp(-t * d2), 0.0))
        return jax.lax.psum(local_sum, MODEL_AXIS)

    total = jax.shard_map(
        local, mesh=mesh, in_specs=(P(MODEL_AXIS, None),), out_specs=P()
    )(x)
    n_pairs = n * (n - 1) // 2
    return jnp.log(total / max(n_pairs, 1) + 1e-8)
