"""Top-k retrieval primitives (layer L7 hot path).

Replaces the numba heap ``find_k_largest`` (`ncl.py:180-192`,
`ssl4rec.py:94-102`) and per-user numpy argsort (`lightgcn.py:57`) with
MXU-scored MIPS + ``lax.top_k``, train-positive masking done on device
(−1e8 sentinel exactly as `selfcf.py:419-421`).

The sharded variant (items split across mesh shards, local top-k + gathered
merge) lives in ``parallel/collectives.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MASK_VALUE = -1e8


def mask_seen_post_merge(scores, ids, uid_arr, train_keys, n_items,
                         mask_value=MASK_VALUE):
    """Host-side vectorized train-positive masking for over-fetched top-k
    candidates after a sharded merge (shared by the sharded evaluator,
    `parallel/trainer.py::test`, and the serving path).

    ``train_keys`` = int64 ``user * n_items + item`` of every train edge;
    ``ids >= n_items`` marks row-padding from `pad_rows_to`. Returns a
    masked COPY of ``scores``."""
    import numpy as np

    uid_arr = np.asarray(uid_arr, dtype=np.int64)
    ids = np.asarray(ids)
    valid = ids < n_items
    query = uid_arr[:, None] * n_items + np.where(valid, ids, 0)
    seen = np.isin(query, train_keys) & valid
    out = np.asarray(scores).copy()
    out[seen | ~valid] = mask_value
    return out


def train_edge_keys(interaction_mat, n_items):
    """int64 ``user * n_items + item`` keys of every train edge (the
    immutable structure `mask_seen_post_merge` queries against)."""
    import numpy as np

    coo = interaction_mat.tocoo()
    return coo.row.astype(np.int64) * n_items + coo.col.astype(np.int64)


def mask_trained(scores: jnp.ndarray, user_positives: jnp.ndarray) -> jnp.ndarray:
    """Mask each user's train positives to −1e8.

    scores: f32[B, n_items]; user_positives: i32[B, max_deg] padded with −1.
    Scatter of a constant over ≤max_deg columns per row — O(B·max_deg)."""
    b = scores.shape[0]
    row_idx = jnp.broadcast_to(jnp.arange(b)[:, None], user_positives.shape)
    safe_cols = jnp.maximum(user_positives, 0)
    # scatter-min: real positives take MASK_VALUE, pad entries (−1) take +inf
    # which leaves the original score untouched.
    fill = jnp.where(user_positives >= 0, MASK_VALUE, jnp.inf)
    return scores.at[row_idx.reshape(-1), safe_cols.reshape(-1)].min(fill.reshape(-1))


def masked_topk(
    scores: jnp.ndarray, user_positives: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(top_scores, top_ids) over items with train positives excluded."""
    masked = mask_trained(scores, user_positives)
    return jax.lax.top_k(masked, k)


from functools import partial


@partial(jax.jit, static_argnames=("k",))
def _score_block(u_emb, item_emb, u_pos, k):
    scores = jnp.dot(u_emb, item_emb.T, preferred_element_type=jnp.float32)
    return masked_topk(scores, u_pos, k)


def _pow2_bucket(n: int, cap: int) -> int:
    b = 1
    while b < n:
        b <<= 1
    return min(b, cap)


def topk_with_exclusions(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    user_positives: jnp.ndarray,
    k: int,
    batch_size: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full-catalog MIPS top-k for a block of users, batched to bound the
    [B, n_items] score buffer. Returns (scores f32[U,k], ids i32[U,k]).

    ``_score_block`` is a module-level jit with ``item_emb`` as an ARGUMENT —
    a per-call closure would bake the table in as a constant and recompile
    every evaluation. The partial tail block is PADDED to a power-of-two
    bucket (zero user rows, −1 positives) and sliced back: otherwise every
    distinct residual size compiles its own program — under the serving
    micro-batcher, whose wave sizes vary request-to-request, that measured
    as a 20-70 s compile stall per new wave size instead of one ~70 ms
    device call (tools/serve_latency_bench.py). Caps the jit cache at
    ≤ log2(batch_size)+1 programs per (k, n_items)."""
    n = user_emb.shape[0]
    outs_s, outs_i = [], []
    for start in range(0, n, batch_size):
        ue = jnp.asarray(user_emb[start:start + batch_size])
        up = jnp.asarray(user_positives[start:start + batch_size])
        b = ue.shape[0]
        pb = _pow2_bucket(b, batch_size)
        if pb != b:
            ue = jnp.concatenate(
                [ue, jnp.zeros((pb - b, ue.shape[1]), ue.dtype)]
            )
            up = jnp.concatenate(
                [up, jnp.full((pb - b, up.shape[1]), -1, up.dtype)]
            )
        s, i = _score_block(ue, item_emb, up, k)
        outs_s.append(s[:b])
        outs_i.append(i[:b])
    return jnp.concatenate(outs_s), jnp.concatenate(outs_i)
