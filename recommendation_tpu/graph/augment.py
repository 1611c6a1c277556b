"""Device-side graph augmentation.

Replaces the reference's host-side augmentors — scipy edge dropout +
re-normalization (`univariate/sept.py:53-61`), PyG ``dropout_adj`` + feature
masking (`univariate/grace.py:270-289`), torch sparse-tensor dropout
(`univariate/buir.py:300-309`), edge removal on edge_index (`gcl.py:18-25`) —
with mask-based, static-shape, jit-safe transforms that never leave the
device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceAdj, DeviceGraph, with_vals


def edge_keep_mask(rng: jax.Array, graph: DeviceGraph, drop_rate: float) -> jnp.ndarray:
    """Bernoulli keep-mask over the interaction edges (f32[E_pad])."""
    return jax.random.bernoulli(
        rng, 1.0 - drop_rate, shape=graph.edge_valid.shape
    ).astype(jnp.float32)


def dropped_norm_adj(rng: jax.Array, graph: DeviceGraph, drop_rate: float) -> DeviceAdj:
    """Edge-dropped, re-normalized bipartite adjacency, fully on device."""
    return graph.normalized_bipartite(edge_keep_mask(rng, graph, drop_rate))


def drop_edges(rng: jax.Array, adj: DeviceAdj, drop_rate: float, renormalize: bool = False) -> DeviceAdj:
    """Generic edge dropout on any DeviceAdj by zeroing values.

    With ``renormalize=False`` (BUIR `univariate/buir.py:300-309` semantics)
    surviving values are scaled by 1/(1-p), like inverted dropout."""
    keep = jax.random.bernoulli(rng, 1.0 - drop_rate, shape=adj.vals.shape)
    scale = 1.0 if renormalize else 1.0 / max(1.0 - drop_rate, 1e-8)
    return with_vals(adj, jnp.where(keep, adj.vals * scale, 0.0))


def mask_features(rng: jax.Array, x: jnp.ndarray, mask_rate: float) -> jnp.ndarray:
    """Column-wise feature masking (`univariate/grace.py:281-289`): zero a
    random subset of feature dimensions across all nodes."""
    keep = jax.random.bernoulli(rng, 1.0 - mask_rate, shape=(x.shape[-1],))
    return x * keep.astype(x.dtype)[None, :]
