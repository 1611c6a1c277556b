"""On-device k-means (NCL's E-step).

Replaces `faiss.Kmeans` (`ncl.py:347-356`) — a device→host→C++→device round
trip per E-step — with pure-JAX Lloyd iterations: pairwise distances via one
MXU matmul, argmin assignment, segment-mean centroid update. Runs entirely on
device under ``jit``; cluster count capped at n/39 per the reference
(`ncl.py:350-351`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_clusters", "n_iters"))
def kmeans(
    rng: jax.Array, x: jnp.ndarray, n_clusters: int, n_iters: int = 10
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means. Returns (centroids f32[K, d], assignments i32[N])."""
    n = x.shape[0]
    init_idx = jax.random.choice(rng, n, shape=(n_clusters,), replace=False)
    centroids = x[init_idx]

    def step(centroids, _):
        # ||x - c||² = ||x||² − 2 x·c + ||c||²; argmin over c (MXU-friendly).
        d2 = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2.0 * jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
            + jnp.sum(centroids * centroids, axis=1)[None, :]
        )
        assign = jnp.argmin(d2, axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=centroids.shape[0])
        counts = jax.ops.segment_sum(
            jnp.ones((n,), x.dtype), assign, num_segments=centroids.shape[0]
        )
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centroids)
        return new_c, assign

    centroids, assigns = jax.lax.scan(step, centroids, None, length=n_iters)
    return centroids, assigns[-1]


def ncl_cluster_cap(n: int) -> int:
    """Max clusters = n // 39 (`ncl.py:350-351`), at least 1."""
    return max(1, n // 39)
