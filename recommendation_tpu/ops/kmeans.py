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


@partial(jax.jit, static_argnames=("n_clusters", "n_iters", "batch", "assign_chunk"))
def kmeans_minibatch(
    rng: jax.Array,
    x: jnp.ndarray,
    n_clusters: int,
    n_iters: int = 10,
    batch: int = 65_536,
    assign_chunk: int = 131_072,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mini-batch k-means (Sculley 2010) — the E-step that holds at
    million-node tables where full Lloyd's [N, K] distance matrix and
    per-iteration full-table pass stop fitting the step budget
    (`faiss.Kmeans` at `ncl.py:352` solved the same problem on CPU).

    Per iteration: sample ``batch`` rows, assign to nearest centroid, move
    each centroid toward its batch mean with a per-centroid learning rate
    1/count (the running-average schedule). The final full-table assignment
    runs in ``assign_chunk``-row chunks, so peak extra memory is
    O(batch·K + assign_chunk·K) instead of O(N·K).

    Returns (centroids f32[K, d], assignments i32[N]) like :func:`kmeans`.
    """
    n = x.shape[0]
    k_init, k_iter = jax.random.split(rng)
    init_idx = jax.random.choice(k_init, n, shape=(n_clusters,), replace=False)
    centroids = x[init_idx]
    bsz = min(batch, n)

    def step(carry, key):
        centroids, counts = carry
        idx = jax.random.randint(key, (bsz,), 0, n)
        xb = x[idx]
        d2 = (
            jnp.sum(xb * xb, axis=1, keepdims=True)
            - 2.0 * jnp.dot(xb, centroids.T, preferred_element_type=jnp.float32)
            + jnp.sum(centroids * centroids, axis=1)[None, :]
        )
        assign = jnp.argmin(d2, axis=1)
        b_sums = jax.ops.segment_sum(xb, assign, num_segments=n_clusters)
        b_counts = jax.ops.segment_sum(
            jnp.ones((bsz,), x.dtype), assign, num_segments=n_clusters
        )
        counts = counts + b_counts
        eta = jnp.where(counts > 0, b_counts / jnp.maximum(counts, 1.0), 0.0)
        b_mean = b_sums / jnp.maximum(b_counts, 1.0)[:, None]
        centroids = jnp.where(
            b_counts[:, None] > 0,
            centroids + eta[:, None] * (b_mean - centroids),
            centroids,
        )
        return (centroids, counts), None

    (centroids, _), _ = jax.lax.scan(
        step,
        (centroids, jnp.zeros((n_clusters,), x.dtype)),
        jax.random.split(k_iter, n_iters),
    )

    # chunked full-table assignment (static shapes: pad N up to a multiple)
    chunk = min(assign_chunk, n)
    n_pad = -(-n // chunk) * chunk
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    c_norm = jnp.sum(centroids * centroids, axis=1)[None, :]

    def assign_block(xb):
        d2 = (
            jnp.sum(xb * xb, axis=1, keepdims=True)
            - 2.0 * jnp.dot(xb, centroids.T, preferred_element_type=jnp.float32)
            + c_norm
        )
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    assigns = jax.lax.map(assign_block, xp.reshape(-1, chunk, x.shape[1]))
    return centroids, assigns.reshape(-1)[:n]


def ncl_cluster_cap(n: int) -> int:
    """Max clusters = n // 39 (`ncl.py:350-351`), at least 1."""
    return max(1, n // 39)
