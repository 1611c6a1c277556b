"""Unit tests for compute primitives vs dense/scipy oracles (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from recommendation_tpu.graph.device import DeviceGraph, from_scipy, densify
from recommendation_tpu.ops.kmeans import kmeans
from recommendation_tpu.ops.spmm import adj_matmul, segment_mean, segment_softmax
from recommendation_tpu.ops.topk import masked_topk, topk_with_exclusions


def _random_sparse(m, n, density=0.05, seed=0):
    return sp.random(m, n, density=density, random_state=seed, format="csr", dtype=np.float32)


def test_adj_matmul_backends_match_scipy():
    a = _random_sparse(64, 96)
    x = np.random.default_rng(0).normal(size=(96, 16)).astype(np.float32)
    expected = a @ x
    for backend in ("dense", "segment", "bucketed"):
        adj = from_scipy(a, backend=backend)
        out = np.asarray(adj_matmul(adj, jnp.asarray(x)))
        assert np.allclose(out, expected, atol=1e-4), backend


def test_densify_matches_scipy():
    a = _random_sparse(32, 40, density=0.1, seed=2)
    adj = from_scipy(a, backend="segment")
    assert np.allclose(np.asarray(densify(adj)), a.toarray(), atol=1e-6)


def test_device_norm_adj_matches_host(tiny_data, tiny_graph):
    device = np.asarray(densify(tiny_graph.normalized_bipartite()))
    host = tiny_data.norm_adj.toarray()
    assert np.allclose(device, host, atol=1e-5)


def test_segment_softmax_oracle():
    scores = jnp.asarray(np.array([1.0, 2.0, 3.0, -1.0, 0.5], dtype=np.float32))
    segs = jnp.asarray(np.array([0, 0, 1, 1, 1], dtype=np.int32))
    out = np.asarray(segment_softmax(scores, segs, 2))
    e = np.exp([1.0, 2.0])
    assert np.allclose(out[:2], e / e.sum(), atol=1e-6)
    e2 = np.exp([3.0, -1.0, 0.5])
    assert np.allclose(out[2:], e2 / e2.sum(), atol=1e-6)


def test_segment_mean_oracle():
    vals = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2))
    segs = jnp.asarray(np.array([0, 0, 1, 2], dtype=np.int32))
    out = np.asarray(segment_mean(vals, segs, 3))
    assert np.allclose(out[0], [1.0, 2.0])
    assert np.allclose(out[1], [4.0, 5.0])
    assert np.allclose(out[2], [6.0, 7.0])


def test_masked_topk_excludes_positives():
    scores = jnp.asarray(np.array([[5.0, 4.0, 3.0, 2.0], [1.0, 2.0, 3.0, 4.0]], np.float32))
    positives = jnp.asarray(np.array([[0, -1, -1], [3, 2, -1]], np.int32))
    s, ids = masked_topk(scores, positives, 2)
    assert ids[0].tolist() == [1, 2]  # item 0 masked
    assert ids[1].tolist() == [1, 0]  # items 3, 2 masked


def test_topk_with_exclusions_vs_argsort_oracle(tiny_data, tiny_graph):
    rng = np.random.default_rng(1)
    ue = rng.normal(size=(tiny_graph.n_users, 8)).astype(np.float32)
    ie = rng.normal(size=(tiny_graph.n_items, 8)).astype(np.float32)
    k = 10
    s, ids = topk_with_exclusions(
        jnp.asarray(ue), jnp.asarray(ie), tiny_graph.user_positives, k, batch_size=16
    )
    scores = ue @ ie.T
    pos = np.asarray(tiny_graph.user_positives)
    for u in range(tiny_graph.n_users):
        masked = scores[u].copy()
        masked[pos[u][pos[u] >= 0]] = -1e8
        n_unmasked = int((masked > -1e7).sum())
        if n_unmasked >= k:
            oracle = set(np.argsort(-masked)[:k])
            assert set(np.asarray(ids)[u].tolist()) == oracle
        else:
            # fewer candidates than k: the unmasked ones must all rank first
            got = np.asarray(ids)[u][:n_unmasked]
            assert set(got.tolist()) == set(np.argsort(-masked)[:n_unmasked])


def test_topk_with_exclusions_tail_padding(tiny_graph):
    """Ragged query batches (the serving micro-batcher's wave sizes) are
    padded to power-of-two buckets and sliced back — results must be
    identical to the full-batch answer for every ragged size."""
    rng = np.random.default_rng(2)
    ue = rng.normal(size=(tiny_graph.n_users, 8)).astype(np.float32)
    ie = rng.normal(size=(tiny_graph.n_items, 8)).astype(np.float32)
    pos = np.asarray(tiny_graph.user_positives)
    s_full, ids_full = topk_with_exclusions(ue, ie, pos, 5)
    for n in (1, 3, 7, 13):
        s, ids = topk_with_exclusions(ue[:n], ie, pos[:n], 5)
        assert s.shape == (n, 5) and ids.shape == (n, 5)
        assert np.array_equal(np.asarray(ids), np.asarray(ids_full)[:n])
        assert np.allclose(np.asarray(s), np.asarray(s_full)[:n])


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(50, 4)).astype(np.float32) + 10
    b = rng.normal(size=(50, 4)).astype(np.float32) - 10
    x = jnp.asarray(np.concatenate([a, b]))
    _, assign = kmeans(jax.random.PRNGKey(0), x, 2, n_iters=10)
    assign = np.asarray(assign)
    assert len(set(assign[:50])) == 1
    assert len(set(assign[50:])) == 1
    assert assign[0] != assign[-1]


def test_kmeans_minibatch_separates_clusters():
    """Mini-batch k-means (the large-table E-step) must recover the same
    cluster structure as full Lloyd on well-separated blobs, with its
    chunked assignment pass agreeing with a direct argmin."""
    from recommendation_tpu.ops.kmeans import kmeans_minibatch

    rng = np.random.default_rng(0)
    blobs = np.concatenate([
        rng.normal(loc=c, scale=0.05, size=(500, 8)).astype(np.float32)
        for c in (-2.0, 0.0, 2.0)
    ])
    x = jnp.asarray(blobs)
    cent, assign = kmeans_minibatch(
        jax.random.PRNGKey(1), x, 3, n_iters=30, batch=256, assign_chunk=512
    )
    assign = np.asarray(assign)
    # each true blob maps to one dominant predicted cluster, all distinct
    dominant = [np.bincount(assign[i * 500:(i + 1) * 500], minlength=3).argmax() for i in range(3)]
    assert len(set(dominant)) == 3
    for i, d in enumerate(dominant):
        purity = (assign[i * 500:(i + 1) * 500] == d).mean()
        assert purity > 0.95, (i, purity)
    # chunked assignment == direct nearest-centroid
    d2 = ((blobs[:, None, :] - np.asarray(cent)[None]) ** 2).sum(-1)
    assert (np.argmin(d2, 1) == assign).mean() > 0.999


def test_ncl_cluster_routing():
    """NCL routes small tables to full Lloyd and big tables to mini-batch
    (threshold + force knobs)."""
    from unittest.mock import patch

    from recommendation_tpu.config import default_config
    from recommendation_tpu.models.ncl import NCL

    x_small = jnp.zeros((100, 8))
    x_big = jnp.zeros((600, 8))

    m = NCL(default_config(**{"NCL.kmeans_minibatch_above": 500}))
    with patch("recommendation_tpu.models.ncl.kmeans") as full, \
         patch("recommendation_tpu.models.ncl.kmeans_minibatch") as mini:
        full.return_value = mini.return_value = (jnp.zeros((2, 8)), jnp.zeros((1,), jnp.int32))
        m._cluster(jax.random.PRNGKey(0), x_small, 2)
        assert full.called and not mini.called
        m._cluster(jax.random.PRNGKey(0), x_big, 2)
        assert mini.called
    m_force_full = NCL(default_config(**{"NCL.kmeans_minibatch_above": -1}))
    with patch("recommendation_tpu.models.ncl.kmeans") as full:
        full.return_value = (jnp.zeros((2, 8)), jnp.zeros((1,), jnp.int32))
        m_force_full._cluster(jax.random.PRNGKey(0), x_big, 2)
        assert full.called
