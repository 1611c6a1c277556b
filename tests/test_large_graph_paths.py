"""Large-graph code paths: pos-table cap fallback in eval, flat generator."""

import numpy as np
import pytest

import recommendation_tpu.graph.device as device_mod
from recommendation_tpu.data.synthetic import ArrayInteraction, make_flat_interactions
from recommendation_tpu.graph.device import DeviceGraph


def test_make_flat_interactions_properties():
    pairs = make_flat_interactions(200, 400, 5000, seed=1)
    assert pairs.shape == (5000, 2)
    assert pairs[:, 0].max() < 200 and pairs[:, 1].max() < 400
    # deduplicated
    assert len(np.unique(pairs, axis=0)) == len(pairs)


def test_make_clustered_interactions_signal():
    """The quality-at-scale fixture must carry conditional collaborative
    signal (`make_flat_interactions` is popularity-optimal by construction):
    ~(1-noise_rate) of edges land in the user's preferred clusters, pairs are
    deduplicated, deterministic, and in range."""
    from recommendation_tpu.data.synthetic import make_clustered_interactions

    pairs, item_cluster, prefs = make_clustered_interactions(
        500, 1000, 20_000, n_clusters=16, noise_rate=0.25, seed=5,
        return_structure=True,
    )
    assert pairs.shape == (20_000, 2)
    assert pairs[:, 0].max() < 500 and pairs[:, 1].max() < 1000
    assert len(np.unique(pairs, axis=0)) == len(pairs)
    u, i = pairs[:, 0], pairs[:, 1]
    in_pref = (item_cluster[i][:, None] == prefs[u]).any(axis=1).mean()
    # 75% by construction plus noise draws that happen to hit a pref cluster
    assert 0.65 < in_pref < 0.95, in_pref
    again = make_clustered_interactions(
        500, 1000, 20_000, n_clusters=16, noise_rate=0.25, seed=5
    )
    assert np.array_equal(pairs, again)


def test_array_interaction_graph_builds():
    pairs = make_flat_interactions(100, 150, 2000, seed=2)
    data = ArrayInteraction(pairs, 100, 150)
    graph = DeviceGraph(data, backend="segment")
    assert graph.n_edges == 2000
    assert graph.norm_adj.n_rows == 250
    # sym-normalized: row sums of D^-1/2 A D^-1/2 bounded by sqrt(deg)
    from recommendation_tpu.graph.device import densify

    dense = np.asarray(densify(graph.norm_adj))
    assert np.allclose(dense, dense.T, atol=1e-6)


def test_eval_without_pos_table(tiny_data, monkeypatch):
    """When the padded positives table exceeds the cap, evaluation must build
    per-block tables from the host CSR and give identical results."""
    import jax.numpy as jnp

    from recommendation_tpu.evalx.ranking import evaluate_ranking

    graph_full = DeviceGraph(tiny_data, backend="dense")
    assert graph_full.has_pos_table

    monkeypatch.setattr(device_mod, "POS_TABLE_MAX_ELEMENTS", 1)
    graph_capped = DeviceGraph(tiny_data, backend="dense")
    assert not graph_capped.has_pos_table
    assert graph_capped.user_positives.shape == (1, 1)

    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.normal(size=(graph_full.n_users, 8)).astype(np.float32))
    ie = jnp.asarray(rng.normal(size=(graph_full.n_items, 8)).astype(np.float32))
    m_full = evaluate_ranking(ue, ie, tiny_data, graph_full, Ns=[10]).metrics
    m_capped = evaluate_ranking(ue, ie, tiny_data, graph_capped, Ns=[10]).metrics
    assert m_full == m_capped


def test_sampling_without_pos_table(tiny_data, monkeypatch):
    """Negative-sampling rejection is CSR-based and must not depend on the
    padded table."""
    import jax

    from recommendation_tpu.sampling import sample_negatives

    monkeypatch.setattr(device_mod, "POS_TABLE_MAX_ELEMENTS", 1)
    graph = DeviceGraph(tiny_data, backend="dense")
    users = jax.numpy.asarray(np.arange(graph.n_users, dtype=np.int32))
    negs = np.asarray(sample_negatives(jax.random.PRNGKey(0), graph, users, n_redraws=6))
    assert ((0 <= negs) & (negs < graph.n_items)).all()


def test_array_interaction_bucketed_default_and_trains():
    """Gowalla-class auto-routing: a graph too big for the dense path picks
    the bucketed backend, and one training step runs finitely on it (the
    production large-graph configuration, CPU-sized here)."""
    import jax

    from recommendation_tpu.config import default_config
    from recommendation_tpu.data.synthetic import ArrayInteraction, make_flat_interactions
    from recommendation_tpu.graph.device import DENSE_MAX_ELEMENTS
    from recommendation_tpu.models.lightgcn import LightGCN
    from recommendation_tpu.train.loop import make_epoch_fn, make_optimizer

    n_u, n_i = 3000, 9000  # 12k^2 square > DENSE_MAX_ELEMENTS
    assert (n_u + n_i) ** 2 > DENSE_MAX_ELEMENTS
    pairs = make_flat_interactions(n_u, n_i, 30_000, seed=2)
    data = ArrayInteraction(pairs, n_u, n_i)
    graph = DeviceGraph(data, backend="auto")
    assert graph.backend == "bucketed"
    assert graph.norm_adj.pull is not None

    config = default_config(**{"embedding.size": 16, "batch.size": 1024})
    model = LightGCN(config)
    params, state = model.init(jax.random.PRNGKey(0), graph)
    opt = make_optimizer(config)
    fn = make_epoch_fn(model, opt, 1024)
    _, _, _, loss = fn(graph, params, opt.init(params), state, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
