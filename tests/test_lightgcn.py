"""Integration: LightGCN end-to-end on synthetic data (SURVEY.md §4.3)."""

import numpy as np

from recommendation_tpu.config import default_config
from recommendation_tpu.evalx.metrics import ranking_metrics
from recommendation_tpu.models.lightgcn import LightGCN
from recommendation_tpu.sampling import popularity_baseline_topk
from recommendation_tpu.train.recommender import GraphRecommender
from recommendation_tpu.utils.logging import Log


def _popularity_metrics(data, graph, k=20):
    top = popularity_baseline_topk(graph, graph.n_items)
    test_uids = data.test_user_ids()
    rows = []
    pos = np.asarray(graph.user_positives)
    for u in test_uids:
        cand = [i for i in top if i not in set(pos[u][pos[u] >= 0].tolist())][:k]
        rows.append(np.array(cand))
    test_items = [
        np.array([data.item[i] for i in data.test_set[data.id2user[int(u)]]]) for u in test_uids
    ]
    return ranking_metrics(np.stack(rows), test_items, Ns=[k])


def test_lightgcn_beats_popularity(tiny_data, tiny_graph):
    # The tiny fixture is ~42% dense, so popularity is near-optimal
    # (0.8917 Recall@20) and the trained-model margin is within seed noise
    # (0.8904-0.8942 across seeds 0-3). The invariant this test encodes is
    # "learned ranking ≈ popularity-optimal on a dense fixture" — assert
    # within-tolerance rather than a strict beat, so RNG/numeric drift can't
    # flip a coin-toss margin into a flake; a regression to random/broken
    # training still fails by a mile.
    config = default_config(**{
        "max.epoch": 25,
        "batch.size": 512,
        "learning.rate": 5e-3,
        "embedding.size": 32,
        "item.ranking.topN": [10, 20],
        "eval.interval": 5,
        "seed": 2,
    })
    model = LightGCN(config)
    rec = GraphRecommender(model, tiny_data, config, graph=tiny_graph, log=Log(echo=False))
    metrics = rec.execute()
    pop = _popularity_metrics(tiny_data, tiny_graph, k=20)
    assert metrics["Recall@20"] >= pop["Recall@20"] - 0.005, (metrics, pop)
    assert 0 < metrics["NDCG@20"] <= 1


def test_lightgcn_backends_agree(tiny_data, tiny_graph, tiny_graph_segment):
    """dense and segment propagation give identical training trajectories."""
    config = default_config(**{
        "max.epoch": 2,
        "batch.size": 512,
        "embedding.size": 16,
        "item.ranking.topN": [10],
        "eval.interval": 1,
    })
    results = []
    for g in (tiny_graph, tiny_graph_segment):
        model = LightGCN(config)
        rec = GraphRecommender(model, tiny_data, config, graph=g, log=Log(echo=False))
        rec.build()
        rec.train()
        ue, ie = model.eval_embeddings(rec.params, rec.state, g)
        results.append((np.asarray(ue), np.asarray(ie)))
    assert np.allclose(results[0][0], results[1][0], atol=2e-3)
    assert np.allclose(results[0][1], results[1][1], atol=2e-3)
