"""Metric math vs hand-computed cases + dict/vectorized cross-check."""

import numpy as np

from recommendation_tpu.evalx.metrics import Metric, ranking_evaluation, ranking_metrics


def test_metrics_hand_computed():
    # user A: test {1, 2}; top-2 = [1, 5] -> 1 hit at rank 0
    # user B: test {3};    top-2 = [4, 3] -> 1 hit at rank 1
    origin = {"A": {1: 1.0, 2: 1.0}, "B": {3: 1.0}}
    res = {"A": [(1, 0.9), (5, 0.8)], "B": [(4, 0.7), (3, 0.6)]}
    hits = Metric.hits(origin, res)
    assert hits == {"A": 1, "B": 1}
    assert Metric.hit_ratio(origin, hits) == round(2 / 3, 5)
    assert Metric.precision(hits, 2) == round(2 / 4, 5)
    assert Metric.recall(hits, origin) == round((0.5 + 1.0) / 2, 5)
    # NDCG: A: DCG=1/log2(2)=1, IDCG=1+1/log2(3); B: DCG=1/log2(3), IDCG=1
    idcg_a = 1 + 1 / np.log2(3)
    expected = (1 / idcg_a + (1 / np.log2(3)) / 1) / 2
    assert abs(Metric.NDCG(origin, res, 2) - round(expected, 5)) < 1e-9


def test_vectorized_matches_dict_path():
    rng = np.random.default_rng(0)
    n_users, n_items, max_n = 30, 50, 10
    top_ids = np.stack([rng.choice(n_items, size=max_n, replace=False) for _ in range(n_users)])
    test_items = [
        rng.choice(n_items, size=rng.integers(1, 6), replace=False) for _ in range(n_users)
    ]
    metrics = ranking_metrics(top_ids, test_items, Ns=[5, 10])

    origin = {u: {int(i): 1.0 for i in test_items[u]} for u in range(n_users)}
    res = {u: [(int(i), 0.0) for i in top_ids[u]] for u in range(n_users)}
    for n in (5, 10):
        pred = {u: res[u][:n] for u in res}
        hits = Metric.hits(origin, pred)
        assert abs(metrics[f"HitRatio@{n}"] - Metric.hit_ratio(origin, hits)) < 2e-5
        assert abs(metrics[f"Precision@{n}"] - Metric.precision(hits, n)) < 2e-5
        assert abs(metrics[f"Recall@{n}"] - Metric.recall(hits, origin)) < 2e-5
        assert abs(metrics[f"NDCG@{n}"] - Metric.NDCG(origin, pred, n)) < 2e-5


def test_ranking_evaluation_report_format():
    origin = {"A": {1: 1.0}}
    res = {"A": [(1, 0.9), (2, 0.8)]}
    report = ranking_evaluation(origin, res, [2])
    assert report[0] == "Top 2\n"
    assert report[1].startswith("Hit Ratio:")
    assert report[3] == "Recall:1.0\n"


def test_mae_rmse():
    rows = [("u", "i", 3.0, 2.0), ("u", "j", 4.0, 6.0)]
    assert Metric.MAE(rows) == round(1.5, 5)
    assert Metric.RMSE(rows) == round(np.sqrt((1 + 4) / 2), 5)
