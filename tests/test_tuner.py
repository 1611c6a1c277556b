"""Tuner contracts: grid size, fault isolation, results artifacts, summary."""

import json

import pytest

from recommendation_tpu.config import default_config
from recommendation_tpu.data.synthetic import make_synthetic_dataset
from recommendation_tpu.tune import (
    GridTuner,
    UnivariateTuner,
    generate_independent_grid,
    print_summary,
)
from recommendation_tpu.utils.logging import Log


@pytest.fixture(scope="module")
def sets():
    return make_synthetic_dataset(n_users=40, n_items=60, n_interactions=1200, seed=5)


BASE = {
    "max.epoch": 1,
    "batch.size": 256,
    "embedding.size": 8,
    "item.ranking.topN": [10, 20],
    "eval.interval": 1,
}


def test_grid_tuner_runs_all_combos(sets, tmp_path):
    train, test = sets
    tuner = GridTuner(
        "lightgcn", train, test,
        grid={"learning.rate": [1e-3, 5e-3], "LightGCN.n_layers": [1, 2]},
        base_config=default_config(**BASE),
        log=Log(echo=False),
    )
    results = tuner.run()
    assert len(results) == 4
    assert all("metrics" in r for r in results)
    best = tuner.best("Recall@20")
    assert best is not None and "Recall@20" in best["metrics"]

    jpath = tmp_path / "res.json"
    tuner.save_json(str(jpath))
    saved = json.loads(jpath.read_text())
    assert len(saved) == 4

    cpath = tmp_path / "res.csv"
    tuner.save_csv(str(cpath))
    assert len(cpath.read_text().strip().splitlines()) == 5  # header + 4

    lines = print_summary(results, log=Log(echo=False), Ns=[20])
    assert any("Best Recall@20" in line for line in lines)


def test_grid_tuner_fault_isolation(sets):
    train, test = sets
    tuner = GridTuner(
        "lightgcn", train, test,
        # optimizer 'bogus' raises in make_optimizer — config 2 must fail
        grid={"optimizer": ["adam", "bogus"]},
        base_config=default_config(**BASE),
        log=Log(echo=False),
    )
    results = tuner.run()
    assert len(results) == 2
    ok = [r for r in results if "metrics" in r]
    bad = [r for r in results if "error" in r]
    assert len(ok) == 1 and len(bad) == 1
    assert "bogus" in bad[0]["error"] or "ValueError" in bad[0]["error"]


def test_generate_independent_grid():
    configs = generate_independent_grid(
        {"a": 1, "b": 2}, {"a": [1, 3], "b": [4]}
    )
    # defaults + (a=3) + (b=4); a=1 skipped as equal to default
    assert len(configs) == 3
    assert configs[0]["_varied"] == "(defaults)"
    assert {c.get("a") for c in configs} == {1, 3}


def test_univariate_tuner(sets):
    train, test = sets
    tuner = UnivariateTuner(
        "lightgcn", train, test,
        grid={"embedding.size": [8, 16]},
        defaults={"embedding.size": 8},
        base_config=default_config(**BASE),
        log=Log(echo=False),
    )
    results = tuner.run()
    # defaults run + emb 16 (emb 8 equals default -> skipped)
    assert len(results) == 2
