"""CLI surface: train/tune/models subcommands in-process."""

import json
import os

import pytest

from recommendation_tpu.cli import main
from recommendation_tpu.data.synthetic import make_synthetic_dataset, write_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    train, test = make_synthetic_dataset(n_users=30, n_items=50, n_interactions=900, seed=9)
    write_dataset(str(d), train, test)
    return str(d)


def test_models_lists_registry(capsys):
    assert main(["models"]) == 0
    out = capsys.readouterr().out
    assert "lightgcn" in out and "mhcn" in out


def test_train_subcommand(dataset_dir, capsys, tmp_path):
    out_path = str(tmp_path / "metrics.json")
    rc = main(
        [
            "train", "--model", "lightgcn",
            "--train", os.path.join(dataset_dir, "train.txt"),
            "--test", os.path.join(dataset_dir, "test.txt"),
            "--set", "max.epoch=1", "--set", "embedding.size=8",
            "--set", "batch.size=256", "--set", "item.ranking.topN=[10]",
            "--out", out_path,
        ]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    metrics = json.loads(lines[-1])
    assert "Recall@10" in metrics
    assert os.path.exists(out_path)


def test_train_social_synthesizes(dataset_dir, capsys):
    rc = main(
        [
            "train", "--model", "diffnet",
            "--train", os.path.join(dataset_dir, "train.txt"),
            "--test", os.path.join(dataset_dir, "test.txt"),
            "--set", "max.epoch=1", "--set", "embedding.size=8",
            "--set", "batch.size=256", "--set", "item.ranking.topN=[10]",
        ]
    )
    assert rc == 0
    out = capsys.readouterr()
    assert "Recall@10" in out.out


def test_tune_subcommand(dataset_dir, capsys, tmp_path):
    rc = main(
        [
            "tune", "--model", "lightgcn", "--mode", "grid",
            "--train", os.path.join(dataset_dir, "train.txt"),
            "--test", os.path.join(dataset_dir, "test.txt"),
            "--grid", "learning.rate=1e-3,5e-3",
            "--set", "max.epoch=1", "--set", "embedding.size=8",
            "--set", "batch.size=256", "--set", "item.ranking.topN=[10,20]",
            "--out", str(tmp_path / "tune.json"),
        ]
    )
    assert rc == 0
    results = json.loads((tmp_path / "tune.json").read_text())
    assert len(results) == 2
