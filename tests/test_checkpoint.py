"""Checkpoint/resume: payload round trip and trainer resume equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.config import default_config
from recommendation_tpu.models.lightgcn import LightGCN
from recommendation_tpu.train.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)
from recommendation_tpu.train.recommender import GraphRecommender
from recommendation_tpu.utils.logging import Log


def test_checkpoint_roundtrip(tmp_path):
    payload = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "epoch": 3,
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, payload)
    restored = load_checkpoint(path)
    assert np.allclose(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
    assert int(restored["epoch"]) == 3


def test_manager_keeps_last_n(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "run"), keep=2)
    for step in range(5):
        mgr.save(step, {"x": jnp.ones((2,)) * step})
    assert mgr.all_steps() == [3, 4]
    assert int(np.asarray(mgr.restore_latest()["x"])[0]) == 4


def test_trainer_resume_continues(tiny_data, tiny_graph, tmp_path):
    """Train 4 epochs straight vs 2 epochs + resume 2 epochs: the resumed run
    must restart from the saved epoch and produce finite, trained params."""
    ckpt_dir = str(tmp_path / "ckpts")
    base = {
        "batch.size": 512,
        "embedding.size": 8,
        "item.ranking.topN": [10],
        "eval.interval": 1,
        "checkpoint.dir": ckpt_dir,
    }
    config_a = default_config(**{**base, "max.epoch": 2})
    rec_a = GraphRecommender(
        LightGCN(config_a), tiny_data, config_a, graph=tiny_graph, log=Log(echo=False)
    )
    rec_a.build()
    rec_a.train()

    config_b = default_config(**{**base, "max.epoch": 4})
    rec_b = GraphRecommender(
        LightGCN(config_b), tiny_data, config_b, graph=tiny_graph, log=Log(echo=False)
    )
    rec_b.build()
    assert rec_b.start_epoch == 2  # resumed
    rec_b.train()
    assert any("resumed from checkpoint" in line for line in rec_b.log.contents())
    ue, _ = rec_b.model.eval_embeddings(rec_b.params, rec_b.state, tiny_graph)
    assert np.isfinite(np.asarray(ue)).all()
