"""Bold-driver LR, convergence stop, legacy option strings, tuner resume,
chunked-epoch equivalence."""

import json

import jax
import numpy as np

from recommendation_tpu.config import Config, apply_legacy_options, default_config
from recommendation_tpu.models.lightgcn import LightGCN
from recommendation_tpu.train.loop import BoldDriver, make_epoch_fn, make_optimizer
from recommendation_tpu.train.recommender import GraphRecommender
from recommendation_tpu.tune import GridTuner
from recommendation_tpu.utils.logging import Log


def test_bold_driver_rule():
    bd = BoldDriver(0.1, max_lrate=0.2)
    assert bd.update(1, 1.0) == 0.1  # epoch <= 1: unchanged
    assert abs(bd.update(2, 0.5) - 0.105) < 1e-9  # improved -> x1.05
    assert abs(bd.update(3, 0.7) - 0.0525) < 1e-9  # worse -> x0.5
    bd2 = BoldDriver(0.19, max_lrate=0.2)
    bd2.update(1, 1.0)
    bd2.update(2, 0.5)
    assert bd2.update(3, 0.4) <= 0.2  # capped


def test_adaptive_lr_trains(tiny_data, tiny_graph):
    config = default_config(**{
        "max.epoch": 3, "batch.size": 512, "embedding.size": 8,
        "item.ranking.topN": [10], "eval.interval": 3, "adaptive.lr": True,
    })
    rec = GraphRecommender(LightGCN(config), tiny_data, config, graph=tiny_graph, log=Log(echo=False))
    rec.build()
    rec.train()
    assert any("bold-driver lr ->" in line for line in rec.log.contents())
    ue, _ = rec.model.eval_embeddings(rec.params, rec.state, tiny_graph)
    assert np.isfinite(np.asarray(ue)).all()


def test_convergence_stop(tiny_data, tiny_graph):
    config = default_config(**{
        "max.epoch": 30, "batch.size": 512, "embedding.size": 8,
        "item.ranking.topN": [10], "eval.interval": 30,
        "convergence.eps": 10.0,  # absurdly large -> stop at epoch 1
    })
    rec = GraphRecommender(LightGCN(config), tiny_data, config, graph=tiny_graph, log=Log(echo=False))
    rec.build()
    rec.train()
    assert any("converged at epoch" in line for line in rec.log.contents())


def test_apply_legacy_options():
    conf = Config({"item.ranking": "on -topN 10,20", "evaluation.setup": "cv -k 1 -p on -rand-seed 7"})
    apply_legacy_options(conf)
    assert conf["item.ranking.topN"] == [10, 20]
    assert conf["eval.cv_k"] == 1
    assert conf["eval.rand_seed"] == 7
    # off switch leaves topN untouched
    conf2 = apply_legacy_options(Config({"item.ranking": "off -topN 5"}))
    assert conf2.get("item.ranking.topN") is None


def test_tuner_resume_skips_done(tmp_path):
    from recommendation_tpu.data.synthetic import make_synthetic_dataset

    train, test = make_synthetic_dataset(n_users=30, n_items=50, n_interactions=800, seed=4)
    base = default_config(**{
        "max.epoch": 1, "batch.size": 256, "embedding.size": 8,
        "item.ranking.topN": [10], "eval.interval": 1,
    })
    grid = {"learning.rate": [1e-3, 5e-3]}
    t1 = GridTuner("lightgcn", train, test, grid, base_config=base, log=Log(echo=False))
    t1.run()
    out = tmp_path / "partial.json"
    # keep only the first result, pretend the sweep died mid-way
    out.write_text(json.dumps(t1.results[:1]))

    t2 = GridTuner("lightgcn", train, test, grid, base_config=base, log=Log(echo=False))
    t2.run(resume_path=str(out))
    assert any("resuming: 1 configurations" in l for l in t2.log.contents())
    assert len(t2.results) == 2  # 1 restored + 1 fresh


def test_chunked_epoch_matches_single_scan(tiny_data, tiny_graph):
    config = default_config(**{"embedding.size": 8})
    model = LightGCN(config)
    params, state = model.init(jax.random.PRNGKey(0), tiny_graph)
    opt = make_optimizer(config)
    outs = []
    for spc in (None, 3):
        fn = make_epoch_fn(model, opt, 256, steps_per_call=spc)
        p, o, s, loss = fn(tiny_graph, params, opt.init(params), state, jax.random.PRNGKey(9))
        outs.append((np.asarray(p["user_emb"]), float(loss)))
    assert abs(outs[0][1] - outs[1][1]) < 1e-6
    assert np.allclose(outs[0][0], outs[1][0], atol=1e-6)


def test_fused_trainer_matches_unfused(tiny_data, tiny_graph):
    """eval.interval epochs fused into ONE device call must be numerically
    identical to the per-epoch loop (same key sequence, same epoch body)."""
    results = {}
    for fuse in (False, "auto"):
        config = default_config(**{
            "max.epoch": 5, "batch.size": 512, "embedding.size": 8,
            "item.ranking.topN": [10], "eval.interval": 3,
            "train.fuse_epochs": fuse,
        })
        rec = GraphRecommender(
            LightGCN(config), tiny_data, config, graph=tiny_graph, log=Log(echo=False)
        )
        rec.build()
        assert rec._can_fuse_epochs() == (fuse == "auto")
        rec.train()
        results[fuse] = rec
    fused, unfused = results["auto"], results[False]
    assert any("fused x3" in l for l in fused.log.contents())
    # eval cadence identical: evals at epochs 2 and 4
    assert [h["epoch"] for h in fused.history] == [h["epoch"] for h in unfused.history]
    for k in fused.params:
        assert np.allclose(
            np.asarray(fused.params[k]), np.asarray(unfused.params[k]), atol=1e-6
        ), k
    for h_f, h_u in zip(fused.history, unfused.history):
        for key in h_f:
            assert abs(h_f[key] - h_u[key]) < 1e-6, key


def test_fuse_gates(tiny_data, tiny_graph):
    """Per-epoch host work (bold driver, convergence check, a real
    epoch_begin) must disable fusing."""
    def make(extra):
        config = default_config(**{
            "max.epoch": 4, "batch.size": 512, "embedding.size": 8,
            "item.ranking.topN": [10], "eval.interval": 2, **extra,
        })
        rec = GraphRecommender(
            LightGCN(config), tiny_data, config, graph=tiny_graph, log=Log(echo=False)
        )
        rec.build()
        return rec

    assert make({})._can_fuse_epochs()
    assert not make({"adaptive.lr": True})._can_fuse_epochs()
    assert not make({"convergence.eps": 1e-9})._can_fuse_epochs()
    assert not make({"train.fuse_epochs": False})._can_fuse_epochs()
    assert not make({"train.max_fused_steps": 1})._can_fuse_epochs()

    # a model with a real epoch_begin (NCL runs k-means there)
    from recommendation_tpu.models.ncl import NCL
    config = default_config(**{
        "max.epoch": 4, "batch.size": 512, "embedding.size": 8,
        "item.ranking.topN": [10], "eval.interval": 2,
    })
    rec = GraphRecommender(
        NCL(config), tiny_data, config, graph=tiny_graph, log=Log(echo=False)
    )
    rec.build()
    assert not rec._can_fuse_epochs()


def test_trainer_auto_chunking_matches_unchunked(tiny_data, tiny_graph):
    """Forcing the watchdog chunking threshold low must not change results:
    the chunked epoch path is numerically identical to the single-scan one."""
    results = {}
    for overrides in ({}, {"train.max_steps_per_call": 2, "train.steps_per_call": 3}):
        config = default_config(**{
            "max.epoch": 3, "batch.size": 512, "embedding.size": 8,
            "item.ranking.topN": [10], "eval.interval": 3, **overrides,
        })
        rec = GraphRecommender(
            LightGCN(config), tiny_data, config, graph=tiny_graph, log=Log(echo=False)
        )
        rec.build()
        rec.train()
        results[bool(overrides)] = rec
    for k in results[False].params:
        assert np.allclose(
            np.asarray(results[False].params[k]),
            np.asarray(results[True].params[k]),
            atol=1e-6,
        ), k
