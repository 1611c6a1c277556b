"""Every registered model: 2 epochs end-to-end, finite loss, sane eval.

The model-zoo equivalent of the reference tuners' per-config smoke signal
(printed epoch metrics, `selfcf.py:446-452`), made into a real test.
"""

import numpy as np
import pytest

from recommendation_tpu.config import default_config
from recommendation_tpu.models import registry
from recommendation_tpu.train.recommender import GraphRecommender
from recommendation_tpu.utils.logging import Log

SMOKE_OVERRIDES = {
    "max.epoch": 2,
    "batch.size": 512,
    "embedding.size": 16,
    "item.ranking.topN": [10],
    "eval.interval": 1,
    "SSL4Rec.hidden": 32,
    "SSL4Rec.out_dim": 16,
    "GAT.hidden": 8,
    "GAT.num_heads": 2,
    "NCL.num_clusters": 4,
    "ESRF.segment": 16,
    "GBT.hidden": 16,
    "GBT.out_dim": 16,
    "GRACE.hidden": 16,
    "BGRL.hidden": 16,
    "SEPT.warmup_fraction": 0.0,  # exercise the SSL path within 2 epochs
}

SOCIAL_MODELS = {"sept", "sept_social", "mhcn", "diffnet", "esrf"}


def _model_names():
    return registry.available()


@pytest.mark.parametrize("name", _model_names())
def test_model_smoke(name, tiny_data, tiny_graph, tiny_social_graph):
    config = default_config(**SMOKE_OVERRIDES)
    model = registry.build(name, config)
    graph = tiny_social_graph if name in SOCIAL_MODELS else tiny_graph
    rec = GraphRecommender(model, tiny_data, config, graph=graph, log=Log(echo=False))
    metrics = rec.execute()
    assert np.isfinite(metrics["Recall@10"])
    assert 0.0 <= metrics["Recall@10"] <= 1.0
    assert rec.best_params is not None


def test_esrf_reaches_adversarial_phase(tiny_data, tiny_social_graph):
    """ESRF's phase schedule: 3 epochs with max.epoch=3 walks pretrain →
    social → adversarial (the lax.switch branch the 2-epoch smoke never
    hits)."""
    config = default_config(**{**SMOKE_OVERRIDES, "max.epoch": 3})
    model = registry.build("esrf", config)
    rec = GraphRecommender(model, tiny_data, config, graph=tiny_social_graph, log=Log(echo=False))
    rec.build()
    phases = []
    orig = model.epoch_begin

    def spy(params, state, graph, rng, epoch):
        new = orig(params, state, graph, rng, epoch)
        phases.append(int(new["phase"]))
        return new

    model.epoch_begin = spy
    rec.train()
    assert phases == [0, 1, 2]
    metrics = rec.test().metrics
    assert np.isfinite(metrics["Recall@10"])


def test_social_models_require_social_graph(tiny_data, tiny_graph):
    config = default_config(**SMOKE_OVERRIDES)
    model = registry.build("mhcn", config)
    rec = GraphRecommender(model, tiny_data, config, graph=tiny_graph, log=Log(echo=False))
    with pytest.raises(ValueError, match="SocialDeviceGraph"):
        rec.build()
