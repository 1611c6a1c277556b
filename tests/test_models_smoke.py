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
}


def _model_names():
    return registry.available()


@pytest.mark.parametrize("name", _model_names())
def test_model_smoke(name, tiny_data, tiny_graph):
    config = default_config(**SMOKE_OVERRIDES)
    model = registry.build(name, config)
    rec = GraphRecommender(model, tiny_data, config, graph=tiny_graph, log=Log(echo=False))
    metrics = rec.execute()
    assert np.isfinite(metrics["Recall@10"])
    assert 0.0 <= metrics["Recall@10"] <= 1.0
    assert rec.best_params is not None
