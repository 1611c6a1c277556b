"""Minimal end-to-end example: train LightGCN-BPR and print ranking metrics.

Run: python examples/train_lightgcn.py [path/to/train.txt path/to/test.txt]
Falls back to the cached synthetic ML-100K-shaped dataset.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendation_tpu.config import default_config
from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.data.synthetic import load_or_make_dataset
from recommendation_tpu.models import get_model
from recommendation_tpu.train.recommender import GraphRecommender

if len(sys.argv) >= 3:
    data = Interaction.from_files(sys.argv[1], sys.argv[2])
else:
    train, test = load_or_make_dataset()
    data = Interaction(train, test)

config = default_config(**{
    "max.epoch": 20,
    "embedding.size": 64,
    "batch.size": 2048,
    "LightGCN.n_layers": 3,
    "eval.interval": 5,
    "early.stopping.patience": 3,
})
rec = GraphRecommender(get_model("lightgcn", config), data, config)
metrics = rec.execute()
print(metrics)
