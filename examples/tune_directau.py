"""Hyperparameter sweep example: DirectAU grid with result artifacts.

Run: python examples/tune_directau.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendation_tpu.config import default_config
from recommendation_tpu.data.synthetic import load_or_make_dataset
from recommendation_tpu.tune import GridTuner, print_summary

train, test = load_or_make_dataset()
tuner = GridTuner(
    "directau",
    train,
    test,
    grid={
        "DirectAU.gamma": [0.5, 1.0, 3.0],
        "learning.rate": [1e-3, 5e-3],
    },
    base_config=default_config(**{
        "max.epoch": 3,
        "embedding.size": 64,
        "item.ranking.topN": [10, 20],
        "eval.interval": 3,
    }),
)
tuner.run()
print_summary(tuner.results, Ns=[20])
tuner.save_json("results/directau_tune.json")
