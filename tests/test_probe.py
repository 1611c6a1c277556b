"""Embedding probes: linearly-separable data must score near-perfect F1."""

import numpy as np

from recommendation_tpu.evalx.probe import LREvaluator, SVMEvaluator, f1_scores, get_split


def _separable(n=300, d=8, k=3, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 5
    y = rng.integers(0, k, size=n)
    z = centers[y] + rng.normal(size=(n, d)) * 0.3
    return z.astype(np.float32), y


def test_split_sizes():
    s = get_split(100, 0.1, 0.8)
    assert len(s["train"]) == 10 and len(s["test"]) == 80 and len(s["valid"]) == 10
    assert len(set(s["train"]) & set(s["test"])) == 0


def test_f1_hand_case():
    micro, macro = f1_scores(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 1]), 2)
    assert abs(micro - 0.75) < 1e-9
    # class 0: p=1, r=.5 -> f1=2/3; class 1: p=2/3, r=1 -> f1=0.8
    assert abs(macro - (2 / 3 + 0.8) / 2) < 1e-9


def test_lr_probe_separates():
    z, y = _separable()
    res = LREvaluator(num_epochs=300)(z, y, get_split(len(y)))
    assert res["micro_f1"] > 0.9
    assert res["macro_f1"] > 0.9


def test_svm_probe_separates():
    z, y = _separable(seed=1)
    res = SVMEvaluator(num_epochs=300)(z, y, get_split(len(y), seed=1))
    assert res["micro_f1"] > 0.9
