"""Embedding-probe evaluators (layer L7, contrastive-model branch).

The reference's GRACE/BGRL/G-BT scripts judge representations with sklearn
probes: logistic regression with micro/macro-F1 (`univariate/grace.py:327-378`
``LREvaluator``, train 10% / test 80% split) and an SVM probe
(`univariate/bgrl_g2l.py:348-373`). TPU-native equivalents: jit-compiled
full-batch logistic regression / linear hinge classifier trained with optax
on device — no sklearn dependency.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def get_split(
    num_samples: int, train_ratio: float = 0.1, test_ratio: float = 0.8, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Random index split (`grace.py:381-404` semantics)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(num_samples)
    n_train = int(num_samples * train_ratio)
    n_test = int(num_samples * test_ratio)
    return {
        "train": perm[:n_train],
        "test": perm[n_train:n_train + n_test],
        "valid": perm[n_train + n_test:],
    }


def f1_scores(y_true: np.ndarray, y_pred: np.ndarray, n_classes: int) -> Tuple[float, float]:
    """(micro_f1, macro_f1). Micro == accuracy for single-label problems."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    micro = float((y_true == y_pred).mean()) if len(y_true) else 0.0
    f1s = []
    for c in range(n_classes):
        tp = int(((y_pred == c) & (y_true == c)).sum())
        fp = int(((y_pred == c) & (y_true != c)).sum())
        fn = int(((y_pred != c) & (y_true == c)).sum())
        if tp == 0 and (fp or fn):
            f1s.append(0.0)
        elif tp:
            prec = tp / (tp + fp)
            rec = tp / (tp + fn)
            f1s.append(2 * prec * rec / (prec + rec))
    macro = float(np.mean(f1s)) if f1s else 0.0
    return micro, macro


def _train_linear(
    x: jnp.ndarray,
    y: jnp.ndarray,
    n_classes: int,
    loss_kind: str,
    n_epochs: int,
    lr: float,
    weight_decay: float,
    seed: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    d = x.shape[1]
    key = jax.random.PRNGKey(seed)
    params = {
        "w": 0.01 * jax.random.normal(key, (d, n_classes)),
        "b": jnp.zeros((n_classes,)),
    }
    opt = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = opt.init(params)
    y_onehot = jax.nn.one_hot(y, n_classes)

    def loss_fn(p):
        logits = x @ p["w"] + p["b"]
        if loss_kind == "hinge":
            # multiclass hinge (Crammer-Singer style), the SVM-probe analog
            correct = jnp.sum(logits * y_onehot, axis=1, keepdims=True)
            margins = jnp.maximum(0.0, 1.0 + logits - correct) * (1.0 - y_onehot)
            return jnp.mean(jnp.sum(margins, axis=1))
        return optax.softmax_cross_entropy(logits, y_onehot).mean()

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s

    for _ in range(n_epochs):
        params, opt_state = step(params, opt_state)
    return params["w"], params["b"]


def _evaluate(kind, z, y, split, n_epochs, lr, weight_decay, seed):
    z = jnp.asarray(z)
    y = np.asarray(y)
    n_classes = int(y.max()) + 1
    w, b = _train_linear(
        z[split["train"]], jnp.asarray(y[split["train"]]), n_classes,
        kind, n_epochs, lr, weight_decay, seed,
    )
    pred = np.asarray(jnp.argmax(z @ w + b, axis=1))
    micro, macro = f1_scores(y[split["test"]], pred[split["test"]], n_classes)
    return {"micro_f1": micro, "macro_f1": macro}


class LREvaluator:
    """Logistic-regression probe (`grace.py:327-378` contract)."""

    def __init__(self, num_epochs: int = 500, learning_rate: float = 0.01, weight_decay: float = 0.0):
        self.num_epochs = num_epochs
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay

    def __call__(self, z, y, split, seed: int = 0) -> Dict[str, float]:
        return _evaluate(
            "logreg", z, y, split, self.num_epochs, self.learning_rate, self.weight_decay, seed
        )


class SVMEvaluator:
    """Linear hinge-loss probe (`bgrl_g2l.py:348-373` SVM analog)."""

    def __init__(self, num_epochs: int = 500, learning_rate: float = 0.01, weight_decay: float = 1e-4):
        self.num_epochs = num_epochs
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay

    def __call__(self, z, y, split, seed: int = 0) -> Dict[str, float]:
        return _evaluate(
            "hinge", z, y, split, self.num_epochs, self.learning_rate, self.weight_decay, seed
        )
