"""Rating metrics path + NaN-guard behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.config import default_config
from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.evalx.rating import evaluate_rating, global_mean
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.models.base import Model
from recommendation_tpu.train.loop import make_epoch_fn, make_optimizer
from recommendation_tpu.tune.presets import PRESETS, get_preset


def test_evaluate_rating_oracle():
    train = [["u0", "i0", 4.0], ["u0", "i1", 2.0], ["u1", "i0", 5.0]]
    test = [["u0", "i0", 3.0], ["u1", "i1", 4.0]]
    data = Interaction(train, test)
    ue = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    ie = np.array([[2.0, 0.0], [0.0, 3.0]], np.float32)
    out = evaluate_rating(ue, ie, data)
    # preds: u0-i0 = 2.0 (true 3), u1-i1 = 3.0 (true 4) -> MAE 1.0 RMSE 1.0
    assert abs(out["MAE"] - 1.0) < 1e-6
    assert abs(out["RMSE"] - 1.0) < 1e-6
    assert abs(global_mean(data) - (4 + 2 + 5) / 3) < 1e-6


def test_rating_clip():
    train = [["u0", "i0", 4.0]]
    test = [["u0", "i0", 5.0]]
    data = Interaction(train, test)
    ue = np.array([[10.0]], np.float32)
    ie = np.array([[10.0]], np.float32)
    out = evaluate_rating(ue, ie, data, clip=(1.0, 5.0))
    assert abs(out["MAE"] - 0.0) < 1e-6  # 100 clipped to 5


class _PoisonModel(Model):
    """Loss is NaN on a random ~half of steps (keyed off the step rng).

    Note the guard intentionally discards a poisoned step's STATE update too,
    so a state-based counter cannot drive the poison — the rng can."""

    name = "poison"

    def init(self, rng, graph):
        return {"w": jnp.ones((4,))}, {"good_steps": jnp.zeros((), jnp.int32)}

    def loss(self, params, state, batch, graph, rng):
        base = jnp.sum(params["w"] ** 2) * 1e-3
        poisoned = jax.random.uniform(rng) < 0.5
        loss = jnp.where(poisoned, jnp.nan, base)
        return loss, {"good_steps": state["good_steps"] + 1}

    def eval_embeddings(self, params, state, graph):
        raise NotImplementedError


def test_nan_guard_skips_poisoned_step(tiny_graph):
    config = default_config(**{"batch.size": 256})
    model = _PoisonModel(config)
    params, state = model.init(jax.random.PRNGKey(0), tiny_graph)
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    epoch_fn = make_epoch_fn(model, optimizer, 256)
    p, o, s, loss = epoch_fn(tiny_graph, params, opt_state, state, jax.random.PRNGKey(1))
    n_batches = -(-tiny_graph.n_edges // 256)
    # epoch mean excludes the NaN steps; params stayed finite; only
    # non-poisoned steps advanced the state counter
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(p["w"])).all()
    assert 0 < int(s["good_steps"]) <= n_batches


def test_presets_reference_all_known_keys():
    from recommendation_tpu.models import registry

    for name, preset in PRESETS.items():
        assert preset["mode"] in ("grid", "univariate")
        assert preset["grid"]
        registry.build(name, default_config())  # every preset names a real model
    assert get_preset("LIGHTGCN")["mode"] == "univariate"
