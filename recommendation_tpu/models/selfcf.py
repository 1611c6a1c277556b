"""SelfCF-HE — self-supervised CF without negatives via historical embeddings.

Parity target: `selfcf.py:457-591`. Online LightGCN encoder + linear
predictor; the target view is a momentum blend of a HISTORICAL embedding
table with the current online rows (`selfcf.py:497-510`). The reference
mutates ``u_target_his`` in-place under ``no_grad``; here the history tables
are explicit carried state updated functionally per step (SURVEY.md §7.3
"stateful SSL machinery under jit").

Prediction uses the dual score  p(u)·iᵀ + u·p(i)ᵀ  (`selfcf.py:581-591`),
expressed as a single MIPS by concatenating [p(u), u] and [i, p(i)] along the
feature axis — so the shared sharded top-k path applies unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import selfcf_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.lightgcn import lightgcn_propagate
from recommendation_tpu.models.registry import register
from recommendation_tpu.sampling import PairwiseBatch
from recommendation_tpu.ops.rows import take_rows


@register("selfcf")
class SelfCF(Model):
    name = "selfcf"

    def __init__(self, config):
        super().__init__(config)
        self.momentum = float(config.get("SelfCF.tau", 0.05))
        self.n_layers = int(config.get("SelfCF.n_layer", config.get("n_layers", 2)))
        self.reg_weight = float(config.get("reg.weight", 1.0))

    def init(self, rng, graph: DeviceGraph):
        ku, ki, kp, khu, khi = jax.random.split(rng, 5)
        params = {
            "user_emb": self._init_table(ku, graph.n_users, self.emb_size),
            "item_emb": self._init_table(ki, graph.n_items, self.emb_size),
            "predictor": self._init_linear(kp, self.emb_size, self.emb_size),
        }
        # Histories start from randn like the reference (`selfcf.py:498-499`).
        state = {
            "u_his": jax.random.normal(khu, (graph.n_users, self.emb_size)),
            "i_his": jax.random.normal(khi, (graph.n_items, self.emb_size)),
        }
        return params, state

    def _predict_head(self, params, x):
        p = params["predictor"]
        return x @ p["w"] + p["b"]

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        u_online, i_online = lightgcn_propagate(
            params["user_emb"], params["item_emb"], graph.norm_adj, self.n_layers,
            bipartite_dense=getattr(graph, "interaction_norm_dense", None),
        )
        users, items = batch.users, batch.pos_items
        u_rows = take_rows(u_online, users)
        i_rows = take_rows(i_online, items)

        # Momentum target from history (no grad through either term).
        u_target = jax.lax.stop_gradient(
            state["u_his"][users] * self.momentum + u_rows * (1.0 - self.momentum)
        )
        i_target = jax.lax.stop_gradient(
            state["i_his"][items] * self.momentum + i_rows * (1.0 - self.momentum)
        )
        # History <- current online rows (`selfcf.py:509-510`), functional.
        new_state = {
            "u_his": state["u_his"].at[users].set(jax.lax.stop_gradient(u_rows)),
            "i_his": state["i_his"].at[items].set(jax.lax.stop_gradient(i_rows)),
        }
        loss = self.reg_weight * selfcf_loss(
            self._predict_head(params, u_rows), u_target,
            self._predict_head(params, i_rows), i_target,
        )
        return loss, new_state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        u_online, i_online = lightgcn_propagate(
            params["user_emb"], params["item_emb"], graph.norm_adj, self.n_layers,
            bipartite_dense=getattr(graph, "interaction_norm_dense", None),
        )
        user_cat = jnp.concatenate([self._predict_head(params, u_online), u_online], axis=1)
        item_cat = jnp.concatenate([i_online, self._predict_head(params, i_online)], axis=1)
        return user_cat, item_cat
