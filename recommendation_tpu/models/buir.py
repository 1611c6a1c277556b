"""BUIR-NB — BYOL-for-recommendation with online/target LightGCN encoders.

Parity target: `univariate/buir.py:177-340`. Online and target encoders share
architecture; the target is gradient-free and its embedding ROWS touched by a
batch are EMA-updated after each optimizer step (`buir.py:251-257` — row-wise,
not whole-table). Both encoders apply sparse edge dropout with a per-forward
random rate in [0, drop_rate) (`buir.py:300-309,330`). Loss = symmetric
2−2·cos with a linear predictor on the online side.

The reference's in-place target-row mutation becomes carried state updated in
``post_step``; dropout becomes a value-mask over the DeviceAdj (shapes fixed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import buir_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.lightgcn import lightgcn_propagate
from recommendation_tpu.models.registry import register
from recommendation_tpu.sampling import PairwiseBatch
from recommendation_tpu.ops.rows import take_rows


@register("buir")
class BUIR(Model):
    name = "buir"

    def __init__(self, config):
        super().__init__(config)
        self.momentum = float(config.get("BUIR.tau", 0.995))
        self.n_layers = int(config.get("BUIR.n_layer", config.get("n_layers", 2)))
        self.drop_rate = float(config.get("BUIR.drop_rate", 0.2))

    def init(self, rng, graph: DeviceGraph):
        ku, ki, kp = jax.random.split(rng, 3)
        user_emb = self._init_table(ku, graph.n_users, self.emb_size)
        item_emb = self._init_table(ki, graph.n_items, self.emb_size)
        params = {
            "user_emb": user_emb,
            "item_emb": item_emb,
            "predictor": self._init_linear(kp, self.emb_size, self.emb_size),
        }
        # Target starts as a copy of online (`buir.py:251-255`).
        state = {"t_user_emb": user_emb, "t_item_emb": item_emb}
        return params, state

    def _encode(self, user_emb, item_emb, graph: DeviceGraph, rng):
        """LightGCN propagation through a randomly edge-dropped adjacency
        with per-forward rate U(0,1)·drop_rate (`buir.py:330`)."""
        k_rate, k_drop = jax.random.split(rng)
        rate = jax.random.uniform(k_rate) * self.drop_rate
        keep = jax.random.bernoulli(k_drop, 1.0 - rate, graph.norm_adj.vals.shape)
        adj = graph.norm_adj
        from recommendation_tpu.graph.device import with_vals

        dropped = with_vals(
            adj, jnp.where(keep, adj.vals / jnp.maximum(1.0 - rate, 1e-8), 0.0)
        )
        return lightgcn_propagate(user_emb, item_emb, dropped, self.n_layers)

    def _predict_head(self, params, x):
        p = params["predictor"]
        return x @ p["w"] + p["b"]

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        k_on, k_tg = jax.random.split(rng)
        u_on_all, i_on_all = self._encode(
            params["user_emb"], params["item_emb"], graph, k_on
        )
        u_tg_all, i_tg_all = self._encode(
            jax.lax.stop_gradient(state["t_user_emb"]),
            jax.lax.stop_gradient(state["t_item_emb"]),
            graph,
            k_tg,
        )
        users, items = batch.users, batch.pos_items
        loss = buir_loss(
            self._predict_head(params, take_rows(u_on_all, users)),
            take_rows(u_tg_all, users),
            self._predict_head(params, take_rows(i_on_all, items)),
            take_rows(i_tg_all, items),
        )
        return loss, state

    def post_step(self, params, state, batch: PairwiseBatch):
        """Row-wise EMA of target embeddings for the touched rows
        (`buir.py:251-257`)."""
        m = self.momentum
        u, i = batch.users, batch.pos_items
        t_u = state["t_user_emb"]
        t_i = state["t_item_emb"]
        t_u = t_u.at[u].set(t_u[u] * m + params["user_emb"][u] * (1.0 - m))
        t_i = t_i.at[i].set(t_i[i] * m + params["item_emb"][i] * (1.0 - m))
        return {"t_user_emb": t_u, "t_item_emb": t_i}

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        u_online, i_online = lightgcn_propagate(
            params["user_emb"], params["item_emb"], graph.norm_adj, self.n_layers
        )
        user_cat = jnp.concatenate([self._predict_head(params, u_online), u_online], axis=1)
        item_cat = jnp.concatenate([i_online, self._predict_head(params, i_online)], axis=1)
        return user_cat, item_cat
