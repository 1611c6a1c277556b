"""SSL4Rec — two-tower DNN retrieval with item-dropout contrastive loss.

Parity target: `ssl4rec.py:160-266`. Query/item towers are MLPs over id
embeddings (hidden 1024 → 128, ReLU then Tanh, `ssl4rec.py:176-187`);
training loss = in-batch softmax retrieval (`ssl4rec.py:25-30`)
+ α · item-dropout InfoNCE CL (`ssl4rec.py:192-196`) + L2 reg.
Early stopping (patience 3, `ssl4rec.py:213,240-244`) is provided by the
trainer via ``early.stopping.patience``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import batch_softmax_loss, info_nce, l2_reg_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.registry import register
from recommendation_tpu.sampling import PairwiseBatch
from recommendation_tpu.ops.rows import take_rows


def mlp_apply(layers, x, final_tanh=True):
    n = len(layers)
    for idx, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        x = jnp.tanh(x) if idx == n - 1 and final_tanh else jax.nn.relu(x) if idx < n - 1 else x
    return x


@register("ssl4rec")
class SSL4Rec(Model):
    name = "ssl4rec"

    def __init__(self, config):
        super().__init__(config)
        self.cl_rate = float(config.get("SSL4Rec.alpha", 0.5))
        self.tau = float(config.get("SSL4Rec.tau", 0.1))
        self.drop = float(config.get("SSL4Rec.drop", 0.1))
        self.n_layers = int(config.get("n.layers", 1))
        self.hidden = int(config.get("SSL4Rec.hidden", 1024))
        self.out_dim = int(config.get("SSL4Rec.out_dim", 128))

    def _build_mlp(self, rng, d_in):
        """n_layers linears: hidden...hidden, final out_dim (`ssl4rec.py:176-187`)."""
        layers = []
        keys = jax.random.split(rng, self.n_layers)
        for i in range(self.n_layers):
            d_out = self.hidden if i < self.n_layers - 1 else self.out_dim
            layers.append(self._init_linear(keys[i], d_in, d_out))
            d_in = d_out
        return layers

    def init(self, rng, graph: DeviceGraph):
        ku, ki, kun, kin = jax.random.split(rng, 4)
        params = {
            "user_emb": self._init_table(ku, graph.n_users, self.emb_size),
            "item_emb": self._init_table(ki, graph.n_items, self.emb_size),
            "user_net": self._build_mlp(kun, self.emb_size),
            "item_net": self._build_mlp(kin, self.emb_size),
        }
        return params, {}

    def towers(self, params, user_ids, item_ids):
        u = mlp_apply(params["user_net"], take_rows(params["user_emb"], user_ids))
        i = mlp_apply(params["item_net"], take_rows(params["item_emb"], item_ids))
        return u, i

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        u_emb, i_emb = self.towers(params, batch.users, batch.pos_items)
        rec = batch_softmax_loss(u_emb, i_emb, self.tau)

        # CL: two dropout views of the raw item embeddings through the tower.
        k1, k2 = jax.random.split(rng)
        raw = take_rows(params["item_emb"], batch.pos_items)

        def dropout(key, x):
            keep = jax.random.bernoulli(key, 1.0 - self.drop, x.shape)
            return jnp.where(keep, x / (1.0 - self.drop), 0.0)

        v1 = mlp_apply(params["item_net"], dropout(k1, raw))
        v2 = mlp_apply(params["item_net"], dropout(k2, raw))
        cl = self.cl_rate * info_nce(v1, v2, self.tau)

        reg = l2_reg_loss(self.reg, u_emb, i_emb)
        return rec + cl + reg, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        return self.towers(
            params, jnp.arange(graph.n_users), jnp.arange(graph.n_items)
        )
