"""MHCN — Multi-channel Hypergraph Convolutional Network.

Parity target: `univariate/mhcn.py:316-555`. Three hypergraph channels
(social H_s, joint H_j, purchase H_p from the 10 triangular motifs) + a
"simple" user channel via R·V; per-channel self-gating; channel attention
mixing; item conv via Rᵀ·mixed; BPR + ss_rate · hierarchical MIM SSL per
channel (`mhcn.py:480-505`) + L2 over all parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import bpr_loss, hierarchical_mim_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.registry import register
from recommendation_tpu.ops.spmm import adj_matmul
from recommendation_tpu.sampling import PairwiseBatch


from recommendation_tpu.losses import _l2_normalize as _l2n  # zero-safe gradient
from recommendation_tpu.ops.rows import take_rows


@register("mhcn")
class MHCN(Model):
    name = "mhcn"
    N_CHANNELS = 4

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(config.get("MHCN.n_layer", config.get("n_layers", 2)))
        self.ss_rate = float(config.get("MHCN.ss_rate", 0.01))

    def init(self, rng, graph: DeviceGraph):
        if not hasattr(graph, "mhcn_hs"):
            raise ValueError("MHCN requires a SocialDeviceGraph (social side data)")
        keys = jax.random.split(rng, 4 + 4 * self.N_CHANNELS)
        d = self.emb_size
        params = {
            "user_emb": self._init_table(keys[0], graph.n_users, d),
            "item_emb": self._init_table(keys[1], graph.n_items, d),
            "attention": self._init_table(keys[2], 1, d),
            "attention_mat": self._init_table(keys[3], d, d),
            "gating_w": [], "gating_b": [], "sgating_w": [], "sgating_b": [],
        }
        for c in range(self.N_CHANNELS):
            params["gating_w"].append(self._init_table(keys[4 + c], d, d))
            params["gating_b"].append(jnp.zeros((1, d)))
            params["sgating_w"].append(self._init_table(keys[8 + c], d, d))
            params["sgating_b"].append(jnp.zeros((1, d)))
        return params, {}

    def _gate(self, params, em, c, supervised=False):
        w = params["sgating_w" if supervised else "gating_w"][c]
        b = params["sgating_b" if supervised else "gating_b"][c]
        return em * jax.nn.sigmoid(em @ w + b)

    def _channel_attention(self, params, *channels):
        weights = jnp.stack(
            [jnp.sum(params["attention"] * (c @ params["attention_mat"]), axis=1) for c in channels]
        )  # [C, n_users]
        score = jax.nn.softmax(weights, axis=0)
        mixed = sum(score[i][:, None] * channels[i] for i in range(len(channels)))
        return mixed, score

    def _forward(self, params, graph: DeviceGraph):
        u1 = self._gate(params, params["user_emb"], 0)
        u2 = self._gate(params, params["user_emb"], 1)
        u3 = self._gate(params, params["user_emb"], 2)
        simple = self._gate(params, params["user_emb"], 3)
        item = params["item_emb"]
        acc1, acc2, acc3, acc_s, acc_i = u1, u2, u3, simple, item
        for _ in range(self.n_layers):
            mixed, _ = self._channel_attention(params, u1, u2, u3)
            mixed = mixed + simple / 2.0
            u1 = adj_matmul(graph.mhcn_hs, u1)
            acc1 = acc1 + _l2n(u1)
            u2 = adj_matmul(graph.mhcn_hj, u2)
            acc2 = acc2 + _l2n(u2)
            u3 = adj_matmul(graph.mhcn_hp, u3)
            acc3 = acc3 + _l2n(u3)
            new_item = adj_matmul(graph.interaction_norm.transpose(), mixed)
            acc_i = acc_i + _l2n(new_item)
            simple = adj_matmul(graph.interaction_norm, item)
            acc_s = acc_s + _l2n(simple)
            item = new_item
        final_user, _ = self._channel_attention(params, acc1, acc2, acc3)
        final_user = final_user + acc_s / 2.0
        return final_user, acc_i

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        user_all, item_all = self._forward(params, graph)
        rec = bpr_loss(
            take_rows(user_all, batch.users), take_rows(item_all, batch.pos_items), take_rows(item_all, batch.neg_items)
        )
        # L2 over ALL parameters, unsquared norms (`mhcn.py:522-525`);
        # eps inside the sqrt keeps the gradient finite at exactly-zero
        # parameters (the zero-initialized gating biases).
        leaves = jax.tree_util.tree_leaves(params)
        reg = self.reg * sum(jnp.sqrt(jnp.sum(p ** 2) + 1e-12) for p in leaves)

        k1, k2, k3 = jax.random.split(rng, 3)
        ss = hierarchical_mim_loss(
            k1,
            self._gate(params, user_all, 0, supervised=True),
            adj_matmul(graph.mhcn_hs, self._gate(params, user_all, 0, supervised=True)),
        )
        ss = ss + hierarchical_mim_loss(
            k2,
            self._gate(params, user_all, 1, supervised=True),
            adj_matmul(graph.mhcn_hj, self._gate(params, user_all, 1, supervised=True)),
        )
        ss = ss + hierarchical_mim_loss(
            k3,
            self._gate(params, user_all, 2, supervised=True),
            adj_matmul(graph.mhcn_hp, self._gate(params, user_all, 2, supervised=True)),
        )
        return rec + reg + self.ss_rate * ss, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        return self._forward(params, graph)
