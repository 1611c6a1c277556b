"""DiffNet — social influence diffusion.

Parity target: `univariate/diffnet.py:1050-1144`. Per diffusion layer:
``u ← ReLU([S·u ‖ u] · W_k)`` with S the row-normalized trust matrix
(`diffnet.py:1070-1077,1124-1132`); final user embedding adds the normalized
interaction aggregation ``A·V``. Items score against the raw item table.
Loss: summed BPR (−Σ log σ(y_ui − y_uj)) + regU·(unsquared norms), the
`diffnet.py:1110-1117` composition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.models.base import Model
from recommendation_tpu.losses import safe_frobenius_norm
from recommendation_tpu.models.registry import register
from recommendation_tpu.ops.spmm import adj_matmul
from recommendation_tpu.sampling import PairwiseBatch
from recommendation_tpu.ops.rows import take_rows


@register("diffnet")
class DiffNet(Model):
    name = "diffnet"

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(config.get("DiffNet.n_layer", config.get("n_layers", 2)))
        self.reg_u = float(config.get("DiffNet.reg_lambda", config.get("reg.lambda", 1e-4)))

    def init(self, rng, graph: DeviceGraph):
        if not hasattr(graph, "social_adj"):
            raise ValueError("DiffNet requires a SocialDeviceGraph (social side data)")
        keys = jax.random.split(rng, 2 + self.n_layers)
        d = self.emb_size
        params = {
            # randn * 0.005 init (`diffnet.py:1066-1067`)
            "user_emb": 0.005 * jax.random.normal(keys[0], (graph.n_users, d)),
            "item_emb": 0.005 * jax.random.normal(keys[1], (graph.n_items, d)),
            "weights": [self._init_table(keys[2 + k], 2 * d, d) for k in range(self.n_layers)],
        }
        return params, {}

    def _forward(self, params, graph: DeviceGraph):
        u = params["user_emb"]
        for k in range(self.n_layers):
            diffused = adj_matmul(graph.social_adj, u)
            u = jax.nn.relu(jnp.concatenate([diffused, u], axis=1) @ params["weights"][k])
        final_u = u + adj_matmul(graph.interaction_norm, params["item_emb"])
        return final_u, params["item_emb"]

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        user_all, item_all = self._forward(params, graph)
        u = take_rows(user_all, batch.users)
        pos = take_rows(item_all, batch.pos_items)
        neg = take_rows(item_all, batch.neg_items)
        y = jnp.sum(u * pos, axis=1) - jnp.sum(u * neg, axis=1)
        pairwise = -jnp.sum(jnp.log(jax.nn.sigmoid(y) + 1e-10))
        reg = self.reg_u * (
            safe_frobenius_norm(u) + safe_frobenius_norm(pos) + safe_frobenius_norm(neg)
        )
        return pairwise + reg, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        return self._forward(params, graph)
