"""DirectAU — LightGCN encoder trained with alignment + γ·uniformity.

Parity target: `directau.py:196-293`. The reference script composes
``loss = L(u,pos) − L(u,neg) + reg`` (`directau.py:223-226`); the published
DirectAU algorithm uses positives only. Both are supported via
``DirectAU.neg_composition`` (default True = reference-script semantics,
SURVEY.md §7.3 faithful-vs-fixed policy).

The all-pairs uniformity term has blockwise/ring variants for sharded
execution (``ops/pallas_losses.py``, ``parallel/collectives.py``).
"""

from __future__ import annotations

import jax

from recommendation_tpu.graph.device import DeviceGraph, binarized
from recommendation_tpu.losses import alignment_loss, l2_reg_loss, uniformity_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.lightgcn import lightgcn_propagate
from recommendation_tpu.models.registry import register
from recommendation_tpu.sampling import PairwiseBatch
from recommendation_tpu.ops.rows import take_rows


@register("directau")
class DirectAU(Model):
    name = "directau"

    def __init__(self, config):
        super().__init__(config)
        self.gamma = float(config.get("DirectAU.gamma", 1.0))
        self.n_layers = int(config.get("DirectAU.n_layers", config.get("n_layers", 2)))
        self.neg_composition = bool(config.get("DirectAU.neg_composition", True))
        # The reference script propagates over the RAW adjacency — its
        # `_build_adj` (`directau.py:132-141`) never degree-normalizes.
        # Default False reproduces that behavior (measured: it outperforms
        # the normalized variant on popularity-skewed data, head-to-head
        # parity in tools/parity_vs_reference.py); True gives published
        # LightGCN-style D^-1/2 A D^-1/2 propagation.
        self.normalize_adj = bool(config.get("DirectAU.normalize_adj", False))

    def init(self, rng, graph: DeviceGraph):
        ku, ki = jax.random.split(rng)
        params = {
            "user_emb": self._init_table(ku, graph.n_users, self.emb_size),
            "item_emb": self._init_table(ki, graph.n_items, self.emb_size),
        }
        return params, {}

    def _au(self, u, i):
        align = alignment_loss(u, i)
        uniform = self.gamma * (uniformity_loss(u) + uniformity_loss(i)) / 2.0
        return align + uniform

    def _adj(self, graph: DeviceGraph):
        return graph.norm_adj if self.normalize_adj else binarized(graph.norm_adj)

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        user_all, item_all = lightgcn_propagate(
            params["user_emb"], params["item_emb"], self._adj(graph), self.n_layers
        )
        u = take_rows(user_all, batch.users)
        pos = take_rows(item_all, batch.pos_items)
        neg = take_rows(item_all, batch.neg_items)
        loss = self._au(u, pos)
        if self.neg_composition:
            loss = loss - self._au(u, neg)
        loss = loss + l2_reg_loss(self.reg, u, pos, neg) / batch.users.shape[0]
        return loss, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        return lightgcn_propagate(
            params["user_emb"], params["item_emb"], self._adj(graph), self.n_layers
        )
