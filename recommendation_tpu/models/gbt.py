"""G-BT — Graph Barlow Twins.

Parity target: `univariate/gbt.py:203-228,386-433,454-530`: 2-layer GCN
encoder with BatchNorm and feature-repeat widening, two edge-dropped +
feature-masked views, WithinEmbedContrast with the cross-correlation
decorrelation ``bt_loss`` (implemented in ``losses.barlow_twins_loss``).
Identity features (`gbt.py:124-129`) again become a learned table.
The reference's CosineAnnealingLR (`gbt.py:512-514`) maps to an optax
cosine_decay_schedule via ``make_optimizer``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from recommendation_tpu.graph.augment import drop_edges, mask_features
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import barlow_twins_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.registry import register
from recommendation_tpu.ops.spmm import adj_matmul
from recommendation_tpu.sampling import PairwiseBatch


def _batch_norm(x, eps=1e-5):
    # torch BatchNorm1d semantics (biased variance, eps inside the
    # sqrt) so the torch oracles agree to float precision
    return (x - x.mean(axis=0)) / jnp.sqrt(x.var(axis=0) + eps)


@register("gbt")
class GBT(Model):
    name = "gbt"

    def __init__(self, config):
        super().__init__(config)
        self.hidden = int(config.get("GBT.hidden", 2 * int(config.get("embedding.size", 64))))
        self.out_dim = int(config.get("GBT.out_dim", config.get("embedding.size", 64)))
        self.drop_edge = float(config.get("GBT.drop_edge", 0.25))
        self.drop_feat = float(config.get("GBT.drop_feat", 0.25))
        self.total_steps = int(config.get("GBT.total_steps", 1000))

    def make_optimizer(self, config):
        lr = float(config.get("learning.rate", 1e-3))
        schedule = optax.cosine_decay_schedule(lr, decay_steps=self.total_steps)
        return optax.adam(schedule)

    def init(self, rng, graph: DeviceGraph):
        kf, k1, k2 = jax.random.split(rng, 3)
        params = {
            "features": self._init_table(kf, graph.n_nodes, self.out_dim),
            "conv1": self._init_linear(k1, self.out_dim, self.hidden),
            "conv2": self._init_linear(k2, self.hidden, self.out_dim),
        }
        return params, {}

    def _gcn(self, params, x, adj):
        # GCNConv bias is applied AFTER propagation (see grace.py::_gcn note)
        z = adj_matmul(adj, x @ params["conv1"]["w"]) + params["conv1"]["b"]
        z = jax.nn.relu(_batch_norm(z))
        z = adj_matmul(adj, z @ params["conv2"]["w"]) + params["conv2"]["b"]
        return z

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        ke1, ke2, kf1, kf2 = jax.random.split(rng, 4)
        adj1 = drop_edges(ke1, graph.norm_adj_selfloops, self.drop_edge)
        adj2 = drop_edges(ke2, graph.norm_adj_selfloops, self.drop_edge)
        x1 = mask_features(kf1, params["features"], self.drop_feat)
        x2 = mask_features(kf2, params["features"], self.drop_feat)
        h1 = self._gcn(params, x1, adj1)
        h2 = self._gcn(params, x2, adj2)
        return barlow_twins_loss(h1, h2), state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        z = self._gcn(params, params["features"], graph.norm_adj_selfloops)
        return z[: graph.n_users], z[graph.n_users :]
