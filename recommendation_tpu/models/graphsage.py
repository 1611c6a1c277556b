"""GraphSAGE recommender over the bipartite graph.

Parity target: `graphsage.py:15-32,46`: SAGEConv stack (mean aggregator,
x' = W_self·x + W_neigh·mean_N(x)) over RANDOM 64-d node features
(`graphsage.py:46` — node ids carry no learned embedding in the reference),
ReLU + dropout between layers, BPR/BCE loss. A learned-feature option
(``GraphSAGE.learned_features``) is provided since random features cap
quality; default False for reference semantics.

Aggregation runs as masked ``segment_sum``/count over the static edge list —
the TPU replacement for torch_scatter's SAGEConv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import bce_loss, bpr_loss, l2_reg_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.registry import register
from recommendation_tpu.sampling import PairwiseBatch
from recommendation_tpu.ops.rows import take_rows


def bidirectional_edges(graph: DeviceGraph):
    """(src, dst, mask): both directions of every interaction edge, padded."""
    u = graph.edge_users
    i = graph.edge_items + graph.n_users
    src = jnp.concatenate([u, i])
    dst = jnp.concatenate([i, u])
    mask = jnp.concatenate([graph.edge_valid, graph.edge_valid])
    return src, dst, mask


def masked_segment_mean(values, segments, mask, num_segments):
    sums = jax.ops.segment_sum(values * mask[:, None], segments, num_segments=num_segments)
    counts = jax.ops.segment_sum(mask, segments, num_segments=num_segments)
    return sums / jnp.maximum(counts, 1.0)[:, None]


@register("graphsage")
class GraphSAGE(Model):
    name = "graphsage"

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(config.get("GraphSAGE.n_layers", config.get("n_layers", 2)))
        self.hidden = int(config.get("GraphSAGE.hidden", 64))
        self.dropout = float(config.get("GraphSAGE.dropout", 0.2))
        self.in_dim = int(config.get("GraphSAGE.in_dim", 64))
        self.loss_type = str(config.get("loss", "bpr"))
        self.learned_features = bool(config.get("GraphSAGE.learned_features", False))

    def init(self, rng, graph: DeviceGraph):
        kx, *keys = jax.random.split(rng, self.n_layers * 2 + 1)
        params = {}
        if self.learned_features:
            params["features"] = self._init_table(kx, graph.n_nodes, self.in_dim)
        else:
            # fixed random features (`graphsage.py:46`), stored as state-like
            # constants in params but without gradient use — kept in params
            # for checkpointing; stop_gradient applied in forward.
            params["features"] = jax.random.normal(kx, (graph.n_nodes, self.in_dim))
        dims = [self.in_dim] + [self.hidden] * (self.n_layers - 1) + [self.emb_size]
        params["layers"] = []
        for li in range(self.n_layers):
            params["layers"].append(
                {
                    "self": self._init_linear(keys[2 * li], dims[li], dims[li + 1]),
                    "neigh": self._init_linear(keys[2 * li + 1], dims[li], dims[li + 1]),
                }
            )
        return params, {}

    def _forward(self, params, graph: DeviceGraph, rng=None):
        src, dst, mask = bidirectional_edges(graph)
        x = params["features"]
        if not self.learned_features:
            x = jax.lax.stop_gradient(x)
        for li, layer in enumerate(params["layers"]):
            neigh = masked_segment_mean(x[src], dst, mask, graph.n_nodes)
            x = (
                x @ layer["self"]["w"] + layer["self"]["b"]
                + neigh @ layer["neigh"]["w"] + layer["neigh"]["b"]
            )
            if li < self.n_layers - 1:
                x = jax.nn.relu(x)
                if rng is not None and self.dropout > 0:
                    rng, k = jax.random.split(rng)
                    keep = jax.random.bernoulli(k, 1.0 - self.dropout, x.shape)
                    x = jnp.where(keep, x / (1.0 - self.dropout), 0.0)
        return x[: graph.n_users], x[graph.n_users :]

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        user_all, item_all = self._forward(params, graph, rng)
        u = take_rows(user_all, batch.users)
        pos = take_rows(item_all, batch.pos_items)
        neg = take_rows(item_all, batch.neg_items)
        fn = bpr_loss if self.loss_type == "bpr" else bce_loss
        loss = fn(u, pos, neg) + l2_reg_loss(self.reg, u, pos, neg) / batch.users.shape[0]
        return loss, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        return self._forward(params, graph, rng=None)
