"""BGRL (G2L) — bootstrapped graph latents with an EMA target network.

Parity target: `univariate/bgrl_g2l.py:121-127,277-308,436-446,505-583`:
GIN encoder (2-layer MLP conv over sum aggregation) with a projection head,
learnable node-feature embedding, two augmented views, online predictor,
whole-network EMA target (momentum 0.99, `bgrl_g2l.py:553-555`), and the
G2L BootstrapLatent loss (node prediction vs cross-view graph readout).

The reference's in-place deepcopy target (`bgrl_g2l.py:547-551`) becomes
explicit carried state EMA-updated in ``post_step``. BatchNorms are applied
with per-forward batch statistics (no running stats carried).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.augment import drop_edges, mask_features
from recommendation_tpu.graph.device import DeviceGraph, binarized
from recommendation_tpu.losses import bootstrap_g2l_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.registry import register
from recommendation_tpu.ops.spmm import adj_matmul
from recommendation_tpu.sampling import PairwiseBatch


def _batch_norm(x, eps=1e-5):
    # torch BatchNorm1d semantics (biased variance, eps inside the
    # sqrt) so the torch oracles agree to float precision
    return (x - x.mean(axis=0)) / jnp.sqrt(x.var(axis=0) + eps)


@register("bgrl")
@register("bgrl_g2l")
class BGRL(Model):
    name = "bgrl"

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(config.get("BGRL.num_layers", 2))
        self.hidden = int(config.get("BGRL.hidden", config.get("embedding.size", 64)))
        self.momentum = float(config.get("BGRL.momentum", 0.99))
        self.drop_edge = float(config.get("BGRL.drop_edge", 0.25))
        self.drop_feat = float(config.get("BGRL.drop_feat", 0.25))

    def _encoder_params(self, rng):
        keys = jax.random.split(rng, 2 * self.n_layers + 2)
        convs = []
        for i in range(self.n_layers):
            convs.append(
                {
                    "mlp1": self._init_linear(keys[2 * i], self.hidden, self.hidden * 2),
                    "mlp2": self._init_linear(keys[2 * i + 1], self.hidden * 2, self.hidden),
                }
            )
        return {
            "convs": convs,
            "proj": self._init_linear(keys[-2], self.hidden, self.hidden),
            "prelu": jnp.asarray(0.25),
        }

    def init(self, rng, graph: DeviceGraph):
        kf, ke, kp = jax.random.split(rng, 3)
        online = self._encoder_params(ke)
        params = {
            "features": self._init_table(kf, graph.n_nodes, self.hidden),
            "online": online,
            "predictor": self._init_linear(kp, self.hidden, self.hidden),
        }
        state = {"target": jax.tree_util.tree_map(lambda x: x, online)}
        return params, state

    def _gin(self, enc, x, adj):
        """GIN conv stack: z = MLP(z + Σ_neighbors z), ReLU between
        (`bgrl_g2l.py:498-531`), then batch norm + projection head."""
        z = x
        for conv in enc["convs"]:
            agg = z + adj_matmul(adj, z)
            h = jax.nn.relu(agg @ conv["mlp1"]["w"] + conv["mlp1"]["b"])
            z = h @ conv["mlp2"]["w"] + conv["mlp2"]["b"]
            z = jax.nn.relu(z)
        z = _batch_norm(z)
        p = z @ enc["proj"]["w"] + enc["proj"]["b"]
        p = _batch_norm(p)
        p = jnp.where(p >= 0, p, enc["prelu"] * p)
        return z, p

    def _views(self, rng, params, graph):
        ke1, ke2, kf1, kf2 = jax.random.split(rng, 4)
        # unnormalized neighbor-sum adjacency for GIN: use norm_adj structure
        # with binarized values would lose degree info; GIN uses raw sums, so
        # propagate with the 0/1 adjacency = norm_adj with values replaced.
        ones = binarized(graph.norm_adj)
        a1 = drop_edges(ke1, ones, self.drop_edge)
        a2 = drop_edges(ke2, ones, self.drop_edge)
        x1 = mask_features(kf1, params["features"], self.drop_feat)
        x2 = mask_features(kf2, params["features"], self.drop_feat)
        return (x1, a1), (x2, a2)

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        (x1, a1), (x2, a2) = self._views(rng, params, graph)
        _, p1 = self._gin(params["online"], x1, a1)
        _, p2 = self._gin(params["online"], x2, a2)

        def predict(p):
            return p @ params["predictor"]["w"] + params["predictor"]["b"]

        h1_pred, h2_pred = predict(p1), predict(p2)
        _, t1 = self._gin(state["target"], x1, a1)
        _, t2 = self._gin(state["target"], x2, a2)
        g1 = jnp.sum(t1, axis=0)  # global_add_pool, single graph
        g2 = jnp.sum(t2, axis=0)
        return bootstrap_g2l_loss(h1_pred, h2_pred, g1, g2), state

    def post_step(self, params, state, batch):
        m = self.momentum
        target = jax.tree_util.tree_map(
            lambda t, o: t * m + o * (1.0 - m), state["target"], params["online"]
        )
        return {"target": target}

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        ones = binarized(graph.norm_adj)
        z, _ = self._gin(params["online"], params["features"], ones)
        return z[: graph.n_users], z[graph.n_users :]
