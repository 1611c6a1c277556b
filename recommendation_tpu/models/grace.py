"""GRACE (proper) — GCN contrastive learning with dual augmentor pairs.

Parity target: `univariate/grace.py:236-553`: GCNConv encoder (self-loop
normalized adjacency) over identity node features, EdgeRemoving +
FeatureMasking augmentor per view, ELU projection head, DualBranchContrast
masked InfoNCE with intraview negatives (`grace.py:213-224,469-502`).

Identity features (`grace.py:124-130`) make the first GCN layer's weight act
as an embedding table (I·W = W); implemented directly as a learned [N, d_in]
table — mathematically identical and O(N·d) instead of O(N²) memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.augment import drop_edges, mask_features
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import grace_dual_branch_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.registry import register
from recommendation_tpu.ops.spmm import adj_matmul
from recommendation_tpu.sampling import PairwiseBatch


@register("grace")
class GRACE(Model):
    name = "grace"

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(config.get("GRACE.num_layers", 2))
        self.hidden = int(config.get("GRACE.hidden", config.get("embedding.size", 64)))
        self.proj_dim = int(config.get("GRACE.proj_dim", 64))
        self.tau = float(config.get("GRACE.tau", 0.5))
        self.drop_edge1 = float(config.get("GRACE.drop_edge1", 0.3))
        self.drop_edge2 = float(config.get("GRACE.drop_edge2", 0.4))
        self.drop_feat1 = float(config.get("GRACE.drop_feat1", 0.3))
        self.drop_feat2 = float(config.get("GRACE.drop_feat2", 0.4))

    def init(self, rng, graph: DeviceGraph):
        kf, kp1, kp2, *kl = jax.random.split(rng, 3 + self.n_layers)
        params = {
            "features": self._init_table(kf, graph.n_nodes, self.hidden),
            "convs": [self._init_linear(kl[i], self.hidden, self.hidden) for i in range(self.n_layers)],
            "fc1": self._init_linear(kp1, self.hidden, self.proj_dim),
            "fc2": self._init_linear(kp2, self.proj_dim, self.hidden),
        }
        return params, {}

    def _gcn(self, params, x, adj):
        # GCNConv applies its bias AFTER propagation: x' = Â(xW) + b
        # (`univariate/grace.py:510-519` via torch_geometric; Â·b ≠ b under
        # sym-normalization, so bias placement is numerically visible —
        # pinned by tests/test_encoder_oracles.py)
        for layer in params["convs"]:
            x = adj_matmul(adj, x @ layer["w"]) + layer["b"]
            x = jax.nn.relu(x)
        return x

    def _project(self, params, z):
        h = jax.nn.elu(z @ params["fc1"]["w"] + params["fc1"]["b"])
        return h @ params["fc2"]["w"] + params["fc2"]["b"]

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        ke1, ke2, kf1, kf2 = jax.random.split(rng, 4)
        adj1 = drop_edges(ke1, graph.norm_adj_selfloops, self.drop_edge1)
        adj2 = drop_edges(ke2, graph.norm_adj_selfloops, self.drop_edge2)
        x1 = mask_features(kf1, params["features"], self.drop_feat1)
        x2 = mask_features(kf2, params["features"], self.drop_feat2)
        z1 = self._project(params, self._gcn(params, x1, adj1))
        z2 = self._project(params, self._gcn(params, x2, adj2))
        return grace_dual_branch_loss(z1, z2, self.tau), state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        z = self._gcn(params, params["features"], graph.norm_adj_selfloops)
        return z[: graph.n_users], z[graph.n_users :]
