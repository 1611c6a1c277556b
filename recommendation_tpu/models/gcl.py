"""GCL — graph contrastive learning for recommendation (GRACE-style).

Parity target: `gcl.py:18-64,195-235`: two edge-dropped views → encoder →
2-layer projection head → symmetric InfoNCE on users + items, combined with
BPR on the projected view-1 embeddings and squared-L2 reg.

Encoder note (SURVEY.md §7.3 faithful-vs-fixed): the reference's "conv" stack
is plain ``nn.Linear`` layers that IGNORE the graph (`gcl.py:52-56`).
Published GRACE uses a graph encoder. Default here is LightGCN propagation
over each augmented view (``GCL.encoder='graph'``); set
``GCL.encoder='linear'`` for bug-compatible reference-script behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.augment import dropped_norm_adj
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import info_nce
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.registry import register
from recommendation_tpu.ops.spmm import adj_matmul
from recommendation_tpu.sampling import PairwiseBatch
from recommendation_tpu.ops.rows import take_rows


@register("gcl")
@register("grace_rec")
class GCL(Model):
    name = "gcl"

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(config.get("GCL.num_layers", config.get("n_layers", 2)))
        self.proj_dim = int(config.get("GCL.proj_dim", 64))
        self.ssl_temp = float(config.get("GCL.ssl_temp", 0.2))
        self.drop_edge = float(config.get("GCL.drop_edge", 0.2))
        self.reg_weight = float(config.get("GCL.reg_weight", config.get("reg.lambda", 1e-4)))
        self.encoder_kind = str(config.get("GCL.encoder", "graph"))

    def init(self, rng, graph: DeviceGraph):
        ku, ki, kc, kp1, kp2 = jax.random.split(rng, 5)
        params = {
            "user_emb": self._init_table(ku, graph.n_users, self.emb_size),
            "item_emb": self._init_table(ki, graph.n_items, self.emb_size),
            "proj1": self._init_linear(kp1, self.emb_size, self.proj_dim),
            "proj2": self._init_linear(kp2, self.proj_dim, self.proj_dim),
        }
        if self.encoder_kind == "linear":
            keys = jax.random.split(kc, self.n_layers)
            params["convs"] = [
                self._init_linear(k, self.emb_size, self.emb_size) for k in keys
            ]
        return params, {}

    def _encode(self, params, graph: DeviceGraph, adj):
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        if self.encoder_kind == "linear":
            for layer in params["convs"]:
                x = x @ layer["w"] + layer["b"]
            return x
        acc = x
        for _ in range(self.n_layers):
            x = adj_matmul(adj, x)
            acc = acc + x
        return acc / (self.n_layers + 1)

    def _project(self, params, x):
        h = jax.nn.relu(x @ params["proj1"]["w"] + params["proj1"]["b"])
        return h @ params["proj2"]["w"] + params["proj2"]["b"]

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        k1, k2 = jax.random.split(rng)
        adj1 = dropped_norm_adj(k1, graph, self.drop_edge)
        adj2 = dropped_norm_adj(k2, graph, self.drop_edge)
        z1 = self._project(params, self._encode(params, graph, adj1))
        z2 = self._project(params, self._encode(params, graph, adj2))
        nu = graph.n_users
        u1, i1 = z1[:nu], z1[nu:]
        u2, i2 = z2[:nu], z2[nu:]

        # symmetric InfoNCE = mean of both directions (`gcl.py:28-35`)
        def sym_nce(a, b):
            return (info_nce(a, b, self.ssl_temp) + info_nce(b, a, self.ssl_temp)) / 2.0

        ssl = sym_nce(u1, u2) + sym_nce(i1, i2)

        u_e = take_rows(u1, batch.users)
        p_e = take_rows(i1, batch.pos_items)
        n_e = take_rows(i1, batch.neg_items)
        pos = jnp.sum(u_e * p_e, axis=1)
        neg = jnp.sum(u_e * n_e, axis=1)
        bpr = -jnp.mean(jax.nn.log_sigmoid(pos - neg))
        # squared-L2 reg over batch rows (`gcl.py:224-225`)
        reg = (
            (jnp.sum(u_e ** 2) + jnp.sum(p_e ** 2) + jnp.sum(n_e ** 2))
            / batch.users.shape[0]
        )
        return ssl + bpr + self.reg_weight * reg, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        z = self._encode(params, graph, graph.norm_adj)
        return z[: graph.n_users], z[graph.n_users :]
