"""SEPT — Socially-aware self-supervised tri-view co-training.

Parity targets:
  * full SEPT (`univariate/sept_social.py:333-488`): rec view (LightGCN on
    norm_adj), friend + sharing social views from bidirectional motifs,
    tri-view pseudo-label co-training (label_prediction → top-ins_cnt pseudo
    positives → neighbor-discrimination InfoNCE at τ=0.1), SSL after a
    warm-up of maxEpoch/3; per-epoch edge-dropped augmented adjacency.
  * "sept_basic" (`univariate/sept.py:198-260`): the social-free variant —
    LightGCN on an edge-dropped adjacency with plain BPR.

Divergences (documented, SURVEY.md §7.3):
  * the reference restricts SSL terms to ``torch.unique(u_idx)`` (dynamic
    shape); here all batch occurrences participate — repeated users weigh
    proportionally to their batch frequency, shapes stay static under jit;
  * warm-up gating is a 0/1 state flag multiplied into the SSL term, so one
    compiled epoch program serves both phases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.augment import edge_keep_mask
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import bpr_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.registry import register
from recommendation_tpu.ops.spmm import adj_matmul
from recommendation_tpu.sampling import PairwiseBatch


from recommendation_tpu.losses import _l2_normalize as _l2n  # zero-safe gradient
from recommendation_tpu.ops.rows import take_rows


def sept_encoder(emb, adj, n_layers, readout: str = "sum"):
    """Propagation with per-layer L2 normalization. Readout over layers incl.
    layer 0: SUM for the full social SEPT (`sept_social.py:370-377`), MEAN
    for the simplified script (`sept.py:220-226`)."""
    acc = emb
    for _ in range(n_layers):
        emb = adj_matmul(adj, emb)
        emb = _l2n(emb)
        acc = acc + emb
    if readout == "mean":
        return acc / (n_layers + 1)
    return acc


@register("sept")
@register("sept_social")
class SEPT(Model):
    name = "sept"

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(config.get("SEPT.n_layer", config.get("n_layers", 2)))
        self.ss_rate = float(config.get("SEPT.ss_rate", 0.005))
        self.drop_rate = float(config.get("SEPT.drop_rate", 0.3))
        self.instance_cnt = int(config.get("SEPT.ins_cnt", 10))
        self.warmup_fraction = float(config.get("SEPT.warmup_fraction", 1.0 / 3.0))
        self.max_epoch = int(config.get("max.epoch", 30))
        self.ssl_tau = float(config.get("SEPT.tau", 0.1))

    def init(self, rng, graph: DeviceGraph):
        if not hasattr(graph, "sept_friend"):
            raise ValueError("SEPT requires a SocialDeviceGraph (social side data)")
        ku, ki = jax.random.split(rng)
        params = {
            "user_emb": self._init_table(ku, graph.n_users, self.emb_size),
            "item_emb": self._init_table(ki, graph.n_items, self.emb_size),
        }
        state = {
            "aug_keep": jnp.ones_like(graph.edge_valid),
            "ssl_on": jnp.zeros(()),
        }
        return params, state

    def epoch_begin(self, params, state, graph: DeviceGraph, rng, epoch: int):
        """After warm-up: fresh edge-dropped adjacency mask + enable SSL
        (`sept_social.py:425-429`)."""
        if epoch > self.max_epoch * self.warmup_fraction:
            return {
                "aug_keep": edge_keep_mask(rng, graph, self.drop_rate),
                "ssl_on": jnp.ones(()),
            }
        return {"aug_keep": jnp.ones_like(graph.edge_valid), "ssl_on": jnp.zeros(())}

    def _views(self, params, state, graph):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        rec = sept_encoder(ego, graph.norm_adj, self.n_layers)
        aug_adj = graph.normalized_bipartite(state["aug_keep"])
        aug = sept_encoder(ego, aug_adj, self.n_layers)
        friend = sept_encoder(params["user_emb"], graph.sept_friend, self.n_layers)
        sharing = sept_encoder(params["user_emb"], graph.sept_sharing, self.n_layers)
        nu = graph.n_users
        return rec[:nu], rec[nu:], aug[:nu], friend, sharing

    def _label_prediction(self, emb, aug_users):
        """softmax(norm(emb) @ norm(aug)ᵀ) over batch users
        (`sept_social.py:394-399`)."""
        return jax.nn.softmax(_l2n(emb) @ _l2n(aug_users).T, axis=1)

    def _neighbor_discrimination(self, positive_idx, emb, aug_users):
        """-Σ log(Σ_pos exp(s/τ) / Σ_all exp(s/τ))  (`sept_social.py:408-420`)."""
        emb_n = _l2n(emb)
        aug_n = _l2n(aug_users)
        pos_emb = aug_n[positive_idx]  # [B, ins_cnt, d]
        pos = jnp.einsum("bd,bkd->bk", emb_n, pos_emb)
        ttl = emb_n @ aug_n.T
        pos_score = jnp.sum(jnp.exp(pos / self.ssl_tau), axis=1)
        ttl_score = jnp.sum(jnp.exp(ttl / self.ssl_tau), axis=1)
        return -jnp.sum(jnp.log(pos_score / ttl_score + 1e-12))

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        rec_u, rec_i, aug_u, friend, sharing = self._views(params, state, graph)
        users = batch.users
        rec = bpr_loss(take_rows(rec_u, users), take_rows(rec_i, batch.pos_items), take_rows(rec_i, batch.neg_items))
        rec = rec + self.reg * (
            jnp.sum(params["user_emb"] ** 2) + jnp.sum(params["item_emb"] ** 2)
        )

        # tri-view pseudo-label SSL over the batch users
        aug_b = take_rows(aug_u, users)
        f_prob = self._label_prediction(take_rows(friend, users), aug_b)
        s_prob = self._label_prediction(take_rows(sharing, users), aug_b)
        r_prob = self._label_prediction(take_rows(rec_u, users), aug_b)
        k = min(self.instance_cnt, users.shape[0])

        def pseudo(p1, p2):
            return jax.lax.top_k((p1 + p2) / 2.0, k)[1]

        ssl = (
            self._neighbor_discrimination(pseudo(s_prob, r_prob), take_rows(friend, users), aug_b)
            + self._neighbor_discrimination(pseudo(f_prob, r_prob), take_rows(sharing, users), aug_b)
            + self._neighbor_discrimination(pseudo(f_prob, s_prob), take_rows(rec_u, users), aug_b)
        )
        total = rec + state["ssl_on"] * self.ss_rate * ssl
        return total, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        rec = sept_encoder(ego, graph.norm_adj, self.n_layers)
        return rec[: graph.n_users], rec[graph.n_users :]


@register("sept_basic")
class SEPTBasic(Model):
    """The social-free `univariate/sept.py` variant: LightGCN encoder on a
    per-epoch edge-dropped adjacency, plain BPR + full-table L2."""

    name = "sept_basic"

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(config.get("SEPT.n_layer", config.get("n_layers", 2)))
        self.drop_rate = float(config.get("SEPT.drop_rate", 0.3))

    def init(self, rng, graph: DeviceGraph):
        ku, ki = jax.random.split(rng)
        params = {
            "user_emb": self._init_table(ku, graph.n_users, self.emb_size),
            "item_emb": self._init_table(ki, graph.n_items, self.emb_size),
        }
        return params, {"aug_keep": jnp.ones_like(graph.edge_valid)}

    def epoch_begin(self, params, state, graph, rng, epoch):
        return {"aug_keep": edge_keep_mask(rng, graph, self.drop_rate)}

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        adj = graph.normalized_bipartite(state["aug_keep"])
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        out = sept_encoder(ego, adj, self.n_layers, readout="mean")
        u, i = out[: graph.n_users], out[graph.n_users :]
        ue, ie, je = take_rows(u, batch.users), take_rows(i, batch.pos_items), take_rows(i, batch.neg_items)
        loss = bpr_loss(ue, ie, je)
        # batch-row squared-norm reg / 2 (`sept.py:242-243`)
        loss = loss + self.reg * (
            jnp.sum(ue ** 2) + jnp.sum(ie ** 2) + jnp.sum(je ** 2)
        ) / 2.0
        return loss, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        out = sept_encoder(ego, graph.norm_adj, self.n_layers, readout="mean")
        return out[: graph.n_users], out[graph.n_users :]
