"""LightGCN — K-layer normalized propagation + layer-mean readout, BPR/BCE.

Capability parity with `lightgcn.py:12-27,91-118` (PyG LGConv version) and
the ``LGCNEncoder`` clones (`ncl.py:397-422`, `directau.py:269-293`,
`selfcf.py:457-485`). The propagation runs through ``ops.adj_matmul`` (MXU
dense or XLA segment-sum, Pallas-ready) instead of ``torch.sparse.mm``.

Supported config: ``LightGCN.n_layers`` (default 3), ``loss`` in
{'bpr','bce'}, ``n_negs`` multi-negative option (`lightgcn.py:93-104`),
``reg.lambda``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceAdj, DeviceGraph
from recommendation_tpu.losses import bce_loss, bpr_loss, l2_reg_loss, pointwise_bce_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.ops.rows import take_rows
from recommendation_tpu.ops.spmm import adj_matmul
from recommendation_tpu.sampling import PairwiseBatch, sample_negatives, sample_pointwise


def _use_prop_kernel(
    n_users: int, n_items: int, d: int, r_itemsize: int = 2, extra_tables: int = 0
) -> bool:
    """Gate for the fused Pallas propagation kernel — OPT-IN via
    RECTPU_PROP_KERNEL=on (TPU platform only; CPU keeps the XLA chain —
    interpret mode is test-only; shapes must fit the VMEM budget).

    Default OFF since round 4: with the epoch machinery gone, the XLA
    chain beats the monolithic kernel end-to-end on the headline bench
    (24.0M vs 19.4M ex/s, A/B'd both orders, BASELINE.md round-4) — XLA
    overlaps the chain's dots with the step's other work (one-hot grads,
    loss) while a pallas_call is an opaque scheduling unit. The kernel
    remains correct, tested, and reachable for propagation-dominated
    workloads where R̂ re-read traffic is the binding constraint."""
    import os

    if os.environ.get("RECTPU_PROP_KERNEL", "off") != "on":
        return False
    if jax.default_backend() == "cpu":
        return False
    from recommendation_tpu.ops.pallas_prop import chain_supported

    return chain_supported(n_users, n_items, d, r_itemsize, extra_tables)


def lightgcn_propagate(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    norm_adj: DeviceAdj,
    n_layers: int,
    return_layers: bool = False,
    bipartite_dense: jnp.ndarray | None = None,
):
    """K rounds of Â·E with mean-of-layers readout (incl. layer 0).

    When ``bipartite_dense`` (R̂ = D_u^-1/2 R D_i^-1/2, f32[U, I]) is given,
    exploits the block-anti-diagonal structure Â = [[0, R̂], [R̂ᵀ, 0]]:
    each round is two rectangular MXU matmuls touching U·I elements instead
    of the square path's (U+I)² — a >2× FLOP/byte cut, numerically identical
    (tested)."""
    n_users = user_emb.shape[0]
    if bipartite_dense is not None:
        r = bipartite_dense
        if norm_adj.compute_dtype == "bfloat16":
            r = r.astype(jnp.bfloat16)
            if not return_layers and _use_prop_kernel(
                n_users, item_emb.shape[0], user_emb.shape[1]
            ):
                # fused Pallas chain: R̂ stays VMEM-resident across every
                # layer of BOTH passes (XLA re-reads it from HBM per dot —
                # ~12 reads/step at 3 layers). `ops/pallas_prop.py`.
                from recommendation_tpu.ops.pallas_prop import dense_chain_mean

                return dense_chain_mean(r, user_emb, item_emb, n_layers)

            def mm(a, b):
                return jnp.dot(a, b.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

        else:
            if not return_layers and _use_prop_kernel(
                n_users, item_emb.shape[0], user_emb.shape[1], r_itemsize=4
            ):
                # f32 kernel variant (round 4): f32-configured models —
                # DirectAU/SelfCF/BUIR default configs among them — keep the
                # VMEM-resident chain instead of silently losing it
                from recommendation_tpu.ops.pallas_prop import dense_chain_mean

                return dense_chain_mean(r, user_emb, item_emb, n_layers)

            def mm(a, b):
                return jnp.dot(a, b, preferred_element_type=jnp.float32)

        u, i = user_emb, item_emb
        if return_layers:
            layers = [jnp.concatenate([u, i], axis=0)]
            for _ in range(n_layers):
                u, i = mm(r, i), mm(r.T, u)
                layers.append(jnp.concatenate([u, i], axis=0))
            mean = jnp.mean(jnp.stack(layers), axis=0)
            return (mean[:n_users], mean[n_users:], layers)
        # hot path: accumulate the mean instead of materializing the
        # [L+1, N, d] stack (same f32 sum, one buffer)
        acc_u, acc_i = u, i
        for _ in range(n_layers):
            u, i = mm(r, i), mm(r.T, u)
            acc_u, acc_i = acc_u + u, acc_i + i
        inv = 1.0 / (n_layers + 1.0)
        return acc_u * inv, acc_i * inv

    ego = jnp.concatenate([user_emb, item_emb], axis=0)
    if (
        not return_layers
        and norm_adj.backend == "bucketed"
        and norm_adj.pull is not None
        and norm_adj.sym_rowspace
        and norm_adj.pull.node_of_row is not None
    ):
        # permuted-space fused chain: layers stay in concat-row order, the
        # per-layer table reorder disappears in both passes (custom VJP runs
        # the mirrored Horner chain through pull_t) — `graph/bucketed.py::
        # bucketed_chain_mean`
        from recommendation_tpu.graph.bucketed import bucketed_chain_mean

        mean = bucketed_chain_mean(
            n_layers, norm_adj.compute_dtype, norm_adj.pull, norm_adj.pull_t, ego
        )
        return mean[:n_users], mean[n_users:]
    if return_layers:
        layers = [ego]
        for _ in range(n_layers):
            ego = adj_matmul(norm_adj, ego)
            layers.append(ego)
        mean = jnp.mean(jnp.stack(layers), axis=0)
        return (mean[:n_users], mean[n_users:], layers)
    acc = ego
    for _ in range(n_layers):
        ego = adj_matmul(norm_adj, ego)
        acc = acc + ego
    mean = acc / (n_layers + 1.0)
    return mean[:n_users], mean[n_users:]


from recommendation_tpu.models.registry import register


@register("lightgcn")
class LightGCN(Model):
    name = "lightgcn"

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(config.get("LightGCN.n_layers", config.get("n_layers", 3)))
        self.loss_type = str(config.get("loss", "bpr"))
        self.n_negs = int(config.get("n_negs", 1))

    def init(self, rng, graph: DeviceGraph):
        ku, ki = jax.random.split(rng)
        params = {
            "user_emb": self._init_table(ku, graph.n_users, self.emb_size),
            "item_emb": self._init_table(ki, graph.n_items, self.emb_size),
        }
        return params, {}

    def propagate(self, params, graph: DeviceGraph):
        return lightgcn_propagate(
            params["user_emb"], params["item_emb"], graph.norm_adj, self.n_layers,
            bipartite_dense=getattr(graph, "interaction_norm_dense", None),
        )

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        user_all, item_all = self.propagate(params, graph)

        if self.loss_type == "pointwise":
            # DeepRecommender-style labeled-rows path: 1 positive + n_negs
            # y=0 rows per edge (`univariate/diffnet.py:968-991`), BCE over
            # the scores. ``Pointwise.n_negs`` defaults to the reference's 4.
            k = int(self.config.get("Pointwise.n_negs", 4))
            pw = sample_pointwise(rng, graph, batch.users, batch.pos_items,
                                  n_negs=k, weight=batch.weight)
            u = take_rows(user_all, pw.users)
            it = take_rows(item_all, pw.items)
            scores = jnp.sum(u * it, axis=1)
            rank = pointwise_bce_loss(scores, pw.labels, pw.weight)
            reg = l2_reg_loss(self.reg, u, it) / batch.users.shape[0]
            return rank + reg, state

        # take_rows: same gather, MXU one-hot backward instead of a
        # scatter-add (ops/rows.py — measured ~1.5x on the bench step)
        u = take_rows(user_all, batch.users)
        pos = take_rows(item_all, batch.pos_items)

        if self.n_negs > 1:
            # Multi-negative mean composition (`lightgcn.py:93-104`).
            keys = jax.random.split(rng, self.n_negs)
            rank_losses = []
            for k in keys:
                negs = sample_negatives(k, graph, batch.users)
                neg = take_rows(item_all, negs)
                fn = bpr_loss if self.loss_type == "bpr" else bce_loss
                rank_losses.append(fn(u, pos, neg))
            rank = jnp.mean(jnp.stack(rank_losses))
            neg = take_rows(item_all, batch.neg_items)
        else:
            neg = take_rows(item_all, batch.neg_items)
            fn = bpr_loss if self.loss_type == "bpr" else bce_loss
            rank = fn(u, pos, neg)

        reg = l2_reg_loss(self.reg, u, pos, neg) / batch.users.shape[0]
        return rank + reg, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        return self.propagate(params, graph)
