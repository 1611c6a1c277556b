"""NCL — Neighborhood-enriched Contrastive Learning.

Parity target: `ncl.py:282-422`. LightGCN encoder keeping per-layer
embeddings; loss = BPR + structure-contrastive SSL (layer-2k vs layer-0,
full-catalog denominator, summed over the batch — `ncl.py:358-367`)
+ prototype-contrastive ProtoNCE over k-means clusters (`ncl.py:369-375`).

The faiss E-step (`ncl.py:347-356`) becomes on-device JAX k-means
(``ops/kmeans.py``). The reference re-clusters EVERY BATCH (`ncl.py:324` —
SURVEY.md §3 hot loop #4); the cadence is a config knob
``NCL.e_step_cadence`` defaulting to once per epoch, with the faithful
per-batch behavior reachable via ``NCL.e_step_cadence='batch'`` (runs the
Lloyd iterations inside the jitted step on stop-gradient embeddings).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import bpr_loss, info_nce, l2_reg_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.lightgcn import _use_prop_kernel, lightgcn_propagate
from recommendation_tpu.models.registry import register
from recommendation_tpu.ops.kmeans import kmeans, kmeans_minibatch
from recommendation_tpu.sampling import PairwiseBatch


from recommendation_tpu.losses import _l2_normalize as _l2n  # zero-safe gradient
from recommendation_tpu.ops.rows import take_rows


@register("ncl")
class NCL(Model):
    name = "ncl"

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(config.get("NCL.n_layers", 3))
        self.ssl_temp = float(config.get("NCL.tau", 0.1))
        # Default 1e-8: the reference's grid values (1e-5..1e-3,
        # `ncl.py:450`) make the batch-SUMMED layer-contrast term's gradient
        # ~30x the BPR gradient at init and collapse ranking quality on
        # popularity-skewed data (verified formula-exact vs a torch replica
        # — it is the algorithm's sensitivity, not an implementation bug).
        # At 1e-8 the SSL term is a mild positive (leaderboard: 0.5708 vs
        # 0.5704 plain LightGCN). Tune upward per dataset.
        self.ssl_reg = float(config.get("NCL.ssl_reg", 1e-8))
        self.proto_reg = float(config.get("NCL.proto_reg", 1e-7))
        self.hyper_layers = int(config.get("NCL.hyper_layers", 1))
        self.alpha = float(config.get("NCL.alpha", 1.0))
        self.num_clusters = int(config.get("NCL.num_clusters", 100))
        self.kmeans_iters = int(config.get("NCL.kmeans_iters", 10))
        # E-step cadence: an int = every N epochs (fast default), or the
        # string "batch" = re-cluster EVERY BATCH inside the jitted step,
        # which is the reference's faithful behavior (`ncl.py:324` calls
        # e_step() before every ProtoNCE). The faithful mode runs the Lloyd
        # iterations on stop-gradient propagated embeddings in-scan.
        cad = config.get("NCL.e_step_cadence", 1)
        self.e_step_per_batch = str(cad).lower() == "batch"
        self.e_step_cadence = 1 if self.e_step_per_batch else int(cad)
        # tables past this row count cluster with mini-batch k-means
        # (O(batch*K) memory instead of full Lloyd's O(N*K) — DESIGN gap #7);
        # 0 forces mini-batch everywhere, -1 forces full Lloyd everywhere
        self.kmeans_minibatch_above = int(
            config.get("NCL.kmeans_minibatch_above", 131_072)
        )
        self.kmeans_batch = int(config.get("NCL.kmeans_batch", 65_536))

    def _k_for(self, n: int) -> int:
        """k capped at max(2, n//39) (`ncl.py:350-351`)."""
        return min(self.num_clusters, max(2, n // 39))

    def _cluster(self, rng, x, k):
        """Full Lloyd for small tables, mini-batch k-means past the memory
        threshold (both on device, same (centroids, assignments) contract)."""
        thr = self.kmeans_minibatch_above
        if thr >= 0 and x.shape[0] > thr:
            batch = min(self.kmeans_batch, x.shape[0])
            return kmeans_minibatch(rng, x, k, self.kmeans_iters, batch=batch)
        return kmeans(rng, x, k, self.kmeans_iters)

    def init(self, rng, graph: DeviceGraph):
        ku, ki = jax.random.split(rng)
        params = {
            "user_emb": self._init_table(ku, graph.n_users, self.emb_size),
            "item_emb": self._init_table(ki, graph.n_items, self.emb_size),
        }
        ku_k = self._k_for(graph.n_users)
        ki_k = self._k_for(graph.n_items)
        state = {
            "user_centroids": jnp.zeros((ku_k, self.emb_size)),
            "user_2cluster": jnp.zeros((graph.n_users,), jnp.int32),
            "item_centroids": jnp.zeros((ki_k, self.emb_size)),
            "item_2cluster": jnp.zeros((graph.n_items,), jnp.int32),
        }
        return params, state

    def _forward_layers(self, params, graph: DeviceGraph):
        return lightgcn_propagate(
            params["user_emb"], params["item_emb"], graph.norm_adj,
            self.n_layers, return_layers=True,
            bipartite_dense=getattr(graph, "interaction_norm_dense", None),
        )

    def _forward_ctx(self, params, graph: DeviceGraph):
        """(user_all, item_all, initial, context) — what ``loss`` actually
        consumes. On TPU in the dense bipartite regime this routes through
        the fused mean+layer Pallas kernel (`ops/pallas_prop.py::
        dense_chain_mean_layer`), which returns the mean readout and layer
        ``2*hyper_layers`` without materializing the [L+1, N, d] stack;
        elsewhere it falls back to the XLA return_layers path. Both paths
        compute the same values (tests/test_pallas_prop.py)."""
        ctx_idx = min(self.hyper_layers * 2, self.n_layers)
        r = getattr(graph, "interaction_norm_dense", None)
        bf16 = graph.norm_adj.compute_dtype == "bfloat16"
        if (
            r is not None
            and ctx_idx >= 1
            and _use_prop_kernel(
                graph.n_users, graph.n_items, self.emb_size,
                r_itemsize=2 if bf16 else 4, extra_tables=2,
            )
        ):
            from recommendation_tpu.ops.pallas_prop import dense_chain_mean_layer

            if bf16:
                r = r.astype(jnp.bfloat16)
            au, ai, uk, ik = dense_chain_mean_layer(
                r, params["user_emb"], params["item_emb"], self.n_layers, ctx_idx
            )
            initial = jnp.concatenate(
                [params["user_emb"], params["item_emb"]], axis=0
            )
            return au, ai, initial, jnp.concatenate([uk, ik], axis=0)
        user_all, item_all, layers = self._forward_layers(params, graph)
        full_idx = self.hyper_layers * 2
        context = layers[-1] if full_idx >= len(layers) else layers[full_idx]
        return user_all, item_all, layers[0], context

    def epoch_begin(self, params, state, graph: DeviceGraph, rng, epoch: int):
        """E-step: k-means over current mean embeddings (`ncl.py:340-356`),
        every ``NCL.e_step_cadence`` epochs (always at epoch 0). In
        per-batch mode the E-step lives inside ``loss`` instead."""
        if self.e_step_per_batch:
            return state
        if epoch % max(1, self.e_step_cadence) != 0 and epoch > 0:
            return state
        user_all, item_all, _ = self._forward_layers(params, graph)
        k1, k2 = jax.random.split(rng)
        uc, ua = self._cluster(k1, user_all, self._k_for(graph.n_users))
        ic, ia = self._cluster(k2, item_all, self._k_for(graph.n_items))
        return {
            "user_centroids": uc,
            "user_2cluster": ua.astype(jnp.int32),
            "item_centroids": ic,
            "item_2cluster": ia.astype(jnp.int32),
        }

    def _ssl_layer_loss(self, context, initial, users, items, n_users):
        """Layer-contrast InfoNCE with full-catalog denominators, SUMMED over
        the batch (`ncl.py:358-367`)."""
        from recommendation_tpu.ops.pallas_losses import catalog_lse

        cu, ci = context[:n_users], context[n_users:]
        iu, ii = initial[:n_users], initial[n_users:]
        n_cu, n_iu = _l2n(take_rows(cu, users)), _l2n(take_rows(iu, users))
        n_ci, n_ii = _l2n(take_rows(ci, items)), _l2n(take_rows(ii, items))
        pos_u = jnp.sum(n_cu * n_iu, axis=1) / self.ssl_temp
        denom_u = catalog_lse(n_cu, _l2n(iu), self.ssl_temp)
        loss_u = -jnp.sum(pos_u - denom_u)
        pos_i = jnp.sum(n_ci * n_ii, axis=1) / self.ssl_temp
        denom_i = catalog_lse(n_ci, _l2n(ii), self.ssl_temp)
        loss_i = -jnp.sum(pos_i - denom_i)
        return self.ssl_reg * (loss_u + self.alpha * loss_i)

    def _proto_nce(self, state, initial, users, items, n_users, batch_size):
        """InfoNCE against assigned centroids ×B (`ncl.py:369-375`)."""
        user_emb = initial[:n_users]
        item_emb = initial[n_users:]
        u2c = state["user_centroids"][state["user_2cluster"][users]]
        i2c = state["item_centroids"][state["item_2cluster"][items]]
        loss_u = info_nce(take_rows(user_emb, users), u2c, self.ssl_temp) * batch_size
        loss_i = info_nce(take_rows(item_emb, items), i2c, self.ssl_temp) * batch_size
        return self.proto_reg * (loss_u + loss_i)

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        user_all, item_all, initial, context = self._forward_ctx(params, graph)
        users, pos, neg = batch.users, batch.pos_items, batch.neg_items
        rec = bpr_loss(take_rows(user_all, users), take_rows(item_all, pos), take_rows(item_all, neg))
        ssl = self._ssl_layer_loss(context, initial, users, pos, graph.n_users)
        if self.e_step_per_batch:
            # faithful per-batch E-step (`ncl.py:324`): re-cluster the
            # CURRENT propagated embeddings before ProtoNCE. Centroids are
            # data (faiss was non-differentiable), hence stop_gradient.
            k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
            uc, ua = self._cluster(
                k1, jax.lax.stop_gradient(user_all), self._k_for(graph.n_users)
            )
            ic, ia = self._cluster(
                k2, jax.lax.stop_gradient(item_all), self._k_for(graph.n_items)
            )
            state = {
                "user_centroids": uc,
                "user_2cluster": ua.astype(jnp.int32),
                "item_centroids": ic,
                "item_2cluster": ia.astype(jnp.int32),
            }
        proto = self._proto_nce(state, initial, users, pos, graph.n_users, users.shape[0])
        reg = l2_reg_loss(self.reg, take_rows(user_all, users), take_rows(item_all, pos), take_rows(item_all, neg)) / users.shape[0]
        return rec + reg + ssl + proto, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        user_all, item_all, _ = self._forward_layers(params, graph)
        return user_all, item_all
