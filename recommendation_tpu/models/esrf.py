"""ESRF — adversarial social refinement (generator/discriminator GAN).

Parity target: `univariate/esrf.py:1011-1378`. Generator proposes K
alternative neighbors per user via gumbel-softmax over motif-propagated user
similarity, in fixed-size user segments (`esrf.py:1127-1149`, 100 users/step);
Discriminator is a social-aware LightGCN (`esrf.py:1151-1192`, including the
reference's quirk that with social enabled the propagated embeddings are
REPLACED by user+social / item parts). Three training phases by epoch third
(`esrf.py:1220-1359`): BPR pretrain → social training (G frozen) →
adversarial min-max.

Adversarial-phase update rule (``ESRF.alternating_updates``, default True):
the reference alternates two optimizer steps per batch
(`esrf.py:1281-1359`: d_loss.backward(retain_graph=True) → d_step →
g_loss.backward() → g_step). Because the G gradient is taken from the graph
built BEFORE the D step, both gradients are evaluated at the pre-update
point — exactly what one combined step computes when the two objectives are
partitioned by parameter group. The faithful mode therefore reproduces the
reference's stop-gradient placement: the D objective flows through the
friend embeddings (`esrf.py:1300-1302` has no detach), and the G objective
flows through the whole discriminator forward with the D *parameters*
frozen. ``alternating_updates=False`` selects the simpler variant that
freezes D *outputs* in the G objective. G's 5× learning rate is honored via
an optax.multi_transform partition. The unused ``projection_head``
parameter (`esrf.py:1110`) is not carried.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.registry import register
from recommendation_tpu.ops.spmm import adj_matmul
from recommendation_tpu.sampling import PairwiseBatch


from recommendation_tpu.losses import _l2_normalize as _l2n  # zero-safe gradient
from recommendation_tpu.losses import safe_frobenius_norm
from recommendation_tpu.ops.rows import take_rows


def gumbel_softmax(rng, logits, temperature=0.2, eps=1e-10):
    u = jax.random.uniform(rng, logits.shape)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    y = jnp.log(jnp.maximum(logits, 0.0) + eps) + g
    return jax.nn.softmax(y / temperature, axis=-1)


@register("esrf")
class ESRF(Model):
    name = "esrf"

    def __init__(self, config):
        super().__init__(config)
        self.K = int(config.get("ESRF.K", 10))
        self.beta = float(config.get("ESRF.beta", 0.1))
        self.n_layers_g = int(config.get("ESRF.n_layers_G", 2))
        self.n_layers_d = int(config.get("ESRF.n_layer", config.get("n_layers", 2)))
        self.segment = int(config.get("ESRF.segment", 100))
        self.max_epoch = int(config.get("max.epoch", 30))
        self.reg_u = float(config.get("reg.lambda", 1e-4))
        self.alternating = bool(config.get("ESRF.alternating_updates", True))

    def make_optimizer(self, config):
        lr = float(config.get("learning.rate", 1e-3))
        return optax.multi_transform(
            {"d": optax.adam(lr), "g": optax.adam(lr * 5.0)},
            param_labels={"d": "d", "g": "g"},
        )

    def init(self, rng, graph: DeviceGraph):
        if not hasattr(graph, "esrf_motif"):
            raise ValueError("ESRF requires a SocialDeviceGraph (social side data)")
        kd1, kd2, kg1, kg2 = jax.random.split(rng, 4)
        d = self.emb_size
        params = {
            "d": {
                "user_emb": 0.01 * jax.random.normal(kd1, (graph.n_users, d)),
                "item_emb": 0.01 * jax.random.normal(kd2, (graph.n_items, d)),
            },
            "g": {
                "relation_emb": 0.005 * jax.random.normal(kg1, (graph.n_users, d)),
                "c_selector": 0.005 * jax.random.normal(kg2, (self.K, graph.n_users)),
            },
        }
        return params, {"phase": jnp.zeros((), jnp.int32)}

    def epoch_begin(self, params, state, graph, rng, epoch: int):
        third = max(1, self.max_epoch // 3)
        return {"phase": jnp.asarray(min(epoch // third, 2), jnp.int32)}

    # -- generator ------------------------------------------------------------

    def _generator(self, g_params, graph: DeviceGraph, rng):
        """Alternative neighborhood for a random user segment
        (`esrf.py:1137-1160`)."""
        k_seg, k_gum = jax.random.split(rng)
        emb = g_params["relation_emb"]
        acc = emb
        cur = emb
        for _ in range(self.n_layers_g):
            cur = adj_matmul(graph.esrf_motif, cur)
            acc = acc + _l2n(cur)
        user_embeddings = acc / (self.n_layers_g + 1)

        seg = min(self.segment, graph.n_users)
        start = jax.random.randint(k_seg, (), 0, max(1, graph.n_users - seg + 1))
        seg_emb = jax.lax.dynamic_slice_in_dim(user_embeddings, start, seg, axis=0)
        feats = seg_emb @ user_embeddings.T  # [seg, n_users]
        alpha = feats[:, None, :] * g_params["c_selector"][None, :, :]  # [seg, K, n_u]
        multi_hot = jnp.sum(gumbel_softmax(k_gum, alpha), axis=1)  # [seg, n_u]
        alt = jnp.zeros((graph.n_users, graph.n_users))
        return jax.lax.dynamic_update_slice_in_dim(alt, multi_hot, start, axis=0)

    # -- discriminator --------------------------------------------------------

    def _discriminator(self, d_params, graph: DeviceGraph, alt, is_social: bool):
        ego = jnp.concatenate([d_params["user_emb"], d_params["item_emb"]], axis=0)
        acc = ego
        for _ in range(self.n_layers_d):
            if is_social:
                # reference quirk: replaces propagation with user+social
                # (`esrf.py:1184-1192`)
                social = (alt @ ego[: graph.n_users]) / self.K
                ego = jnp.concatenate(
                    [ego[: graph.n_users] + social, ego[graph.n_users :]], axis=0
                )
            else:
                ego = adj_matmul(graph.norm_adj, ego)
            acc = acc + _l2n(ego)
        return acc[: graph.n_users], acc[graph.n_users :]

    # -- losses ---------------------------------------------------------------

    def _bpr_sum(self, u, pos, neg):
        y = jnp.sum(u * pos, axis=1) - jnp.sum(u * neg, axis=1)
        pairwise = -jnp.sum(jnp.log(jax.nn.sigmoid(y) + 1e-10))
        reg = self.reg_u * (
            safe_frobenius_norm(u) + safe_frobenius_norm(pos) + safe_frobenius_norm(neg)
        )
        return pairwise + reg

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        k_gen, _ = jax.random.split(rng)

        def phase0(_):
            alt = jnp.zeros((graph.n_users, graph.n_users))
            ue, ie = self._discriminator(params["d"], graph, alt, is_social=False)
            return self._bpr_sum(
                take_rows(ue, batch.users), take_rows(ie, batch.pos_items), take_rows(ie, batch.neg_items)
            )

        def phase1(_):
            alt = jax.lax.stop_gradient(self._generator(params["g"], graph, k_gen))
            ue, ie = self._discriminator(params["d"], graph, alt, is_social=True)
            return self._bpr_sum(
                take_rows(ue, batch.users), take_rows(ie, batch.pos_items), take_rows(ie, batch.neg_items)
            )

        def phase2(_):
            alt = self._generator(params["g"], graph, k_gen)
            alt_stop = jax.lax.stop_gradient(alt)
            # D objective: alt frozen
            ue, ie = self._discriminator(params["d"], graph, alt_stop, is_social=True)
            u = take_rows(ue, batch.users)
            pos = take_rows(ie, batch.pos_items)
            neg = take_rows(ie, batch.neg_items)
            y_ui = jnp.sum(u * pos, axis=1)
            friends = (alt_stop[batch.users] @ ue) / self.K
            if self.alternating:
                # faithful (`esrf.py:1299-1309`): no detach on the friend
                # embeddings — D's adversarial term shapes its own
                # embeddings through y_vi as well
                y_vi_d = jnp.sum(friends * pos, axis=1)
            else:
                y_vi_d = jnp.sum(jax.lax.stop_gradient(friends) * pos, axis=1)
            d_loss = self._bpr_sum(u, pos, neg) + self.beta * (
                -jnp.sum(jnp.log(jax.nn.sigmoid(y_ui - y_vi_d) + 1e-10))
            )
            if self.alternating:
                # faithful G objective (`esrf.py:1310-1314`): gradient flows
                # to G through the WHOLE discriminator forward (y_ui and
                # y_vi both depend on alt), with the D parameters frozen —
                # the torch two-step evaluates both gradients at this same
                # pre-update point (retain_graph before d_step).
                d_frozen = jax.lax.stop_gradient(params["d"])
                ue_g, ie_g = self._discriminator(d_frozen, graph, alt, is_social=True)
                u_g = take_rows(ue_g, batch.users)
                pos_g = take_rows(ie_g, batch.pos_items)
                y_ui_g = jnp.sum(u_g * pos_g, axis=1)
                friends_g = (alt[batch.users] @ ue_g) / self.K
                y_vi_g = jnp.sum(friends_g * pos_g, axis=1)
            else:
                # simpler variant: D outputs frozen (only the direct
                # alt-path reaches G)
                y_ui_g = jax.lax.stop_gradient(y_ui)
                friends_g = (alt[batch.users] @ jax.lax.stop_gradient(ue)) / self.K
                y_vi_g = jnp.sum(friends_g * jax.lax.stop_gradient(pos), axis=1)
            g_loss = self.beta * (
                -jnp.sum(jnp.log(jax.nn.sigmoid(y_vi_g - y_ui_g) + 1e-10))
            )
            return d_loss + g_loss

        total = jax.lax.switch(state["phase"], [phase0, phase1, phase2], None)
        return total, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        alt = jnp.zeros((graph.n_users, graph.n_users))
        return self._discriminator(params["d"], graph, alt, is_social=False)
