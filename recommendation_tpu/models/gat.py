"""GAT recommender — 2-layer multi-head graph attention over the bipartite
graph.

Parity target: `gat.py:14-40`: learned id embeddings → dropout → GATConv
(heads, attention dropout, LeakyReLU negative slope) → ELU → dropout →
GATConv (1 head) → split user/item; BPR loss.

The per-edge attention softmax (torch_scatter CUDA in PyG) runs as the
``segment_softmax`` TPU primitive (SURVEY.md §2.4 row 2): per-edge logits
e_ij = LeakyReLU(aₛᵀWx_src + a_dᵀWx_dst), normalized over each destination's
incoming edges, with attention-weight dropout.

On the bucketed large-graph backend the softmax is a dense masked reduce
along each bucket's cap axis and training runs through
``gat_layer_bucketed_sf``'s custom VJP, in which every reverse flow is a
gather (round-3; see `_attention_pull`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import bpr_loss, l2_reg_loss
from recommendation_tpu.models.base import Model
from recommendation_tpu.models.graphsage import bidirectional_edges
from recommendation_tpu.models.registry import register
from recommendation_tpu.sampling import PairwiseBatch
from recommendation_tpu.ops.rows import take_rows


def gat_layer(
    x, src, dst, mask, n_nodes, w, a_src, a_dst, heads, neg_slope, rng, att_drop
):
    """Multi-head GAT conv. x: [N, d_in]; w: [d_in, H*d]; a_*: [H, d].
    Returns [N, H*d] (concat heads)."""
    d = a_src.shape[1]
    h = (x @ w).reshape(-1, heads, d)  # [N, H, d]
    alpha_src = jnp.einsum("nhd,hd->nh", h, a_src)  # [N, H]
    alpha_dst = jnp.einsum("nhd,hd->nh", h, a_dst)
    e = jax.nn.leaky_relu(alpha_src[src] + alpha_dst[dst], neg_slope)  # [E, H]
    e = jnp.where(mask[:, None] > 0, e, -jnp.inf)

    # segment softmax over destination, per head
    seg_max = jax.ops.segment_max(e, dst, num_segments=n_nodes)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    exp = jnp.where(mask[:, None] > 0, jnp.exp(e - seg_max[dst]), 0.0)
    denom = jax.ops.segment_sum(exp, dst, num_segments=n_nodes)
    att = exp / (denom[dst] + 1e-16)  # [E, H]

    if rng is not None and att_drop > 0:
        keep = jax.random.bernoulli(rng, 1.0 - att_drop, att.shape)
        att = jnp.where(keep, att / (1.0 - att_drop), 0.0)

    msgs = h[src] * att[:, :, None]  # [E, H, d]
    out = jax.ops.segment_sum(msgs, dst, num_segments=n_nodes)
    return out.reshape(n_nodes, heads * d)


def bucketed_row_nodes(csr, n_nodes):
    """Node id per concat row of the bucketed tables (inverse of
    gather_pos; degree-0 nodes collide harmlessly on the trailing zeros
    row). Static graph structure — compute once per forward."""
    total_rows = sum(int(b.idx.shape[0]) for b in csr.buckets)
    return jnp.zeros((total_rows + 1,), jnp.int32).at[csr.gather_pos].set(
        jnp.arange(n_nodes, dtype=jnp.int32)
    )


def _real_slots(b):
    """bool[nb, cap]: slots holding a REAL edge — non-padding (edge >= 0)
    whose COO entry has a nonzero value (from_scipy pads the COO with
    zero-valued entries that carry valid edge ids)."""
    return (b.edge >= 0) & (b.val != 0)


def _bucket_attention(csr, row_nodes, alpha_src, alpha_dst, neg_slope):
    """Pre-dropout attention per bucket: list of [nb, cap, H] softmax
    weights (zero on padding slots), a function of the alphas only — h does
    not enter until the message aggregation. Shared by the custom-VJP
    forward and its backward recomputation."""
    atts = []
    off_r = 0
    for b in csr.buckets:
        nb = b.idx.shape[0]
        dstn = row_nodes[off_r:off_r + nb]
        off_r += nb
        z = alpha_src[b.idx] + alpha_dst[dstn][:, None, :]  # [nb, cap, H]
        e = jax.nn.leaky_relu(z, neg_slope)
        real = _real_slots(b)[:, :, None]
        e = jnp.where(real, e, -jnp.inf)
        m = jnp.max(e, axis=1, keepdims=True)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        ex = jnp.where(real, jnp.exp(e - m), 0.0)
        atts.append(ex / (jnp.sum(ex, axis=1, keepdims=True) + 1e-16))
    return atts


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _attention_pull(neg_slope, drop_scale, csr, csr_t, aux, h, alpha_src, alpha_dst, keep):
    """Scatter-free attention aggregation: out[n] = Σ_s att·h[neighbors(n)]
    over the bucketed tables, with a custom VJP in which EVERY reverse flow
    is a gather (VERDICT-r2 item 3; design from the round-2 docstring):

      * ∂h  (message path)   = Aᵀ_att @ g   — pulled through the transpose
        tables ``csr_t``, whose per-slot attention weights are GATHERED from
        the forward layout by edge id (``aux['pos_map']``), never scattered;
      * ∂α_src               = Aᵀ @ dz      — same transpose pull over the
        logit cotangents;
      * ∂α_dst               = row-sum of dz restored via ``gather_pos`` —
        the same 1:1 gather the forward output uses.

    ``keep`` is an optional f32[total_slots, H] dropout mask (None = no
    attention dropout); ``drop_scale`` its 1/(1-p) rescale. ``aux`` carries
    the static slot maps from ``graph.bucketed.slot_maps``."""
    atts = _bucket_attention(csr, aux["node_of_row"], alpha_src, alpha_dst, neg_slope)
    outs = []
    off_s = 0
    heads = alpha_src.shape[1]
    for b, att in zip(csr.buckets, atts):
        nb, cap = b.idx.shape
        if keep is not None:
            att = att * keep[off_s:off_s + nb * cap].reshape(nb, cap, heads) * drop_scale
        off_s += nb * cap
        outs.append(jnp.einsum("nch,nchd->nhd", att, h[b.idx]))
    zero = jnp.zeros((1,) + outs[0].shape[1:], outs[0].dtype)
    return jnp.concatenate(outs + [zero], axis=0)[csr.gather_pos]  # [N, H, d]


def _attention_pull_fwd(neg_slope, drop_scale, csr, csr_t, aux, h, alpha_src, alpha_dst, keep):
    out = _attention_pull(neg_slope, drop_scale, csr, csr_t, aux, h, alpha_src, alpha_dst, keep)
    return out, (csr, csr_t, aux, h, alpha_src, alpha_dst, keep)


def _attention_pull_bwd(neg_slope, drop_scale, res, g):
    csr, csr_t, aux, h, alpha_src, alpha_dst, keep = res
    heads, d = h.shape[1], h.shape[2]
    row_nodes = aux["node_of_row"]
    atts = _bucket_attention(csr, row_nodes, alpha_src, alpha_dst, neg_slope)

    # ---- forward-layout pass: per-slot cotangents, all dense per bucket --
    dz_parts, attd_parts, dadst_rows = [], [], []
    off_r, off_s = 0, 0
    for b, att in zip(csr.buckets, atts):
        nb, cap = b.idx.shape
        dstn = row_nodes[off_r:off_r + nb]
        off_r += nb
        kb = None
        if keep is not None:
            kb = keep[off_s:off_s + nb * cap].reshape(nb, cap, heads) * drop_scale
        off_s += nb * cap
        gb = g[dstn]  # [nb, H, d] — 1:1 gather (the VJP of out = concat[gather_pos])
        hb = h[b.idx]  # [nb, cap, H, d] recomputed gather
        datt_d = jnp.einsum("nhd,nchd->nch", gb, hb)
        datt = datt_d if kb is None else datt_d * kb
        att_d = att if kb is None else att * kb
        # softmax backward along the cap axis (padding slots: att == 0 ⇒ 0)
        de = att * (datt - jnp.sum(att * datt, axis=1, keepdims=True))
        z = alpha_src[b.idx] + alpha_dst[dstn][:, None, :]
        real = _real_slots(b)[:, :, None]
        dz = jnp.where(real, de * jnp.where(z >= 0, 1.0, neg_slope), 0.0)
        dadst_rows.append(jnp.sum(dz, axis=1))  # [nb, H]
        dz_parts.append(dz.reshape(nb * cap, heads))
        attd_parts.append(att_d.reshape(nb * cap, heads))
    dz_flat = jnp.concatenate(dz_parts, axis=0)  # [S, H]
    attd_flat = jnp.concatenate(attd_parts, axis=0)  # [S, H]
    zero_h = jnp.zeros((1, heads), dz_flat.dtype)
    dalpha_dst = jnp.concatenate(dadst_rows + [zero_h], axis=0)[csr.gather_pos]

    # ---- transpose-layout pass: everything arrives by edge-id gather ------
    # Round-5 narrow-gather cuts (the per-pull ablation behind the 2.77x
    # fwd+bwd ratio, tools/probe_gat_pulls.py): (a) the forward-slot position
    # of each transpose slot is STATIC — prebuilt on host (aux['tpos']) so the
    # per-step pos_map[bt.edge] per-slot gather disappears; (b) attd and dz
    # ride ONE fused [S, 2H] row gather instead of two [S, H] gathers;
    # (c) g[slot_node[p]] == g[bt.idx] by the definition of a transpose (a
    # transpose slot's source node IS its edge's forward destination), which
    # drops the slot_node double indirection and makes the row gather direct.
    pos_map = aux["pos_map"]
    tpos = aux.get("tpos")
    both_flat = jnp.concatenate([attd_flat, dz_flat], axis=1)  # [S, 2H]
    dh_rows, dasrc_rows = [], []
    for i, bt in enumerate(csr_t.buckets):
        validt = _real_slots(bt)[:, :, None]
        p = tpos[i] if tpos is not None else pos_map[jnp.maximum(bt.edge, 0)]
        bp = jnp.where(validt, both_flat[p], 0.0)  # [nbt, capt, 2H]
        av = bp[..., :heads]
        gsl = g[bt.idx]  # [nbt, capt, H, d] — cotangent of each edge's dst
        dh_rows.append(jnp.einsum("nch,nchd->nhd", av, gsl))
        dasrc_rows.append(jnp.sum(bp[..., heads:], axis=1))
    zero_hd = jnp.zeros((1, heads, d), dz_flat.dtype)
    dh = jnp.concatenate(dh_rows + [zero_hd], axis=0)[csr_t.gather_pos]
    dalpha_src = jnp.concatenate(dasrc_rows + [zero_h], axis=0)[csr_t.gather_pos]

    from recommendation_tpu.graph.bucketed import _float0_zeros

    return (
        _float0_zeros(csr),
        _float0_zeros(csr_t),
        _float0_zeros(aux),
        dh,
        dalpha_src,
        dalpha_dst,
        None if keep is None else jnp.zeros_like(keep),
    )


_attention_pull.defvjp(_attention_pull_fwd, _attention_pull_bwd)


def gat_layer_bucketed_sf(
    x, csr, csr_t, aux, n_nodes, w, a_src, a_dst, heads, neg_slope, rng, att_drop
):
    """Scatter-free bucketed GAT conv: the projection/logit math runs under
    normal autodiff (dense), aggregation goes through ``_attention_pull``'s
    gather-only custom VJP. Numerics match :func:`gat_layer` (tested)."""
    d = a_src.shape[1]
    h = (x @ w).reshape(-1, heads, d)  # [N, H, d]
    alpha_src = jnp.einsum("nhd,hd->nh", h, a_src)
    alpha_dst = jnp.einsum("nhd,hd->nh", h, a_dst)
    keep = None
    drop_scale = 1.0
    if rng is not None and att_drop > 0:
        total_slots = sum(int(b.idx.shape[0]) * b.cap for b in csr.buckets)
        keep = jax.random.bernoulli(
            rng, 1.0 - att_drop, (total_slots, heads)
        ).astype(jnp.float32)
        drop_scale = 1.0 / (1.0 - att_drop)
    out = _attention_pull(
        neg_slope, drop_scale, csr, csr_t, aux, h, alpha_src, alpha_dst, keep
    )
    return out.reshape(n_nodes, heads * d)


def gat_layer_bucketed(x, csr, row_nodes, n_nodes, w, a_src, a_dst, heads, neg_slope, rng, att_drop):
    """Multi-head GAT conv over the bucketed pull tables (`graph/bucketed.py`)
    — the large-graph attention path. The per-destination softmax becomes a
    DENSE masked softmax along each bucket's cap axis (padding slots carry
    ``edge == -1``), so the forward pass is gather-only: no segment_max /
    segment_sum over edges. Under plain autodiff the backward emits a
    scatter; the training path uses :func:`gat_layer_bucketed_sf` (custom
    gather-only VJP) — this variant remains as the oracle it is tested
    against and the fallback when no transpose tables exist."""
    d = a_src.shape[1]
    h = (x @ w).reshape(-1, heads, d)  # [N, H, d]
    alpha_src = jnp.einsum("nhd,hd->nh", h, a_src)  # [N, H]
    alpha_dst = jnp.einsum("nhd,hd->nh", h, a_dst)

    outs = []
    off = 0
    if rng is not None and att_drop > 0:
        drop_keys = jax.random.split(rng, len(csr.buckets))
    for bi, b in enumerate(csr.buckets):
        nb = int(b.idx.shape[0])
        dst_rows = row_nodes[off:off + nb]  # node id per bucket row
        off += nb
        e = jax.nn.leaky_relu(
            alpha_src[b.idx] + alpha_dst[dst_rows][:, None, :], neg_slope
        )  # [nb, cap, H]
        # a REAL neighbor is a non-padding SLOT (edge >= 0) whose COO entry
        # is a real edge (val != 0 — from_scipy pads the COO with
        # zero-valued entries that carry valid edge ids; normalized real
        # edges are strictly positive)
        real = ((b.edge >= 0) & (b.val != 0))[:, :, None]
        e = jnp.where(real, e, -jnp.inf)
        e_max = jnp.max(e, axis=1, keepdims=True)
        e_max = jnp.where(jnp.isfinite(e_max), e_max, 0.0)
        ex = jnp.where(real, jnp.exp(e - e_max), 0.0)
        att = ex / (jnp.sum(ex, axis=1, keepdims=True) + 1e-16)  # [nb, cap, H]
        if rng is not None and att_drop > 0:
            keep = jax.random.bernoulli(drop_keys[bi], 1.0 - att_drop, att.shape)
            att = jnp.where(keep, att / (1.0 - att_drop), 0.0)
        msgs = h[b.idx] * att[:, :, :, None]  # [nb, cap, H, d]
        outs.append(jnp.sum(msgs, axis=1))  # [nb, H, d]
    zero = jnp.zeros((1, heads, d), jnp.float32)
    concat = jnp.concatenate(outs + [zero], axis=0)
    return concat[csr.gather_pos].reshape(n_nodes, heads * d)


@register("gat")
class GAT(Model):
    name = "gat"

    def __init__(self, config):
        super().__init__(config)
        self.heads = int(config.get("GAT.num_heads", 4))
        self.hidden = int(config.get("GAT.hidden", 64))
        self.dropout = float(config.get("GAT.dropout", 0.2))
        self.edge_dropout = float(config.get("GAT.edge_dropout", 0.2))
        self.neg_slope = float(config.get("GAT.neg_slope", 0.2))

    def init(self, rng, graph: DeviceGraph):
        ku, ki, kw1, ka1, kb1, kw2, ka2, kb2 = jax.random.split(rng, 8)
        d_in, h, heads, d_out = self.emb_size, self.hidden, self.heads, self.emb_size

        def glorot(key, shape):
            limit = jnp.sqrt(6.0 / (shape[0] + shape[-1]))
            return jax.random.uniform(key, shape, jnp.float32, -limit, limit)

        params = {
            "user_emb": self._init_table(ku, graph.n_users, d_in),
            "item_emb": self._init_table(ki, graph.n_items, d_in),
            "gat1": {
                "w": glorot(kw1, (d_in, heads * h)),
                "a_src": glorot(ka1, (heads, h)),
                "a_dst": glorot(kb1, (heads, h)),
            },
            "gat2": {
                "w": glorot(kw2, (heads * h, d_out)),
                "a_src": glorot(ka2, (1, d_out)),
                "a_dst": glorot(kb2, (1, d_out)),
            },
        }
        # static slot maps for the scatter-free attention VJP — host-built
        # once here (init runs outside jit) and cached ON THE GRAPH (a
        # pytree child, not model state: O(E) derivable index data must not
        # land in checkpoints — review finding, round 3)
        graph.ensure_gat_aux()
        return params, {}

    def _forward(self, params, graph: DeviceGraph, rng=None):
        adj = graph.norm_adj
        att_aux = getattr(graph, "gat_aux", None)
        bucketed = adj.backend == "bucketed" and adj.pull is not None
        if not bucketed:
            src, dst, mask = bidirectional_edges(graph)
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)

        def maybe_dropout(key, t):
            if key is None or self.dropout <= 0:
                return t
            keep = jax.random.bernoulli(key, 1.0 - self.dropout, t.shape)
            return jnp.where(keep, t / (1.0 - self.dropout), 0.0)

        scatter_free = bucketed and att_aux is not None and adj.pull_t is not None
        row_nodes = (
            bucketed_row_nodes(adj.pull, graph.n_nodes)
            if bucketed and not scatter_free
            else None
        )

        def layer(x, p, heads, key):
            drop = self.edge_dropout if rng is not None else 0.0
            if scatter_free:
                return gat_layer_bucketed_sf(
                    x, adj.pull, adj.pull_t, att_aux, graph.n_nodes,
                    p["w"], p["a_src"], p["a_dst"], heads, self.neg_slope, key, drop,
                )
            if bucketed:
                return gat_layer_bucketed(
                    x, adj.pull, row_nodes, graph.n_nodes,
                    p["w"], p["a_src"], p["a_dst"], heads, self.neg_slope, key, drop,
                )
            return gat_layer(
                x, src, dst, mask, graph.n_nodes,
                p["w"], p["a_src"], p["a_dst"], heads, self.neg_slope, key, drop,
            )

        k1 = k2 = k3 = k4 = None
        if rng is not None:
            k1, k2, k3, k4 = jax.random.split(rng, 4)
        x = maybe_dropout(k1, x)
        x = layer(x, params["gat1"], self.heads, k2)
        x = jax.nn.elu(x)
        x = maybe_dropout(k3, x)
        x = layer(x, params["gat2"], 1, k4)
        return x[: graph.n_users], x[graph.n_users :]

    def loss(self, params, state, batch: PairwiseBatch, graph: DeviceGraph, rng):
        user_all, item_all = self._forward(params, graph, rng)
        u = take_rows(user_all, batch.users)
        pos = take_rows(item_all, batch.pos_items)
        neg = take_rows(item_all, batch.neg_items)
        loss = bpr_loss(u, pos, neg) + l2_reg_loss(self.reg, u, pos, neg) / batch.users.shape[0]
        return loss, state

    def eval_embeddings(self, params, state, graph: DeviceGraph):
        return self._forward(params, graph, rng=None)
