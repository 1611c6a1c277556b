"""Loss zoo (layer L5) — every loss family of the reference, built once.

Pure jnp; all differentiable under ``jax.grad`` and fusable under ``jit``.
Numerical contracts match the reference formulas cited per-function; full-
catalog / all-pairs denominators also have blockwise streaming variants in
``ops/pallas_losses.py`` / ``parallel/collectives.py`` for sharded
execution (SURVEY.md §7.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize with a ZERO-safe gradient.

    ``jnp.linalg.norm``'s gradient at an exactly-zero row is NaN (0/0), and
    zero rows genuinely occur in every encoder that normalizes per layer:
    edge dropout isolates nodes, whose propagated embeddings are all-zero
    (found as a training NaN in SEPT's SSL phase the moment augmentation
    kicked in). The double-where keeps the value (0) AND the gradient (0)
    finite there — also torch's norm-at-zero subgradient convention."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.where(sq > 0, x / jnp.maximum(norm, eps), 0.0)


# -- pairwise ranking ---------------------------------------------------------


def bpr_loss(user_emb: jnp.ndarray, pos_emb: jnp.ndarray, neg_emb: jnp.ndarray) -> jnp.ndarray:
    """-mean log(1e-5 + sigmoid(pos - neg))  (`ncl.py:116-120`; the reference's
    ``10e-6`` epsilon inside the log is kept for value parity)."""
    pos_score = jnp.sum(user_emb * pos_emb, axis=1)
    neg_score = jnp.sum(user_emb * neg_emb, axis=1)
    return -jnp.mean(jnp.log(1e-5 + jax.nn.sigmoid(pos_score - neg_score)))


def bce_loss(user_emb: jnp.ndarray, pos_emb: jnp.ndarray, neg_emb: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy over pos/neg scores (`lightgcn.py:109-113`)."""
    pos_score = jnp.sum(user_emb * pos_emb, axis=1)
    neg_score = jnp.sum(user_emb * neg_emb, axis=1)
    logits = jnp.concatenate([pos_score, neg_score])
    labels = jnp.concatenate([jnp.ones_like(pos_score), jnp.zeros_like(neg_score)])
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def pointwise_bce_loss(
    scores: jnp.ndarray, labels: jnp.ndarray, weight: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Weighted BCE over labeled (user, item, y) scores — the loss the
    pointwise batcher feeds (`univariate/diffnet.py:968-991` emits y∈{0,1}
    rows; DeepRecommender-style training optimizes their cross-entropy).
    ``weight`` masks padding rows."""
    per_row = (
        jnp.maximum(scores, 0) - scores * labels + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    )
    if weight is None:
        return jnp.mean(per_row)
    return jnp.sum(per_row * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def safe_frobenius_norm(x: jnp.ndarray) -> jnp.ndarray:
    """||x||_F with a zero-safe gradient (same NaN class as _l2_normalize:
    d||x||/dx = x/||x|| is 0/0 at x = 0; the reference's torch.norm has the
    subgradient-0 convention there)."""
    sq = jnp.sum(x * x)
    return jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)


def l2_reg_loss(reg: float, *embs: jnp.ndarray) -> jnp.ndarray:
    """reg * Σ ||x||_F / x.shape[0]  — Frobenius norm over the batch rows
    divided by row count, NOT squared (`ncl.py:122-123`, `ssl4rec.py:16-17`)."""
    return reg * sum(safe_frobenius_norm(x) / x.shape[0] for x in embs)


# -- contrastive --------------------------------------------------------------


def info_nce(view1: jnp.ndarray, view2: jnp.ndarray, temperature: float, b_cos: bool = True) -> jnp.ndarray:
    """Symmetric-view InfoNCE: -mean diag(log_softmax(v1·v2ᵀ/τ))
    (`ncl.py:125-130`, `ssl4rec.py:19-23`)."""
    if b_cos:
        view1, view2 = _l2_normalize(view1), _l2_normalize(view2)
    scores = view1 @ view2.T / temperature
    return -jnp.mean(jnp.diagonal(jax.nn.log_softmax(scores, axis=1)))


def masked_info_nce(
    anchor: jnp.ndarray,
    sample: jnp.ndarray,
    pos_mask: jnp.ndarray,
    neg_mask: jnp.ndarray,
    tau: float,
) -> jnp.ndarray:
    """Matrix-mask InfoNCE with explicit pos/neg masks
    (`univariate/grace.py:213-224`): denominator over pos∪neg entries,
    numerator averaged over positives per anchor."""
    anchor, sample = _l2_normalize(anchor), _l2_normalize(sample)
    sim = anchor @ sample.T / tau
    both = pos_mask + neg_mask
    masked = jnp.where(both > 0, sim, -jnp.inf)
    log_denom = jax.nn.logsumexp(masked, axis=1, keepdims=True)
    log_prob = sim - log_denom
    per_anchor = jnp.sum(log_prob * pos_mask, axis=1) / jnp.maximum(
        jnp.sum(pos_mask, axis=1), 1e-12
    )
    return -jnp.mean(per_anchor)


def batch_softmax_loss(user_emb: jnp.ndarray, item_emb: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """In-batch sampled-softmax retrieval loss (`ssl4rec.py:25-30`), with the
    reference's +1e-6 inside the log."""
    user_emb, item_emb = _l2_normalize(user_emb), _l2_normalize(item_emb)
    pos_score = jnp.exp(jnp.sum(user_emb * item_emb, axis=-1) / temperature)
    ttl_score = jnp.sum(jnp.exp(user_emb @ item_emb.T / temperature), axis=1)
    return jnp.mean(-jnp.log(pos_score / ttl_score + 1e-6))


# -- DirectAU -----------------------------------------------------------------


def alignment_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """mean ||x̂ - ŷ||²  (`directau.py:245-246`)."""
    return jnp.mean(jnp.sum((_l2_normalize(x) - _l2_normalize(y)) ** 2, axis=1))


def uniformity_loss(x: jnp.ndarray, t: float = 2.0) -> jnp.ndarray:
    """log(mean exp(-t·||x̂_a - x̂_b||²) + 1e-8) over all unordered pairs
    (`directau.py:248-251`, torch.pdist semantics: a<b, no self-pairs).

    Above 4096 rows dispatches to the blockwise streaming version
    (``ops.pallas_losses.uniformity_streaming``) so the N×N matrix never
    materializes; numerically identical."""
    if x.shape[0] >= 4096:
        from recommendation_tpu.ops.pallas_losses import uniformity_streaming

        return uniformity_streaming(x, t=t)
    x = _l2_normalize(x)
    n = x.shape[0]
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    d2 = jnp.maximum(d2, 0.0)
    mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    n_pairs = n * (n - 1) // 2
    mean_exp = jnp.sum(jnp.where(mask, jnp.exp(-t * d2), 0.0)) / max(n_pairs, 1)
    return jnp.log(mean_exp + 1e-8)


def direct_au_loss(user_emb: jnp.ndarray, item_emb: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """align(u,i) + γ·(uniform(u)+uniform(i))/2  (`directau.py:238-243`)."""
    align = alignment_loss(user_emb, item_emb)
    uniform = (uniformity_loss(user_emb) + uniformity_loss(item_emb)) / 2.0
    return align + gamma * uniform


# -- bootstrap (negative-free) ------------------------------------------------


def cosine_bootstrap_loss(p: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """1 - mean cos(p, stop_grad(z))  (`selfcf.py:518-519`)."""
    z = jax.lax.stop_gradient(z)
    return 1.0 - jnp.mean(jnp.sum(_l2_normalize(p) * _l2_normalize(z), axis=-1))


def selfcf_loss(u_online, u_target, i_online, i_target) -> jnp.ndarray:
    """cos bootstrap both ways, halved (`selfcf.py:520-525`)."""
    return (
        cosine_bootstrap_loss(u_online, i_target) / 2.0
        + cosine_bootstrap_loss(i_online, u_target) / 2.0
    )


def buir_loss(u_online, u_target, i_online, i_target) -> jnp.ndarray:
    """mean[(2-2·cos(u_on, i_tg)) + (2-2·cos(i_on, u_tg))]
    (`univariate/buir.py:263-277`; targets already stop-gradient upstream)."""
    u_online, u_target = _l2_normalize(u_online), _l2_normalize(u_target)
    i_online, i_target = _l2_normalize(i_online), _l2_normalize(i_target)
    loss_ui = 2.0 - 2.0 * jnp.sum(u_online * jax.lax.stop_gradient(i_target), axis=-1)
    loss_iu = 2.0 - 2.0 * jnp.sum(i_online * jax.lax.stop_gradient(u_target), axis=-1)
    return jnp.mean(loss_ui + loss_iu)


# -- decorrelation ------------------------------------------------------------


def barlow_twins_loss(
    h1: jnp.ndarray,
    h2: jnp.ndarray,
    lambda_: float | None = None,
    batch_norm: bool = True,
    eps: float = 1e-15,
) -> jnp.ndarray:
    """Cross-correlation decorrelation loss (`univariate/gbt.py:203-217`)."""
    batch_size, feature_dim = h1.shape
    if lambda_ is None:
        lambda_ = 1.0 / feature_dim
    if batch_norm:
        z1 = (h1 - h1.mean(axis=0)) / (h1.std(axis=0, ddof=1) + eps)
        z2 = (h2 - h2.mean(axis=0)) / (h2.std(axis=0, ddof=1) + eps)
        c = z1.T @ z2 / batch_size
    else:
        c = h1.T @ h2 / batch_size
    on_diag = jnp.sum((1.0 - jnp.diagonal(c)) ** 2)
    off_diag = jnp.sum(jnp.where(jnp.eye(feature_dim, dtype=bool), 0.0, c) ** 2)
    return on_diag + lambda_ * off_diag


def grace_dual_branch_loss(z1: jnp.ndarray, z2: jnp.ndarray, tau: float) -> jnp.ndarray:
    """GRACE dual-branch InfoNCE with intraview negatives
    (`univariate/grace.py:213-224` + DualBranchContrast sampling 469-502):
    for anchor i in view1, positive = z2_i; negatives = all z2_j plus all
    intraview z1_{j≠i}. Symmetrized over the two views."""

    def one_side(a, b):
        a, b = _l2_normalize(a), _l2_normalize(b)
        inter = a @ b.T / tau  # [N, N]; diag = positives
        intra = a @ a.T / tau
        n = a.shape[0]
        intra = jnp.where(jnp.eye(n, dtype=bool), -jnp.inf, intra)
        denom = jax.nn.logsumexp(jnp.concatenate([inter, intra], axis=1), axis=1)
        return -jnp.mean(jnp.diagonal(inter) - denom)

    return (one_side(z1, z2) + one_side(z2, z1)) / 2.0


def bootstrap_g2l_loss(h1_pred, h2_pred, g1_target, g2_target) -> jnp.ndarray:
    """BGRL G2L BootstrapLatent (`univariate/bgrl_g2l.py:277-308,436-446`):
    node-level online predictions vs the CROSS-view graph-level target
    readout, 2−2·cos, symmetrized."""
    g1 = jax.lax.stop_gradient(g1_target)
    g2 = jax.lax.stop_gradient(g2_target)

    def side(h, g):
        h = _l2_normalize(h)
        g = g / jnp.maximum(safe_frobenius_norm(g), 1e-12)
        return jnp.mean(2.0 - 2.0 * h @ g)

    return (side(h1_pred, g2) + side(h2_pred, g1)) / 2.0


# -- hierarchical mutual information (MHCN) -----------------------------------


def hierarchical_mim_loss(
    rng: jax.Array, user_emb: jnp.ndarray, adj_user_emb: jnp.ndarray
) -> jnp.ndarray:
    """MHCN's hierarchical self-supervision (`univariate/mhcn.py:480-505`):
    local MIM user↔hyperedge (shuffled negatives) + global MIM vs graph
    readout. ``adj_user_emb`` = H_c @ user_emb (hyperedge embeddings)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    n = user_emb.shape[0]

    def score(a, b):
        return jnp.sum(a * b, axis=1)

    shuf1 = user_emb[jax.random.permutation(k1, n)]
    shuf2 = adj_user_emb[jax.random.permutation(k2, n)]
    pos = score(user_emb, adj_user_emb)
    neg1 = score(shuf1, adj_user_emb)
    neg2 = score(shuf2, user_emb)
    local = jnp.sum(
        -jnp.log(jax.nn.sigmoid(pos - neg1) + 1e-12)
        - jnp.log(jax.nn.sigmoid(neg1 - neg2) + 1e-12)
    )
    graph = jnp.mean(adj_user_emb, axis=0, keepdims=True)
    gpos = score(adj_user_emb, jnp.broadcast_to(graph, adj_user_emb.shape))
    gshuf = adj_user_emb[jax.random.permutation(k3, n)]
    gneg = score(gshuf, jnp.broadcast_to(graph, adj_user_emb.shape))
    global_ = jnp.sum(-jnp.log(jax.nn.sigmoid(gpos - gneg) + 1e-12))
    return local + global_
