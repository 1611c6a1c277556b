"""Loss-family value parity vs independent torch oracles (SURVEY.md §4.2).

Each oracle re-derives the published loss formula in torch (the reference's
framework), so agreement checks both the math and the numerics — without
sharing any code with the jnp implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from recommendation_tpu import losses

RNG = np.random.default_rng(42)
B, D = 32, 16


def _pair():
    a = RNG.normal(size=(B, D)).astype(np.float32)
    b = RNG.normal(size=(B, D)).astype(np.float32)
    return a, b


def test_bpr_loss():
    u, p = _pair()
    n, _ = _pair()
    got = float(losses.bpr_loss(jnp.asarray(u), jnp.asarray(p), jnp.asarray(n)))
    tu, tp, tn = map(torch.tensor, (u, p, n))
    pos = (tu * tp).sum(1)
    neg = (tu * tn).sum(1)
    want = float((-torch.log(10e-6 + torch.sigmoid(pos - neg))).mean())
    assert abs(got - want) < 1e-5


def test_l2_reg_loss():
    a, b = _pair()
    got = float(losses.l2_reg_loss(0.01, jnp.asarray(a), jnp.asarray(b)))
    want = float(0.01 * (torch.norm(torch.tensor(a)) / B + torch.norm(torch.tensor(b)) / B))
    assert abs(got - want) < 1e-6


def test_info_nce():
    v1, v2 = _pair()
    got = float(losses.info_nce(jnp.asarray(v1), jnp.asarray(v2), temperature=0.2))
    t1, t2 = F.normalize(torch.tensor(v1), dim=1), F.normalize(torch.tensor(v2), dim=1)
    scores = t1 @ t2.T / 0.2
    want = float(-torch.diag(F.log_softmax(scores, dim=1)).mean())
    assert abs(got - want) / max(abs(want), 1.0) < 1e-3


def test_batch_softmax_loss():
    u, i = _pair()
    got = float(losses.batch_softmax_loss(jnp.asarray(u), jnp.asarray(i), 0.1))
    tu, ti = F.normalize(torch.tensor(u), dim=1), F.normalize(torch.tensor(i), dim=1)
    pos = torch.exp((tu * ti).sum(-1) / 0.1)
    ttl = torch.exp(tu @ ti.T / 0.1).sum(1)
    want = float((-torch.log(pos / ttl + 1e-6)).mean())
    assert abs(got - want) / max(abs(want), 1.0) < 2e-3


def test_alignment_uniformity():
    x, y = _pair()
    ga = float(losses.alignment_loss(jnp.asarray(x), jnp.asarray(y)))
    tx, ty = F.normalize(torch.tensor(x), dim=-1), F.normalize(torch.tensor(y), dim=-1)
    wa = float((tx - ty).pow(2).sum(1).mean())
    assert abs(ga - wa) < 1e-5

    gu = float(losses.uniformity_loss(jnp.asarray(x)))
    pd = torch.pdist(F.normalize(torch.tensor(x), dim=-1), p=2)
    wu = float((pd.pow(2).mul(-2).exp().mean() + 1e-8).log())
    assert abs(gu - wu) / max(abs(wu), 1.0) < 2e-3


def test_selfcf_and_buir_losses():
    uo, ut = _pair()
    io, it = _pair()
    j = [jnp.asarray(v) for v in (uo, ut, io, it)]
    got_selfcf = float(losses.selfcf_loss(*j))
    t = [torch.tensor(v) for v in (uo, ut, io, it)]
    w_ui = 1 - F.cosine_similarity(t[0], t[3], dim=-1).mean()
    w_iu = 1 - F.cosine_similarity(t[2], t[1], dim=-1).mean()
    assert abs(got_selfcf - float(w_ui / 2 + w_iu / 2)) < 1e-5

    got_buir = float(losses.buir_loss(*j))
    tn = [F.normalize(v, dim=-1) for v in t]
    w = ((2 - 2 * (tn[0] * tn[3]).sum(-1)) + (2 - 2 * (tn[2] * tn[1]).sum(-1))).mean()
    assert abs(got_buir - float(w)) < 1e-5


def test_barlow_twins_loss():
    h1, h2 = _pair()
    got = float(losses.barlow_twins_loss(jnp.asarray(h1), jnp.asarray(h2)))
    t1, t2 = torch.tensor(h1), torch.tensor(h2)
    z1 = (t1 - t1.mean(0)) / (t1.std(0) + 1e-15)
    z2 = (t2 - t2.mean(0)) / (t2.std(0) + 1e-15)
    c = z1.T @ z2 / B
    off = ~torch.eye(D).bool()
    want = float((1 - c.diagonal()).pow(2).sum() + (1.0 / D) * c[off].pow(2).sum())
    assert abs(got - want) / max(abs(want), 1) < 1e-4


def test_masked_info_nce():
    v1, v2 = _pair()
    pos_mask = np.eye(B, dtype=np.float32)
    neg_mask = 1.0 - pos_mask
    got = float(
        losses.masked_info_nce(
            jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(pos_mask), jnp.asarray(neg_mask), 0.5
        )
    )
    # with identity pos mask and full neg mask this equals plain InfoNCE
    want = float(losses.info_nce(jnp.asarray(v1), jnp.asarray(v2), 0.5))
    assert abs(got - want) < 1e-5


def test_bce_loss_matches_torch():
    u, p = _pair()
    n, _ = _pair()
    got = float(losses.bce_loss(jnp.asarray(u), jnp.asarray(p), jnp.asarray(n)))
    tu, tp, tn = map(torch.tensor, (u, p, n))
    logits = torch.cat([(tu * tp).sum(1), (tu * tn).sum(1)])
    labels = torch.cat([torch.ones(B), torch.zeros(B)])
    want = float(F.binary_cross_entropy_with_logits(logits, labels))
    assert abs(got - want) < 1e-5


def test_losses_are_differentiable():
    u, p = _pair()
    n, _ = _pair()

    def f(x):
        return losses.bpr_loss(x, jnp.asarray(p), jnp.asarray(n))

    g = jax.grad(f)(jnp.asarray(u))
    assert np.isfinite(np.asarray(g)).all()


def test_hierarchical_mim_finite():
    u, a = _pair()
    val = float(
        losses.hierarchical_mim_loss(jax.random.PRNGKey(0), jnp.asarray(u), jnp.asarray(a))
    )
    assert np.isfinite(val)


def test_l2_normalize_zero_row_gradient_finite():
    """Zero rows genuinely occur (edge dropout isolates nodes); the
    normalize must have value 0 AND gradient 0 there — jnp.linalg.norm's
    raw gradient is NaN at exactly-zero input (found as a SEPT SSL-phase
    training NaN)."""
    import jax

    from recommendation_tpu.losses import _l2_normalize

    x = jnp.asarray([[0.0, 0.0, 0.0], [3.0, 4.0, 0.0], [1e-20, 0.0, 0.0]])
    y = _l2_normalize(x)
    assert np.allclose(np.asarray(y[0]), 0.0)
    assert np.allclose(np.asarray(y[1]), [0.6, 0.8, 0.0])

    g = jax.grad(lambda a: jnp.sum(_l2_normalize(a) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.allclose(np.asarray(g[0]), 0.0)  # zero row -> zero gradient
