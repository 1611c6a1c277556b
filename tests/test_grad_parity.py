"""One-step gradient parity vs torch replicas (SURVEY.md §4.2).

The full training-loss composition — propagation → gather → loss → reg —
must produce the same VALUE and the same GRADIENTS w.r.t. the embedding
tables as an independently-written torch implementation on identical inputs.
Catches sign/scaling errors that value-only tests cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from recommendation_tpu.config import default_config
from recommendation_tpu.graph.device import from_scipy
from recommendation_tpu.losses import bpr_loss, l2_reg_loss
from recommendation_tpu.models.lightgcn import lightgcn_propagate

B = 64


def _setup(tiny_data, seed=0):
    rng = np.random.default_rng(seed)
    d = 16
    ue = rng.normal(size=(tiny_data.user_num, d)).astype(np.float32) * 0.1
    ie = rng.normal(size=(tiny_data.item_num, d)).astype(np.float32) * 0.1
    users = rng.integers(0, tiny_data.user_num, size=B).astype(np.int64)
    pos = rng.integers(0, tiny_data.item_num, size=B).astype(np.int64)
    neg = rng.integers(0, tiny_data.item_num, size=B).astype(np.int64)
    return ue, ie, users, pos, neg


def _torch_sparse(mat):
    coo = mat.tocoo()
    idx = torch.tensor(np.array([coo.row, coo.col]), dtype=torch.long)
    return torch.sparse_coo_tensor(idx, torch.tensor(coo.data), coo.shape).coalesce()


def test_lightgcn_bpr_total_loss_grads(tiny_data):
    ue, ie, users, pos, neg = _setup(tiny_data)
    n_layers, reg = 3, 1e-4
    adj = from_scipy(tiny_data.norm_adj, backend="dense")

    def total_loss(u_tab, i_tab):
        ua, ia = lightgcn_propagate(u_tab, i_tab, adj, n_layers)
        u, p, n = ua[users], ia[pos], ia[neg]
        return bpr_loss(u, p, n) + l2_reg_loss(reg, u, p, n) / B

    val, (gu, gi) = jax.value_and_grad(total_loss, argnums=(0, 1))(
        jnp.asarray(ue), jnp.asarray(ie)
    )

    # torch replica
    t_u = torch.tensor(ue, requires_grad=True)
    t_i = torch.tensor(ie, requires_grad=True)
    t_adj = _torch_sparse(tiny_data.norm_adj)
    ego = torch.cat([t_u, t_i], 0)
    layers = [ego]
    for _ in range(n_layers):
        ego = torch.sparse.mm(t_adj, ego)
        layers.append(ego)
    mean = torch.stack(layers).mean(0)
    ua, ia = mean[: tiny_data.user_num], mean[tiny_data.user_num :]
    u, p, n = ua[users], ia[pos], ia[neg]
    t_loss = -torch.log(
        1e-5 + torch.sigmoid((u * p).sum(1) - (u * n).sum(1))
    ).mean()
    t_loss = t_loss + reg * (u.norm() / B + p.norm() / B + n.norm() / B) / B
    t_loss.backward()

    assert abs(float(val) - float(t_loss)) < 1e-5
    assert np.allclose(np.asarray(gu), t_u.grad.numpy(), atol=2e-5)
    assert np.allclose(np.asarray(gi), t_i.grad.numpy(), atol=2e-5)


def test_directau_raw_adjacency_loss_grads(tiny_data, tiny_graph):
    """Our DirectAU default (raw adjacency, pos−neg composition) vs torch."""
    from recommendation_tpu.models.directau import DirectAU
    from recommendation_tpu.sampling import PairwiseBatch

    ue, ie, users, pos, neg = _setup(tiny_data, seed=1)
    config = default_config(**{"embedding.size": 16, "DirectAU.n_layers": 2,
                               "DirectAU.gamma": 1.0})
    model = DirectAU(config)
    batch = PairwiseBatch(
        jnp.asarray(users.astype(np.int32)), jnp.asarray(pos.astype(np.int32)),
        jnp.asarray(neg.astype(np.int32)), jnp.ones((B,), jnp.float32),
    )

    def total_loss(u_tab, i_tab):
        params = {"user_emb": u_tab, "item_emb": i_tab}
        loss, _ = model.loss(params, {}, batch, tiny_graph, jax.random.PRNGKey(0))
        return loss

    val, (gu, gi) = jax.value_and_grad(total_loss, argnums=(0, 1))(
        jnp.asarray(ue), jnp.asarray(ie)
    )

    # torch replica over the RAW adjacency
    t_u = torch.tensor(ue, requires_grad=True)
    t_i = torch.tensor(ie, requires_grad=True)
    t_adj = _torch_sparse(tiny_data.ui_adj)  # raw 0/1
    ego = torch.cat([t_u, t_i], 0)
    layers = [ego]
    for _ in range(2):
        ego = torch.sparse.mm(t_adj, ego)
        layers.append(ego)
    mean = torch.stack(layers).mean(0)
    ua, ia = mean[: tiny_data.user_num], mean[tiny_data.user_num :]
    u, p, n = ua[users], ia[pos], ia[neg]

    def au(x, y):
        xn, yn = F.normalize(x, dim=-1), F.normalize(y, dim=-1)
        align = (xn - yn).pow(2).sum(1).mean()

        def uni(z):
            pd = torch.pdist(F.normalize(z, dim=-1), p=2)
            return (pd.pow(2).mul(-2).exp().mean() + 1e-8).log()

        return align + 1.0 * (uni(x) + uni(y)) / 2

    t_loss = au(u, p) - au(u, n)
    t_loss = t_loss + 1e-4 * (u.norm() / B + p.norm() / B + n.norm() / B) / B
    t_loss.backward()

    assert abs(float(val) - float(t_loss)) / max(abs(float(t_loss)), 1) < 1e-3
    assert np.allclose(np.asarray(gu), t_u.grad.numpy(), atol=5e-4)
    assert np.allclose(np.asarray(gi), t_i.grad.numpy(), atol=5e-4)
