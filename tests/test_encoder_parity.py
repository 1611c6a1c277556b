"""Encoder-output parity vs independent torch implementations.

Complements the loss-value parity tests: the same LightGCN propagation math
written in torch (the reference's framework) over the same scipy adjacency
must produce identical embeddings — catching layout/normalization drift that
loss tests can't see.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from recommendation_tpu.models.lightgcn import lightgcn_propagate
from recommendation_tpu.models.sept import sept_encoder
from recommendation_tpu.graph.device import from_scipy


def _torch_sparse(mat):
    coo = mat.tocoo()
    idx = torch.tensor(np.array([coo.row, coo.col]), dtype=torch.long)
    return torch.sparse_coo_tensor(idx, torch.tensor(coo.data), coo.shape).coalesce()


def test_lightgcn_propagation_matches_torch(tiny_data):
    rng = np.random.default_rng(0)
    d = 16
    ue = rng.normal(size=(tiny_data.user_num, d)).astype(np.float32)
    ie = rng.normal(size=(tiny_data.item_num, d)).astype(np.float32)

    for backend in ("dense", "segment", "bucketed"):
        adj = from_scipy(tiny_data.norm_adj, backend=backend)
        got_u, got_i = lightgcn_propagate(jnp.asarray(ue), jnp.asarray(ie), adj, n_layers=3)

        t_adj = _torch_sparse(tiny_data.norm_adj)
        ego = torch.tensor(np.concatenate([ue, ie]))
        layers = [ego]
        for _ in range(3):
            ego = torch.sparse.mm(t_adj, ego)
            layers.append(ego)
        mean = torch.stack(layers).mean(0)
        want_u = mean[: tiny_data.user_num].numpy()
        want_i = mean[tiny_data.user_num :].numpy()

        assert np.allclose(np.asarray(got_u), want_u, atol=2e-4), backend
        assert np.allclose(np.asarray(got_i), want_i, atol=2e-4), backend


def test_bipartite_block_propagation_matches_square(tiny_data, tiny_graph):
    """The two-rectangular-matmul path (R̂ blocks) must equal the square
    Â path exactly (same normalization, same readout)."""
    rng = np.random.default_rng(3)
    d = 16
    ue = jnp.asarray(rng.normal(size=(tiny_data.user_num, d)).astype(np.float32))
    ie = jnp.asarray(rng.normal(size=(tiny_data.item_num, d)).astype(np.float32))
    sq_u, sq_i = lightgcn_propagate(ue, ie, tiny_graph.norm_adj, 3)
    bp_u, bp_i = lightgcn_propagate(
        ue, ie, tiny_graph.norm_adj, 3,
        bipartite_dense=tiny_graph.interaction_norm_dense,
    )
    assert tiny_graph.interaction_norm_dense is not None
    assert np.allclose(np.asarray(sq_u), np.asarray(bp_u), atol=1e-5)
    assert np.allclose(np.asarray(sq_i), np.asarray(bp_i), atol=1e-5)


def test_sept_encoder_matches_torch(tiny_data):
    """SEPT's per-layer-normalized SUM-readout encoder
    (`sept_social.py:370-377`) vs torch."""
    rng = np.random.default_rng(1)
    d = 8
    x = rng.normal(size=(tiny_data.user_num + tiny_data.item_num, d)).astype(np.float32)
    adj = from_scipy(tiny_data.norm_adj, backend="dense")
    got = np.asarray(sept_encoder(jnp.asarray(x), adj, n_layers=2))

    t_adj = _torch_sparse(tiny_data.norm_adj)
    emb = torch.tensor(x)
    acc = emb.clone()
    for _ in range(2):
        emb = torch.sparse.mm(t_adj, emb)
        emb = torch.nn.functional.normalize(emb)
        acc = acc + emb
    assert np.allclose(got, acc.numpy(), atol=2e-4)
