"""Bucketed pull-form propagation (`graph/bucketed.py`) vs scipy/dense
oracles — the large-graph backend's correctness contract:

  * forward == scipy SpMM for skewed degree distributions (hubs, zero-degree
    rows, duplicate-free COO);
  * gradients == dense-matrix autodiff oracle (the custom VJP pulls through
    the transpose — this is what keeps training scatter-free);
  * on-device value refresh (augmentation) == rebuilt-from-scratch result;
  * a full training run on the bucketed backend matches the segment backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from recommendation_tpu.graph.bucketed import (
    Bucket,
    BucketedCSR,
    build_bucketed,
    bucketed_matmul,
    pull,
    refresh_vals,
)
from recommendation_tpu.graph.device import DeviceGraph, from_scipy, with_vals
from recommendation_tpu.ops.spmm import adj_matmul


def _skewed_coo(n_rows=257, n_cols=181, e=3000, seed=0):
    """COO with hub rows, a power-law tail, and guaranteed empty rows."""
    rng = np.random.default_rng(seed)
    rows = (rng.pareto(0.7, size=e) % (n_rows - 5)).astype(np.int64)  # last 5 rows empty
    cols = rng.integers(0, n_cols, e)
    mat = sp.coo_matrix(
        (rng.normal(size=e).astype(np.float32), (rows, cols)), shape=(n_rows, n_cols)
    )
    mat.sum_duplicates()
    return mat.tocoo()


def test_pull_matches_scipy_on_skewed_degrees():
    coo = _skewed_coo()
    csr = build_bucketed(coo.row, coo.col, coo.data, *coo.shape)
    x = np.random.default_rng(1).normal(size=(coo.shape[1], 24)).astype(np.float32)
    out = np.asarray(pull(csr, jnp.asarray(x)))
    assert np.allclose(out, coo @ x, atol=1e-4)
    # empty rows produce exactly zero
    assert np.abs(out[-5:]).max() == 0.0


def test_padding_overhead_bounded():
    coo = _skewed_coo(seed=3)
    csr = build_bucketed(coo.row, coo.col, coo.data, *coo.shape)
    slots = sum(b.idx.shape[0] * b.cap for b in csr.buckets)
    deg = np.bincount(coo.row, minlength=coo.shape[0])
    padded_min = np.maximum(deg[deg > 0], 4).sum()  # MIN_CAP floor
    # multiple-of-4 caps below 128 keep padding tight; pow2 above at most 2x
    assert slots < 1.5 * padded_min


def test_custom_vjp_matches_dense_autodiff():
    coo = _skewed_coo(seed=5)
    fwd = build_bucketed(coo.row, coo.col, coo.data, *coo.shape)
    bwd = build_bucketed(coo.col, coo.row, coo.data, coo.shape[1], coo.shape[0])
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(coo.shape[1], 8)).astype(np.float32)
    )
    dense = jnp.asarray(coo.todense())

    def f(x):
        return jnp.sum(jnp.tanh(bucketed_matmul(fwd, bwd, x)) ** 2)

    def f_ref(x):
        return jnp.sum(jnp.tanh(dense @ x) ** 2)

    g = jax.grad(f)(x)
    g_ref = jax.grad(f_ref)(x)
    assert np.allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_backward_hlo_has_no_scatter():
    """The point of the custom VJP: no scatter op anywhere in the compiled
    train-direction program."""
    coo = _skewed_coo(seed=7)
    fwd = build_bucketed(coo.row, coo.col, coo.data, *coo.shape)
    bwd = build_bucketed(coo.col, coo.row, coo.data, coo.shape[1], coo.shape[0])
    x = jnp.zeros((coo.shape[1], 8), jnp.float32)

    def f(fwd, bwd, x):
        return jax.grad(lambda x: jnp.sum(bucketed_matmul(fwd, bwd, x) ** 2))(x)

    hlo = jax.jit(f).lower(fwd, bwd, x).as_text()
    assert "scatter" not in hlo


def test_refresh_vals_equals_rebuild():
    coo = _skewed_coo(seed=9)
    tpl = build_bucketed(coo.row, coo.col, None, *coo.shape)
    refreshed = refresh_vals(tpl, jnp.asarray(coo.data))
    # build_bucketed's internal sort is stable, so the slot layout is
    # identical — compare the value tables directly
    direct = build_bucketed(coo.row, coo.col, coo.data, *coo.shape)
    for a, b in zip(refreshed.buckets, direct.buckets):
        assert np.allclose(np.asarray(a.val), np.asarray(b.val))


def test_with_vals_refreshes_bucketed_tables():
    coo = _skewed_coo(seed=11)
    adj = from_scipy(sp.csr_matrix(coo), backend="bucketed")
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(coo.shape[1], 8)).astype(np.float32)
    )
    halved = with_vals(adj, adj.vals * 0.5)
    out = np.asarray(adj_matmul(halved, x))
    assert np.allclose(out, 0.5 * (coo @ np.asarray(x)), atol=1e-4)
    # the transpose direction refreshed too
    out_t = np.asarray(adj_matmul(halved.transpose(), jnp.zeros((coo.shape[0], 8)) + 1.0))
    assert np.allclose(out_t, 0.5 * (coo.T @ np.ones((coo.shape[0], 8))), atol=1e-4)


def test_normalized_bipartite_bucketed_matches_segment(tiny_data):
    """On-device re-normalization under a keep-mask must agree between the
    bucketed templates and the segment COO path."""
    g_seg = DeviceGraph(tiny_data, backend="segment")
    g_buck = DeviceGraph(tiny_data, backend="bucketed")
    mask = jnp.asarray(
        np.random.default_rng(0).integers(0, 2, size=g_seg.edge_valid.shape).astype(np.float32)
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(g_seg.n_nodes, 8)).astype(np.float32)
    )
    out_seg = np.asarray(adj_matmul(g_seg.normalized_bipartite(mask), x))
    out_buck = np.asarray(adj_matmul(g_buck.normalized_bipartite(mask), x))
    assert np.allclose(out_seg, out_buck, atol=1e-4)


def test_training_equivalence_bucketed_vs_segment(tiny_data):
    """Two epochs of LightGCN must produce the same params on both backends
    (identical math, different memory layout)."""
    from recommendation_tpu.config import default_config
    from recommendation_tpu.models.lightgcn import LightGCN
    from recommendation_tpu.train.loop import make_epoch_fn, make_optimizer

    config = default_config(**{"embedding.size": 8, "batch.size": 32, "max.epoch": 2})
    model = LightGCN(config)
    results = {}
    for backend in ("segment", "bucketed"):
        graph = DeviceGraph(tiny_data, backend=backend)
        params, state = model.init(jax.random.PRNGKey(0), graph)
        optimizer = make_optimizer(config)
        opt_state = optimizer.init(params)
        epoch_fn = make_epoch_fn(model, optimizer, 32)
        rng = jax.random.PRNGKey(1)
        for e in range(2):
            rng, k = jax.random.split(rng)
            params, opt_state, state, loss = epoch_fn(graph, params, opt_state, state, k)
        results[backend] = params
    for k in results["segment"]:
        a = np.asarray(results["segment"][k])
        b = np.asarray(results["bucketed"][k])
        assert np.allclose(a, b, atol=5e-5), k


def test_gat_bucketed_matches_segment(tiny_data):
    """The gather-only bucketed GAT attention layer must equal the
    segment-softmax path: same forward embeddings (no dropout) and the same
    end metrics after a short training run."""
    from recommendation_tpu.config import default_config
    from recommendation_tpu.models.gat import GAT

    config = default_config(**{
        "embedding.size": 8, "GAT.hidden": 8, "GAT.num_heads": 2,
        "batch.size": 256, "max.epoch": 2, "eval.interval": 2,
        "item.ranking.topN": [10],
    })
    outs = {}
    for backend in ("segment", "bucketed"):
        graph = DeviceGraph(tiny_data, backend=backend)
        model = GAT(config)
        params, state = model.init(jax.random.PRNGKey(0), graph)
        ue, ie = model.eval_embeddings(params, state, graph)
        outs[backend] = (np.asarray(ue), np.asarray(ie))
    assert np.allclose(outs["segment"][0], outs["bucketed"][0], atol=1e-4)
    assert np.allclose(outs["segment"][1], outs["bucketed"][1], atol=1e-4)

    # end-to-end: trains with finite gradients on the bucketed path
    from recommendation_tpu.train.recommender import GraphRecommender
    from recommendation_tpu.utils.logging import Log

    rec = GraphRecommender(
        GAT(config), tiny_data, config,
        graph=DeviceGraph(tiny_data, backend="bucketed"), log=Log(echo=False),
    )
    metrics = rec.execute()
    assert np.isfinite(metrics["Recall@10"])


def test_social_models_on_bucketed_graph(tiny_data, tiny_social):
    """Every social model family must train end-to-end when the
    SocialDeviceGraph (motif adjacencies included) uses the bucketed
    large-graph backend."""
    from recommendation_tpu.config import default_config
    from recommendation_tpu.graph.social_device import SocialDeviceGraph
    from recommendation_tpu.models import registry
    from recommendation_tpu.train.recommender import GraphRecommender
    from recommendation_tpu.utils.logging import Log

    graph = SocialDeviceGraph(tiny_data, tiny_social, backend="bucketed")
    config = default_config(**{
        "max.epoch": 2, "batch.size": 512, "embedding.size": 16,
        "item.ranking.topN": [10], "eval.interval": 2,
        "ESRF.segment": 16, "NCL.num_clusters": 4,
    })
    for name in ("mhcn", "sept", "diffnet", "esrf"):
        rec = GraphRecommender(
            registry.build(name, config), tiny_data, config, graph=graph,
            log=Log(echo=False),
        )
        metrics = rec.execute()
        assert np.isfinite(metrics["Recall@10"]), name


def test_gat_bucketed_ignores_coo_padding():
    """from_scipy pads the COO with zero-valued entries that carry VALID
    edge ids; the bucketed GAT mask must treat them as non-edges or phantom
    neighbors enter the last node's softmax (found by review: any graph
    whose norm_adj nnz is not a multiple of pad_to diverged)."""
    from recommendation_tpu.config import default_config
    from recommendation_tpu.data.interaction import Interaction
    from recommendation_tpu.models.gat import GAT

    # 5 interactions -> square nnz = 10, NOT a multiple of pad_to=8
    train = [[f"u{i}", f"i{i % 3}", 1.0] for i in range(5)]
    test = [["u0", "i1", 1.0]]
    data = Interaction(train, test)
    assert data.norm_adj.nnz % 8 != 0
    config = default_config(**{"embedding.size": 8, "GAT.hidden": 8, "GAT.num_heads": 2})
    outs = {}
    for backend in ("segment", "bucketed"):
        graph = DeviceGraph(data, backend=backend)
        model = GAT(config)
        params, state = model.init(jax.random.PRNGKey(0), graph)
        ue, ie = model.eval_embeddings(params, state, graph)
        outs[backend] = (np.asarray(ue), np.asarray(ie))
    assert np.allclose(outs["segment"][0], outs["bucketed"][0], atol=1e-4)
    assert np.allclose(outs["segment"][1], outs["bucketed"][1], atol=1e-4)


def test_gat_scatter_free_vjp_matches_segment_grads(tiny_data):
    """`gat_layer_bucketed_sf`'s custom VJP (VERDICT-r2 item 3) must produce
    the SAME gradients as the segment-softmax layer (plain autodiff) for the
    full 2-layer GAT loss — values AND grads, no dropout."""
    from recommendation_tpu.config import default_config
    from recommendation_tpu.models.gat import GAT
    from recommendation_tpu.sampling import PairwiseBatch

    config = default_config(**{
        "embedding.size": 8, "GAT.hidden": 8, "GAT.num_heads": 2,
    })
    b = 64
    rng = np.random.default_rng(0)
    users = jnp.asarray(rng.integers(0, tiny_data.user_num, b).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, tiny_data.item_num, b).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, tiny_data.item_num, b).astype(np.int32))
    batch = PairwiseBatch(users, pos, neg, jnp.ones((b,), jnp.float32))

    grads, values = {}, {}
    for backend in ("segment", "bucketed"):
        graph = DeviceGraph(tiny_data, backend=backend)
        model = GAT(config)
        params, state = model.init(jax.random.PRNGKey(0), graph)
        if backend == "bucketed":
            assert graph.gat_aux is not None  # the scatter-free path is active
        val, g = jax.value_and_grad(
            lambda p: model.loss(p, state, batch, graph, None)[0]
        )(params)
        values[backend], grads[backend] = float(val), g
    assert np.isclose(values["segment"], values["bucketed"], atol=1e-5)
    flat_s = jax.tree_util.tree_leaves(grads["segment"])
    flat_b = jax.tree_util.tree_leaves(grads["bucketed"])
    for gs, gb in zip(flat_s, flat_b):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gb), atol=2e-4, rtol=2e-3)


def test_gat_scatter_free_backward_hlo_has_no_scatter(tiny_data):
    """The point of the custom VJP: the compiled gradient of the attention
    LAYER contains no scatter op — the O(E·d) attention scatter that made
    fwd+bwd ~3.2x fwd at Gowalla scale is gone. (The full model loss still
    scatters for the [B, d] batch-row embedding gradients, like every other
    model — that is the standard, batch-sized embedding update, not the
    edge-sized attention backward.)"""
    from recommendation_tpu.config import default_config
    from recommendation_tpu.models.gat import GAT, gat_layer_bucketed_sf

    config = default_config(**{
        "embedding.size": 8, "GAT.hidden": 8, "GAT.num_heads": 2,
    })
    graph = DeviceGraph(tiny_data, backend="bucketed")
    model = GAT(config)
    params, state = model.init(jax.random.PRNGKey(0), graph)
    aux = graph.gat_aux
    adj = graph.norm_adj
    n = graph.n_nodes
    x = jnp.zeros((n, 8), jnp.float32)
    p1 = params["gat1"]

    def layer_loss(x, w, a_src, a_dst, rng):
        out = gat_layer_bucketed_sf(
            x, adj.pull, adj.pull_t, aux, n, w, a_src, a_dst,
            heads=2, neg_slope=0.2, rng=rng, att_drop=0.5,
        )
        return jnp.sum(out ** 2)

    grad_fn = jax.grad(layer_loss, argnums=(0, 1, 2, 3))
    hlo = jax.jit(grad_fn).lower(
        x, p1["w"], p1["a_src"], p1["a_dst"], jax.random.PRNGKey(1)
    ).as_text()
    assert "scatter" not in hlo


def test_gat_scatter_free_dropout_trains_finite(tiny_data):
    """Attention dropout through the custom VJP: gradients stay finite and
    the dropout mask actually changes the loss."""
    from recommendation_tpu.config import default_config
    from recommendation_tpu.models.gat import GAT
    from recommendation_tpu.sampling import PairwiseBatch

    config = default_config(**{
        "embedding.size": 8, "GAT.hidden": 8, "GAT.num_heads": 2,
        "GAT.edge_dropout": 0.5, "GAT.dropout": 0.0,
    })
    graph = DeviceGraph(tiny_data, backend="bucketed")
    model = GAT(config)
    params, state = model.init(jax.random.PRNGKey(0), graph)
    b = 64
    rng = np.random.default_rng(1)
    batch = PairwiseBatch(
        jnp.asarray(rng.integers(0, tiny_data.user_num, b).astype(np.int32)),
        jnp.asarray(rng.integers(0, tiny_data.item_num, b).astype(np.int32)),
        jnp.asarray(rng.integers(0, tiny_data.item_num, b).astype(np.int32)),
        jnp.ones((b,), jnp.float32),
    )
    vals = []
    for seed in (1, 2):
        val, g = jax.value_and_grad(
            lambda p: model.loss(p, state, batch, graph, jax.random.PRNGKey(seed))[0]
        )(params)
        assert np.isfinite(float(val))
        assert all(np.all(np.isfinite(np.asarray(t))) for t in jax.tree_util.tree_leaves(g))
        vals.append(float(val))
    assert vals[0] != vals[1]


def test_chain_mean_matches_unfused(tiny_data):
    """Permuted-space fused chain (`bucketed_chain_mean`) == the unfused
    mean-of-layers loop — values and gradients (DESIGN.md agenda #1)."""
    from recommendation_tpu.graph.bucketed import bucketed_chain_mean

    graph = DeviceGraph(tiny_data, backend="bucketed")
    adj = graph.norm_adj
    assert adj.sym_rowspace and adj.pull.node_of_row is not None
    n = graph.n_nodes
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 16)).astype(np.float32))
    probe = jnp.asarray(np.random.default_rng(1).normal(size=(n, 16)).astype(np.float32))
    L = 3

    def fused(x):
        out = bucketed_chain_mean(L, "float32", adj.pull, adj.pull_t, x)
        return jnp.sum(out * probe), out

    def unfused(x):
        ego, acc = x, x
        for _ in range(L):
            ego = bucketed_matmul(adj.pull, adj.pull_t, ego)
            acc = acc + ego
        out = acc / (L + 1.0)
        return jnp.sum(out * probe), out

    (_, got), g_f = jax.value_and_grad(fused, has_aux=True)(x)
    (_, want), g_u = jax.value_and_grad(unfused, has_aux=True)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_u), atol=1e-5)


def test_chain_mean_under_augmentation(tiny_data):
    """The chain path survives on-device re-normalization (the refreshed
    mirrored-transpose templates keep sym_rowspace) and still matches the
    segment backend's dropped-adjacency propagation."""
    from recommendation_tpu.graph.bucketed import bucketed_chain_mean
    from recommendation_tpu.models.lightgcn import lightgcn_propagate

    outs = {}
    for backend in ("segment", "bucketed"):
        graph = DeviceGraph(tiny_data, backend=backend)
        keep = jnp.asarray(
            (np.random.default_rng(7).random(np.asarray(graph.edge_valid).shape) > 0.3)
            .astype(np.float32)
        )
        adj = graph.normalized_bipartite(keep)
        if backend == "bucketed":
            assert adj.sym_rowspace
        ue = jnp.asarray(np.random.default_rng(2).normal(
            size=(graph.n_users, 8)).astype(np.float32))
        ie = jnp.asarray(np.random.default_rng(3).normal(
            size=(graph.n_items, 8)).astype(np.float32))
        outs[backend] = lightgcn_propagate(ue, ie, adj, 2)
    np.testing.assert_allclose(
        np.asarray(outs["segment"][0]), np.asarray(outs["bucketed"][0]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(outs["segment"][1]), np.asarray(outs["bucketed"][1]), atol=1e-4)


def test_packed_bf16_pull_close_to_f32():
    """compute_dtype='bfloat16' gathers bf16 pairs packed in f32 words —
    results must match the f32 pull to bf16 precision, both node-space and
    row-space/chained."""
    from recommendation_tpu.graph.bucketed import bucketed_chain_mean

    coo = _skewed_coo(seed=13)
    adj = from_scipy(sp.csr_matrix(coo), backend="bucketed")
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(coo.shape[1], 9)).astype(np.float32)
    )
    exact = np.asarray(pull(adj.pull, x, "float32"))
    packed = np.asarray(pull(adj.pull, x, "bfloat16"))
    scale = np.abs(exact).max()
    np.testing.assert_allclose(packed, exact, atol=2e-2 * scale)

    # chained (symmetric square pattern needed): use a tiny graph's norm_adj
    sym = sp.csr_matrix(coo @ coo.T)  # symmetric by construction
    adj_s = from_scipy(sym, backend="bucketed")
    assert adj_s.sym_rowspace
    xs = jnp.asarray(
        np.random.default_rng(6).normal(size=(sym.shape[0], 8)).astype(np.float32)
    )
    exact_c = np.asarray(bucketed_chain_mean(2, "float32", adj_s.pull, adj_s.pull_t, xs))
    packed_c = np.asarray(bucketed_chain_mean(2, "bfloat16", adj_s.pull, adj_s.pull_t, xs))
    np.testing.assert_allclose(packed_c, exact_c, atol=3e-2 * np.abs(exact_c).max())


def test_packed_int8_pull_bounded_error():
    """compute_dtype='int8' (quad-packed rows + per-row scale): relative
    error bounded by int8 resolution."""
    coo = _skewed_coo(seed=17)
    adj = from_scipy(sp.csr_matrix(coo), backend="bucketed")
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(coo.shape[1], 10)).astype(np.float32)
    )
    exact = np.asarray(pull(adj.pull, x, "float32"))
    packed = np.asarray(pull(adj.pull, x, "int8"))
    # per-row error ≤ (scale/2)·Σ|val| ≈ 0.4% of the row magnitude envelope
    deg = np.asarray(np.abs(sp.csr_matrix(coo)).sum(axis=1)).flatten()
    bound = (np.abs(np.asarray(x)).max(axis=1).max() / 127.0) * (deg.max() + 1)
    assert np.abs(packed - exact).max() < bound
    # and it is actually close in aggregate
    rel = np.abs(packed - exact).max() / (np.abs(exact).max() + 1e-9)
    assert rel < 0.02
