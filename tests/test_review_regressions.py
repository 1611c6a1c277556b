"""Regression tests for code-review findings."""

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.config import default_config
from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.graph.device import DeviceGraph, from_scipy
from recommendation_tpu.sampling import shuffled_epoch


def test_shuffled_epoch_batch_larger_than_twice_edges():
    """batch_size >> edge count must tile, not crash (single-slice cyclic
    padding could only supply e extra indices)."""
    train = [["u0", "i0", 1.0], ["u0", "i1", 1.0], ["u1", "i0", 1.0]]
    data = Interaction(train, [])
    graph = DeviceGraph(data, backend="dense")
    users, items, w, n_batches = shuffled_epoch(jax.random.PRNGKey(0), graph, 10)
    assert users.shape == (1, 10)
    # all 3 real edges present
    pairs = set(zip(np.asarray(users).ravel().tolist(), np.asarray(items).ravel().tolist()))
    assert len(pairs) == 3


def test_pallas_backend_falls_back():
    import scipy.sparse as sp

    from recommendation_tpu.ops.spmm import adj_matmul

    a = sp.random(16, 24, density=0.2, random_state=0, format="csr", dtype=np.float32)
    adj = from_scipy(a, backend="pallas")
    x = np.random.default_rng(0).normal(size=(24, 4)).astype(np.float32)
    out = np.asarray(adj_matmul(adj, jnp.asarray(x)))
    assert np.allclose(out, a @ x, atol=1e-5)


def test_native_rejects_malformed_weight(tmp_path):
    """'3abc' must fall back to 1.0 like python float(), not parse a 3.0
    prefix (std::stof behavior)."""
    import pytest

    from recommendation_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        pytest.skip("native lib not built")
    from recommendation_tpu.native.loader import load_indexed

    p = tmp_path / "t.txt"
    p.write_text("u1 i1 3abc\nu2 i2 2.5\nu3 i3\n")
    idx = load_indexed(lib, str(p))
    assert np.allclose(idx.weights, [1.0, 2.5, 1.0])


def test_tuner_csv_with_error_rows(tmp_path):
    import csv

    from recommendation_tpu.data.synthetic import make_synthetic_dataset
    from recommendation_tpu.tune import GridTuner
    from recommendation_tpu.utils.logging import Log

    train, test = make_synthetic_dataset(n_users=20, n_items=30, n_interactions=400, seed=6)
    base = default_config(**{
        "max.epoch": 1, "batch.size": 128, "embedding.size": 8,
        "item.ranking.topN": [10], "eval.interval": 1,
    })
    t = GridTuner("lightgcn", train, test, {"optimizer": ["adam", "bogus"]},
                  base_config=base, log=Log(echo=False))
    t.run()
    path = tmp_path / "r.csv"
    t.save_csv(str(path))
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    header = rows[0].keys()
    assert "error" in header and "Recall@10" in header
    err_row = next(r for r in rows if r["error"])
    assert "bogus" in err_row["error"]
    assert err_row["Recall@10"] in ("", None)  # not misaligned


def test_ncl_e_step_cadence(tiny_data, tiny_graph):
    from recommendation_tpu.models.ncl import NCL

    config = default_config(**{"embedding.size": 8, "NCL.num_clusters": 4,
                               "NCL.e_step_cadence": 3})
    model = NCL(config)
    params, state = model.init(jax.random.PRNGKey(0), tiny_graph)
    s0 = model.epoch_begin(params, state, tiny_graph, jax.random.PRNGKey(1), 0)
    s1 = model.epoch_begin(params, s0, tiny_graph, jax.random.PRNGKey(2), 1)
    assert s1 is s0  # skipped (epoch 1 % 3 != 0)
    s3 = model.epoch_begin(params, s1, tiny_graph, jax.random.PRNGKey(3), 3)
    assert s3 is not s1  # re-clustered


def test_shuffle_family_knob(tiny_graph, monkeypatch):
    """RECTPU_SHUFFLE=sort restores jax.random.permutation (ADVICE r4)."""
    key = jax.random.PRNGKey(3)
    u_swap, i_swap, _, _ = jax.jit(
        lambda k: shuffled_epoch(k, tiny_graph, 8)
    )(key)
    monkeypatch.setenv("RECTPU_SHUFFLE", "sort")
    u_sort, i_sort, _, nb = jax.jit(
        lambda k: shuffled_epoch(k, tiny_graph, 8)
    )(key)
    # both are permutations of the same edge multiset...
    swap_pairs = sorted(zip(np.asarray(u_swap).ravel(), np.asarray(i_swap).ravel()))
    sort_pairs = sorted(zip(np.asarray(u_sort).ravel(), np.asarray(i_sort).ravel()))
    assert swap_pairs == sort_pairs
    # ...drawn from different families (orders differ for this key)
    assert not np.array_equal(np.asarray(u_swap), np.asarray(u_sort))


def test_refresh_vals_resurrection_check(monkeypatch):
    """RECTPU_DEBUG_CHECKS flags a refresh that resurrects a build-time-zero
    edge (the Bucket.ridx dead-slot contract, ADVICE r4)."""
    import pytest

    from recommendation_tpu.graph.bucketed import build_bucketed, refresh_vals

    rows = np.array([0, 0, 1, 1], dtype=np.int64)
    cols = np.array([1, 0, 0, 1], dtype=np.int64)
    vals = np.array([1.0, 0.0, 1.0, 1.0], dtype=np.float32)  # edge 1 dead
    csr = build_bucketed(rows, cols, vals, 2, 2)
    monkeypatch.setenv("RECTPU_DEBUG_CHECKS", "1")
    # mask-style refresh (preserves zeros): fine
    out = refresh_vals(csr, jnp.asarray(vals) * 0.5)
    jax.block_until_ready(jax.tree_util.tree_leaves(out.buckets[0].val))
    # resurrecting the dead edge: flagged
    with pytest.raises(Exception, match="resurrect|NONZERO"):
        bad = refresh_vals(csr, jnp.ones(4, jnp.float32))
        jax.block_until_ready(jax.tree_util.tree_leaves(bad.buckets[0].val))
