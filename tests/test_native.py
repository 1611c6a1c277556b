"""Native C++ loader vs the Python semantics oracle."""

import os
import subprocess

import numpy as np
import pytest

from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.data.io import load_data
from recommendation_tpu.data.synthetic import make_synthetic_dataset, write_dataset


@pytest.fixture(scope="module")
def native_lib():
    from recommendation_tpu.native import _lib_path, get_lib

    if not os.path.exists(_lib_path()):
        try:
            from recommendation_tpu.native.build import build

            build(verbose=False)
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("g++ unavailable — native loader not built")
    import recommendation_tpu.native as nat

    nat._LIB_TRIED = False  # re-probe after build
    lib = get_lib()
    if lib is None:
        pytest.skip("native library failed to load")
    return lib


@pytest.fixture(scope="module")
def dataset_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_ds")
    train, test = make_synthetic_dataset(n_users=50, n_items=80, n_interactions=1500, seed=11)
    write_dataset(str(d), train, test)
    return os.path.join(d, "train.txt"), os.path.join(d, "test.txt")


def test_native_parse_matches_python(native_lib, dataset_files):
    from recommendation_tpu.native.loader import parse_triples

    train_path, _ = dataset_files
    assert parse_triples(native_lib, train_path) == load_data(train_path)


def test_native_indexing_matches_interaction(native_lib, dataset_files):
    from recommendation_tpu.native.loader import load_indexed

    train_path, _ = dataset_files
    idx = load_indexed(native_lib, train_path)
    oracle = Interaction(load_data(train_path), [])
    assert idx.user_ids == [oracle.id2user[i] for i in range(oracle.user_num)]
    assert idx.item_ids == [oracle.id2item[i] for i in range(oracle.item_num)]
    assert np.array_equal(idx.users, oracle.edge_users)
    assert np.array_equal(idx.items, oracle.edge_items)
    assert np.allclose(idx.weights, oracle.edge_weights)


def test_from_files_equivalent(native_lib, dataset_files):
    train_path, test_path = dataset_files
    fast = Interaction.from_files(train_path, test_path)
    oracle = Interaction(load_data(train_path), load_data(test_path))
    assert fast.user == oracle.user
    assert fast.item == oracle.item
    assert fast.test_set == oracle.test_set
    assert np.allclose(fast.norm_adj.toarray(), oracle.norm_adj.toarray(), atol=1e-6)
    assert fast.training_set_u == oracle.training_set_u


def test_missing_file_handling(native_lib):
    from recommendation_tpu.native.loader import load_indexed

    assert load_indexed(native_lib, "/nonexistent/file.txt") is None
    data = Interaction.from_files("/nonexistent/file.txt")
    assert data.user_num == 0


def test_native_bucketize_matches_numpy():
    """The C++ bucket builder must produce BIT-IDENTICAL tables to the numpy
    builder (same cap schedule, row order, slot order, row maps) — on both
    sorted and unsorted COO input."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from recommendation_tpu.graph import bucketed as B
    from recommendation_tpu.native import get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("native library not built")

    rng = np.random.default_rng(0)
    n_rows, n_cols, e = 301, 211, 4000
    rows = (rng.pareto(0.7, size=e) % n_rows).astype(np.int64)
    cols = rng.integers(0, n_cols, e).astype(np.int64)
    mat = sp.coo_matrix((rng.normal(size=e).astype(np.float32), (rows, cols)),
                        shape=(n_rows, n_cols))
    mat.sum_duplicates()
    coo = mat.tocoo()

    for order in ("sorted", "shuffled"):
        r, c, v = coo.row.copy(), coo.col.copy(), coo.data.copy()
        if order == "shuffled":
            perm = rng.permutation(len(r))
            r, c, v = r[perm], c[perm], v[perm]
        native = B.build_bucketed(r, c, v, n_rows, n_cols)

        # force the numpy path by hiding the library
        import recommendation_tpu.native as nat

        saved, saved_tried = nat._LIB, nat._LIB_TRIED
        nat._LIB, nat._LIB_TRIED = None, True
        try:
            ref = B.build_bucketed(r, c, v, n_rows, n_cols)
        finally:
            nat._LIB, nat._LIB_TRIED = saved, saved_tried

        assert len(native.buckets) == len(ref.buckets), order
        for a, b in zip(native.buckets, ref.buckets):
            assert a.cap == b.cap
            assert np.array_equal(np.asarray(a.idx), np.asarray(b.idx)), order
            assert np.array_equal(np.asarray(a.val), np.asarray(b.val)), order
            assert np.array_equal(np.asarray(a.edge), np.asarray(b.edge)), order
        assert np.array_equal(np.asarray(native.gather_pos), np.asarray(ref.gather_pos))
        assert np.array_equal(np.asarray(native.node_of_row), np.asarray(ref.node_of_row))

        # and the product is actually correct
        x = rng.normal(size=(n_cols, 8)).astype(np.float32)
        out = np.asarray(B.pull(native, jnp.asarray(x)))
        assert np.allclose(out, coo @ x, atol=1e-4)
