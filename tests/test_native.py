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
