"""Unit tests for L1/L2: io, Interaction, normalization (SURVEY.md §4.1)."""

import numpy as np
import scipy.sparse as sp

from recommendation_tpu.data.interaction import Interaction, normalize_graph_mat
from recommendation_tpu.data.io import load_data
from recommendation_tpu.data.synthetic import make_synthetic_dataset, write_dataset


def test_load_data_contract(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text("u1 i1 1.0\nu1 i2\n\nu2 i1 0.5\nbad\n")
    rows = load_data(str(p))
    assert rows == [["u1", "i1", 1.0], ["u1", "i2", 1.0], ["u2", "i1", 0.5]]
    assert load_data(str(tmp_path / "missing.txt")) == []


def test_interaction_id_insertion_order():
    train = [["b", "y", 1.0], ["a", "x", 1.0], ["b", "x", 1.0]]
    data = Interaction(train, [])
    # insertion order over training data (selfcf.py:279-290)
    assert data.user == {"b": 0, "a": 1}
    assert data.item == {"y": 0, "x": 1}
    assert data.user_num == 2 and data.item_num == 2


def test_interaction_test_filtering():
    train = [["a", "x", 1.0]]
    test = [["a", "x", 1.0], ["unknown", "x", 1.0], ["a", "unknown", 1.0]]
    data = Interaction(train, test)
    # test entries restricted to seen users/items (selfcf.py:292-295)
    assert set(data.test_set) == {"a"}
    assert set(data.test_set["a"]) == {"x"}


def test_bipartite_adjacency_structure():
    train = [["u0", "i0", 1.0], ["u0", "i1", 1.0], ["u1", "i0", 1.0]]
    data = Interaction(train, [])
    adj = data.ui_adj.toarray()
    n_u = data.user_num
    # A = [[0, R], [R^T, 0]]
    assert np.allclose(adj[:n_u, :n_u], 0)
    assert np.allclose(adj[n_u:, n_u:], 0)
    assert np.allclose(adj[:n_u, n_u:], data.interaction_mat.toarray())
    assert np.allclose(adj, adj.T)


def test_normalize_graph_mat_against_oracle(rng_np):
    a = sp.random(50, 50, density=0.1, random_state=1, format="csr", dtype=np.float32)
    a = a + a.T
    norm = normalize_graph_mat(a).toarray()
    d = np.asarray(a.sum(axis=1)).flatten()
    d_inv_sqrt = np.where(d > 0, d ** -0.5, 0)
    expected = d_inv_sqrt[:, None] * a.toarray() * d_inv_sqrt[None, :]
    assert np.allclose(norm, expected, atol=1e-6)


def test_normalize_rectangular_row_norm():
    a = sp.csr_matrix(np.array([[1, 1, 0], [0, 2, 0]], dtype=np.float32))
    norm = normalize_graph_mat(a).toarray()
    assert np.allclose(norm.sum(axis=1), [1.0, 1.0])


def test_synthetic_dataset_roundtrip(tmp_path):
    train, test = make_synthetic_dataset(n_users=20, n_items=40, n_interactions=600, seed=1)
    write_dataset(str(tmp_path), train, test)
    loaded = load_data(str(tmp_path / "train.txt"))
    assert len(loaded) == len(train)
    data = Interaction(train, test)
    assert data.user_num <= 20 and data.item_num <= 40
    assert data.test_size()[0] > 0
    # every user in train has at least one test or train item
    assert all(len(v) > 0 for v in data.training_set_u.values())
