"""Social layer: Relation contracts, motif algebra vs oracles, synthesizer."""

import numpy as np
import scipy.sparse as sp

from recommendation_tpu.data.social import (
    Relation,
    esrf_motif_adjacency,
    mhcn_hypergraph_channels,
    row_normalize,
    sept_social_views,
    synthesize_social,
    triangular_motif_matrices,
)


def _toy_social():
    # users 0..3; mutual pair (0,1); one-way 0->2, 2->3, 3->0
    user_map = {f"u{i}": i for i in range(4)}
    triples = [
        ["u0", "u1", 1.0], ["u1", "u0", 1.0],
        ["u0", "u2", 1.0], ["u2", "u3", 1.0], ["u3", "u0", 1.0],
    ]
    return Relation(triples, user_map), user_map


def test_relation_contracts():
    rel, user_map = _toy_social()
    assert rel.size() == (4, 5)  # 4 users are followed; 5 relations
    assert rel.has_followee("u0", "u1")
    assert not rel.has_followee("u1", "u2")
    assert rel.weight("u0", "u2") == 1.0
    # unseen users dropped
    rel2 = Relation([["u0", "zz", 1.0]], user_map)
    assert rel2.size()[1] == 0


def test_bidirectional_social_mat():
    rel, _ = _toy_social()
    bi = rel.get_bidirectional_social_mat().toarray()
    expected = np.zeros((4, 4))
    expected[0, 1] = expected[1, 0] = 1.0
    assert np.allclose(bi, expected)


def test_motif_matrices_symmetry_and_types():
    rel, _ = _toy_social()
    S = rel.get_social_mat()
    Y = sp.random(4, 6, density=0.5, random_state=0, format="csr", dtype=np.float32)
    A = triangular_motif_matrices(S, Y)
    assert len(A) == 10
    # A1-A5, A9 are symmetric by construction
    for idx in (0, 1, 2, 3, 4, 8):
        assert np.allclose(A[idx].toarray(), A[idx].toarray().T, atol=1e-6), idx
    # one-way-triangle motif A5: add the transitive edge 0->3 closing
    # 0->2->3 into a feed-forward triangle; A5[0,3] must then fire
    user_map = {f"u{i}": i for i in range(4)}
    rel_t = Relation(
        [["u0", "u2", 1.0], ["u2", "u3", 1.0], ["u0", "u3", 1.0]], user_map
    )
    A_t = triangular_motif_matrices(rel_t.get_social_mat(), Y)
    assert A_t[4].toarray()[0, 3] > 0


def test_mhcn_channels_row_normalized():
    rel, _ = _toy_social()
    S = rel.get_social_mat()
    Y = sp.random(4, 6, density=0.9, random_state=1, format="csr", dtype=np.float32)
    hs, hj, hp = mhcn_hypergraph_channels(S, Y, purchase_threshold=0)
    for mat in (hs, hj, hp):
        sums = np.asarray(mat.sum(axis=1)).flatten()
        nonzero = sums > 0
        assert np.allclose(sums[nonzero], 1.0, atol=1e-5)


def test_esrf_and_sept_views_shapes():
    rel, _ = _toy_social()
    S = rel.get_social_mat()
    Y = sp.random(4, 6, density=0.5, random_state=2, format="csr", dtype=np.float32)
    esrf = esrf_motif_adjacency(S, Y, threshold=0)
    assert esrf.shape == (4, 4)
    friend, sharing = sept_social_views(rel.get_bidirectional_social_mat(), Y)
    assert friend.shape == sharing.shape == (4, 4)
    # sym-normalized: diagonal entries nonzero via +I
    assert (friend.diagonal() > 0).all()


def test_row_normalize_oracle():
    m = sp.csr_matrix(np.array([[2.0, 2.0], [0.0, 0.0]], dtype=np.float32))
    out = row_normalize(m).toarray()
    assert np.allclose(out[0], [0.5, 0.5])
    assert np.allclose(out[1], [0.0, 0.0])


def test_synthesize_social_contract(tiny_data):
    triples = synthesize_social(tiny_data, threshold=0.35, top_k=5)
    users = set(tiny_data.user)
    assert triples, "synthesizer produced no edges"
    for u, v, w in triples[:200]:
        assert u in users and v in users
        assert u != v
        assert w >= 0.0
    # every user has at least top_k-ish outgoing edges
    from collections import Counter

    out_deg = Counter(t[0] for t in triples)
    assert min(out_deg.values()) >= 1
    assert len(out_deg) == tiny_data.user_num
