"""Serving path: batch API correctness + real HTTP round trips."""

import json
import urllib.request

import numpy as np
import pytest

from recommendation_tpu.config import default_config
from recommendation_tpu.models.lightgcn import LightGCN
from recommendation_tpu.serve.http import serve_http
from recommendation_tpu.serve.service import RecommenderService
from recommendation_tpu.train.recommender import GraphRecommender
from recommendation_tpu.utils.logging import Log


@pytest.fixture(scope="module")
def trained(tiny_data_module, tiny_graph_module):
    config = default_config(**{
        "max.epoch": 3, "batch.size": 512, "embedding.size": 16,
        "item.ranking.topN": [10], "eval.interval": 3,
    })
    rec = GraphRecommender(
        LightGCN(config), tiny_data_module, config, graph=tiny_graph_module,
        log=Log(echo=False),
    )
    rec.build()
    rec.train()
    return rec


@pytest.fixture(scope="module")
def tiny_data_module():
    from recommendation_tpu.data.interaction import Interaction
    from recommendation_tpu.data.synthetic import make_synthetic_dataset

    train, test = make_synthetic_dataset(n_users=60, n_items=100, n_interactions=2500, seed=3)
    return Interaction(train, test)


@pytest.fixture(scope="module")
def tiny_graph_module(tiny_data_module):
    from recommendation_tpu.graph.device import DeviceGraph

    return DeviceGraph(tiny_data_module, backend="dense")


@pytest.fixture(scope="module")
def service(trained):
    return RecommenderService.from_recommender(trained)


def test_recommend_excludes_seen(service, tiny_data_module):
    users = list(tiny_data_module.user)[:5]
    results = service.recommend(users, k=10)
    for user, items in zip(users, results):
        assert items is not None and len(items) == 10
        seen = set(tiny_data_module.training_set_u[user])
        rec_items = [r["item"] for r in items]
        assert not (set(rec_items) & seen), "recommended a train positive"
        assert all(isinstance(r["score"], float) for r in items)


def test_recommend_unknown_user(service):
    out = service.recommend(["nope", list(service.data.user)[0]], k=5)
    assert out[0] is None
    assert out[1] is not None and len(out[1]) == 5


def test_recommend_matches_eval_topk(service, trained, tiny_data_module):
    """Service results must equal the evaluator's top-k for the same user."""
    result = trained.test()
    ref = result.as_reference_dict(tiny_data_module)
    user = tiny_data_module.id2user[int(result.test_user_ids[0])]
    got = service.recommend([user], k=10)[0]
    assert [r["item"] for r in got] == [i for i, _ in ref[user][:10]]


def test_service_sharded_topk_path(trained, tiny_data_module):
    """Mesh-backed service (row-sharded item table) must rank identically to
    the single-device path when seen-exclusion is off."""
    from recommendation_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=1, model=4))
    svc_mesh = RecommenderService.from_recommender(trained, mesh=mesh)
    svc_plain = RecommenderService.from_recommender(trained)
    uids = [0, 3, 7]
    s_m, i_m = svc_mesh.recommend_ids(uids, k=5, exclude_seen=False)
    s_p, i_p = svc_plain.recommend_ids(uids, k=5, exclude_seen=False)
    assert np.array_equal(i_m, i_p)
    assert np.allclose(s_m, s_p, atol=1e-5)


def test_http_round_trip(service):
    server = serve_http(service, port=0, background=True)
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"

        health = json.load(urllib.request.urlopen(f"{base}/healthz"))
        assert health["status"] == "ok"

        user = list(service.data.user)[0]
        resp = json.load(urllib.request.urlopen(f"{base}/recommend?user={user}&k=5"))
        assert resp["user"] == user and len(resp["items"]) == 5

        # POST batch
        body = json.dumps({"users": [user, "nope"], "k": 3}).encode()
        req = urllib.request.Request(
            f"{base}/recommend", data=body, headers={"Content-Type": "application/json"}
        )
        batch = json.load(urllib.request.urlopen(req))
        assert len(batch["results"]) == 2
        assert len(batch["results"][0]["items"]) == 3
        assert batch["results"][1]["items"] is None

        # error paths
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/recommend?user=nope")
        assert e.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/recommend")
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/recommend?user={user}&k=abc")
        assert e.value.code == 400
    finally:
        server.shutdown()


def test_microbatcher_correctness_and_coalescing(trained):
    """Concurrent requests through the micro-batcher must return exactly the
    direct-path answers, and a synchronized burst must coalesce into fewer
    device calls than requests."""
    import threading

    service = RecommenderService.from_recommender(trained)
    uids = list(range(service.data.user_num))
    direct = {u: service.recommend_ids([u], 5) for u in uids[:24]}

    batcher = service.enable_batching(max_batch=256, max_wait_ms=20.0)
    try:
        results = {}
        errors = []
        gate = threading.Barrier(24)

        def worker(u):
            try:
                gate.wait(timeout=10)
                results[u] = service.recommend_ids([u], 5)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(u,)) for u in uids[:24]]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errors, errors
        for u in uids[:24]:
            s_d, i_d = direct[u]
            s_b, i_b = results[u]
            assert np.array_equal(np.asarray(i_d), np.asarray(i_b)), u
            assert np.allclose(np.asarray(s_d), np.asarray(s_b)), u
        # the synchronized burst must have been coalesced
        assert batcher.stats["requests"] == 24
        assert batcher.stats["device_calls"] < 24
    finally:
        service.disable_batching()


def test_ragged_batch_padding_matches_per_user(trained):
    """Ragged query batches are padded to power-of-two buckets before device
    indexing (compile-cache bound for micro-batcher waves) and sliced back —
    every ragged size must return exactly the per-user answers."""
    service = RecommenderService.from_recommender(trained)
    per_user = {u: service.recommend_ids([u], 5) for u in range(13)}
    for n in (1, 3, 5, 13):
        s, ids = service.recommend_ids(list(range(n)), 5)
        assert s.shape == (n, 5) and ids.shape == (n, 5)
        for u in range(n):
            assert np.array_equal(np.asarray(ids)[u], np.asarray(per_user[u][1])[0]), u
            assert np.allclose(np.asarray(s)[u], np.asarray(per_user[u][0])[0]), u


def test_http_concurrent_load(trained):
    """Load smoke: 60 concurrent HTTP requests against the batched server —
    every response 200 with k results, server survives."""
    import threading

    service = RecommenderService.from_recommender(trained)
    server = serve_http(service, port=0, background=True, batching=True)
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        users = list(service.data.user)[:12]
        oks = []
        errors = []

        def hit(i):
            try:
                u = users[i % len(users)]
                resp = json.load(
                    urllib.request.urlopen(f"{base}/recommend?user={u}&k=5", timeout=30)
                )
                assert len(resp["items"]) == 5
                oks.append(i)
            except Exception as e:  # noqa: BLE001
                errors.append((i, e))

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(60)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors[:3]
        assert len(oks) == 60
        batcher = service._batcher
        assert batcher is not None and batcher.stats["requests"] == 60
    finally:
        server.shutdown()
        service.disable_batching()


def test_sharded_serving_with_exclusions_matches_single(trained):
    """On a mesh, recommend_ids with exclude_seen must use the sharded
    top-k + post-merge masking and agree with the single-device path."""
    from recommendation_tpu.parallel.mesh import MeshSpec, make_mesh

    plain = RecommenderService.from_recommender(trained)
    mesh = make_mesh(MeshSpec(data=4, model=2))
    sharded = RecommenderService.from_recommender(trained, mesh=mesh)
    uids = list(range(0, trained.data.user_num, 3))
    s0, i0 = plain.recommend_ids(uids, 7, exclude_seen=True)
    s1, i1 = sharded.recommend_ids(uids, 7, exclude_seen=True)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    assert np.allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)
    # no recommended item may be a train positive
    mat = trained.data.interaction_mat
    for row, uid in enumerate(uids):
        seen = set(mat.indices[mat.indptr[uid]:mat.indptr[uid + 1]].tolist())
        assert not (set(np.asarray(i1)[row].tolist()) & seen)


def test_batcher_closed_raises_and_falls_back(trained):
    """submit() after close() raises BatcherClosed (a dedicated type so real
    device RuntimeErrors still propagate), and the service transparently
    answers the request on the direct path."""
    from recommendation_tpu.serve.batching import BatcherClosed

    service = RecommenderService.from_recommender(trained)
    batcher = service.enable_batching()
    batcher.close()
    with pytest.raises(BatcherClosed):
        batcher.submit([0], 5)
    # the service-level call still succeeds (falls back to direct)
    s, i = service.recommend_ids([0], 5)
    assert np.asarray(i).shape == (1, 5)
    service.disable_batching()


def test_mask_seen_post_merge_unit():
    import scipy.sparse as sp

    from recommendation_tpu.ops.topk import (
        MASK_VALUE,
        mask_seen_post_merge,
        train_edge_keys,
    )

    # 3 users x 4 items; train edges: (0,1), (1,2), (2,0)
    mat = sp.csr_matrix(
        (np.ones(3), ([0, 1, 2], [1, 2, 0])), shape=(3, 4)
    )
    keys = train_edge_keys(mat, 4)
    ids = np.array([[1, 0, 4], [2, 3, 1], [0, 5, 2]])  # 4,5 = padding rows
    scores = np.ones_like(ids, dtype=np.float32)
    out = mask_seen_post_merge(scores, ids, [0, 1, 2], keys, 4, MASK_VALUE)
    expect_masked = np.array([
        [True, False, True],    # (0,1) seen; id 4 padded
        [True, False, False],   # (1,2) seen
        [True, True, False],    # (2,0) seen; id 5 padded
    ])
    assert np.array_equal(out == MASK_VALUE, expect_masked)
    assert (scores == 1.0).all()  # input untouched (copy semantics)
