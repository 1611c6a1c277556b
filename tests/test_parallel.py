"""Distributed semantics on the 8-device CPU mesh (SURVEY.md §4.4):
sharded lookup / top-k / streaming losses vs single-device oracles, and
data-parallel gradient equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from recommendation_tpu.parallel.collectives import (
    sharded_batch_softmax_denominator,
    sharded_topk,
    sharded_uniformity,
)
from recommendation_tpu.parallel.embedding import pad_rows_to, sharded_embedding_lookup
from recommendation_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshSpec,
    default_mesh_shape,
    make_mesh,
    shard_params,
    table_sharding,
)

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests require the 8-device CPU mesh"
    return make_mesh(MeshSpec(data=4, model=2))


@pytest.fixture(scope="module")
def model_mesh():
    # all 8 devices on the model axis for collective tests
    return make_mesh(MeshSpec(data=1, model=8))


def test_default_mesh_shape():
    spec = default_mesh_shape(8)
    assert spec.n_devices == 8
    assert spec.model in (1, 2)


def test_sharded_embedding_lookup_matches_gather(model_mesh):
    table = jnp.asarray(RNG.normal(size=(64, 16)).astype(np.float32))
    ids = jnp.asarray(RNG.integers(0, 64, size=37).astype(np.int32))
    table_sh = jax.device_put(table, table_sharding(model_mesh))
    out = sharded_embedding_lookup(table_sh, ids, model_mesh)
    assert np.allclose(np.asarray(out), np.asarray(table)[np.asarray(ids)], atol=1e-6)


def test_sharded_topk_matches_dense(model_mesh):
    users = jnp.asarray(RNG.normal(size=(9, 8)).astype(np.float32))
    items = jnp.asarray(RNG.normal(size=(40, 8)).astype(np.float32))
    items_p = pad_rows_to(items, 8)  # zero rows score 0 — fine for this data
    items_sh = jax.device_put(items_p, table_sharding(model_mesh))
    scores, ids = sharded_topk(users, items_sh, k=5, mesh=model_mesh)
    dense = np.asarray(users) @ np.asarray(items_p).T
    for b in range(9):
        oracle = np.argsort(-dense[b])[:5]
        assert set(np.asarray(ids)[b].tolist()) == set(oracle.tolist())
        assert np.allclose(np.sort(np.asarray(scores)[b]), np.sort(dense[b][oracle]), atol=1e-5)


def test_sharded_logsumexp_matches_dense(model_mesh):
    users = jnp.asarray(RNG.normal(size=(7, 8)).astype(np.float32))
    items = jnp.asarray(RNG.normal(size=(64, 8)).astype(np.float32))
    items_sh = jax.device_put(items, table_sharding(model_mesh))
    out = sharded_batch_softmax_denominator(users, items_sh, 0.2, model_mesh)
    oracle = jax.nn.logsumexp(np.asarray(users) @ np.asarray(items).T / 0.2, axis=1)
    assert np.allclose(np.asarray(out), np.asarray(oracle), atol=1e-5)


def test_sharded_uniformity_matches_dense(model_mesh):
    from recommendation_tpu.losses import uniformity_loss

    x = jnp.asarray(RNG.normal(size=(64, 8)).astype(np.float32))
    x_sh = jax.device_put(x, table_sharding(model_mesh))
    out = float(sharded_uniformity(x_sh, model_mesh))
    oracle = float(uniformity_loss(x))
    assert abs(out - oracle) < 1e-4


def test_dp_gradient_equivalence(mesh):
    """N-device DP run == single-device run (fp32) for one grad step."""
    w = jnp.asarray(RNG.normal(size=(16, 4)).astype(np.float32))
    x = jnp.asarray(RNG.normal(size=(32, 16)).astype(np.float32))
    y = jnp.asarray(RNG.normal(size=(32, 4)).astype(np.float32))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, x, y)

    dp = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    g_sharded = jax.jit(jax.grad(loss))(
        jax.device_put(w, rep), jax.device_put(x, dp), jax.device_put(y, dp)
    )
    assert np.allclose(np.asarray(g_single), np.asarray(g_sharded), atol=1e-6)


def test_shard_params_placement(mesh):
    params = {
        "user_emb": jnp.zeros((16, 4)),
        "item_emb": jnp.zeros((8, 4)),
        "predictor": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))},
    }
    placed = shard_params(params, mesh)
    assert placed["user_emb"].sharding.spec == P(MODEL_AXIS, None)
    assert placed["predictor"]["w"].sharding.spec == P()


def test_multichip_dryrun_entry():
    """The driver's dryrun path must work on the CPU mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
