"""ops/rows.py: gather forward + one-hot MXU backward == plain indexing."""

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.ops.rows import ONEHOT_BWD_MAX_ROWS, take_rows


def test_take_rows_forward_and_grad_match_indexing():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(137, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 137, 64).astype(np.int32))

    np.testing.assert_array_equal(take_rows(table, idx), table[idx])

    def loss_ref(t):
        r = t[idx]
        return jnp.sum(jax.nn.softplus(r * 1.7 - 0.3))

    def loss_new(t):
        r = take_rows(t, idx)
        return jnp.sum(jax.nn.softplus(r * 1.7 - 0.3))

    g_ref = jax.grad(loss_ref)(table)
    g_new = jax.grad(loss_new)(table)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), rtol=1e-6, atol=1e-7)


def test_take_rows_large_table_falls_through():
    table = jnp.zeros((ONEHOT_BWD_MAX_ROWS + 1, 4))
    idx = jnp.zeros((8,), jnp.int32)
    out = take_rows(table, idx)  # plain indexing path, no custom vjp
    assert out.shape == (8, 4)


def test_take_rows_duplicate_indices_accumulate():
    """Multiple batch rows hitting the same table row must sum cotangents."""
    table = jnp.ones((5, 3))
    idx = jnp.asarray([2, 2, 2, 0], jnp.int32)
    g = jax.grad(lambda t: jnp.sum(take_rows(t, idx) * 2.0))(table)
    np.testing.assert_allclose(np.asarray(g)[2], np.full(3, 6.0))
    np.testing.assert_allclose(np.asarray(g)[0], np.full(3, 2.0))
    np.testing.assert_allclose(np.asarray(g)[1], np.zeros(3))
