"""Pallas streaming loss kernels vs XLA oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.losses import uniformity_loss
from recommendation_tpu.ops.pallas_losses import (
    catalog_logsumexp,
    catalog_logsumexp_reference,
    uniformity_streaming,
)

RNG = np.random.default_rng(3)


def test_catalog_logsumexp_matches_reference():
    q = jnp.asarray(RNG.normal(size=(16, 32)).astype(np.float32))
    x = jnp.asarray(RNG.normal(size=(700, 32)).astype(np.float32))  # partial block
    got = catalog_logsumexp(q, x, 0.2, 256, True)
    want = catalog_logsumexp_reference(q, x, 0.2)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_catalog_logsumexp_gradients_match():
    q = jnp.asarray(RNG.normal(size=(8, 16)).astype(np.float32))
    x = jnp.asarray(RNG.normal(size=(300, 16)).astype(np.float32))

    def f_pallas(q, x):
        return jnp.sum(catalog_logsumexp(q, x, 0.5, 128, True) ** 2)

    def f_ref(q, x):
        return jnp.sum(catalog_logsumexp_reference(q, x, 0.5) ** 2)

    gq_p, gx_p = jax.grad(f_pallas, argnums=(0, 1))(q, x)
    gq_r, gx_r = jax.grad(f_ref, argnums=(0, 1))(q, x)
    assert np.allclose(np.asarray(gq_p), np.asarray(gq_r), atol=1e-3)
    assert np.allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3)


def test_uniformity_streaming_matches_dense():
    x = jnp.asarray(RNG.normal(size=(333, 16)).astype(np.float32))
    got = float(uniformity_streaming(x, block_n=128))
    want = float(uniformity_loss(x))
    assert abs(got - want) < 1e-4


def test_uniformity_streaming_differentiable():
    x = jnp.asarray(RNG.normal(size=(100, 8)).astype(np.float32))
    g_s = jax.grad(lambda v: uniformity_streaming(v, block_n=64))(x)
    g_d = jax.grad(uniformity_loss)(x)
    assert np.allclose(np.asarray(g_s), np.asarray(g_d), atol=1e-4)
