"""Numerics of the fused Pallas dense-chain propagation kernel
(`ops/pallas_prop.py`) against the XLA bipartite-block chain it replaces —
values AND gradients, interpret mode (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendation_tpu.models.lightgcn import lightgcn_propagate
from recommendation_tpu.ops.pallas_prop import chain_supported, dense_chain_mean


class _Adj:
    compute_dtype = "bfloat16"
    backend = "dense"
    pull = None


def _xla_chain(r_bf16, u0, i0, n_layers):
    """The exact XLA path the kernel replaces (bf16 dots, f32 accumulate)."""
    def mm(a, b):
        return jnp.dot(a, b.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

    u, i = u0.astype(jnp.float32), i0.astype(jnp.float32)
    acc_u, acc_i = u, i
    for _ in range(n_layers):
        u, i = mm(r_bf16, i), mm(r_bf16.T, u)
        acc_u, acc_i = acc_u + u, acc_i + i
    inv = 1.0 / (n_layers + 1.0)
    return acc_u * inv, acc_i * inv


@pytest.mark.parametrize("n_layers", [1, 3])
def test_chain_matches_xla_fwd_and_grad(n_layers):
    rng = np.random.default_rng(0)
    n_u, n_i, d = 37, 53, 8  # deliberately unaligned: exercises padding
    r = jnp.asarray(rng.normal(size=(n_u, n_i)).astype(np.float32) * 0.1).astype(
        jnp.bfloat16
    )
    u0 = jnp.asarray(rng.normal(size=(n_u, d)).astype(np.float32))
    i0 = jnp.asarray(rng.normal(size=(n_i, d)).astype(np.float32))

    want_u, want_i = _xla_chain(r, u0, i0, n_layers)
    got_u, got_i = dense_chain_mean(r, u0, i0, n_layers, True)
    np.testing.assert_allclose(got_u, want_u, rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(got_i, want_i, rtol=2e-2, atol=2e-3)

    def loss_ref(u0, i0):
        a, b = _xla_chain(r, u0, i0, n_layers)
        return jnp.sum(a * a) + jnp.sum(jnp.sin(b))

    def loss_ker(u0, i0):
        a, b = dense_chain_mean(r, u0, i0, n_layers, True)
        return jnp.sum(a * a) + jnp.sum(jnp.sin(b))

    gu_ref, gi_ref = jax.grad(loss_ref, argnums=(0, 1))(u0, i0)
    gu_ker, gi_ker = jax.grad(loss_ker, argnums=(0, 1))(u0, i0)
    np.testing.assert_allclose(gu_ker, gu_ref, rtol=3e-2, atol=3e-3)
    np.testing.assert_allclose(gi_ker, gi_ref, rtol=3e-2, atol=3e-3)


def test_chain_supported_budget():
    assert chain_supported(943, 1682, 64)  # the headline-bench shape
    assert not chain_supported(50_000, 100_000, 64)  # bucketed regime


def test_propagate_gate_off_on_cpu(monkeypatch):
    """On the CPU backend the gate must keep the XLA chain (no Mosaic)."""
    from recommendation_tpu.models.lightgcn import _use_prop_kernel

    assert jax.default_backend() == "cpu"
    assert not _use_prop_kernel(943, 1682, 64)


@pytest.mark.parametrize("n_layers", [1, 3])
def test_chain_f32_matches_xla(n_layers):
    """f32 kernel variant (round 4): both dots stay f32 on the MXU, so the
    match against the f32 XLA chain is tight — not bf16-tolerance."""
    rng = np.random.default_rng(1)
    n_u, n_i, d = 37, 53, 8
    r = jnp.asarray(rng.normal(size=(n_u, n_i)).astype(np.float32) * 0.1)
    u0 = jnp.asarray(rng.normal(size=(n_u, d)).astype(np.float32))
    i0 = jnp.asarray(rng.normal(size=(n_i, d)).astype(np.float32))

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    u, i = u0, i0
    acc_u, acc_i = u, i
    for _ in range(n_layers):
        u, i = mm(r, i), mm(r.T, u)
        acc_u, acc_i = acc_u + u, acc_i + i
    inv = 1.0 / (n_layers + 1.0)
    want_u, want_i = acc_u * inv, acc_i * inv

    got_u, got_i = dense_chain_mean(r, u0, i0, n_layers, True)
    np.testing.assert_allclose(got_u, want_u, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_i, want_i, rtol=1e-5, atol=1e-6)

    gu_ker, gi_ker = jax.grad(
        lambda a, b: jnp.sum(dense_chain_mean(r, a, b, n_layers, True)[0] ** 2)
        + jnp.sum(jnp.sin(dense_chain_mean(r, a, b, n_layers, True)[1])),
        argnums=(0, 1),
    )(u0, i0)

    def xla_loss(a, b):
        u, i = a, b
        acc_u, acc_i = u, i
        for _ in range(n_layers):
            u, i = mm(r, i), mm(r.T, u)
            acc_u, acc_i = acc_u + u, acc_i + i
        au, ai = acc_u * inv, acc_i * inv
        return jnp.sum(au ** 2) + jnp.sum(jnp.sin(ai))

    gu_ref, gi_ref = jax.grad(xla_loss, argnums=(0, 1))(u0, i0)
    np.testing.assert_allclose(gu_ker, gu_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gi_ker, gi_ref, rtol=1e-5, atol=1e-6)


def test_chain_f32_budget_gate():
    # f32 R̂ doubles the resident bytes: the headline shape still fits,
    # a 2x-items shape that fits at bf16 no longer does at f32
    assert chain_supported(943, 1682, 64, r_itemsize=4)
    assert chain_supported(1200, 2048, 64, r_itemsize=2)
    assert not chain_supported(1200, 2048, 64, r_itemsize=4)


@pytest.mark.parametrize("n_layers,k", [(3, 1), (3, 2), (3, 3), (1, 1)])
def test_chain_mean_layer_matches_xla(n_layers, k):
    """mean+layer variant (NCL's layer-contrast path): all four outputs and
    the gradients through ALL of them — including the injected layer-k
    cotangent — must match the XLA return_layers chain. f32, tight tol."""
    from recommendation_tpu.ops.pallas_prop import dense_chain_mean_layer

    rng = np.random.default_rng(2)
    n_u, n_i, d = 37, 53, 8
    r = jnp.asarray(rng.normal(size=(n_u, n_i)).astype(np.float32) * 0.1)
    u0 = jnp.asarray(rng.normal(size=(n_u, d)).astype(np.float32))
    i0 = jnp.asarray(rng.normal(size=(n_i, d)).astype(np.float32))

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def xla(a, b):
        u, i = a, b
        acc_u, acc_i = u, i
        uk, ik = u, i
        for layer in range(1, n_layers + 1):
            u, i = mm(r, i), mm(r.T, u)
            acc_u, acc_i = acc_u + u, acc_i + i
            if layer == k:
                uk, ik = u, i
        inv = 1.0 / (n_layers + 1.0)
        return acc_u * inv, acc_i * inv, uk, ik

    want = xla(u0, i0)
    got = dense_chain_mean_layer(r, u0, i0, n_layers, k, True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)

    def scalarize(outs):
        au, ai, uk, ik = outs
        # distinct nonlinearities per output so each cotangent is distinct
        return (jnp.sum(au ** 2) + jnp.sum(jnp.sin(ai))
                + jnp.sum(jnp.cos(uk)) + jnp.sum(uk * ik[: uk.shape[0]] if uk.shape == ik.shape else jnp.tanh(ik)))

    g_ker = jax.grad(lambda a, b: scalarize(
        dense_chain_mean_layer(r, a, b, n_layers, k, True)), argnums=(0, 1))(u0, i0)
    g_ref = jax.grad(lambda a, b: scalarize(xla(a, b)), argnums=(0, 1))(u0, i0)
    for g, w in zip(g_ker, g_ref):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
