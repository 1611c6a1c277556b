"""Fused dense bipartite LightGCN propagation — the hand-tiled Pallas kernel
for the framework's hottest op (replacing `ncl.py:419`, `selfcf.py:479`,
`directau.py:290` — K rounds of ``torch.sparse.mm`` — in the dense-MXU
regime).

Why a kernel when XLA already runs the bipartite-block matmuls on the MXU:
the layer chain

    u_{k+1} = R̂ @ i_k ;  i_{k+1} = R̂ᵀ @ u_k      (k = 0..L-1)

reuses the SAME R̂ operand 2L times forward and 2L more in the backward
chain, but XLA streams R̂ from HBM for every dot (no cross-op VMEM
residency). At the headline-bench shape (943×1682, bf16) that is ~12 × 3.4
MB = 41 MB/step of redundant R̂ traffic against a ~17 MB/step roofline.
This kernel loads R̂ into VMEM ONCE per pass and runs the whole chain —
including the mean-of-layers readout — on-chip: HBM touches only R̂ once
plus the [N, d] tables in and out.

Fits-in-VMEM regime (ML-100K through ~2k×4k at bf16) — exactly where the
dense backend is auto-selected; the large-graph regime uses the bucketed
gather backend instead (`graph/bucketed.py`).

The backward is the mirrored Horner chain (same structure, R̂ marked
constant — adjacency is never a parameter):

    au_L = gu/(L+1); ai_L = gi/(L+1)
    au_{k} = gu/(L+1) + R̂ @ ai_{k+1} ;  ai_{k} = gi/(L+1) + R̂ᵀ @ au_{k+1}

verified against jax.grad of the XLA chain in tests/test_pallas_prop.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget guard: R̂ (bf16) + 6 [N, d]-class f32 buffers must fit in
# ~16 MB/core with headroom for Mosaic's own spills.
_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def chain_supported(
    n_users: int, n_items: int, d: int, r_itemsize: int = 2, extra_tables: int = 0
) -> bool:
    """True when the fused kernel's working set fits the VMEM budget.

    ``r_itemsize`` is R̂'s bytes/element (2 for the bf16 compute regime,
    4 for the f32 one — the f32 kernel keeps full precision on the MXU and
    halves the supported shape envelope accordingly). ``extra_tables``
    charges additional live [N, d]-class buffers (the mean+layer variant
    carries 2 more outputs than the mean-only kernel)."""
    up, ip, dp = _round_up(n_users, 16), _round_up(n_items, 128), _round_up(d, 128)
    r_bytes = up * ip * r_itemsize
    tables = (3 + extra_tables) * (up + ip) * dp * 4
    return r_bytes + tables <= _VMEM_BUDGET and d <= 256


def _chain_kernel(n_layers, forward, r_ref, u_ref, i_ref, au_ref, ai_ref):
    """One grid cell: the whole layer chain with R̂ VMEM-resident.

    forward=True : (u0, i0) -> mean of layers (incl. layer 0).
    forward=False: (gu, gi) cotangents -> (du0, di0) via the Horner chain.
    Both directions are L rounds of the same two matmuls; the backward's
    1/(L+1) scaling is applied by the wrapper (linear map, so it commutes).
    """
    r = r_ref[:]  # [U, I] bf16 or f32, stays in VMEM for the whole chain
    # operand dtype follows R̂: bf16 regime casts the running tables down per
    # dot (matching the XLA chain's mm exactly); f32 regime keeps f32 on the
    # MXU (full precision, ~half throughput).
    # VMEM discipline: the running layer tables rebind SEQUENTIALLY (new_u
    # lands before i is overwritten, whose old value new_i no longer needs)
    # and the readout accumulates INTO the output refs — peak live set is
    # R̂ + 3 table-pairs instead of 5, which is what lets the f32 variant
    # fit the 16 MB scoped-vmem limit at the headline shape (the naive
    # form compiled to 16.75 MB and was rejected, round 4).
    cast = (lambda x: x.astype(jnp.bfloat16)) if r.dtype == jnp.bfloat16 else (lambda x: x)

    def mm(a, b):
        return jnp.dot(a, cast(b), preferred_element_type=jnp.float32)

    def mmt(a, b):
        return jax.lax.dot_general(
            a, cast(b),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if forward:
        u = u_ref[:]
        i = i_ref[:]
        au_ref[:] = u
        ai_ref[:] = i
        for _ in range(n_layers):
            nu = mm(r, i)      # needs old i
            i = mmt(r, u)      # needs old u; old i now dead
            u = nu
            au_ref[:] += u
            ai_ref[:] += i
        inv = 1.0 / (n_layers + 1.0)
        au_ref[:] *= inv
        ai_ref[:] *= inv
    else:
        # au_k = gu + R̂ ai_{k+1} ; ai_k = gi + R̂ᵀ au_{k+1} — the cotangent
        # seeds (gu, gi) are re-read from the input refs instead of held live
        au = u_ref[:]
        ai = i_ref[:]
        for _ in range(n_layers):
            nau = u_ref[:] + mm(r, ai)   # needs old ai
            ai = i_ref[:] + mmt(r, au)   # needs old au; old ai now dead
            au = nau
        au_ref[:] = au
        ai_ref[:] = ai


def _chain_call(r_pad, u_pad, i_pad, n_layers: int, forward: bool, interpret: bool):
    up, ip = r_pad.shape
    d = u_pad.shape[1]
    kernel = functools.partial(_chain_kernel, n_layers, forward)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((up, d), jnp.float32),
            jax.ShapeDtypeStruct((ip, d), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(r_pad, u_pad, i_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dense_chain_mean(r_bf16, u0, i0, n_layers: int, interpret: bool = False):
    """mean([E_0, ÂE_0, .., Â^L E_0]) for the bipartite Â = [[0, R̂], [R̂ᵀ, 0]]
    with R̂ VMEM-resident across the whole chain. Returns (user_mean [U, d],
    item_mean [I, d]); gradients flow to u0/i0 (adjacency is constant —
    same contract as `graph/bucketed.py::bucketed_chain_mean`).

    ``r_bf16``: R̂ as bf16 OR f32 [U, I] — the kernel computes in R̂'s dtype
    (bf16 matches the dense backend's MXU mode; f32 keeps full precision for
    f32-configured models, round-4 f32 variant). ``interpret=True`` runs the
    Pallas interpreter (CPU tests)."""
    return _chain_fwd(r_bf16, u0, i0, n_layers, interpret)[0]


def _pad_inputs(r_bf16, u0, i0):
    u_n, i_n = r_bf16.shape
    d = u0.shape[1]
    up, ip = _round_up(u_n, 16), _round_up(i_n, 128)
    dp = _round_up(d, 128)
    r_pad = jnp.pad(r_bf16, ((0, up - u_n), (0, ip - i_n)))
    u_pad = jnp.pad(u0.astype(jnp.float32), ((0, up - u_n), (0, dp - d)))
    i_pad = jnp.pad(i0.astype(jnp.float32), ((0, ip - i_n), (0, dp - d)))
    return r_pad, u_pad, i_pad, (u_n, i_n, d)


def _chain_fwd(r_bf16, u0, i0, n_layers, interpret):
    r_pad, u_pad, i_pad, (u_n, i_n, d) = _pad_inputs(r_bf16, u0, i0)
    au, ai = _chain_call(r_pad, u_pad, i_pad, n_layers, True, interpret)
    out = (au[:u_n, :d], ai[:i_n, :d])
    return out, r_bf16


def _chain_bwd(n_layers, interpret, r_bf16, g):
    gu, gi = g
    inv = 1.0 / (n_layers + 1.0)
    r_pad, gu_pad, gi_pad, (u_n, i_n, d) = _pad_inputs(r_bf16, gu * inv, gi * inv)
    du, di = _chain_call(r_pad, gu_pad, gi_pad, n_layers, False, interpret)
    # adjacency cotangent is structurally zero (never a parameter); XLA DCEs
    # the zeros when nothing consumes them
    return (
        jnp.zeros_like(r_bf16),
        du[:u_n, :d].astype(gu.dtype),
        di[:i_n, :d].astype(gi.dtype),
    )


dense_chain_mean.defvjp(_chain_fwd, _chain_bwd)


# ---------------------------------------------------------------------------
# mean + single-layer variant (NCL's layer-contrast path, `ncl.py:358-367`:
# the SSL term contrasts layer 0 against layer 2*hyper_layers while the BPR
# term uses the mean readout — this kernel returns both without
# materializing the full [L+1, N, d] stack the XLA return_layers path needs)
# ---------------------------------------------------------------------------


def _chain_layer_fwd_kernel(
    n_layers, k, r_ref, u_ref, i_ref, au_ref, ai_ref, uk_ref, ik_ref
):
    """Forward chain with the mean accumulated into (au, ai) and layer ``k``
    snapshotted into (uk, ik). Requires 1 <= k <= n_layers (k = 0 is the
    input itself — handled by the wrapper without a kernel round trip)."""
    r = r_ref[:]
    cast = (lambda x: x.astype(jnp.bfloat16)) if r.dtype == jnp.bfloat16 else (lambda x: x)

    def mm(a, b):
        return jnp.dot(a, cast(b), preferred_element_type=jnp.float32)

    def mmt(a, b):
        return jax.lax.dot_general(
            a, cast(b),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    u = u_ref[:]
    i = i_ref[:]
    au_ref[:] = u
    ai_ref[:] = i
    for layer in range(1, n_layers + 1):
        nu = mm(r, i)
        i = mmt(r, u)
        u = nu
        au_ref[:] += u
        ai_ref[:] += i
        if layer == k:
            uk_ref[:] = u
            ik_ref[:] = i
    inv = 1.0 / (n_layers + 1.0)
    au_ref[:] *= inv
    ai_ref[:] *= inv


def _chain_layer_bwd_kernel(
    n_layers, k, r_ref, gu_ref, gi_ref, gku_ref, gki_ref, du_ref, di_ref
):
    """Cotangent chain: t_j = gmean' everywhere plus the layer-k cotangent
    injected at j == k; du0 = t_0 + Â(t_1 + Â(t_2 + ...)) in the bipartite
    block form (gmean' pre-scaled by 1/(L+1) in the wrapper)."""
    r = r_ref[:]
    cast = (lambda x: x.astype(jnp.bfloat16)) if r.dtype == jnp.bfloat16 else (lambda x: x)

    def mm(a, b):
        return jnp.dot(a, cast(b), preferred_element_type=jnp.float32)

    def mmt(a, b):
        return jax.lax.dot_general(
            a, cast(b),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    au = gu_ref[:]
    ai = gi_ref[:]
    if k == n_layers:
        au += gku_ref[:]
        ai += gki_ref[:]
    for j in range(n_layers - 1, -1, -1):
        nau = gu_ref[:] + mm(r, ai)
        ai = gi_ref[:] + mmt(r, au)
        au = nau
        if j == k:
            au += gku_ref[:]
            ai += gki_ref[:]
    du_ref[:] = au
    di_ref[:] = ai


def _chain_layer_call(r_pad, a, b, c, d_in, n_layers, k, forward, interpret):
    up, ip = r_pad.shape
    d = a.shape[1]
    if forward:
        kernel = functools.partial(_chain_layer_fwd_kernel, n_layers, k)
        n_in, n_out = 2, 4
        ins = (a, b)
    else:
        kernel = functools.partial(_chain_layer_bwd_kernel, n_layers, k)
        n_in, n_out = 4, 2
        ins = (a, b, c, d_in)
    outs = [
        jax.ShapeDtypeStruct((up, d), jnp.float32),
        jax.ShapeDtypeStruct((ip, d), jnp.float32),
    ] * (n_out // 2)
    return pl.pallas_call(
        kernel,
        out_shape=tuple(outs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_in),
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out),
        interpret=interpret,
    )(r_pad, *ins)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dense_chain_mean_layer(r_any, u0, i0, n_layers: int, k: int, interpret: bool = False):
    """(mean_u, mean_i, u_k, i_k): the layer-mean readout PLUS the layer-``k``
    tables, whole chain VMEM-resident (forward and the injected-cotangent
    Horner backward each one kernel launch). 1 <= k <= n_layers; gradients
    flow to u0/i0 from all four outputs."""
    return _chain_layer_fwd(r_any, u0, i0, n_layers, k, interpret)[0]


def _chain_layer_fwd(r_any, u0, i0, n_layers, k, interpret):
    r_pad, u_pad, i_pad, (u_n, i_n, d) = _pad_inputs(r_any, u0, i0)
    au, ai, uk, ik = _chain_layer_call(
        r_pad, u_pad, i_pad, None, None, n_layers, k, True, interpret
    )
    out = (au[:u_n, :d], ai[:i_n, :d], uk[:u_n, :d], ik[:i_n, :d])
    return out, r_any


def _chain_layer_bwd(n_layers, k, interpret, r_any, g):
    gau, gai, gku, gki = g
    inv = 1.0 / (n_layers + 1.0)
    r_pad, gu_pad, gi_pad, (u_n, i_n, d) = _pad_inputs(r_any, gau * inv, gai * inv)
    _, gku_pad, gki_pad, _ = _pad_inputs(r_any, gku, gki)
    du, di = _chain_layer_call(
        r_pad, gu_pad, gi_pad, gku_pad, gki_pad, n_layers, k, False, interpret
    )
    return (
        jnp.zeros_like(r_any),
        du[:u_n, :d].astype(gau.dtype),
        di[:i_n, :d].astype(gai.dtype),
    )


dense_chain_mean_layer.defvjp(_chain_layer_fwd, _chain_layer_bwd)
