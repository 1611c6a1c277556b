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


def chain_supported(n_users: int, n_items: int, d: int) -> bool:
    """True when the fused kernel's working set fits the VMEM budget."""
    up, ip, dp = _round_up(n_users, 16), _round_up(n_items, 128), _round_up(d, 128)
    r_bytes = up * ip * 2
    tables = 3 * (up + ip) * dp * 4
    return r_bytes + tables <= _VMEM_BUDGET and d <= 256


def _chain_kernel(n_layers, forward, r_ref, u_ref, i_ref, au_ref, ai_ref):
    """One grid cell: the whole layer chain with R̂ VMEM-resident.

    forward=True : (u0, i0) -> mean of layers (incl. layer 0).
    forward=False: (gu, gi) cotangents -> (du0, di0) via the Horner chain.
    Both directions are L rounds of the same two matmuls; the backward's
    1/(L+1) scaling is applied by the wrapper (linear map, so it commutes).
    """
    r = r_ref[:]  # [U, I] bf16, stays in VMEM for the whole chain
    u = u_ref[:]
    i = i_ref[:]
    if forward:
        acc_u, acc_i = u, i
        for _ in range(n_layers):
            u, i = (
                jnp.dot(r, i.astype(jnp.bfloat16), preferred_element_type=jnp.float32),
                jax.lax.dot_general(
                    r,
                    u.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ),
            )
            acc_u, acc_i = acc_u + u, acc_i + i
        inv = 1.0 / (n_layers + 1.0)
        au_ref[:] = acc_u * inv
        ai_ref[:] = acc_i * inv
    else:
        gu, gi = u, i
        au, ai = gu, gi
        for _ in range(n_layers):
            au, ai = (
                gu + jnp.dot(r, ai.astype(jnp.bfloat16), preferred_element_type=jnp.float32),
                gi
                + jax.lax.dot_general(
                    r,
                    au.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ),
            )
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

    ``r_bf16``: R̂ as bf16 [U, I] (the dense backend's compute dtype; the
    f32 path stays on the XLA chain). ``interpret=True`` runs the Pallas
    interpreter (CPU tests)."""
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
