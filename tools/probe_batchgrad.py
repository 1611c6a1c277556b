"""Batch-row gradient variants at the headline shape (B=2048, tables
943/1682 x 64): what does the BPR loss' gather-backward really cost?

  scatter      plain indexing (scatter-add VJP)
  onehot       production take_rows (one [B,n] f32 one-hot matmul per gather)
  onehot_cat   pos+neg share ONE [2B, n_items] one-hot matmul
  onehot_bf16  one-hot AND cotangent in bf16, f32 accumulate (quality
               deviation — measured only to see the traffic ceiling)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_batchgrad.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from recommendation_tpu.losses import bpr_loss
from recommendation_tpu.ops.rows import take_rows

NU, NI, D, B = 943, 1682, 64, 2048
N_SHORT, N_LONG = 256, 1024

ua = jax.random.normal(jax.random.PRNGKey(0), (NU, D), jnp.float32)
ia = jax.random.normal(jax.random.PRNGKey(1), (NI, D), jnp.float32)
us = jax.random.randint(jax.random.PRNGKey(2), (N_LONG, B), 0, NU)
ps = jax.random.randint(jax.random.PRNGKey(3), (N_LONG, B), 0, NI)
ns = jax.random.randint(jax.random.PRNGKey(4), (N_LONG, B), 0, NI)
for a in (ua, ia, us, ps, ns):
    jax.block_until_ready(a)


def timed(loss_fn, label):
    g = jax.grad(loss_fn)

    def step(carry, x):
        u, p, n = x
        tabs = jax.tree_util.tree_map(lambda a: a * (1.0 + carry * 1e-20), (ua, ia))
        gr = g(tabs, u, p, n)
        return carry + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(gr)) * 1e-20, None

    def make(n):
        @jax.jit
        def fn(xs):
            carry, _ = jax.lax.scan(step, jnp.float32(0.0), xs)
            return carry
        return fn

    times = {}
    for n in (N_SHORT, N_LONG):
        fn = make(n)
        xs = (us[:n], ps[:n], ns[:n])
        float(fn(xs))
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(xs))
            best.append(time.perf_counter() - t0)
        times[n] = min(best)
    per = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT) * 1e6
    print(f"{label:<12} {per:8.1f} us/step", flush=True)


def scatter(tabs, u, p, n):
    a, b = tabs
    return bpr_loss(a[u], b[p], b[n])


timed(scatter, "scatter")


def onehot(tabs, u, p, n):
    a, b = tabs
    return bpr_loss(take_rows(a, u), take_rows(b, p), take_rows(b, n))


timed(onehot, "onehot")


@jax.custom_vjp
def _take2_cat(table, idx2):
    return table[idx2]


def _t2_fwd(table, idx2):
    return table[idx2], idx2


def _t2_bwd(res, gg):
    idx2 = res
    flat_idx = idx2.reshape(-1)
    gflat = gg.reshape(-1, gg.shape[-1])
    oh = (flat_idx[:, None] == jnp.arange(NI, dtype=flat_idx.dtype)[None, :]).astype(gflat.dtype)
    d = jax.lax.dot_general(oh, gflat, (((0,), (0,)), ((), ())))
    return d, None


_take2_cat.defvjp(_t2_fwd, _t2_bwd)


def onehot_cat(tabs, u, p, n):
    a, b = tabs
    pn = _take2_cat(b, jnp.stack([p, n]))
    return bpr_loss(take_rows(a, u), pn[0], pn[1])


timed(onehot_cat, "onehot_cat")


@jax.custom_vjp
def _take_bf16(table, idx):
    return table[idx]


def _tb_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _tb_bwd(res, gg):
    idx, n = res
    oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(jnp.bfloat16)
    d = jax.lax.dot_general(oh, gg.astype(jnp.bfloat16),
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return d, None


_take_bf16.defvjp(_tb_fwd, _tb_bwd)


def onehot_bf16(tabs, u, p, n):
    a, b = tabs
    return bpr_loss(_take_bf16(a, u), _take_bf16(b, p), _take_bf16(b, n))


timed(onehot_bf16, "onehot_bf16")
