"""Per-step time budget at the Gowalla-class shape (the `bench.py --large`
configuration: 50k users x 100k items x 1M edges, bucketed backend, batch
8192, emb 64, 3 layers).

Same paired-scan-length protocol as tools/ablate_step.py (dispatch RTT and
the 4-byte host fence cancel in the long-short delta). The round-3 probe
established the propagation's issue-rate floor (~1.2 ns/slot -> ~17 ms/step
at this shape vs ~47 ms achieved); this tool attributes the remainder.

Variants (ms/step):
  step            production step: grad(loss) + adam + NaN guard, negatives
                  precomputed (the chunked-epoch path hoists sampling)
  prop_fwd        bucketed_chain_mean forward only
  prop_fwd_bwd    value_and_grad of sum(propagate)
  batch_grad      BPR grad over rows gathered from FIXED tables (plain
                  indexing + scatter-add VJP: tables exceed the one-hot cap)
  sample_only     sample_negatives at B=8192 over 100k items
  shuffle         shuffled_epoch (1M-element permutation sort), amortized
  adam_only       optimizer update alone

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_large.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import optax

from recommendation_tpu.config import default_config
from recommendation_tpu.data.synthetic import ArrayInteraction, make_flat_interactions
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.models.lightgcn import LightGCN
from recommendation_tpu.losses import bpr_loss
from recommendation_tpu.sampling import PairwiseBatch, sample_negatives, shuffled_epoch
from recommendation_tpu.train.loop import make_optimizer

N_USERS, N_ITEMS, N_EDGES = 50_000, 100_000, 1_000_000
EMB, LAYERS, BATCH = 64, 3, 8192
N_SHORT, N_LONG = 8, 24


def build(compute_dtype="float32"):
    pairs = make_flat_interactions(N_USERS, N_ITEMS, N_EDGES, seed=3)
    data = ArrayInteraction(pairs, N_USERS, N_ITEMS)
    config = default_config(**{
        "embedding.size": EMB, "batch.size": BATCH,
        "LightGCN.n_layers": LAYERS, "learning.rate": 1e-3,
    })
    graph = DeviceGraph(data, backend="auto", compute_dtype=compute_dtype)
    model = LightGCN(config)
    params, state = model.init(jax.random.PRNGKey(0), graph)
    optimizer = make_optimizer(config)
    return graph, model, params, state, optimizer, optimizer.init(params)


def timed_pair(make_fn, make_args, label, repeats=3):
    times = {}
    for n in (N_SHORT, N_LONG):
        fn = make_fn(n)
        args = make_args(n)
        float(fn(*args))  # compile + warmup
        best = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(*args))
            best.append(time.perf_counter() - t0)
        times[n] = min(best)
    per_step = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT) * 1e3
    print(f"{label:<14} {per_step:8.2f} ms/step   "
          f"(short {times[N_SHORT] * 1e3:8.1f} ms, long {times[N_LONG] * 1e3:8.1f} ms)",
          flush=True)
    return per_step


def _scalarize(out):
    acc = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-20
    return acc


def main():
    import sys

    dtype = "bfloat16" if "--bf16" in sys.argv else "float32"
    graph, model, params, state, optimizer, opt_state = build(dtype)
    print(f"# backend={graph.norm_adj.backend} compute_dtype={dtype}", flush=True)

    @functools.partial(jax.jit, static_argnums=(1,))
    def make_xs(rng, n_steps):
        us, its, ws, nb = shuffled_epoch(rng, graph, BATCH)
        reps = -(-n_steps // nb)
        us = jnp.tile(us, (reps, 1))[:n_steps]
        its = jnp.tile(its, (reps, 1))[:n_steps]
        nk = jax.random.split(jax.random.PRNGKey(11), n_steps)
        negs = jax.vmap(lambda k, u: sample_negatives(k, graph, u))(nk, us)
        return us, its, negs, nk

    xs_by_n = {}

    def xs_for(n):
        if n not in xs_by_n:
            xs_by_n[n] = jax.block_until_ready(make_xs(jax.random.PRNGKey(1), n))
        return xs_by_n[n]

    def scan_variant(step, init):
        def make(n):
            @jax.jit
            def run(init, xs):
                carry, ys = jax.lax.scan(step, init, xs)
                return _scalarize((carry, ys))
            return run
        return make, lambda n: (init, xs_for(n))

    def length_variant(step, init):
        def make(n):
            @jax.jit
            def run(init):
                carry, ys = jax.lax.scan(step, init, None, length=n)
                return _scalarize((carry, ys))
            return run
        return make, lambda n: (init,)

    grad_fn = jax.value_and_grad(
        lambda p, batch, k: model.loss(p, state, batch, graph, k)[0])

    def prod_step(carry, x):
        p, o = carry
        u, i, j, nk = x
        batch = PairwiseBatch(u, i, j, jnp.ones(u.shape, jnp.float32))
        loss, grads = grad_fn(p, batch, nk)
        ok = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), loss

    t_step = timed_pair(*scan_variant(prod_step, (params, opt_state)), "step")

    def prop_fwd(carry, x):
        del x
        p = jax.tree_util.tree_map(lambda a: a * (1.0 + carry * 1e-20), params)
        ua, ia = model.propagate(p, graph)
        return carry + (jnp.sum(ua[0]) + jnp.sum(ia[0])) * 1e-20, None

    t_pf = timed_pair(*length_variant(prop_fwd, jnp.float32(0.0)), "prop_fwd")

    prop_g = jax.grad(lambda p: sum(jnp.sum(t) for t in
                                    jax.tree_util.tree_leaves(model.propagate(p, graph))))

    def prop_fb(carry, x):
        del x
        p = jax.tree_util.tree_map(lambda a: a * (1.0 + carry * 1e-20), params)
        g = prop_g(p)
        return carry + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g)) * 1e-20, None

    t_pfb = timed_pair(*length_variant(prop_fb, jnp.float32(0.0)), "prop_fwd_bwd")

    ua0, ia0 = jax.jit(lambda p: model.propagate(p, graph))(params)
    ua0, ia0 = jax.block_until_ready((ua0, ia0))

    def batch_loss(tables, u, i, j):
        ua, ia = tables
        return bpr_loss(ua[u], ia[i], ia[j])

    bg = jax.grad(batch_loss)

    def batch_grad(carry, x):
        u, i, j, _ = x
        tabs = jax.tree_util.tree_map(lambda a: a * (1.0 + carry * 1e-20), (ua0, ia0))
        g = bg(tabs, u, i, j)
        return carry + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g)) * 1e-20, None

    t_bg = timed_pair(*scan_variant(batch_grad, jnp.float32(0.0)), "batch_grad")

    def sample_only(carry, x):
        u, _, _, nk = x
        j = sample_negatives(nk, graph, u)
        return carry + jnp.sum(j), None

    t_so = timed_pair(*scan_variant(sample_only, jnp.int32(0)), "sample_only")

    n_batches = -(-graph.n_edges // BATCH)

    def shuffle_make(n):
        @jax.jit
        def fn(rng):
            def one(carry, k):
                us, its, ws, nb = shuffled_epoch(k, graph, BATCH)
                return carry + (jnp.sum(us[0]) + jnp.sum(its[0])).astype(jnp.float32) * 1e-20, None
            keys = jax.random.split(rng, n)
            carry, _ = jax.lax.scan(one, jnp.float32(0.0), keys)
            return carry
        return fn

    # amortized over the epoch's steps
    times = {}
    for n in (4, 12):
        fn = shuffle_make(n)
        float(fn(jax.random.PRNGKey(6)))
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(jax.random.PRNGKey(6)))
            best.append(time.perf_counter() - t0)
        times[n] = min(best)
    t_sh = (times[12] - times[4]) / (12 - 4) / n_batches * 1e3
    print(f"{'shuffle/step':<14} {t_sh:8.2f} ms/step   (one epoch sort / {n_batches} steps)",
          flush=True)

    def adam_only(carry, x):
        del x
        p, o = carry
        g = jax.tree_util.tree_map(lambda a: a * 1e-20, p)
        updates, o = optimizer.update(g, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), None

    t_ad = timed_pair(*length_variant(adam_only, (params, opt_state)), "adam_only")

    print("\nbudget (ms/step):")
    print(f"  step {t_step:.2f} = prop_fb {t_pfb:.2f} + batch_grad {t_bg:.2f} "
          f"+ adam {t_ad:.2f} + residual {t_step - t_pfb - t_bg - t_ad:.2f}")
    print(f"  outside the step: sample {t_so:.2f} (hoisted), shuffle {t_sh:.2f}")
    slots = 2 * graph.n_edges  # sym adjacency
    print(f"  issue-rate floor for prop: ~{2 * LAYERS * slots * 1.2e-6:.1f} ms/step "
          f"(2L pulls x {slots / 1e6:.1f}M slots x 1.2 ns)")


if __name__ == "__main__":
    main()
