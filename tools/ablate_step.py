"""Per-step time budget for the headline bench configuration.

Decomposes the LightGCN-BPR training step (the `bench.py` metric: ML-100K
shape, dense bipartite-block backend, bf16 MXU, batch 2048) into additive
components, each measured as a `lax.scan` of N identical steps inside ONE
jitted program.

Measurement protocol (v2 — the v1 numbers were tunnel artifacts):
  * every timed program reduces its outputs to ONE scalar INSIDE the jit, so
    the host fence transfers 4 bytes. v1 fenced by transferring every output
    leaf, and through the ~10 MB/s remote tunnel that charged Adam ~700
    us/step of pure mu/nu DOWNLOAD time (2.7 MB of opt state per call) —
    6x the whole real step;
  * each variant runs at TWO scan lengths and reports
    (t_long - t_short) / (n_long - n_short): the dispatch RTT and the
    scalar-fence cost cancel exactly, leaving pure per-step device time.

Variants (us/step):
  full            the exact bench step (sample + grad + Adam + NaN guard)
  no_sample       negatives precomputed outside the scan
  no_guard        no NaN-guard where/tree_map pair
  sgd             optax.sgd instead of adam
  fwd_loss        loss forward only (no grad, no update)
  prop_fwd        propagation forward only
  prop_fwd_bwd    grad of sum(propagate) wrt tables (no batch gathers)
  batch_grad      grad of BPR over rows gathered from FIXED tables
                  (isolates the gather fwd + scatter-add bwd)
  sample_only     sample_negatives alone
  adam_only       adam update of zero grads alone

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_step.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recommendation_tpu.config import default_config
from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.data.synthetic import make_synthetic_dataset
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.models.lightgcn import LightGCN
from recommendation_tpu.sampling import PairwiseBatch, sample_negatives, shuffled_epoch
from recommendation_tpu.train.loop import make_optimizer

EMB, LAYERS, BATCH = 64, 3, 2048
N_SHORT, N_LONG = 256, 1024


def build():
    train, test = make_synthetic_dataset(n_users=943, n_items=1682,
                                         n_interactions=100_000, seed=7)
    data = Interaction(train, test)
    config = default_config(**{
        "embedding.size": EMB, "batch.size": BATCH,
        "LightGCN.n_layers": LAYERS, "learning.rate": 1e-3,
    })
    graph = DeviceGraph(data, backend="auto", compute_dtype="bfloat16")
    model = LightGCN(config)
    params, state = model.init(jax.random.PRNGKey(0), graph)
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    return graph, model, params, state, optimizer, opt_state


def batches_for(graph, n_steps, rng):
    """Precomputed per-step users/items/neg_keys/step_keys (outside timing).
    One jitted program: op-by-op dispatch would pay the remote-compile RTT
    once per tiny op."""

    @jax.jit
    def build(rng):
        us, its, ws, nb = shuffled_epoch(rng, graph, BATCH)
        reps = -(-n_steps // nb)
        us = jnp.tile(us, (reps, 1))[:n_steps]
        its = jnp.tile(its, (reps, 1))[:n_steps]
        neg_keys = jax.random.split(jax.random.PRNGKey(11), n_steps)
        negs = jax.vmap(lambda k, u: sample_negatives(k, graph, u))(neg_keys, us)
        return us, its, negs, neg_keys

    return build(rng)


def _scalarize(out):
    """Reduce an arbitrary output pytree to one f32 scalar (inside jit)."""
    acc = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-20
    return acc


def timed_pair(make_fn, make_args, label, repeats=3):
    """Per-step device time via paired scan lengths: the dispatch round trip
    and the 4-byte fence cancel in the (long - short) difference."""
    times = {}
    for n in (N_SHORT, N_LONG):
        fn = make_fn(n)
        args = make_args(n)
        float(fn(*args))  # compile + warmup (4-byte transfer)
        best = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(*args))
            best.append(time.perf_counter() - t0)
        times[n] = min(best)
    per_step = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT) * 1e6
    print(f"{label:<14} {per_step:8.1f} us/step   "
          f"(short {times[N_SHORT] * 1e3:7.1f} ms, long {times[N_LONG] * 1e3:7.1f} ms)",
          flush=True)
    return per_step


def main():
    graph, model, params, state, optimizer, opt_state = build()
    xs_by_n = {}

    def xs_for(n):
        if n not in xs_by_n:
            xs_by_n[n] = batches_for(graph, n, jax.random.PRNGKey(1))
        return xs_by_n[n]

    sgd = optax.sgd(1e-3)
    sgd_state = sgd.init(params)

    grad_fn = jax.value_and_grad(
        lambda p, batch, k: model.loss(p, state, batch, graph, k)[0])

    def full_step(carry, xs, opt=optimizer, guard=True, sample=True):
        p, o = carry
        u, i, j, nk = xs
        if sample:
            j = sample_negatives(nk, graph, u)
        batch = PairwiseBatch(u, i, j, jnp.ones(u.shape, jnp.float32))
        loss, grads = grad_fn(p, batch, nk)
        if guard:
            ok = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), loss

    def scan_variant(step, init):
        def make(n):
            @jax.jit
            def run(init, xs):
                carry, ys = jax.lax.scan(step, init, xs)
                return _scalarize((carry, ys))
            return run
        return make, lambda n: (init, xs_for(n))

    # -- full and subtractive variants ------------------------------------
    t_full = timed_pair(*scan_variant(lambda c, x: full_step(c, x),
                                      (params, opt_state)), "full")
    t_nos = timed_pair(*scan_variant(lambda c, x: full_step(c, x, sample=False),
                                     (params, opt_state)), "no_sample")
    timed_pair(*scan_variant(lambda c, x: full_step(c, x, guard=False),
                             (params, opt_state)), "no_guard")
    t_sgd = timed_pair(*scan_variant(lambda c, x: full_step(c, x, opt=sgd),
                                     (params, sgd_state)), "sgd")

    # -- isolated components ----------------------------------------------
    def fwd_loss(carry, x):
        u, i, j, nk = x
        batch = PairwiseBatch(u, i, j, jnp.ones(u.shape, jnp.float32))
        loss, _ = model.loss(params, state, batch, graph, nk)
        return carry + loss * 1e-20, loss

    t_fwd = timed_pair(*scan_variant(fwd_loss, jnp.float32(0.0)), "fwd_loss")

    def length_variant(step, init):
        def make(n):
            @jax.jit
            def run(init):
                carry, ys = jax.lax.scan(step, init, None, length=n)
                return _scalarize((carry, ys))
            return run
        return make, lambda n: (init,)

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

    # batch gather fwd + scatter bwd on fixed (already-propagated) tables
    ua0, ia0 = jax.jit(lambda p: model.propagate(p, graph))(params)
    from recommendation_tpu.losses import bpr_loss

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

    def adam_only(carry, x):
        del x
        p, o = carry
        g = jax.tree_util.tree_map(lambda a: a * 1e-20, p)
        updates, o = optimizer.update(g, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), None

    timed_pair(*length_variant(adam_only, (params, opt_state)), "adam_only")

    print("\nderived:")
    print(f"  sampling in-step   ~{t_full - t_nos:8.1f} us")
    print(f"  adam vs sgd        ~{t_full - t_sgd:8.1f} us")
    print(f"  backward+update    ~{t_nos - t_fwd:8.1f} us  (no_sample - fwd_loss)")
    print(f"  prop fwd           ~{t_pf:8.1f} us, fwd+bwd ~{t_pfb:8.1f} us")
    print(f"  batch gather+scatter grad ~{t_bg:8.1f} us")
    print(f"  sample_only        ~{t_so:8.1f} us")
    print(f"  residual (full - prop_fb - batch_grad - sample - adam-delta)")


if __name__ == "__main__":
    main()
