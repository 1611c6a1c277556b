"""Per-step time budget for the headline bench configuration.

Decomposes the LightGCN-BPR training step (the `bench.py` metric: ML-100K
shape, dense bipartite-block backend, bf16 MXU, batch 2048) into additive
components, each measured as a `lax.scan` of N identical steps inside ONE
jitted program (per-dispatch RTT through the tunneled chip is ~70-80 ms, so
only scanned programs measure the device — see BASELINE.md forensics note).

Variants (ms/step):
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
N_STEPS = 256


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


def _fence(out):
    """Host transfer of every output leaf — a full sync with NO extra
    compiles (jnp.sum here would compile one tiny program per leaf, each
    paying the remote-compile RTT)."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            np.asarray(leaf)


def timed(fn, args, label, repeats=3):
    out = fn(*args)
    _fence(out)
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _fence(out)
        best.append((time.perf_counter() - t0) / N_STEPS * 1e6)
    print(f"{label:<14} {min(best):8.1f} us/step   (runs: {', '.join(f'{b:.1f}' for b in best)})", flush=True)
    return min(best)


def main():
    graph, model, params, state, optimizer, opt_state = build()
    us, its, negs, neg_keys = batches_for(graph, N_STEPS, jax.random.PRNGKey(1))
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

    def scan_of(step, init):
        def run(init, xs):
            return jax.lax.scan(step, init, xs)
        return jax.jit(run), init

    xs = (us, its, negs, neg_keys)

    # -- full and subtractive variants ------------------------------------
    f, init = scan_of(lambda c, x: full_step(c, x), (params, opt_state))
    t_full = timed(f, (init, xs), "full")

    f, init = scan_of(lambda c, x: full_step(c, x, sample=False), (params, opt_state))
    t_nos = timed(f, (init, xs), "no_sample")

    f, init = scan_of(lambda c, x: full_step(c, x, guard=False), (params, opt_state))
    timed(f, (init, xs), "no_guard")

    f, init = scan_of(lambda c, x: full_step(c, x, opt=sgd), (params, sgd_state))
    t_sgd = timed(f, (init, xs), "sgd")

    # -- isolated components ----------------------------------------------
    def fwd_loss(carry, x):
        u, i, j, nk = x
        batch = PairwiseBatch(u, i, j, jnp.ones(u.shape, jnp.float32))
        loss, _ = model.loss(carry_params, state, batch, graph, nk)
        return carry + loss * 1e-20, loss

    carry_params = params
    f = jax.jit(lambda c, xs: jax.lax.scan(fwd_loss, c, xs))
    t_fwd = timed(f, (jnp.float32(0.0), xs), "fwd_loss")

    def prop_fwd(carry, x):
        del x
        p = jax.tree_util.tree_map(lambda a: a * (1.0 + carry * 1e-20), params)
        ua, ia = model.propagate(p, graph)
        return carry + jnp.sum(ua[0]) + jnp.sum(ia[0]), None

    f = jax.jit(lambda c, xs: jax.lax.scan(prop_fwd, c, xs, length=N_STEPS))
    t_pf = timed(f, (jnp.float32(0.0), None), "prop_fwd")

    prop_g = jax.grad(lambda p: sum(jnp.sum(t) for t in
                                    jax.tree_util.tree_leaves(model.propagate(p, graph))))

    def prop_fb(carry, x):
        del x
        p = jax.tree_util.tree_map(lambda a: a * (1.0 + carry * 1e-20), params)
        g = prop_g(p)
        return carry + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g)) * 1e-20, None

    f = jax.jit(lambda c, xs: jax.lax.scan(prop_fb, c, xs, length=N_STEPS))
    t_pfb = timed(f, (jnp.float32(0.0), None), "prop_fwd_bwd")

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

    f = jax.jit(lambda c, xs: jax.lax.scan(batch_grad, c, xs))
    t_bg = timed(f, (jnp.float32(0.0), xs), "batch_grad")

    def sample_only(carry, x):
        u, _, _, nk = x
        j = sample_negatives(nk, graph, u)
        return carry + jnp.sum(j), None

    f = jax.jit(lambda c, xs: jax.lax.scan(sample_only, c, xs))
    t_so = timed(f, (jnp.int32(0), xs), "sample_only")

    def adam_only(carry, x):
        del x
        p, o = carry
        g = jax.tree_util.tree_map(lambda a: a * 1e-20, p)
        updates, o = optimizer.update(g, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), None

    f = jax.jit(lambda c, xs: jax.lax.scan(adam_only, c, xs, length=N_STEPS))
    timed(f, ((params, opt_state), None), "adam_only")

    print("\nderived:")
    print(f"  sampling in-step   ~{t_full - t_nos:8.1f} us")
    print(f"  adam vs sgd        ~{t_full - t_sgd:8.1f} us")
    print(f"  backward total     ~{t_nos - t_fwd:8.1f} us  (no_sample - fwd_loss)")
    print(f"  prop fwd           ~{t_pf:8.1f} us, fwd+bwd ~{t_pfb:8.1f} us")
    print(f"  batch gather+scatter grad ~{t_bg:8.1f} us")
    print(f"  unexplained (full - prop_fb - batch_grad - sample - adamdelta)")


if __name__ == "__main__":
    main()
