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
  batch_grad      grad of BPR over rows gathered from FIXED tables with
                  PLAIN indexing (isolates gather fwd + scatter-add bwd)
  batch_grad_tr   same but through ops.rows.take_rows (MXU one-hot bwd —
                  the production path in every model's loss)
  sample_only     sample_negatives alone
  adam_only       adam update of zero grads alone

Epoch-machinery variants (us/step, amortized over the epoch's steps —
isolates the bench-vs-ablation gap the round-3 verdict flagged):
  epoch_full      the EXACT make_multi_epoch_fn epoch (shuffle + splits +
                  in-step sampling + scan) — epoch_full - full = epoch tax
  shuffle_only    shuffled_epoch alone (permutation sort + edge gathers)
  shuffle_batched one [E, n_edges] batched permutation for E epochs
  splits_only     the per-epoch key-split calls alone
  sample_epoch    whole-epoch vmapped negative sampling (the hoisted form)

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
    import sys

    # --only epoch : skip the round-3 isolated-component variants (each
    # variant compiles 2 programs at ~20-70 s apiece through the tunnel) and
    # measure just full/no_sample + the epoch-machinery section.
    epoch_only = "--only" in sys.argv and "epoch" in sys.argv

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
    if epoch_only:
        run_epoch_section(graph, model, params, state, optimizer, opt_state,
                          xs_for, t_full, t_nos)
        return
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

    # batch grad through the production take_rows path (MXU one-hot bwd)
    from recommendation_tpu.ops.rows import take_rows

    def batch_loss_tr(tables, u, i, j):
        ua, ia = tables
        return bpr_loss(take_rows(ua, u), take_rows(ia, i), take_rows(ia, j))

    bg_tr = jax.grad(batch_loss_tr)

    def batch_grad_tr(carry, x):
        u, i, j, _ = x
        tabs = jax.tree_util.tree_map(lambda a: a * (1.0 + carry * 1e-20), (ua0, ia0))
        g = bg_tr(tabs, u, i, j)
        return carry + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g)) * 1e-20, None

    t_bgtr = timed_pair(*scan_variant(batch_grad_tr, jnp.float32(0.0)), "batch_grad_tr")

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

    t_ef, t_sh, t_sp, t_se = run_epoch_section(
        graph, model, params, state, optimizer, opt_state, xs_for, t_full, t_nos
    )

    print("\nderived:")
    print(f"  sampling in-step   ~{t_full - t_nos:8.1f} us")
    print(f"  adam vs sgd        ~{t_full - t_sgd:8.1f} us")
    print(f"  backward+update    ~{t_nos - t_fwd:8.1f} us  (no_sample - fwd_loss)")
    print(f"  prop fwd           ~{t_pf:8.1f} us, fwd+bwd ~{t_pfb:8.1f} us")
    print(f"  batch gather+scatter grad ~{t_bg:8.1f} us (plain) / {t_bgtr:8.1f} us (take_rows)")
    print(f"  sample_only        ~{t_so:8.1f} us")


def run_epoch_section(graph, model, params, state, optimizer, opt_state,
                      xs_for, t_full, t_nos):
    # -- epoch machinery (the bench-vs-ablation gap) ------------------------
    from recommendation_tpu.train.loop import make_multi_epoch_fn

    n_batches = -(-graph.n_edges // BATCH)
    E_SHORT, E_LONG = 8, 24

    def timed_epochs(make_fn, make_args, label, repeats=3):
        times = {}
        for n in (E_SHORT, E_LONG):
            fn = make_fn(n)
            args = make_args(n)
            float(fn(*args))
            best = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(fn(*args))
                best.append(time.perf_counter() - t0)
            times[n] = min(best)
        per_step = ((times[E_LONG] - times[E_SHORT])
                    / ((E_LONG - E_SHORT) * n_batches) * 1e6)
        print(f"{label:<14} {per_step:8.1f} us/step   "
              f"(short {times[E_SHORT] * 1e3:7.1f} ms, long {times[E_LONG] * 1e3:7.1f} ms)",
              flush=True)
        return per_step

    def epoch_full_make(n):
        run = make_multi_epoch_fn(model, optimizer, BATCH, n_epochs=n)

        def fn(params, opt_state, state, rng):
            p, o, s, losses = run(graph, params, opt_state, state, rng)
            return _scalarize((p, o, s, losses))

        return jax.jit(fn)

    t_ef = timed_epochs(epoch_full_make,
                        lambda n: (params, opt_state, state, jax.random.PRNGKey(5)),
                        "epoch_full")

    def shuffle_only_make(n):
        @jax.jit
        def fn(rng):
            def one(carry, k):
                us, its, ws, nb = shuffled_epoch(k, graph, BATCH)
                return carry + (jnp.sum(us[0]) + jnp.sum(its[0])).astype(jnp.float32) * 1e-20, None

            keys = jax.random.split(rng, n)
            carry, _ = jax.lax.scan(one, jnp.float32(0.0), keys)
            return carry

        return fn

    t_sh = timed_epochs(shuffle_only_make, lambda n: (jax.random.PRNGKey(6),),
                        "shuffle_only")

    def shuffle_batched_make(n):
        @jax.jit
        def fn(rng):
            keys = jax.random.split(rng, n)
            perms = jax.vmap(lambda k: jax.random.permutation(k, graph.n_edges))(keys)
            return jnp.sum(perms[:, 0]).astype(jnp.float32) * 1e-20

        return fn

    timed_epochs(shuffle_batched_make, lambda n: (jax.random.PRNGKey(6),),
                 "shuffle_batched")

    def splits_only_make(n):
        @jax.jit
        def fn(rng):
            def one(carry, k):
                a, b, c = jax.random.split(k, 3)
                nk = jax.random.split(b, n_batches)
                sk = jax.random.split(c, n_batches)
                leaves = jax.tree_util.tree_leaves((a, nk, sk))
                s = sum(jnp.sum(jax.random.key_data(x).astype(jnp.float32))
                        if jnp.issubdtype(x.dtype, jax.dtypes.prng_key)
                        else jnp.sum(x).astype(jnp.float32) for x in leaves)
                return carry + s * 1e-20, None

            keys = jax.random.split(rng, n)
            carry, _ = jax.lax.scan(one, jnp.float32(0.0), keys)
            return carry

        return fn

    t_sp = timed_epochs(splits_only_make, lambda n: (jax.random.PRNGKey(7),),
                        "splits_only")

    def sample_epoch_make(n):
        from recommendation_tpu.sampling import sample_negatives_epoch

        us, its, _, nks = xs_for(n_batches)

        @jax.jit
        def fn(rng):
            def one(carry, k):
                negs = sample_negatives_epoch(k, graph, us)
                return carry + jnp.sum(negs[0]).astype(jnp.float32) * 1e-20, None

            keys = jax.random.split(rng, n)
            carry, _ = jax.lax.scan(one, jnp.float32(0.0), keys)
            return carry

        return fn

    t_se = timed_epochs(sample_epoch_make, lambda n: (jax.random.PRNGKey(8),),
                        "sample_epoch")

    # machinery PRODUCTION alone (the exact epoch_arrays body of
    # make_multi_epoch_fn, vmapped across epochs) vs xs CONSUMPTION alone
    # (the real step scanned over precomputed arrays) — the two must
    # roughly add up to epoch_full; whichever is big names the residual.
    # NB: draws through sampling.epoch_batches — the shared entry point the
    # trainers use — so this follows the production path as it evolves
    # (round-5 edge-order fused sampler; the old shuffled_epoch +
    # sample_negatives_epoch composition measured 41 µs/step here vs ~20
    # for the fused form, and is what shuffle_only/sample_epoch isolate).
    from recommendation_tpu.sampling import epoch_batches

    def machinery(epoch_rng):
        shuffle_key, neg_key, step_key = jax.random.split(epoch_rng, 3)
        users, items, negs, weights, nb = epoch_batches(
            shuffle_key, neg_key, graph, BATCH
        )
        step_keys = jax.random.split(step_key, nb)
        return users, items, negs, weights, step_keys

    def machinery_only_make(n):
        @jax.jit
        def fn(rng):
            xs = jax.vmap(machinery)(jax.random.split(rng, n))
            return _scalarize(xs)

        return fn

    t_mach = timed_epochs(machinery_only_make, lambda n: (jax.random.PRNGKey(9),),
                          "machinery_only")

    grad_fn = jax.value_and_grad(
        lambda p, batch, k: model.loss(p, state, batch, graph, k)[0])

    def consume_step(carry, xs):
        p, o = carry
        u, i, j, w, k = xs
        batch = PairwiseBatch(u, i, j, w)
        loss, grads = grad_fn(p, batch, k)
        ok = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), loss

    all_xs_cache = {}

    def consume_xs_for(n):
        if n not in all_xs_cache:
            all_xs_cache[n] = jax.block_until_ready(
                jax.jit(lambda r: jax.vmap(machinery)(jax.random.split(r, n)))(
                    jax.random.PRNGKey(9)
                )
            )
        return all_xs_cache[n]

    def consume_make(n):
        @jax.jit
        def fn(carry, xs):
            def one_epoch(c, exs):
                c, losses = jax.lax.scan(consume_step, c, exs)
                return c, jnp.mean(losses)

            carry, ls = jax.lax.scan(one_epoch, carry, xs)
            return _scalarize((carry, ls))

        return fn

    t_cons = timed_epochs(consume_make,
                          lambda n: ((params, opt_state), consume_xs_for(n)),
                          "consume_only")

    print("\nepoch machinery derived:")
    print(f"  machinery {t_mach:6.1f} + consume {t_cons:6.1f} "
          f"vs epoch_full {t_ef:6.1f}")
    print(f"  epoch_full vs full      ~{t_ef - t_full:8.1f} us/step (production epoch incl. hoisted machinery vs bare in-scan-sampling step)")
    print(f"  epoch_full vs no_sample ~{t_ef - t_nos:8.1f} us/step (machinery + amortized sampling)")
    print(f"    shuffle {t_sh:6.1f}  splits {t_sp:6.1f}  sample_epoch(vmapped) {t_se:6.1f}")
    return t_ef, t_sh, t_sp, t_se


if __name__ == "__main__":
    main()
