"""Epoch-machinery decomposition + candidate fixes (round 5).

`tools/ablate_step.py --only epoch` at round-5 HEAD measures machinery_only
at ~40 us/step — 46% of the production fused-epoch step, the largest block
left. This probe decomposes it IN THE PRODUCTION FORM (vmapped across
epochs, exactly the `epoch_arrays` body of make_multi_epoch_fn) and times
candidate replacements:

  mach_prod       shuffled_epoch + sample_negatives_epoch + splits (control)
  perm64/32/16    keyed_permutation at different round counts, vmapped
  perm_sort       jax.random.permutation (sort network), vmapped
  edge_gather     edge_ui row gather given precomputed perms
  samp_prod       sample_negatives_epoch alone
  samp_bits       its [k+1, N] u32 bits block alone
  samp_gather     its user_bitmap_fb row gather alone
  samp_select     word-select + bit test + fallback given gathered rows
  samp_k2         sampler with n_redraws=1 (guarantee unchanged — redraws
                  only trade fallback frequency, never emit a positive)
  splits_only     per-epoch step-key splits

Protocol: paired epoch counts (8/24), scalar fence, min of 3.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_machinery.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.data.synthetic import make_synthetic_dataset
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.sampling import (
    bits_to_ints,
    keyed_permutation,
    sample_negatives_epoch,
    shuffled_epoch,
)

BATCH = 2048
E_SHORT, E_LONG = 8, 24


def main():
    train, test = make_synthetic_dataset(n_users=943, n_items=1682,
                                         n_interactions=100_000, seed=7)
    data = Interaction(train, test)
    graph = DeviceGraph(data, backend="auto", compute_dtype="bfloat16")
    e = graph.n_edges
    n_batches = -(-e // BATCH)
    print(f"# e={e} nb={n_batches} B={BATCH}", flush=True)

    def scalarize(tree):
        return sum(jnp.sum(t).astype(jnp.float32) * 1e-20
                   for t in jax.tree_util.tree_leaves(tree) if hasattr(t, "dtype"))

    def timed(body, label):
        def make(n):
            @jax.jit
            def fn(rng):
                out = jax.vmap(body)(jax.random.split(rng, n))
                return scalarize(out)
            return fn

        times = {}
        for n in (E_SHORT, E_LONG):
            fn = make(n)
            float(fn(jax.random.PRNGKey(2)))
            best = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(fn(jax.random.PRNGKey(2)))
                best.append(time.perf_counter() - t0)
            times[n] = min(best)
        per_step = ((times[E_LONG] - times[E_SHORT])
                    / ((E_LONG - E_SHORT) * n_batches) * 1e6)
        print(f"{label:<14} {per_step:8.1f} us/step   "
              f"(short {times[E_SHORT] * 1e3:7.1f} ms, long {times[E_LONG] * 1e3:7.1f} ms)",
              flush=True)
        return per_step

    def mach_prod(epoch_rng):
        shuffle_key, neg_key, step_key = jax.random.split(epoch_rng, 3)
        users, items, weights, nb = shuffled_epoch(shuffle_key, graph, BATCH)
        negs = sample_negatives_epoch(neg_key, graph, users)
        step_keys = jax.random.split(step_key, nb)
        return users, items, negs, weights, step_keys

    timed(mach_prod, "mach_prod")

    for rounds in (64, 32, 16):
        timed(lambda k, r=rounds: keyed_permutation(k, e, rounds=r),
              f"perm{rounds}")

    timed(lambda k: jax.random.permutation(k, e), "perm_sort")

    perm0 = jax.block_until_ready(
        jax.jit(lambda k: keyed_permutation(k, e))(jax.random.PRNGKey(7))
    )

    def edge_gather(k):
        # same traffic as production: perturb the (precomputed) permutation
        # with the key so the gather cannot be hoisted out of the vmap
        off = bits_to_ints(jax.random.bits(k, (1,), jnp.uint32), e)[0]
        idx = perm0 + (off - off)  # data dependence on k, value unchanged
        rows = graph.edge_ui[idx]
        return rows

    timed(edge_gather, "edge_gather")

    us0, it0, w0, nb = jax.jit(lambda k: shuffled_epoch(k, graph, BATCH))(
        jax.random.PRNGKey(8)
    )
    us0 = jax.block_until_ready(us0)

    timed(lambda k: sample_negatives_epoch(k, graph, us0), "samp_prod")
    timed(lambda k: sample_negatives_epoch(k, graph, us0, n_redraws=1), "samp_k2")

    kk = 5
    n_fb = graph.user_fallback_neg.shape[1]
    w = graph.user_pos_bitmap.shape[1]
    n = us0.size

    timed(lambda k: jax.random.bits(k, (kk + 1, n), jnp.uint32), "samp_bits")

    def samp_gather(k):
        off = bits_to_ints(jax.random.bits(k, (1,), jnp.uint32), 2)[0]
        uflat = us0.reshape(-1) + (off - off)
        return graph.user_bitmap_fb[uflat]

    timed(samp_gather, "samp_gather")

    rows0 = jax.block_until_ready(
        jax.jit(lambda: graph.user_bitmap_fb[us0.reshape(-1)])()
    )

    def samp_select(k):
        all_bits = jax.random.bits(k, (kk + 1, n), jnp.uint32)
        draws = bits_to_ints(all_bits[:kk], graph.n_items)
        fb_col = bits_to_ints(all_bits[kk], n_fb)
        bmp, fb_rows = rows0[:, :w], rows0[:, w:w + n_fb]
        dw = draws >> 5
        iw = jnp.arange(w, dtype=dw.dtype)
        sel = iw[None, None, :] == dw[:, :, None]
        word = jnp.sum(jnp.where(sel, bmp[None], 0), axis=2)
        bad = ((word >> (draws & 31)) & 1) > 0
        first_good = jnp.argmax(~bad, axis=0)
        chosen = jnp.take_along_axis(draws, first_good[None, :], axis=0)[0]
        lane = jnp.arange(n_fb, dtype=fb_col.dtype)
        fallback = jnp.sum(
            jnp.where(lane[None, :] == fb_col[:, None], fb_rows, 0), axis=1
        )
        return jnp.where(jnp.all(bad, axis=0), fallback.astype(chosen.dtype), chosen)

    timed(samp_select, "samp_select")

    def splits_only(k):
        return jax.random.split(k, n_batches)

    timed(splits_only, "splits_only")

    # -- candidate: edge-order sampling + fused (u, i, neg) row gather -------
    # Each epoch consumes each edge EXACTLY once (the epoch is a permutation
    # of edges), so negatives can be drawn per EDGE in static order: the
    # membership rows user_bitmap_fb[edge_users] are then a STATIC array,
    # pre-gathered once — the per-epoch 12 us/step row gather becomes a
    # contiguous scan — and the chosen negative rides the SAME permutation
    # row gather as the edge pair (one [e, 4] gather instead of [e, 2] —
    # issue-bound, so the extra width is free).
    edge_ui = graph.edge_ui[:e]  # drop the padding tail rows
    edge_rows = jax.block_until_ready(
        jax.jit(lambda: graph.user_bitmap_fb[edge_ui[:, 0]])()
    )  # [e, W + fb + pad] STATIC

    total = n_batches * BATCH

    def mach_edgeorder(epoch_rng):
        shuffle_key, neg_key, step_key = jax.random.split(epoch_rng, 3)
        # negatives in edge order, membership against the static rows
        all_bits = jax.random.bits(neg_key, (kk + 1, e), jnp.uint32)
        draws = bits_to_ints(all_bits[:kk], graph.n_items)
        fb_col = bits_to_ints(all_bits[kk], n_fb)
        bmp, fb_rows = edge_rows[:, :w], edge_rows[:, w:w + n_fb]
        dw = draws >> 5
        iw = jnp.arange(w, dtype=dw.dtype)
        sel = iw[None, None, :] == dw[:, :, None]
        word = jnp.sum(jnp.where(sel, bmp[None], 0), axis=2)
        bad = ((word >> (draws & 31)) & 1) > 0
        first_good = jnp.argmax(~bad, axis=0)
        chosen = jnp.take_along_axis(draws, first_good[None, :], axis=0)[0]
        lane = jnp.arange(n_fb, dtype=fb_col.dtype)
        fallback = jnp.sum(
            jnp.where(lane[None, :] == fb_col[:, None], fb_rows, 0), axis=1
        )
        negs_e = jnp.where(jnp.all(bad, axis=0), fallback.astype(chosen.dtype), chosen)
        # pack + one permutation row gather for (u, i, neg, pad)
        table = jnp.concatenate(
            [edge_ui, negs_e[:, None], jnp.zeros((e, 1), jnp.int32)], axis=1
        )
        perm = keyed_permutation(shuffle_key, e)
        idx = jnp.tile(perm, -(-total // e))[:total] if total > e else perm
        rows = table[idx]
        users = rows[:, 0].reshape(n_batches, BATCH)
        items = rows[:, 1].reshape(n_batches, BATCH)
        negs = rows[:, 2].reshape(n_batches, BATCH)
        weights = jnp.ones((n_batches, BATCH), jnp.float32)
        step_keys = jax.random.split(step_key, n_batches)
        return users, items, negs, weights, step_keys

    timed(mach_edgeorder, "mach_edgeorder")

    # select spelling A/B on the static rows: take_along_axis word pick
    def samp_select_taa(k):
        all_bits = jax.random.bits(k, (kk + 1, e), jnp.uint32)
        draws = bits_to_ints(all_bits[:kk], graph.n_items)
        fb_col = bits_to_ints(all_bits[kk], n_fb)
        bmp, fb_rows = edge_rows[:, :w], edge_rows[:, w:w + n_fb]
        dw = (draws >> 5).T  # [e, k]
        word = jnp.take_along_axis(bmp, dw, axis=1).T  # [k, e]
        bad = ((word >> (draws & 31)) & 1) > 0
        first_good = jnp.argmax(~bad, axis=0)
        chosen = jnp.take_along_axis(draws, first_good[None, :], axis=0)[0]
        lane = jnp.arange(n_fb, dtype=fb_col.dtype)
        fallback = jnp.sum(
            jnp.where(lane[None, :] == fb_col[:, None], fb_rows, 0), axis=1
        )
        return jnp.where(jnp.all(bad, axis=0), fallback.astype(chosen.dtype), chosen)

    timed(samp_select_taa, "select_taa")


if __name__ == "__main__":
    main()
