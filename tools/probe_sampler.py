"""Micro-probe: where does epoch-scale negative sampling spend its time?

The round-4 ablation measured whole-epoch vmapped sampling at ~36 us/step
(~1.8 ms/epoch at the headline shape) — as expensive as the in-step form it
replaced. This probe times the sampler's stages and candidate variants at
epoch scale so the expensive stage can be named and fixed.

Variants (per-epoch ms, amortized us/step over 49 steps):
  bits_only        one [k+1, nb, B] u32 bits draw
  bitmap_gather    bitmap row gather [nb*B, W] alone
  member_bcast     current membership: broadcast-compare word select
  member_flat      flat-index word gather (users*W + word) membership
  full_current     sample_negatives as shipped (vmapped over batches)
  full_flat        sample_negatives with flat-gather membership
  fallback_only    the guaranteed-negative gather alone

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_sampler.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from recommendation_tpu.config import default_config
from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.data.synthetic import make_synthetic_dataset
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.sampling import bits_to_ints, sample_negatives, shuffled_epoch

EMB, BATCH = 64, 2048
E_SHORT, E_LONG = 8, 24


def main():
    train, test = make_synthetic_dataset(n_users=943, n_items=1682,
                                         n_interactions=100_000, seed=7)
    data = Interaction(train, test)
    graph = DeviceGraph(data, backend="auto", compute_dtype="bfloat16")
    assert graph.has_pos_bitmap
    n_batches = -(-graph.n_edges // BATCH)
    us, _, _, _ = jax.jit(lambda k: shuffled_epoch(k, graph, BATCH))(jax.random.PRNGKey(1))
    us = jax.block_until_ready(us)  # [nb, B]
    k = 5
    W = graph.user_pos_bitmap.shape[1]
    n_fb = graph.user_fallback_neg.shape[1]
    print(f"# nb={n_batches} B={BATCH} W={W} k={k} n_fb={n_fb}", flush=True)

    def timed(body, label):
        def make(n):
            @jax.jit
            def fn(rng):
                def one(carry, key):
                    return carry + body(key) * 1e-20, None
                keys = jax.random.split(rng, n)
                carry, _ = jax.lax.scan(one, jnp.float32(0.0), keys)
                return carry
            return fn

        times = {}
        for n in (E_SHORT, E_LONG):
            fn = make(n)
            float(fn(jax.random.PRNGKey(3)))
            best = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(jax.random.PRNGKey(3)))
                best.append(time.perf_counter() - t0)
            times[n] = min(best)
        per_epoch = (times[E_LONG] - times[E_SHORT]) / (E_LONG - E_SHORT)
        print(f"{label:<16} {per_epoch * 1e3:8.2f} ms/epoch  "
              f"= {per_epoch / n_batches * 1e6:6.1f} us/step", flush=True)
        return per_epoch

    def bits_only(key):
        bits = jax.random.bits(key, (k + 1, n_batches, BATCH), jnp.uint32)
        return jnp.sum(bits[0, 0, :8].astype(jnp.float32))

    timed(bits_only, "bits_only")

    def bitmap_gather(key):
        rows = graph.user_pos_bitmap[us.reshape(-1)]
        return jnp.sum(rows[0].astype(jnp.float32))

    timed(bitmap_gather, "bitmap_gather")

    def member_bcast(key):
        bits = jax.random.bits(key, (k, n_batches * BATCH), jnp.uint32)
        draws = bits_to_ints(bits, graph.n_items)
        rows = graph.user_pos_bitmap[us.reshape(-1)]  # [N, W]
        dw = draws >> 5
        iw = jnp.arange(W, dtype=dw.dtype)
        sel = iw[None, None, :] == dw[:, :, None]
        word = jnp.sum(jnp.where(sel, rows[None], 0), axis=2)
        bad = ((word >> (draws & 31)) & 1) > 0
        return jnp.sum(bad[0, :8].astype(jnp.float32))

    timed(member_bcast, "member_bcast")

    flat_bitmap = graph.user_pos_bitmap.reshape(-1)

    def member_flat(key):
        bits = jax.random.bits(key, (k, n_batches * BATCH), jnp.uint32)
        draws = bits_to_ints(bits, graph.n_items)
        uflat = us.reshape(-1)
        word = flat_bitmap[uflat[None, :] * W + (draws >> 5)]
        bad = ((word >> (draws & 31)) & 1) > 0
        return jnp.sum(bad[0, :8].astype(jnp.float32))

    timed(member_flat, "member_flat")

    def full_current(key):
        nk = jax.random.split(key, n_batches)
        negs = jax.vmap(lambda kk, u: sample_negatives(kk, graph, u))(nk, us)
        return jnp.sum(negs[0, :8].astype(jnp.float32))

    timed(full_current, "full_current")

    def full_flat(key):
        """sample_negatives re-written with flat-word membership, whole epoch
        in ONE call (no per-batch vmap/key splitting)."""
        all_bits = jax.random.bits(key, (k + 1, n_batches * BATCH), jnp.uint32)
        draws = bits_to_ints(all_bits[:k], graph.n_items)
        fb_col = bits_to_ints(all_bits[k], n_fb)
        uflat = us.reshape(-1)
        fallback = jnp.take(graph.user_fallback_neg.reshape(-1), uflat * n_fb + fb_col)
        word = flat_bitmap[uflat[None, :] * W + (draws >> 5)]
        bad = ((word >> (draws & 31)) & 1) > 0
        first_good = jnp.argmax(~bad, axis=0)
        chosen = jnp.take_along_axis(draws, first_good[None, :], axis=0)[0]
        negs = jnp.where(jnp.all(bad, axis=0), fallback.astype(chosen.dtype), chosen)
        return jnp.sum(negs[:8].astype(jnp.float32))

    timed(full_flat, "full_flat")

    def fallback_only(key):
        bits = jax.random.bits(key, (n_batches * BATCH,), jnp.uint32)
        fb_col = bits_to_ints(bits, n_fb)
        uflat = us.reshape(-1)
        fallback = jnp.take(graph.user_fallback_neg.reshape(-1), uflat * n_fb + fb_col)
        return jnp.sum(fallback[:8].astype(jnp.float32))

    timed(fallback_only, "fallback_only")


if __name__ == "__main__":
    main()
