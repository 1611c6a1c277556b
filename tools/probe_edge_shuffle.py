"""Micro-probe: cost of materializing a shuffled epoch's (users, items)
arrays from a permutation, per candidate layout.

Round-4 ablation: `shuffle_only` = 34.9 us/step at the headline shape while
the permutation itself (batched swap-or-not) is ~5 — the rest is TWO
scalar-element gathers (`edge_users[perm]`, `edge_items[perm]`), which run
at ~10 ns/element vs ~1.2 ns/slot for row gathers (same pathology the
sampler's fallback gather had, tools/probe_sampler.py). Candidates:

  scalar2        current: two [E] scalar gathers
  row2           one [E, 2] i32 row gather, split columns
  row4 / row8    same but zero-padded to 4 / 8 words (dodges any narrow-row
                 slow path; issue-bound cost should be flat in width)
  swapnet        no gather at all: run the swap-or-not rounds directly on
                 the [E, 2] DATA (partner = flip+roll — contiguous ops)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_edge_shuffle.py [--large]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from recommendation_tpu.sampling import keyed_permutation, uniform_ints

LARGE = "--large" in sys.argv
E = 1_000_000 if LARGE else 81_919
E_SHORT, E_LONG = (4, 12) if LARGE else (8, 24)
BATCH = 8192 if LARGE else 2048
N_BATCHES = -(-E // BATCH)

users = jax.block_until_ready(
    uniform_ints(jax.random.PRNGKey(0), (E,), 50_000).astype(jnp.int32))
items = jax.block_until_ready(
    uniform_ints(jax.random.PRNGKey(1), (E,), 100_000).astype(jnp.int32))


def timed(body, label):
    def make(n):
        @jax.jit
        def fn(rng):
            def one(carry, key):
                u, i = body(key)
                return carry + (u[0] + i[0]).astype(jnp.float32) * 1e-20, None
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
    print(f"{label:<10} {per_epoch * 1e3:8.2f} ms/epoch  "
          f"= {per_epoch / N_BATCHES * 1e6:7.1f} us/step", flush=True)


def scalar2(key):
    perm = keyed_permutation(key, E)
    return users[perm], items[perm]


timed(scalar2, "scalar2")

for w in (2, 16, 32, 64):
    cols = [users, items] + [jnp.zeros((E,), jnp.int32)] * (w - 2)
    table = jax.block_until_ready(jnp.stack(cols, axis=1))

    def roww(key, table=table):
        perm = keyed_permutation(key, E)
        rows = table[perm]
        return rows[:, 0], rows[:, 1]

    timed(roww, f"row{w}")


def swapnet(key, rounds=64):
    """Swap-or-not applied to the DATA: round r pairs position p with
    (K_r - p) mod E; old[(K_r - p) mod E] for all p is flip + roll, so each
    round is two contiguous copies + an elementwise select. Identical
    permutation family to keyed_permutation (same pairing, same hash)."""
    k1, k2 = jax.random.split(key)
    ks = uniform_ints(k1, (rounds,), E)
    salts = jax.random.bits(k2, (rounds,), jnp.uint32)
    data = jnp.stack([users, items], axis=1)
    p = jnp.arange(E, dtype=jnp.int32)
    for r in range(rounds):
        pp = ks[r] - p
        pp = jnp.where(pp < 0, pp + E, pp)
        mx = jnp.maximum(p, pp).astype(jnp.uint32)
        h = (mx * jnp.uint32(0x9E3779B1)) ^ salts[r]
        h = (h ^ (h >> 15)) * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 13)
        swap = ((h & 1) > 0)[:, None]
        partner = jnp.roll(data[::-1], ks[r] + 1, axis=0)
        data = jnp.where(swap, partner, data)
    return data[:, 0], data[:, 1]


timed(swapnet, "swapnet")


def perm_only(key):
    perm = keyed_permutation(key, E)
    return perm, perm


timed(perm_only, "perm_only")


def perm32(key):
    perm = keyed_permutation(key, E, rounds=32)
    return perm, perm


timed(perm32, "perm32")

table2 = jax.block_until_ready(jnp.stack([users, items], axis=1))


def row2_perm32(key):
    perm = keyed_permutation(key, E, rounds=32)
    rows = table2[perm]
    return rows[:, 0], rows[:, 1]


timed(row2_perm32, "row2_p32")


def sortperm(key):
    perm = jax.random.permutation(key, E)
    rows = table2[perm]
    return rows[:, 0], rows[:, 1]


timed(sortperm, "row2_sort")
