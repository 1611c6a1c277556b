"""Device-side batching and negative sampling (layer L5).

Replaces the Python rejection-sampling hot loop ``next_batch_pairwise``
(`selfcf.py:188-211`, `ncl.py:91-114`, `directau.py:14-32` — SURVEY.md §3
hot loop #3) with vectorized on-device sampling:

  * epoch = device permutation of the (static-shape, padded) edge list;
  * negatives drawn uniformly, then rejection-corrected by K masked redraw
    rounds against the padded per-user positives table — all inside ``jit``,
    no data-dependent shapes.

With K redraw rounds the residual collision probability is
(density)^(K+1) ≈ (avg_degree/n_items)^(K+1); K=4 makes it < 1e-7 on
ML-100K-class graphs, matching the reference's 100-trial cap in expectation
(`ncl.py:104-112`) while staying branch-free.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.graph.device import DeviceGraph


class PairwiseBatch(NamedTuple):
    users: jnp.ndarray  # i32[B]
    pos_items: jnp.ndarray  # i32[B]
    neg_items: jnp.ndarray  # i32[B]
    weight: jnp.ndarray  # f32[B] 1.0 for real rows, 0.0 for padding


class PointwiseBatch(NamedTuple):
    """Labeled (user, item, y) rows — the `next_batch_pointwise` contract
    (`univariate/diffnet.py:968-991`): each positive edge contributes one
    y=1 row and ``n_negs`` y=0 rows."""

    users: jnp.ndarray  # i32[B*(1+n_negs)]
    items: jnp.ndarray  # i32[B*(1+n_negs)]
    labels: jnp.ndarray  # f32[B*(1+n_negs)] 1.0 positive / 0.0 negative
    weight: jnp.ndarray  # f32[B*(1+n_negs)] 0.0 for padding rows


def bits_to_ints(bits: jnp.ndarray, n: int) -> jnp.ndarray:
    """Map raw u32 bits to uniform i32 in [0, n) WITHOUT integer modulo.

    ``jax.random.randint``'s range reduction costs ~45 us per [5, 2048] call
    on TPU v5e (no hardware integer divide — the remainder expands to a long
    VPU sequence; measured round 3). This maps the top 24 bits through f32
    (exact integer arithmetic below 2^24): ~5x cheaper, with a uniformity
    deviation ≤ n·2⁻²⁴ — for item catalogs this is < 1e-4 relative and
    irrelevant to negative sampling. Requires n < 2^24 (16.7M)."""
    f = (bits >> 8).astype(jnp.float32) * jnp.float32(n * 2.0**-24)
    return jnp.minimum(f.astype(jnp.int32), n - 1)


def uniform_ints(rng: jax.Array, shape, n: int) -> jnp.ndarray:
    """Uniform i32 draws in [0, n) via ``bits_to_ints`` (one ``bits`` call,
    no modulo); n ≥ 2^24 (no current regime) falls back to randint — the
    same strict bound ``sample_negatives`` uses (n == 2^24 would be exact in
    ``bits_to_ints`` — scale is exactly 1.0 — but keep the three call sites
    agreeing on one condition)."""
    if n >= (1 << 24):
        return jax.random.randint(rng, shape, 0, n)
    return bits_to_ints(jax.random.bits(rng, shape, jnp.uint32), n)


def keyed_permutation(rng: jax.Array, n: int, rounds: int | None = None) -> jnp.ndarray:
    """Exact pseudorandom permutation of ``[0, n)`` in O(rounds·n)
    ELEMENTWISE work — the sort-free epoch shuffle.

    ``jax.random.permutation`` lowers to a full sort network (measured
    1.2 ms at n=82k on TPU v5e = 31 us/step of the headline epoch, and the
    sort is the single largest machinery item on the 1M-edge path). This is
    the swap-or-not shuffle (Hoang–Morris–Rogaway): round r draws a key
    K_r ∈ [0, n) and pairs x ↔ (K_r − x) mod n; the pair swaps iff a hash
    bit of the pair's canonical member says so. Each round is a permutation
    for ANY key (the pairing is an involution and both partners compute the
    same bit), so the composition is always an exact bijection — verified by
    tests/test_sampling.py::test_keyed_permutation_is_bijection.

    Mixing quality: ``rounds=None`` (default) uses max(24, 2·⌈lg n⌉) —
    round 5 trimmed the fixed 64 (≈4·lg n for million-edge graphs, far
    beyond the Θ(lg n) mixing bound) since SGD epoch shuffling needs far
    less, and the reference's own shuffle is Python's Mersenne-driven
    Fisher–Yates (`selfcf.py:193` ``shuffle(...)``), also a PRG-driven
    permutation family — the uniformity CLASS is unchanged, only the
    family. Quality re-validated after the change (BASELINE.md round-5
    parity + leaderboard).

    The modulo is compare-add (operands already in [0, n)); the hash is a
    murmur-style multiply-xor-shift — no integer divide anywhere (TPU has
    none in hardware; see ``bits_to_ints``)."""
    if rounds is None:
        rounds = max(24, 2 * int(np.ceil(np.log2(max(n, 2)))))
    k1, k2 = jax.random.split(rng)
    ks = uniform_ints(k1, (rounds,), n)
    salts = jax.random.bits(k2, (rounds,), jnp.uint32)
    x = jnp.arange(n, dtype=jnp.int32)
    for r in range(rounds):
        xp = ks[r] - x
        xp = jnp.where(xp < 0, xp + n, xp)
        mx = jnp.maximum(x, xp).astype(jnp.uint32)
        h = (mx * jnp.uint32(0x9E3779B1)) ^ salts[r]
        h = (h ^ (h >> 15)) * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 13)
        x = jnp.where((h & 1) > 0, xp, x)
    return x


def _is_positive(graph: DeviceGraph, users: jnp.ndarray, items: jnp.ndarray) -> jnp.ndarray:
    """bool[B]: does (u, i) appear in the train set?

    Three paths, chosen statically by graph size:
      * padded-table compare (one gather + vectorized equality) when the
        table exists — a log(max_degree) binary search is ~20× SLOWER here
        on TPU because its dependent mini-gathers serialize (measured:
        38 ms/epoch vs ~2 ms on ML-100K);
      * dense int8 mask row-gather when only the mask fits (mask cap
        DENSE_MAX_ELEMENTS > table cap POS_TABLE_MAX_ELEMENTS);
      * windowed binary search over the CSR item lists otherwise."""
    if getattr(graph, "has_pos_table", True):
        pos_rows = graph.user_positives[users]  # [B, max_deg]
        return jnp.any(pos_rows == items[:, None], axis=1)
    if getattr(graph, "has_pos_mask", False):
        mask_rows = graph.user_pos_mask[users]  # [B, n_items] i8
        return jnp.take_along_axis(mask_rows, items[:, None], axis=1)[:, 0] > 0
    lo = graph.csr_indptr[users]
    hi = graph.csr_indptr[users + 1]
    end = hi
    n_iters = max(1, int(np.ceil(np.log2(max(2, graph.max_degree + 1)))) + 1)
    flat = graph.csr_items
    for _ in range(n_iters):  # vectorized lower_bound
        active = lo < hi
        mid = (lo + hi) // 2
        v = flat[jnp.clip(mid, 0, flat.shape[0] - 1)]
        go_right = active & (v < items)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    return (lo < end) & (flat[jnp.clip(lo, 0, flat.shape[0] - 1)] == items)


def sample_negatives(
    rng: jax.Array,
    graph: DeviceGraph,
    users: jnp.ndarray,
    n_redraws: int = 4,
) -> jnp.ndarray:
    """Uniform negatives with masked redraw rejection (never a shape change).

    Table path draws ALL n_redraws+1 candidates up front and checks them
    against ONE gather of the per-user positives — the gather is the
    dominant cost, so this is ~(n_redraws+1)× cheaper than sequential
    redraw rounds (measured on TPU). First non-colliding candidate wins;
    residual collision probability is density^(n_redraws+1)."""
    k = n_redraws + 1
    n_fb = graph.user_fallback_neg.shape[1]
    # ONE bits call covers the k candidate rows AND the fallback column:
    # per-step key ops (split / fold_in) are ~25-50 us EACH on TPU v5e (a
    # threefry block is a long chain of tiny scalar HLOs — measured round 3),
    # so the sampler touches the key exactly once.
    if graph.n_items < (1 << 24):
        all_bits = jax.random.bits(rng, (k + 1,) + users.shape, jnp.uint32)
        draw_bits, fb_bits = all_bits[:k], all_bits[k]
        fb_col = bits_to_ints(fb_bits, n_fb)
        draws = bits_to_ints(draw_bits, graph.n_items)
    else:  # >16.7M items: keep full-width randint (no current regime)
        rng, fb_key = jax.random.split(rng)
        fb_col = jax.random.randint(fb_key, users.shape, 0, n_fb)
        draws = jax.random.randint(rng, (k,) + users.shape, 0, graph.n_items)
    # single flat gather instead of a 2-D advanced index
    fb_flat = graph.user_fallback_neg.reshape(-1)
    fallback = jnp.take(fb_flat, users * n_fb + fb_col)
    if getattr(graph, "has_pos_bitmap", False):
        # packed-bitmap membership: ONE contiguous [B, W] word-row gather
        # (W = ceil(n_items/32) ≪ max_degree on power-law graphs — 18× less
        # HBM traffic than the positives-table gather at the ML-100K shape),
        # then the candidate's word is selected by a broadcast compare over
        # the W lanes (random per-row column gathers are slow on TPU;
        # vector select over a gathered row is not) and its bit tested.
        rows = graph.user_pos_bitmap[users]  # [B, W]
        dw = draws >> 5  # [k, B]
        iw = jnp.arange(rows.shape[1], dtype=dw.dtype)
        sel = iw[None, None, :] == dw[:, :, None]  # [k, B, W]
        word = jnp.sum(jnp.where(sel, rows[None], 0), axis=2)  # [k, B]
        bad = ((word >> (draws & 31)) & 1) > 0
        first_good = jnp.argmax(~bad, axis=0)
        chosen = jnp.take_along_axis(draws, first_good[None, :], axis=0)[0]
        return jnp.where(jnp.all(bad, axis=0), fallback.astype(chosen.dtype), chosen)
    if getattr(graph, "has_pos_table", True):
        pos_rows = graph.user_positives[users]  # [B, max_deg], gathered once
        # broadcast-compare beats an i8-mask take_along_axis here: random
        # per-row column gathers are slow on TPU, contiguous row gathers +
        # vector equality are not (measured 7.9 vs 12.8 ms/epoch, ML-100K)
        bad = jnp.any(pos_rows[None, :, :] == draws[:, :, None], axis=2)  # [k, B]
        first_good = jnp.argmax(~bad, axis=0)
        chosen = jnp.take_along_axis(draws, first_good[None, :], axis=0)[0]
        # all-k-bad rows (probability density_u^k — non-negligible for
        # near-saturated users) fall back to one of the user's precomputed
        # guaranteed negatives (rotated randomly so no single item absorbs
        # a dense user's collisions): like the reference's rejection loop
        # (`ncl.py:104-112`), a positive is never emitted as a negative —
        # but branch-free.
        return jnp.where(jnp.all(bad, axis=0), fallback.astype(chosen.dtype), chosen)

    # sequential-membership fallback (mask / binary-search regimes): consume
    # the same precomputed candidate rows, replacing on collision
    neg = draws[0]
    for j in range(1, k):
        bad = _is_positive(graph, users, neg)
        neg = jnp.where(bad, draws[j], neg)
    still_bad = _is_positive(graph, users, neg)
    return jnp.where(still_bad, fallback, neg)


def sample_negatives_epoch(
    rng: jax.Array,
    graph: DeviceGraph,
    users: jnp.ndarray,
    n_redraws: int = 4,
) -> jnp.ndarray:
    """Negatives for a WHOLE epoch of batches in one fused call.

    ``users`` is i32[n_batches, B] (from :func:`shuffled_epoch`); returns
    negatives of the same shape, with the identical never-a-train-positive
    guarantee as :func:`sample_negatives`.

    Why a separate entry point (round-4 probe, tools/probe_sampler.py): the
    per-batch form run over an epoch — whether scanned in-step or vmapped —
    costs ~71 us/step at the headline shape, and almost none of it is the
    membership test (4.7 us). The rest is per-batch key plumbing and, above
    all, the SCALAR fallback gather (21.7 us/step: 1-element gathers run at
    ~10 ns/slot vs ~1.2 ns for row gathers). This form draws one bits block
    for the epoch and gathers ONE fused row per example — membership words
    and fallback candidates together (`graph.user_bitmap_fb`) — then selects
    the fallback column with an in-register compare over n_fb lanes.

    Non-bitmap regimes (huge tables / binary-search fallbacks) keep the
    per-batch sampler under vmap: their membership rows are too wide to
    fuse, and those regimes are not sampling-bound.
    """
    if not getattr(graph, "has_pos_bitmap", False) or graph.n_items >= (1 << 24):
        n_batches = users.shape[0]
        keys = jax.random.split(rng, n_batches)
        return jax.vmap(
            lambda k, u: sample_negatives(k, graph, u, n_redraws)
        )(keys, users)

    k = n_redraws + 1
    n_fb = graph.user_fallback_neg.shape[1]
    w = graph.user_pos_bitmap.shape[1]
    uflat = users.reshape(-1)
    n = uflat.shape[0]
    all_bits = jax.random.bits(rng, (k + 1, n), jnp.uint32)
    draws = bits_to_ints(all_bits[:k], graph.n_items)  # [k, N]
    fb_col = bits_to_ints(all_bits[k], n_fb)  # [N]
    rows = graph.user_bitmap_fb[uflat]  # [N, W + n_fb (+pad to 64)] — the one gather
    bmp, fb_rows = rows[:, :w], rows[:, w:w + n_fb]
    dw = draws >> 5  # [k, N]
    iw = jnp.arange(w, dtype=dw.dtype)
    sel = iw[None, None, :] == dw[:, :, None]  # [k, N, W]
    word = jnp.sum(jnp.where(sel, bmp[None], 0), axis=2)  # [k, N]
    bad = ((word >> (draws & 31)) & 1) > 0
    first_good = jnp.argmax(~bad, axis=0)
    chosen = jnp.take_along_axis(draws, first_good[None, :], axis=0)[0]
    lane = jnp.arange(n_fb, dtype=fb_col.dtype)
    fallback = jnp.sum(
        jnp.where(lane[None, :] == fb_col[:, None], fb_rows, 0), axis=1
    )
    negs = jnp.where(jnp.all(bad, axis=0), fallback.astype(chosen.dtype), chosen)
    return negs.reshape(users.shape)


def sample_negatives_epoch_edges(
    rng: jax.Array,
    graph: DeviceGraph,
    n_redraws: int = 4,
) -> jnp.ndarray:
    """One epoch's negatives drawn PER EDGE in static edge order.

    An epoch consumes each edge exactly once (the epoch is a permutation of
    the edge list), so the negative for each edge can be drawn BEFORE the
    shuffle and ride the shuffle's single row gather
    (:func:`shuffled_epoch_fused`). The membership rows are then indexed by
    the STATIC ``graph.edge_bitmap_fb`` (pre-gathered at build) — a
    contiguous scan instead of the per-epoch [N, W+fb] random row gather,
    which measured ~12 us/step of the headline bench (round-5
    tools/probe_machinery.py; the gather was the sampler's largest item).

    Same guarantee as :func:`sample_negatives`: a train positive is never
    emitted (k up-front candidates checked against the bitmap, guaranteed-
    negative fallback). Same uniformity class; the RNG stream differs from
    the per-position sampler (bits are indexed by edge, not by batch slot).

    Returns i32[n_edge_rows] (the padded edge-table length; padding rows'
    draws are never consumed).
    """
    k = n_redraws + 1
    n_fb = graph.user_fallback_neg.shape[1]
    w = graph.user_pos_bitmap.shape[1]
    rows = graph.edge_bitmap_fb  # [E, W + n_fb (+pad)] STATIC
    e = rows.shape[0]
    all_bits = jax.random.bits(rng, (k + 1, e), jnp.uint32)
    draws = bits_to_ints(all_bits[:k], graph.n_items)  # [k, E]
    fb_col = bits_to_ints(all_bits[k], n_fb)  # [E]
    bmp, fb_rows = rows[:, :w], rows[:, w:w + n_fb]
    dw = draws >> 5
    iw = jnp.arange(w, dtype=dw.dtype)
    sel = iw[None, None, :] == dw[:, :, None]  # [k, E, W]
    word = jnp.sum(jnp.where(sel, bmp[None], 0), axis=2)  # [k, E]
    bad = ((word >> (draws & 31)) & 1) > 0
    first_good = jnp.argmax(~bad, axis=0)
    chosen = jnp.take_along_axis(draws, first_good[None, :], axis=0)[0]
    lane = jnp.arange(n_fb, dtype=fb_col.dtype)
    fallback = jnp.sum(
        jnp.where(lane[None, :] == fb_col[:, None], fb_rows, 0), axis=1
    )
    return jnp.where(jnp.all(bad, axis=0), fallback.astype(chosen.dtype), chosen)


def shuffled_epoch_fused(
    rng: jax.Array, graph: DeviceGraph, batch_size: int, negs_e: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
    """:func:`shuffled_epoch` with the per-edge negatives riding the SAME
    permutation row gather: one [total, 4] gather of (user, item, neg, pad)
    rows — row gathers are issue-bound on this TPU, so the extra width over
    the [total, 2] edge gather is free (round-3 probe A).

    Tail batches are padded cyclically like :func:`shuffled_epoch`;
    duplicated tail edges therefore share their epoch negative (≤B−1 rows,
    statistically neutral). Returns (users, items, negs, weights, n_batches).
    """
    e = graph.n_edges
    n_batches = max(1, -(-e // batch_size))
    total = n_batches * batch_size
    import os

    if os.environ.get("RECTPU_SHUFFLE", "swapornot") == "sort":
        perm = jax.random.permutation(rng, e).astype(jnp.int32)
    else:
        perm = keyed_permutation(rng, e)
    if total > e:
        reps = -(-total // e)
        idx = jnp.tile(perm, reps)[:total]
    else:
        idx = perm
    pad = jnp.zeros((graph.edge_ui.shape[0], 1), jnp.int32)
    table = jnp.concatenate(
        [graph.edge_ui, negs_e[: graph.edge_ui.shape[0], None], pad], axis=1
    )
    rows = table[idx]
    users = rows[:, 0].reshape(n_batches, batch_size)
    items = rows[:, 1].reshape(n_batches, batch_size)
    negs = rows[:, 2].reshape(n_batches, batch_size)
    weight = jnp.ones((n_batches, batch_size), dtype=jnp.float32)
    return users, items, negs, weight, n_batches


def epoch_batches(
    shuffle_key: jax.Array,
    neg_key: jax.Array,
    graph: DeviceGraph,
    batch_size: int,
    n_redraws: int = 4,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
    """One epoch's (users, items, negs, weights, n_batches) — the single
    entry point every epoch-level trainer path draws through, so fused,
    unfused and chunked trainers stay bit-identical to each other.

    Routes through the edge-order fused path when the graph carries the
    static edge membership rows (``graph.edge_bitmap_fb``), otherwise the
    round-4 per-position sampler."""
    if getattr(graph, "has_edge_bitmap_fb", False):
        negs_e = sample_negatives_epoch_edges(neg_key, graph, n_redraws)
        return shuffled_epoch_fused(shuffle_key, graph, batch_size, negs_e)
    users, items, weights, nb = shuffled_epoch(shuffle_key, graph, batch_size)
    negs = sample_negatives_epoch(neg_key, graph, users, n_redraws)
    return users, items, negs, weights, nb


def sample_pointwise(
    rng: jax.Array,
    graph: DeviceGraph,
    users: jnp.ndarray,
    pos_items: jnp.ndarray,
    n_negs: int = 4,
    weight: jnp.ndarray | None = None,
) -> PointwiseBatch:
    """On-device `next_batch_pointwise` (`univariate/diffnet.py:968-991`):
    1 positive + ``n_negs`` labeled negatives per training edge, with the
    same never-a-train-positive guarantee as the pairwise path (each
    negative column runs the masked-redraw + guaranteed-fallback sampler).

    Layout is column-major blocks ([all positives; negs_1; ...; negs_k])
    rather than the reference's interleaving — order is irrelevant to any
    pointwise loss, and blocks keep the construct concat-only (static
    shapes, no strided writes)."""
    b = users.shape[0]
    keys = jax.random.split(rng, n_negs)
    negs = [sample_negatives(k, graph, users) for k in keys]
    w = jnp.ones((b,), jnp.float32) if weight is None else weight
    return PointwiseBatch(
        users=jnp.concatenate([users] * (1 + n_negs)),
        items=jnp.concatenate([pos_items, *negs]),
        labels=jnp.concatenate(
            [jnp.ones((b,), jnp.float32), jnp.zeros((b * n_negs,), jnp.float32)]
        ),
        weight=jnp.concatenate([w] * (1 + n_negs)),
    )


def shuffled_epoch(
    rng: jax.Array, graph: DeviceGraph, batch_size: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
    """Permute the real edges and reshape into [n_batches, B] blocks.

    The tail batch is padded CYCLICALLY with edges from the front of the
    permutation, so every batch has identical shape and one compiled step
    serves all. (Divergence from the reference's smaller final batch
    `selfcf.py:193-196`: ≤B−1 duplicated samples per epoch — statistically
    neutral for SGD, and jit-stable.)"""
    e = graph.n_edges
    n_batches = max(1, -(-e // batch_size))
    total = n_batches * batch_size
    # Permutation family knob (ADVICE r4 / DESIGN.md deviation policy):
    # default is the sort-free 64-round swap-or-not shuffle (exact bijection,
    # weaker mixing than a full sort-derived permutation — adequate for SGD
    # epoch order, ~35 -> ~6 us/step on the headline bench). Set
    # RECTPU_SHUFFLE=sort to restore jax.random.permutation (exact uniform)
    # for any consumer that needs the stronger family.
    import os

    if os.environ.get("RECTPU_SHUFFLE", "swapornot") == "sort":
        perm = jax.random.permutation(rng, e).astype(jnp.int32)
    else:
        perm = keyed_permutation(rng, e)
    if total > e:
        # tile enough copies for any batch_size > e (a single cyclic slice
        # cannot supply more than e extra indices)
        reps = -(-total // e)
        idx = jnp.tile(perm, reps)[:total]
    else:
        idx = perm
    # one [total, 2] ROW gather materializes both columns: scalar-element
    # gathers run ~10 ns/element on this TPU (tools/probe_edge_shuffle.py)
    rows = graph.edge_ui[idx]
    users = rows[:, 0].reshape(n_batches, batch_size)
    items = rows[:, 1].reshape(n_batches, batch_size)
    weight = jnp.ones((n_batches, batch_size), dtype=jnp.float32)
    return users, items, weight, n_batches


def pairwise_batches(
    rng: jax.Array, graph: DeviceGraph, batch_size: int, n_negs: int = 1
) -> Iterator[PairwiseBatch]:
    """Host-level generator of device batches (used by non-scan trainers and
    tests; the production trainers consume ``shuffled_epoch`` inside a
    ``lax.scan``)."""
    shuffle_key, neg_key = jax.random.split(rng)
    users, items, weight, n_batches = shuffled_epoch(shuffle_key, graph, batch_size)
    neg_keys = jax.random.split(neg_key, n_batches)
    for b in range(n_batches):
        negs = sample_negatives(neg_keys[b], graph, users[b])
        yield PairwiseBatch(users[b], items[b], negs, weight[b])


def popularity_baseline_topk(graph: DeviceGraph, k: int) -> np.ndarray:
    """Most-popular-items baseline used by integration tests (SURVEY.md §4)."""
    counts = jax.ops.segment_sum(
        graph.edge_valid, graph.edge_items, num_segments=graph.n_items
    )
    return np.asarray(jnp.argsort(-counts)[:k])
