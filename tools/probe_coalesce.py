"""Slot-coalescing probe for the bucketed pull (VERDICT-r4 #2).

Round 3's probe A showed the TPU gather is ISSUE-bound: ns/slot is flat in
row width, so effective bandwidth GROWS with wider rows (47 -> 812 GB/s at
64 -> 1024 B). The untried lever: merge k neighbors that sit in CONSECUTIVE
row-space positions into ONE gather of a k-wide row from an overlapping
pair view (xp2[r] = xp[r] ++ xp[r+1]) — cutting gather ISSUE count.

Because a destination's slots may be reordered freely (the reduction is a
sum), the merge opportunity is: sort each destination's source rows, count
runs of consecutive row-space ids, pair greedily. Row-space position is
bucket-grouped (degree class) then node-id — and high-degree sources (the
rows pulled most often) already cluster in the hub buckets, so consecutive
co-pulls are structurally plausible. A within-bucket reorder (by degree,
or by co-occurrence) can only improve on the node-id order measured here.

Part 1 (host, numpy): pairable-slot fraction of the `bench.py --large`
fixture (50k x 100k, 1M edges, CAP_STEP=8 schedule) under
  (a) the natural node-id order within buckets,
  (b) degree-descending order within buckets,
and the implied issue-count reduction. This is the build-or-kill gate:
the pull floor is ~2.0 ns/slot x slot count, so the ceiling of the lever
is directly the issue-count cut.

Part 2 (TPU, --tpu): measure a synthetic paired pull at the 1M-edge shape —
the production separable pull vs the same slots with the measured pair
fraction merged through an overlapping pair view — to validate that a
2-wide row gather costs ~1 issue, including the pair-view materialization
(one [R, 2d] write per layer).

Run: PYTHONPATH=/root/repo python tools/probe_coalesce.py          # host
     PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_coalesce.py --tpu
"""

from __future__ import annotations

import sys
import time

import numpy as np


def build_rowspace_lists(seed: int = 3):
    """The exact bench --large square structure, as host arrays."""
    from recommendation_tpu.data.synthetic import make_flat_interactions
    from recommendation_tpu.graph.bucketed import MIN_CAP, _cap_for_degree

    nu, ni, e = 50_000, 100_000, 1_000_000
    pairs = make_flat_interactions(nu, ni, e, seed=seed)
    n = nu + ni
    # square symmetric pattern: user u pulls item rows, item i pulls user rows
    rows = np.concatenate([pairs[:, 0], nu + pairs[:, 1]])
    cols = np.concatenate([nu + pairs[:, 1], pairs[:, 0]])

    deg = np.bincount(rows, minlength=n).astype(np.int64)
    caps = _cap_for_degree(deg, MIN_CAP)
    return rows, cols, deg, caps, n


def rowspace_positions(deg, caps, order_within="id"):
    """gather_pos under the builder's bucket grouping; rows within a bucket
    ordered by node id (production) or by degree descending (candidate)."""
    n = len(deg)
    nonzero = deg > 0
    gather_pos = np.full(n, -1, dtype=np.int64)
    base = 0
    for cap in np.unique(caps[nonzero]):
        rows_in = np.where(nonzero & (caps == cap))[0]
        if order_within == "deg":
            rows_in = rows_in[np.argsort(-deg[rows_in], kind="stable")]
        gather_pos[rows_in] = base + np.arange(len(rows_in))
        base += len(rows_in)
    return gather_pos, base


def pair_stats(rows, cols, gather_pos, caps, deg):
    """Greedy pairing of consecutive row-space sources within each
    destination, vectorized: sort (dst, src_row) pairs, mark adjacent
    same-dst entries whose src rows differ by exactly 1, and greedily take
    alternate marks (a run of L consecutive ids yields floor(L/2) pairs)."""
    src_row = gather_pos[cols]
    order = np.lexsort((src_row, rows))
    d = rows[order]
    s = src_row[order]
    same_dst = d[1:] == d[:-1]
    consec = same_dst & (s[1:] == s[:-1] + 1)
    # greedy alternate-take within runs of True
    take = np.zeros(len(consec), dtype=bool)
    # run-id trick: positions where consec turns on
    idx = np.flatnonzero(consec)
    if len(idx):
        run_start = np.concatenate([[True], np.diff(idx) != 1])
        run_id = np.cumsum(run_start) - 1
        starts = idx[run_start]
        offset = idx - starts[run_id]
        take[idx[offset % 2 == 0]] = True
    n_pairs = int(take.sum())
    e = len(rows)
    real_slots = e
    padded_slots = int(caps[deg > 0].sum())
    merged_issues = padded_slots - n_pairs
    return n_pairs, real_slots, padded_slots, merged_issues


def rowspace_positions_anchor(rows, cols, deg, caps):
    """Anchor ordering: within each bucket, sort source nodes by the id of
    the first destination that pulls them — nodes sharing a destination
    become adjacent, guaranteeing >= 1 co-pull per adjacency for the long
    tail (a locality heuristic orthogonal to degree)."""
    n = len(deg)
    order = np.argsort(cols, kind="stable")
    first_dst = np.full(n, n, dtype=np.int64)
    # reversed fill: first occurrence wins
    first_dst[cols[order][::-1]] = rows[order][::-1]
    nonzero = deg > 0
    gather_pos = np.full(n, -1, dtype=np.int64)
    base = 0
    for cap in np.unique(caps[nonzero]):
        rows_in = np.where(nonzero & (caps == cap))[0]
        rows_in = rows_in[np.argsort(first_dst[rows_in], kind="stable")]
        gather_pos[rows_in] = base + np.arange(len(rows_in))
        base += len(rows_in)
    return gather_pos, base


def host_probe():
    t0 = time.time()
    rows, cols, deg, caps, n = build_rowspace_lists()
    print(f"fixture built in {time.time() - t0:.1f}s: {len(rows):,} square "
          f"edges, {int(caps[deg > 0].sum()):,} padded slots")
    best_pairs = 0
    for label, order in (("node-id order", "id"), ("degree-sorted", "deg"),
                         ("anchor-dst", "anchor")):
        if order == "anchor":
            gather_pos, total = rowspace_positions_anchor(rows, cols, deg, caps)
        else:
            gather_pos, total = rowspace_positions(deg, caps, order)
        n_pairs, real, padded, issues = pair_stats(rows, cols, gather_pos, caps, deg)
        best_pairs = max(best_pairs, n_pairs)
        print(
            f"{label:<14} pairable: {n_pairs:,} pairs of {real:,} real slots "
            f"({100 * 2 * n_pairs / real:.1f}% of real slots in pairs); "
            f"issue count {padded:,} -> {issues:,} "
            f"({100 * (1 - issues / padded):.1f}% cut)"
        )
    # Requirement line: the pull floors at ~2.0 ns/slot x 6 pulls/step
    # (BASELINE.md round-4 decomposition), so throughput scales ~1:1 with
    # issue count over the pull-dominated step. 201.6k -> 225k ex/s needs
    # the step's ~34.5 ms of pulls cut by ~4.2 ms = a >= ~12% issue cut.
    padded = int(caps[deg > 0].sum())
    need = 1 - (34.5 - 4.2) / 34.5
    print(f"  requirement: >= {100 * need:.0f}% issue cut for 225k ex/s "
          f"(>= {int(need * padded):,} pairs); best ordering above delivers "
          f"a {100 * best_pairs / padded:.1f}% cut — the lever is ~4x short "
          f"even before pair-view materialization costs")


def tpu_probe():
    import jax
    import jax.numpy as jnp

    rows, cols, deg, caps, n = build_rowspace_lists()
    gather_pos, total_rows = rowspace_positions(deg, caps, "deg")
    d = 64

    # production-shaped separable pull: per-bucket [nb, cap] row gathers +
    # sum (value multiply folded away as in the separable path)
    from recommendation_tpu.graph.bucketed import MIN_CAP, build_bucketed

    vals = np.ones(len(rows), np.float32)
    csr = build_bucketed(rows, cols, vals, n, n, min_cap=MIN_CAP)
    xp = jax.random.normal(jax.random.PRNGKey(0), (csr.total_rows + 1, d), jnp.float32)

    def pull_prod(x):
        outs = [jnp.sum(x[b.ridx], axis=1) for b in csr.buckets]
        return jnp.concatenate(outs + [jnp.zeros((1, d), jnp.float32)], axis=0)

    # paired variant: same slot multiset, measured pair fraction merged.
    # Simulate with the REAL pairing: recompute per-destination slot lists
    # in row space, split into pairs + singles per bucket.
    print("building paired tables on host...", flush=True)
    src_row = gather_pos[cols]
    order = np.lexsort((src_row, rows))
    dst = rows[order]
    s = src_row[order]
    same = (dst[1:] == dst[:-1]) & (s[1:] == s[:-1] + 1)
    take = np.zeros(len(same), dtype=bool)
    idx = np.flatnonzero(same)
    if len(idx):
        run_start = np.concatenate([[True], np.diff(idx) != 1])
        run_id = np.cumsum(run_start) - 1
        starts = idx[run_start]
        offset = idx - starts[run_id]
        take[idx[offset % 2 == 0]] = True
    is_pair_lead = np.concatenate([take, [False]])
    is_pair_tail = np.concatenate([[False], take])
    is_single = ~is_pair_lead & ~is_pair_tail

    # per-destination counts -> bucket tables (pairs and singles separately)
    from recommendation_tpu.graph.bucketed import _cap_for_degree

    def tables_for(mask, width_ids):
        cnt = np.bincount(dst[mask], minlength=n)
        cap_w = _cap_for_degree(cnt, 1)
        nonzero_rows = np.unique(dst)  # every row that pulls anything
        buckets = {}
        ordr = np.lexsort((width_ids[mask], dst[mask]))
        dd, ss = dst[mask][ordr], width_ids[mask][ordr]
        indptr = np.concatenate([[0], np.cumsum(np.bincount(dd, minlength=n))])
        for cap in np.unique(cap_w[cnt > 0]):
            rws = np.where((cnt > 0) & (cap_w == cap))[0]
            nb = len(rws)
            lens = cnt[rws]
            offs = np.arange(int(lens.sum())) - np.repeat(np.cumsum(lens) - lens, lens)
            flat_src = np.repeat(indptr[rws], lens) + offs
            tab = np.full((nb, int(cap)), total_rows, dtype=np.int32)  # pad -> zero row
            tab[np.repeat(np.arange(nb), lens), offs] = ss[flat_src]
            buckets[int(cap)] = (rws, tab)
        return buckets, nonzero_rows

    pair_tabs, _ = tables_for(is_pair_lead, s)  # pair id = lead row id
    single_tabs, _ = tables_for(is_single, s)
    n_pair_slots = sum(t.size for _, t in pair_tabs.values())
    n_single_slots = sum(t.size for _, t in single_tabs.values())
    print(f"paired build: {n_pair_slots:,} pair slots + {n_single_slots:,} "
          f"singles = {n_pair_slots + n_single_slots:,} issues vs "
          f"{sum(b.idx.size for b in csr.buckets):,} production slots")

    pair_dev = {c: jnp.asarray(t) for c, (rws, t) in pair_tabs.items()}
    single_dev = {c: jnp.asarray(t) for c, (rws, t) in single_tabs.items()}

    def pull_paired(x):
        # overlapping pair view: one [R, 2d] materialization per layer
        x2 = jnp.concatenate([x[:-1], x[1:]], axis=1)  # [R-1+? , 2d]
        outs = []
        for c, t in pair_dev.items():
            g = x2[jnp.minimum(t, x2.shape[0] - 1)]  # [nb, cap, 2d]
            outs.append(jnp.sum(g.reshape(g.shape[0], -1, d), axis=1))
        for c, t in single_dev.items():
            outs.append(jnp.sum(x[t], axis=1))
        return sum(jnp.sum(o) for o in outs)  # scalarize (layout differs)

    def timeit(fn, x, label, iters=16):
        f = jax.jit(lambda x: fn(x))
        r = f(x)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = f(x)
            jax.block_until_ready(r)
            ts.append((time.perf_counter() - t0) / iters)
        print(f"{label:<12} {min(ts) * 1e3:8.2f} ms/pull", flush=True)
        return min(ts)

    timeit(lambda x: jnp.sum(pull_prod(x)), xp, "production")
    timeit(pull_paired, xp, "paired")


if __name__ == "__main__":
    if "--tpu" in sys.argv:
        tpu_probe()
    else:
        import jax

        jax.config.update("jax_platforms", "cpu")
        host_probe()
