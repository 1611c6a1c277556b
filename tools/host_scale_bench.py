"""Host-side build/eval walls at web scale (VERDICT-r2 weak #5 done check).

Times the paths that were per-user Python loops before round 3:
  - `DeviceGraph.__init__`'s fallback-negatives table (n_users × 8 cells)
  - the padded positives table (vectorized CSR scatter)
  - `evaluate_ranking`'s per-test-user block positives table

at 1M users × 200k items × 10M edges, on CPU (host work is the subject;
jax arrays land on the CPU backend). Run:

    PYTHONPATH=/root/repo python tools/host_scale_bench.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from recommendation_tpu.data.synthetic import ArrayInteraction, make_flat_interactions
from recommendation_tpu.graph.device import DeviceGraph

N_USERS, N_ITEMS, N_EDGES = 1_000_000, 200_000, 10_000_000


def main():
    t0 = time.perf_counter()
    pairs = make_flat_interactions(N_USERS, N_ITEMS, N_EDGES, seed=0)
    t1 = time.perf_counter()
    print(f"edges generated        {t1 - t0:7.1f}s  ({len(pairs):,} edges)")

    data = ArrayInteraction(pairs, N_USERS, N_ITEMS)
    t2 = time.perf_counter()
    print(f"ArrayInteraction build {t2 - t1:7.1f}s")

    graph = DeviceGraph(data, backend="bucketed")
    t3 = time.perf_counter()
    print(f"DeviceGraph build      {t3 - t2:7.1f}s  (pos_table={graph.has_pos_table})")

    # fallback table invariants: every open user's slots are true negatives
    fb = np.asarray(graph.user_fallback_neg)
    mat = data.interaction_mat
    check_users = np.random.default_rng(0).integers(0, N_USERS, 2000)
    hits = sum(
        mat[int(u), int(i)] != 0 for u in check_users for i in fb[u]
    )
    print(f"fallback positives-hit {hits} / {2000 * fb.shape[1]} (must be 0)")

    # eval block-table path (the has_pos_table=False branch): emulate the
    # evaluate_ranking table build for 100k test users
    test_uids = np.sort(
        np.random.default_rng(1).choice(N_USERS, 100_000, replace=False)
    ).astype(np.int32)
    t4 = time.perf_counter()
    degs = np.diff(mat.indptr)[test_uids].astype(np.int64)
    width = max(1, int(degs.max()))
    pos = np.full((len(test_uids), width), -1, dtype=np.int32)
    rows = np.repeat(np.arange(len(test_uids), dtype=np.int64), degs)
    offs = np.arange(degs.sum(), dtype=np.int64) - np.repeat(np.cumsum(degs) - degs, degs)
    starts = mat.indptr[test_uids].astype(np.int64)
    pos[rows, offs] = mat.indices[offs + np.repeat(starts, degs)]
    t5 = time.perf_counter()
    print(f"eval block table (100k users, width {width}) {t5 - t4:7.2f}s")
    assert hits == 0


if __name__ == "__main__":
    main()
