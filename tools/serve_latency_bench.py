"""Serving latency/QPS table: p50/p95 per concurrency level, single chip.

Trains a small LightGCN, stands up ``RecommenderService`` with the
micro-batcher, then drives it with N in-process client threads issuing
single-user top-k queries back-to-back for a fixed window.

CAVEAT for the committed table: this chip is attached through a network
tunnel with ~40-80 ms dispatch round trip, so ABSOLUTE latencies are
tunnel-dominated; the table's value is the SHAPE — flat p95 under rising
concurrency (the micro-batcher answers each wave with one device program)
and QPS scaling with batch efficiency. On a locally-attached chip the same
harness reports true service latency.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/serve_latency_bench.py
"""

from __future__ import annotations

import threading
import time

import numpy as np


def main():
    from recommendation_tpu.config import default_config
    from recommendation_tpu.data.interaction import Interaction
    from recommendation_tpu.data.synthetic import make_synthetic_dataset
    from recommendation_tpu.models import get_model
    from recommendation_tpu.serve.service import RecommenderService
    from recommendation_tpu.train.recommender import GraphRecommender
    from recommendation_tpu.utils.logging import Log

    train, test = make_synthetic_dataset()
    data = Interaction(train, test)
    config = default_config(**{"max.epoch": 3, "eval.interval": 10})
    rec = GraphRecommender(get_model("lightgcn", config), data, config, log=Log(echo=False))
    rec.build()
    rec.train()
    svc = RecommenderService.from_recommender(rec)
    rng = np.random.default_rng(0)
    n_users = data.user_num

    # warmup: compile every power-of-two batch bucket the batcher can hit
    # (waves are padded to buckets — see ops/topk.py topk_with_exclusions).
    # Done BEFORE enable_batching: the direct path shares the module-level
    # jitted programs, and late-session compiles (70s+) would blow the
    # batcher's 60s future timeout.
    for b in (1, 2, 4, 8, 16, 32, 64, 1024):
        svc.recommend_ids(list(rng.integers(0, n_users, size=b)), k=20)
    svc.enable_batching(max_batch=1024, max_wait_ms=2.0)

    print(f"{'clients':>8} {'qps':>9} {'p50_ms':>8} {'p95_ms':>8} {'p99_ms':>8}",
          flush=True)
    for clients in (1, 8, 60):
        lat: list = []
        lock = threading.Lock()
        stop = time.perf_counter() + 10.0

        def worker(seed):
            r = np.random.default_rng(seed)
            mine = []
            while time.perf_counter() < stop:
                u = int(r.integers(0, n_users))
                t0 = time.perf_counter()
                svc.recommend_ids([u], k=20)
                mine.append(time.perf_counter() - t0)
            with lock:
                lat.extend(mine)

        threads = [threading.Thread(target=worker, args=(s,)) for s in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        a = np.asarray(lat) * 1e3
        print(f"{clients:>8} {len(lat) / wall:>9.1f} {np.percentile(a, 50):>8.1f} "
              f"{np.percentile(a, 95):>8.1f} {np.percentile(a, 99):>8.1f}", flush=True)
    svc.disable_batching()


if __name__ == "__main__":
    main()
