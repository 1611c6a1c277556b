"""Learning quality at the large-graph shape (VERDICT-r4 #4).

Every Recall/NDCG number so far is at ML-100K shape; the bucketed backend
that production graphs rely on had interchangeability tests and throughput
numbers at 50k x 100k x 1M edges, but no committed evidence it LEARNS at
that scale. This trains LightGCN-BPR and DirectAU at the `bench.py --large`
SHAPE (50k x 100k x 1M, 10% holdout) through the bucketed backend — chunked
fused epochs under the runtime watchdog — and evaluates Recall@20/NDCG@20
against the popularity baseline on the same split (protocol per
`selfcf.py:408-428`: full-catalog ranking, train positives masked).

Fixture matters: the throughput bench's `make_flat_interactions` draws user
and item INDEPENDENTLY, so popularity is its Bayes-optimal ranker — a model
can only match it there (measured: LightGCN lands exactly on the popularity
Recall@20; kept reachable via --fixture flat as the no-signal control). The
quality row therefore uses `make_clustered_interactions` at the same shape:
conditional cluster signal a model must LEARN to beat popularity.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/quality_at_scale.py \
         [--epochs 30] [--models lightgcn,directau] [--fixture clustered|flat]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def popularity_baseline(data, k=20):
    """Top-k most-popular train items per test user, train positives
    excluded — vectorized via a dense [U_test, pool] membership lookup."""
    pool = 4 * k
    counts = np.asarray(data.interaction_mat.sum(axis=0)).ravel()
    popular = np.argsort(-counts)[:pool].astype(np.int32)
    test_uids = data.test_user_ids()
    member = np.asarray(
        data.interaction_mat[test_uids][:, popular].todense()
    ) > 0  # [U_test, pool]
    ids = np.full((len(test_uids), k), -1, dtype=np.int32)
    for r in range(len(test_uids)):  # host-side, eval-only, runs once
        keep = popular[~member[r]][:k]
        ids[r, : len(keep)] = keep
    return ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--eval-interval", type=int, default=10)
    ap.add_argument("--models", default="lightgcn,directau")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--fixture", default="clustered", choices=("clustered", "flat"))
    args = ap.parse_args()

    import jax

    from recommendation_tpu.config import default_config
    from recommendation_tpu.data.synthetic import (
        ArrayInteraction,
        make_clustered_interactions,
        make_flat_interactions,
    )
    from recommendation_tpu.evalx.metrics import ranking_metrics
    from recommendation_tpu.evalx.ranking import evaluate_ranking
    from recommendation_tpu.graph.device import DeviceGraph
    from recommendation_tpu.models import get_model
    from recommendation_tpu.train.loop import make_epoch_fn, make_optimizer

    maker = {"clustered": make_clustered_interactions,
             "flat": make_flat_interactions}[args.fixture]
    pairs = maker(50_000, 100_000, 1_000_000, seed=3)
    data = ArrayInteraction(pairs, 50_000, 100_000, test_fraction=0.1)
    print(f"fixture: {args.fixture}")
    print(f"train edges {len(data.edge_users):,}, test edges "
          f"{len(data.test_pairs):,}, test users {len(data.test_user_ids()):,}")

    truth = data.test_items_by_user()
    pop_ids = popularity_baseline(data, k=20)
    pop = ranking_metrics(pop_ids, truth, (20,))
    print(f"popularity     Recall@20 {pop['Recall@20']:.4f}  "
          f"NDCG@20 {pop['NDCG@20']:.4f}", flush=True)

    for name in args.models.split(","):
        config = default_config(**{
            "embedding.size": 64, "batch.size": args.batch,
            "learning.rate": 1e-3, "max.epoch": args.epochs,
        })
        graph = DeviceGraph(data, backend="bucketed")
        model = get_model(name, config)
        params, state = model.init(jax.random.PRNGKey(0), graph)
        optimizer = make_optimizer(config)
        opt_state = optimizer.init(params)
        epoch_fn = make_epoch_fn(model, optimizer, args.batch, steps_per_call=32)
        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        best = None
        for e in range(args.epochs):
            rng, k = jax.random.split(rng)
            params, opt_state, state, loss = epoch_fn(graph, params, opt_state, state, k)
            if (e + 1) % args.eval_interval == 0 or e + 1 == args.epochs:
                ue, ie = model.eval_embeddings(params, state, graph)
                res = evaluate_ranking(np.asarray(ue), np.asarray(ie), data,
                                       graph, Ns=(20,))
                m = res.metrics
                tag = (f"{name} epoch {e + 1:>3}  loss {float(loss):8.4f}  "
                       f"Recall@20 {m['Recall@20']:.4f}  NDCG@20 {m['NDCG@20']:.4f}  "
                       f"({time.time() - t0:.0f}s)")
                print(tag, flush=True)
                if best is None or m["Recall@20"] > best[0]:
                    best = (m["Recall@20"], m["NDCG@20"], e + 1)
        print(f"{name} BEST: Recall@20 {best[0]:.4f}  NDCG@20 {best[1]:.4f} "
              f"(epoch {best[2]}) vs popularity {pop['Recall@20']:.4f}/"
              f"{pop['NDCG@20']:.4f}", flush=True)


if __name__ == "__main__":
    main()
