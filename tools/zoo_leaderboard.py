"""Train every registered model under one budget and rank them.

Produces the model-zoo quality table for BASELINE.md: same dataset, same
epochs, default per-model hyperparameters, full metric row each. Social
models get the synthesized trust graph automatically.

Usage: JAX_PLATFORMS=cpu python tools/zoo_leaderboard.py [--epochs 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOCIAL = {"sept", "sept_social", "mhcn", "diffnet", "esrf"}
SKIP_ALIASES = {"grace_rec", "sept_social", "bgrl_g2l"}  # aliases of listed models


def main():
    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)

    from recommendation_tpu.config import default_config
    from recommendation_tpu.data.interaction import Interaction
    from recommendation_tpu.data.social import synthesize_social
    from recommendation_tpu.data.synthetic import load_or_make_dataset
    from recommendation_tpu.graph.device import DeviceGraph
    from recommendation_tpu.graph.social_device import SocialDeviceGraph
    from recommendation_tpu.models import registry
    from recommendation_tpu.train.recommender import GraphRecommender
    from recommendation_tpu.utils.logging import Log

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--hard", action="store_true",
                    help="discriminating regime (make_hard_dataset): "
                         "popularity baseline ~0.34, zoo spreads 0.02-0.42")
    ap.add_argument("--eval-interval", type=int, default=None)
    args = ap.parse_args()

    train, test = load_or_make_dataset(hard=args.hard)
    data = Interaction(train, test)
    social = synthesize_social(data)
    graph_plain = DeviceGraph(data)
    graph_social = SocialDeviceGraph(data, social)

    rows = []
    for name in registry.available():
        if name in SKIP_ALIASES:
            continue
        config = default_config(**{
            "max.epoch": args.epochs,
            "eval.interval": args.eval_interval or max(1, args.epochs),
            "item.ranking.topN": [20], "batch.size": 2048,
        })
        graph = graph_social if name in SOCIAL else graph_plain
        t0 = time.time()
        try:
            rec = GraphRecommender(
                registry.build(name, config), data, config, graph=graph,
                log=Log(echo=False),
            )
            metrics = rec.execute()
            rows.append((name, metrics["Recall@20"], metrics["NDCG@20"], time.time() - t0))
            print(f"{name:12s} Recall@20={metrics['Recall@20']:.4f} "
                  f"NDCG@20={metrics['NDCG@20']:.4f} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            rows.append((name, float("nan"), float("nan"), time.time() - t0))
            print(f"{name:12s} ERROR {type(e).__name__}: {e}", flush=True)

    print("\n| Model | Recall@20 | NDCG@20 |")
    print("|---|---|---|")
    for name, r, n, _ in sorted(rows, key=lambda x: -(x[1] if x[1] == x[1] else -1)):
        print(f"| {name} | {r:.4f} | {n:.4f} |")


if __name__ == "__main__":
    main()
