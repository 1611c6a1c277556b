"""Command-line entry: train one model or run a tuning sweep.

The reference's CLI is ``python <model>.py`` running a hardcoded sweep at the
bottom of each script (SURVEY.md §1 L8). Here:

  python -m recommendation_tpu train --model lightgcn \\
      --train dataset/ml100k/train.txt --test dataset/ml100k/test.txt \\
      --set max.epoch=30 --set embedding.size=64
  python -m recommendation_tpu tune --model directau --mode grid \\
      --grid 'learning.rate=1e-3,5e-3' --grid 'DirectAU.gamma=0.5,1.0' ...
  python -m recommendation_tpu models          # list the registry

Missing dataset paths fall back to the cached synthetic ML-100K-shaped set.
Social models auto-load ``social.txt`` next to train.txt or synthesize one
(test.ipynb protocol).
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys


def _parse_value(s: str):
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def _parse_sets(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        out[k] = _parse_value(v)
    return out


def _parse_grid(entries):
    grid = {}
    for e in entries or []:
        k, _, vs = e.partition("=")
        grid[k] = [_parse_value(v) for v in vs.split(",")]
    return grid


def _load_sets(args):
    from recommendation_tpu.data.io import load_data
    from recommendation_tpu.data.synthetic import load_or_make_dataset

    if args.train and os.path.exists(args.train):
        train = load_data(args.train)
        test = load_data(args.test) if args.test else []
        return train, test, args.train
    train, test = load_or_make_dataset()
    return train, test, "dataset/synthetic_ml100k/train.txt"


def _maybe_social(args, model_name, data, train_path):
    from recommendation_tpu.models.registry import build  # noqa: F401

    social_models = {"sept", "sept_social", "mhcn", "diffnet", "esrf"}
    if model_name.lower() not in social_models:
        return None
    if args.social and os.path.exists(args.social):
        from recommendation_tpu.data.io import load_data

        return load_data(args.social)
    default = os.path.join(os.path.dirname(train_path), "social.txt")
    if os.path.exists(default):
        from recommendation_tpu.data.io import load_data

        return load_data(default)
    from recommendation_tpu.data.social import synthesize_social

    print("no social.txt found — synthesizing (test.ipynb protocol)", file=sys.stderr)
    return synthesize_social(data)


def main(argv=None):
    from recommendation_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(prog="recommendation_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name in ("train", "tune"):
        p = sub.add_parser(name)
        p.add_argument("--model", required=True)
        p.add_argument("--train")
        p.add_argument("--test")
        p.add_argument("--social")
        p.add_argument("--set", action="append", help="config override key=value")
        p.add_argument("--out", help="results JSON path")
        if name == "tune":
            p.add_argument("--mode", choices=["grid", "univariate"], default="grid")
            p.add_argument("--grid", action="append", help="key=v1,v2,...")
            p.add_argument("--preset", action="store_true",
                           help="use the model's reference-script sweep preset")
            p.add_argument("--resume", action="store_true",
                           help="skip configurations already recorded in --out")
            p.add_argument("--csv", help="also append results to CSV")

    sub.add_parser("models")

    p = sub.add_parser("serve", help="train (or resume from checkpoint) then serve top-k over HTTP")
    p.add_argument("--model", required=True)
    p.add_argument("--train")
    p.add_argument("--test")
    p.add_argument("--social")
    p.add_argument("--set", action="append", help="config override key=value")
    p.add_argument("--checkpoint", help="restore from this checkpoint dir and serve WITHOUT training")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)

    p = sub.add_parser("synthesize-social",
                       help="build social.txt from train interactions (test.ipynb protocol)")
    p.add_argument("--train", required=True)
    p.add_argument("--out", help="default: social.txt next to train file")
    p.add_argument("--threshold", type=float, default=0.35)
    p.add_argument("--top-k", type=int, default=10)

    args = ap.parse_args(argv)

    if args.cmd == "models":
        from recommendation_tpu.models import registry

        print("\n".join(registry.available()))
        return 0

    if args.cmd == "synthesize-social":
        from recommendation_tpu.data.interaction import Interaction
        from recommendation_tpu.data.io import load_data
        from recommendation_tpu.data.social import synthesize_social

        if not os.path.exists(args.train):
            print(f"error: train file not found: {args.train}", file=sys.stderr)
            return 2
        data = Interaction(load_data(args.train), [])
        triples = synthesize_social(data, threshold=args.threshold, top_k=args.top_k)
        out = args.out or os.path.join(os.path.dirname(args.train), "social.txt")
        with open(out, "w") as f:
            for u, v, w in triples:
                f.write(f"{u} {v} {w}\n")
        print(f"wrote {len(triples)} trust edges to {out}")
        return 0

    from recommendation_tpu.config import default_config

    config = default_config(**_parse_sets(args.set))

    if args.cmd == "serve":
        from recommendation_tpu.data.interaction import Interaction
        from recommendation_tpu.graph.device import DeviceGraph
        from recommendation_tpu.models import registry
        from recommendation_tpu.serve import RecommenderService, serve_http
        from recommendation_tpu.train.recommender import GraphRecommender

        train, test, train_path = _load_sets(args)
        data = Interaction(train, test)
        social = _maybe_social(args, args.model, data, train_path)
        if social is not None:
            from recommendation_tpu.graph.social_device import SocialDeviceGraph

            graph = SocialDeviceGraph(data, social, backend=config.get("graph.backend", "auto"),
                                      compute_dtype=config.get("graph.compute_dtype", "float32"))
        else:
            graph = DeviceGraph(data, backend=config.get("graph.backend", "auto"),
                                compute_dtype=config.get("graph.compute_dtype", "float32"))
        if args.checkpoint:
            # restore-only startup: no training pass
            config.update({"checkpoint.dir": args.checkpoint, "checkpoint.resume": True,
                           "max.epoch": 0})
        rec = GraphRecommender(registry.build(args.model, config), data, config, graph=graph)
        rec.build()
        if args.checkpoint and rec.start_epoch == 0:
            print(f"error: no checkpoint found in {args.checkpoint}", file=sys.stderr)
            return 2
        rec.train()  # no-op when restored past max.epoch
        service = RecommenderService.from_recommender(rec)
        print(f"serving on http://{args.host}:{args.port}  (GET /recommend?user=<id>&k=10)")
        serve_http(service, host=args.host, port=args.port)
        return 0

    if args.cmd == "train":
        from recommendation_tpu.data.interaction import Interaction
        from recommendation_tpu.graph.device import DeviceGraph
        from recommendation_tpu.models import registry
        from recommendation_tpu.train.recommender import GraphRecommender

        train, test, train_path = _load_sets(args)
        data = Interaction(train, test)
        social = _maybe_social(args, args.model, data, train_path)
        if social is not None:
            from recommendation_tpu.graph.social_device import SocialDeviceGraph

            graph = SocialDeviceGraph(data, social, backend=config.get("graph.backend", "auto"),
                                      compute_dtype=config.get("graph.compute_dtype", "float32"))
        else:
            graph = DeviceGraph(data, backend=config.get("graph.backend", "auto"),
                                compute_dtype=config.get("graph.compute_dtype", "float32"))
        model = registry.build(args.model, config)
        rec = GraphRecommender(model, data, config, graph=graph)
        metrics = rec.execute()
        print(json.dumps(metrics))
        if args.out:
            from recommendation_tpu.utils.logging import save_json

            save_json(args.out, {"config": config.as_dict(), "metrics": metrics})
        return 0

    # tune
    from recommendation_tpu.tune import GridTuner, UnivariateTuner, print_summary

    train, test, train_path = _load_sets(args)
    grid = _parse_grid(args.grid)
    mode = args.mode
    defaults = {}
    if args.preset:
        from recommendation_tpu.tune.presets import get_preset

        preset = get_preset(args.model)
        mode = preset["mode"]
        defaults = dict(preset.get("defaults", {}))
        preset_grid = dict(preset["grid"])
        preset_grid.update(grid)  # explicit --grid overrides the preset
        grid = preset_grid
    from recommendation_tpu.data.interaction import Interaction

    social = _maybe_social(args, args.model, Interaction(train, test), train_path)
    if mode == "grid":
        tuner = GridTuner(args.model, train, test, grid, base_config=config, social_triples=social)
    else:
        tuner = UnivariateTuner(
            args.model, train, test, grid, defaults=defaults,
            base_config=config, social_triples=social,
        )
    tuner.run(resume_path=args.out if args.resume else None)
    print_summary(tuner.results, Ns=config.get("item.ranking.topN", [10, 20, 30, 50]))
    if args.out:
        tuner.save_json(args.out)
    if getattr(args, "csv", None):
        tuner.save_csv(args.csv)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
