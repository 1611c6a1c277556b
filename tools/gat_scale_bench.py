"""Gowalla-scale GAT attention timings: forward vs forward+backward on the
bucketed backend, autodiff layer vs scatter-free custom VJP (VERDICT-r2
item 3 done criterion: fwd+bwd ≤ ~2.2× fwd).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/gat_scale_bench.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.config import default_config
from recommendation_tpu.data.synthetic import ArrayInteraction, make_flat_interactions
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.models.gat import GAT

STEPS = 8


def _timed(fn, *args, label=""):
    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        best.append((time.perf_counter() - t0) / STEPS * 1e3)
    print(f"{label:<30} {min(best):9.1f} ms/step", flush=True)
    return min(best)


def main():
    pairs = make_flat_interactions(50_000, 100_000, 1_000_000, seed=3)
    data = ArrayInteraction(pairs, 50_000, 100_000)
    graph = DeviceGraph(data, backend="bucketed")
    config = default_config(**{
        "embedding.size": 64, "GAT.hidden": 64, "GAT.num_heads": 4,
    })
    model = GAT(config)
    params, state = model.init(jax.random.PRNGKey(0), graph)
    aux = graph.gat_aux
    b = 4096
    rng = np.random.default_rng(0)
    users = jnp.asarray(rng.integers(0, 50_000, b).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, 100_000, b).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, 100_000, b).astype(np.int32))
    from recommendation_tpu.sampling import PairwiseBatch

    batch = PairwiseBatch(users, pos, neg, jnp.ones((b,), jnp.float32))

    for mode in ("scatter-free", "autodiff"):
        graph.gat_aux = aux if mode == "scatter-free" else None
        st = state

        @jax.jit
        def fwd_only(params, st=st, graph=graph):
            def step(c, _):
                p = jax.tree_util.tree_map(lambda a: a * (1.0 + c * 1e-20), params)
                loss, _ = model.loss(p, st, batch, graph, None)
                return c + loss, None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=STEPS)
            return c

        @jax.jit
        def fwd_bwd(params, st=st, graph=graph):
            g = jax.grad(lambda p: model.loss(p, st, batch, graph, None)[0])

            def step(c, _):
                p = jax.tree_util.tree_map(lambda a: a * (1.0 + c * 1e-20), params)
                grads = g(p)
                return c + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(grads)) * 1e-20, None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=STEPS)
            return c

        tf = _timed(fwd_only, params, label=f"{mode} fwd")
        tb = _timed(fwd_bwd, params, label=f"{mode} fwd+bwd")
        print(f"  -> {mode}: fwd+bwd / fwd = {tb / tf:.2f}x", flush=True)


if __name__ == "__main__":
    main()
