"""Last pull-layout candidates at the 1M-edge shape (CAP_STEP=8 tables).

  gsum_scalar   per-bucket gather+sum collapsed to scalars (fully fusible
                bound — no [nb, d] writes)
  gsum_concat   same reduces but written through the production concat
  gsum_T        transposed tables: gather [cap, nb, d], reduce axis 0
                (reduction over the major axis streams slices)
  gsum_2stage   reshape [nb, cap/4, 4, d], two-stage reduce

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pull_layout.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from recommendation_tpu.data.synthetic import ArrayInteraction, make_flat_interactions
from recommendation_tpu.graph.device import DeviceGraph

N_USERS, N_ITEMS, N_EDGES, EMB = 50_000, 100_000, 1_000_000, 64
N_SHORT, N_LONG = 8, 24


def main():
    pairs = make_flat_interactions(N_USERS, N_ITEMS, N_EDGES, seed=3)
    data = ArrayInteraction(pairs, N_USERS, N_ITEMS)
    graph = DeviceGraph(data, backend="auto", compute_dtype="float32")
    csr = graph.norm_adj.pull
    total = csr.total_rows
    xp = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (total + 1, EMB), jnp.float32)
        .at[-1].set(0.0))
    ridx_T = [jax.block_until_ready(jnp.asarray(b.ridx).T) for b in csr.buckets]

    def timed(body, label):
        def make(n):
            @jax.jit
            def fn(x):
                def one(carry, _):
                    xx = x * (1.0 + carry * 1e-20)
                    return carry + body(xx) * 1e-20, None
                carry, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=n)
                return carry
            return fn

        times = {}
        for n in (N_SHORT, N_LONG):
            fn = make(n)
            float(fn(xp))
            best = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(xp))
                best.append(time.perf_counter() - t0)
            times[n] = min(best)
        per = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT)
        print(f"{label:<13} {per * 1e3:8.2f} ms/pull", flush=True)

    def gsum_scalar(xx):
        acc = jnp.float32(0.0)
        for b in csr.buckets:
            acc = acc + jnp.sum(xx[b.ridx].sum(axis=1))
        return acc

    timed(gsum_scalar, "gsum_scalar")

    def gsum_concat(xx):
        outs = [xx[b.ridx].sum(axis=1) for b in csr.buckets]
        out = jnp.concatenate(outs + [jnp.zeros((1, EMB))], axis=0)
        return jnp.sum(out[0]) + jnp.sum(out[-2])

    timed(gsum_concat, "gsum_concat")

    def gsum_concat_full(xx):
        outs = [xx[b.ridx].sum(axis=1) for b in csr.buckets]
        out = jnp.concatenate(outs + [jnp.zeros((1, EMB))], axis=0)
        return jnp.sum(out)

    timed(gsum_concat_full, "gsum_concatF")

    def gsum_T(xx):
        outs = [xx[rt].sum(axis=0) for rt in ridx_T]
        out = jnp.concatenate(outs + [jnp.zeros((1, EMB))], axis=0)
        return jnp.sum(out)

    timed(gsum_T, "gsum_T")

    def gsum_2stage(xx):
        outs = []
        for b in csr.buckets:
            nb, cap = b.ridx.shape
            g = xx[b.ridx]
            if cap % 4 == 0 and cap >= 8:
                g = g.reshape(nb, cap // 4, 4, EMB).sum(axis=2).sum(axis=1)
            else:
                g = g.sum(axis=1)
            outs.append(g)
        out = jnp.concatenate(outs + [jnp.zeros((1, EMB))], axis=0)
        return jnp.sum(out)

    timed(gsum_2stage, "gsum_2stage")


if __name__ == "__main__":
    main()
