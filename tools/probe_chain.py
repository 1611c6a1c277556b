"""Chain-formulation probe at the 1M-edge shape: which spelling of the
3-layer separable chain does XLA schedule best?

Production (round 4) is pull_rowspace: in-scale -> per-bucket gather+sum ->
concat -> out-scale. The isolated probes said gather+plain-sum fuses
(4.6 ms) while the production chain layer costs ~7.3 ms — somewhere the
fusion is lost. Variants:

  prod         bucketed_chain_mean as shipped
  scale_bucket out-scale applied per bucket BEFORE the concat
  folded       input/output scales folded into one ab-product per layer
               (y_l = ab . G(y_{l-1}); unscale once at the end)
  valpath      sep disabled (the pre-round-4 value-multiply form)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_chain.py
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.data.synthetic import ArrayInteraction, make_flat_interactions
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.graph.bucketed import bucketed_chain_mean

N_USERS, N_ITEMS, N_EDGES, EMB, L = 50_000, 100_000, 1_000_000, 64, 3
N_SHORT, N_LONG = 8, 24


def main():
    pairs = make_flat_interactions(N_USERS, N_ITEMS, N_EDGES, seed=3)
    data = ArrayInteraction(pairs, N_USERS, N_ITEMS)
    graph = DeviceGraph(data, backend="auto", compute_dtype="float32")
    fwd = graph.norm_adj.pull
    bwd = graph.norm_adj.pull_t
    total = fwd.total_rows
    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (fwd.n_rows, EMB), jnp.float32))
    print(f"# buckets={len(fwd.buckets)} "
          f"slots={sum(int(b.idx.size) for b in fwd.buckets)/1e6:.2f}M", flush=True)

    def timed(body, label):
        def make(n):
            @jax.jit
            def fn(xx):
                def one(carry, _):
                    xi = xx * (1.0 + carry * 1e-20)
                    return carry + body(xi) * 1e-20, None
                carry, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=n)
                return carry
            return fn

        times = {}
        for n in (N_SHORT, N_LONG):
            fn = make(n)
            float(fn(x))
            best = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(x))
                best.append(time.perf_counter() - t0)
            times[n] = min(best)
        per = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT)
        print(f"{label:<13} {per * 1e3:8.2f} ms/chain(3) = {per / 3 * 1e3:6.2f} ms/layer",
              flush=True)

    def prod(xx):
        return jnp.sum(bucketed_chain_mean(L, "float32", fwd, bwd, xx))

    timed(prod, "prod")

    # per-bucket out-scale before the concat
    splits = np.cumsum([b.idx.shape[0] for b in fwd.buckets]).tolist()
    sd_parts = [fwd.sep_dst[a:b] for a, b in zip([0] + splits[:-1], splits)]

    def pull_sb(xp):
        xs = xp * fwd.sep_src_row[:, None]
        outs = [
            (xs[b.ridx].sum(axis=1)) * sd[:, None]
            for b, sd in zip(fwd.buckets, sd_parts)
        ]
        return jnp.concatenate(outs + [jnp.zeros((1, EMB))], axis=0)

    def scale_bucket(xx):
        rows = fwd.node_of_row[:total]
        xp = jnp.concatenate([xx[rows], jnp.zeros((1, EMB))], axis=0)
        acc = jnp.zeros_like(xp)
        cur = xp
        for _ in range(L):
            cur = pull_sb(cur)
            acc = acc + cur
        return jnp.sum((xx + acc[fwd.gather_pos]) / (L + 1.0))

    timed(scale_bucket, "scale_bucket")

    # folded: y_l = (a.b) . G_plain(y_{l-1}); sum of x_l = (1/b) . sum y_l
    ab = fwd.sep_dst * fwd.sep_src_row
    inv_b = jnp.where(fwd.sep_src_row > 0, 1.0 / fwd.sep_src_row, 0.0)

    def g_plain(y):
        outs = [y[b.ridx].sum(axis=1) for b in fwd.buckets]
        return jnp.concatenate(outs + [jnp.zeros((1, EMB))], axis=0)

    def folded(xx):
        rows = fwd.node_of_row[:total]
        xp = jnp.concatenate([xx[rows], jnp.zeros((1, EMB))], axis=0)
        y = xp * fwd.sep_src_row[:, None]
        acc_y = jnp.zeros_like(y)
        for i in range(L):
            y = g_plain(y) * (ab if i < L - 1 else fwd.sep_dst)[:, None]
            # last layer needs only the dst scale (no further pulls)
            acc_y = acc_y + (y if i == L - 1 else y)
        # layers 0..L-2 accumulated in b-scaled space, unscale; the last in
        # true space already — to keep it simple here scale ALL in b-space:
        return jnp.sum(acc_y[0])

    # NOTE: folded as written double-counts scales across the acc — this is
    # a TIMING shape probe only (identical op mix), not a numerics check.
    timed(folded, "folded")

    # val path for reference: strip sep fields
    fwd_val = dataclasses.replace(fwd, sep_dst=None, sep_src_row=None)
    bwd_val = dataclasses.replace(bwd, sep_dst=None, sep_src_row=None)

    def valpath(xx):
        return jnp.sum(bucketed_chain_mean(L, "float32", fwd_val, bwd_val, xx))

    timed(valpath, "valpath")

    # backward cost of the production form
    gfun = jax.grad(lambda xx: jnp.sum(
        bucketed_chain_mean(L, "float32", fwd, bwd, xx) ** 2))

    def prod_bwd(xx):
        return jnp.sum(gfun(xx))

    timed(prod_bwd, "prod_fwd+bwd")


if __name__ == "__main__":
    main()
