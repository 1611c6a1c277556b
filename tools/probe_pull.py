"""Micro-probe: where does one bucketed pull spend its time at the 1M-edge
bench shape?

Round-4 large ablation (tools/ablate_large.py): the step is 48.3 ms and
propagation is ~46.6 of it — 7.8 ms per pull against a ~2.4 ms issue-rate
floor (2.0M slots x ~1.2 ns). This probe decomposes one `pull_rowspace`
call and times candidate reformulations of the multiply-reduce.

Variants (ms per pull):
  gather_sum      xd[ridx] summed over (cap) only — gather + cheapest
                  possible reduce (XLA can fuse the reduce into the gather
                  consumer, so this is the attainable gather cost)
  gather_sum_all  jnp.sum(xd[ridx]) to one scalar — fully fusible
  mul_reduce      the production body: sum(g * val[:, :, None], axis=1)
  einsum_bmv      batched matvec einsum (val [nb,1,cap] @ g [nb,cap,d])
  dot_general     explicit batched dot_general on the MXU
  pull_full       production pull_rowspace incl. concat
  chain_fwd       bucketed_chain_mean forward (3 layers, incl. in/out
                  reorders) / 3 — per-layer cost in context

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pull.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from recommendation_tpu.data.synthetic import ArrayInteraction, make_flat_interactions
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.graph.bucketed import bucketed_chain_mean, pull_rowspace

N_USERS, N_ITEMS, N_EDGES, EMB = 50_000, 100_000, 1_000_000, 64
N_SHORT, N_LONG = 8, 24


def main():
    pairs = make_flat_interactions(N_USERS, N_ITEMS, N_EDGES, seed=3)
    data = ArrayInteraction(pairs, N_USERS, N_ITEMS)
    graph = DeviceGraph(data, backend="auto", compute_dtype="float32")
    csr = graph.norm_adj.pull
    total = csr.total_rows
    xp = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (total, EMB), jnp.float32))
    x_node = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (csr.n_cols, EMB), jnp.float32))
    slots = sum(int(b.idx.size) for b in csr.buckets)
    print(f"# buckets={len(csr.buckets)} slots={slots/1e6:.2f}M total_rows={total}",
          flush=True)

    def timed(body, label):
        def make(n):
            @jax.jit
            def fn(x):
                def one(carry, _):
                    # nudge x so the scan can't CSE the pull across steps
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
        print(f"{label:<14} {per * 1e3:8.2f} ms/pull", flush=True)
        return per

    def gather_sum(xx):
        acc = jnp.float32(0.0)
        for b in csr.buckets:
            acc = acc + jnp.sum(xx[b.ridx], axis=(0, 1))[0]
        return acc

    timed(gather_sum, "gather_sum")

    def gather_sum_all(xx):
        acc = jnp.float32(0.0)
        for b in csr.buckets:
            acc = acc + jnp.sum(xx[b.ridx])
        return acc

    timed(gather_sum_all, "gather_sum_all")

    def mul_reduce(xx):
        acc = jnp.float32(0.0)
        for b in csr.buckets:
            g = xx[b.ridx]
            acc = acc + jnp.sum(jnp.sum(g * b.val[:, :, None], axis=1))
        return acc

    timed(mul_reduce, "mul_reduce")

    def einsum_bmv(xx):
        acc = jnp.float32(0.0)
        for b in csr.buckets:
            g = xx[b.ridx]
            acc = acc + jnp.sum(jnp.einsum("bc,bcd->bd", b.val, g))
        return acc

    timed(einsum_bmv, "einsum_bmv")

    def dot_gen(xx):
        acc = jnp.float32(0.0)
        for b in csr.buckets:
            g = xx[b.ridx]
            out = jax.lax.dot_general(
                b.val[:, None, :], g,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc = acc + jnp.sum(out)
        return acc

    timed(dot_gen, "dot_general")

    def pull_full(xx):
        return jnp.sum(pull_rowspace(csr, xx, "float32"))

    timed(pull_full, "pull_full")

    def chain3(_):
        out = bucketed_chain_mean(3, "float32", csr, graph.norm_adj.pull_t, x_node)
        return jnp.sum(out)

    t3 = timed(chain3, "chain_fwd(3)")
    print(f"  per layer incl reorders: {t3 / 3 * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()


def extra():
    """Follow-ups: one FLAT gather for all buckets (consumers slice the
    concat statically) and the zero-row padding form the separable path
    needs."""
    import numpy as np
    pairs = make_flat_interactions(N_USERS, N_ITEMS, N_EDGES, seed=3)
    data = ArrayInteraction(pairs, N_USERS, N_ITEMS)
    graph = DeviceGraph(data, backend="auto", compute_dtype="float32")
    csr = graph.norm_adj.pull
    total = csr.total_rows
    xp = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (total + 1, EMB), jnp.float32)
        .at[-1].set(0.0))

    flat = jnp.concatenate([
        jnp.where(b.edge.reshape(-1) >= 0, b.ridx.reshape(-1),
                  jnp.int32(total)) for b in csr.buckets
    ])
    flat = jax.block_until_ready(flat)
    shapes = [b.idx.shape for b in csr.buckets]
    offs = np.cumsum([0] + [s[0] * s[1] for s in shapes]).tolist()

    def timed(body, label):
        import time as _t
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
                t0 = _t.perf_counter()
                float(fn(xp))
                best.append(_t.perf_counter() - t0)
            times[n] = min(best)
        per = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT)
        print(f"{label:<14} {per * 1e3:8.2f} ms/pull", flush=True)

    def flat_gather_sum(xx):
        g = xx[flat]  # ONE [S, d] gather
        acc = jnp.float32(0.0)
        for (nb, cap), o in zip(shapes, offs):
            acc = acc + jnp.sum(
                g[o:o + nb * cap].reshape(nb, cap, EMB).sum(axis=1))
        return acc

    timed(flat_gather_sum, "flat_g_sum")

    def zrow_gather_sum(xx):
        # per-bucket gathers but padding -> the shared zero row (the
        # separable path's form; vs gather_sum's padding -> row of node 0)
        acc = jnp.float32(0.0)
        o = 0
        for b, (nb, cap) in zip(csr.buckets, shapes):
            idxz = flat[o:o + nb * cap].reshape(nb, cap)
            o += nb * cap
            acc = acc + jnp.sum(xx[idxz].sum(axis=1))
        return acc

    timed(zrow_gather_sum, "zrow_g_sum")

    def sep_pull(xx):
        # full separable pull: scale in, gather+sum, scale out
        sb = xx[:, :1] * 0.5 + 1.0  # stand-in row scales (elementwise cost)
        xs = xx * sb
        outs = []
        o = 0
        for b, (nb, cap) in zip(csr.buckets, shapes):
            idxz = flat[o:o + nb * cap].reshape(nb, cap)
            o += nb * cap
            outs.append(xs[idxz].sum(axis=1))
        out = jnp.concatenate(outs, axis=0)
        return jnp.sum(out * (out[:, :1] * 0 + 1.25))

    timed(sep_pull, "sep_pull")


extra()
