"""Per-pull ablation of the scatter-free GAT backward (VERDICT-r4 #3).

`_attention_pull`'s custom VJP (`models/gat.py`) has three reverse flows;
round 4 measured the whole backward at 1.77x the forward (fwd+bwd 2.77x fwd
vs the <= 2.2x criterion) without attributing it. This decomposes the
backward at the Gowalla shape (50k x 100k, 1M edges, H=4, d=64) into
cumulative stages, each timed as a scanned jitted program (paired scan
lengths — dispatch/fence cancel):

  fwd              the attention pull forward (reference denominator)
  bwd_fwdpass      forward-layout pass alone: g[dstn] + h[b.idx] row
                   gathers, datt/softmax-backward einsums, dz/attd
  bwd_narrow_old   + transpose narrow flows, round-4 spelling:
                   pos_map[bt.edge] and TWO [S, H] gathers (attd, dz)
                   — three per-slot narrow gathers per bucket
  bwd_narrow_new   + transpose narrow flows, round-5 spelling: prebuilt
                   tpos (static, no per-step position gather) and ONE
                   fused [S, 2H] gather
  bwd_row_old      + dh row gather, round-4 spelling g[slot_node[p]]
                   (double indirection)
  bwd_row_new      + dh row gather, round-5 spelling g[bt.idx] (direct)

bwd_row_* are the COMPLETE backward in each spelling; the stage deltas name
the dominant pull.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_gat_pulls.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.data.synthetic import ArrayInteraction, make_flat_interactions
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.models.gat import _bucket_attention, _real_slots

HEADS, D = 4, 64
N_SHORT, N_LONG = 8, 32


def timed_pair(make_fn, args, label):
    times = {}
    for n in (N_SHORT, N_LONG):
        fn = make_fn(n)
        float(fn(*args))
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            best.append(time.perf_counter() - t0)
        times[n] = min(best)
    per = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT) * 1e3
    print(f"{label:<16} {per:9.2f} ms/step", flush=True)
    return per


def main():
    pairs = make_flat_interactions(50_000, 100_000, 1_000_000, seed=3)
    data = ArrayInteraction(pairs, 50_000, 100_000)
    graph = DeviceGraph(data, backend="bucketed")
    graph.ensure_gat_aux()
    csr, csr_t = graph.norm_adj.pull, graph.norm_adj.pull_t
    aux = graph.gat_aux
    n = graph.n_nodes

    k = jax.random.PRNGKey(0)
    kh, ks, kd, kg = jax.random.split(k, 4)
    h = jax.random.normal(kh, (n, HEADS, D), jnp.float32) * 0.1
    alpha_src = jax.random.normal(ks, (n, HEADS), jnp.float32) * 0.1
    alpha_dst = jax.random.normal(kd, (n, HEADS), jnp.float32) * 0.1
    g = jax.random.normal(kg, (n, HEADS, D), jnp.float32) * 0.1
    jax.block_until_ready((h, alpha_src, alpha_dst, g))
    row_nodes = aux["node_of_row"]

    def fwd_body(h, alpha_src, alpha_dst):
        atts = _bucket_attention(csr, row_nodes, alpha_src, alpha_dst, 0.2)
        outs = []
        for b, att in zip(csr.buckets, atts):
            outs.append(jnp.einsum("nch,nchd->nhd", att, h[b.idx]))
        zero = jnp.zeros((1,) + outs[0].shape[1:], outs[0].dtype)
        return jnp.concatenate(outs + [zero], axis=0)[csr.gather_pos]

    def fwdpass_body(h, alpha_src, alpha_dst, g):
        """Forward-layout backward pass -> (dz_flat, attd_flat, dalpha_dst)."""
        atts = _bucket_attention(csr, row_nodes, alpha_src, alpha_dst, 0.2)
        dz_parts, attd_parts, dadst_rows = [], [], []
        off_r = 0
        for b, att in zip(csr.buckets, atts):
            nb, cap = b.idx.shape
            dstn = row_nodes[off_r:off_r + nb]
            off_r += nb
            gb = g[dstn]
            hb = h[b.idx]
            datt = jnp.einsum("nhd,nchd->nch", gb, hb)
            de = att * (datt - jnp.sum(att * datt, axis=1, keepdims=True))
            z = alpha_src[b.idx] + alpha_dst[dstn][:, None, :]
            real = _real_slots(b)[:, :, None]
            dz = jnp.where(real, de * jnp.where(z >= 0, 1.0, 0.2), 0.0)
            dadst_rows.append(jnp.sum(dz, axis=1))
            dz_parts.append(dz.reshape(nb * cap, HEADS))
            attd_parts.append(att.reshape(nb * cap, HEADS))
        dz_flat = jnp.concatenate(dz_parts, axis=0)
        attd_flat = jnp.concatenate(attd_parts, axis=0)
        zero_h = jnp.zeros((1, HEADS), dz_flat.dtype)
        dalpha_dst = jnp.concatenate(dadst_rows + [zero_h], axis=0)[csr.gather_pos]
        return dz_flat, attd_flat, dalpha_dst

    def narrow_old(dz_flat, attd_flat):
        pos_map = aux["pos_map"]
        outs = []
        for bt in csr_t.buckets:
            validt = _real_slots(bt)[:, :, None]
            p = pos_map[jnp.maximum(bt.edge, 0)]
            av = jnp.where(validt, attd_flat[p], 0.0)
            dzv = jnp.where(validt, dz_flat[p], 0.0)
            outs.append((av, dzv, p))
        return outs

    def narrow_new(dz_flat, attd_flat):
        both = jnp.concatenate([attd_flat, dz_flat], axis=1)
        outs = []
        for i, bt in enumerate(csr_t.buckets):
            validt = _real_slots(bt)[:, :, None]
            bp = jnp.where(validt, both[aux["tpos"][i]], 0.0)
            outs.append((bp[..., :HEADS], bp[..., HEADS:], aux["tpos"][i]))
        return outs

    def row_old(parts, g):
        slot_node = aux["slot_node"]
        dh_rows, dasrc_rows = [], []
        for (av, dzv, p), bt in zip(parts, csr_t.buckets):
            gsl = g[slot_node[p]]
            dh_rows.append(jnp.einsum("nch,nchd->nhd", av, gsl))
            dasrc_rows.append(jnp.sum(dzv, axis=1))
        zero_hd = jnp.zeros((1, HEADS, D), jnp.float32)
        zero_h = jnp.zeros((1, HEADS), jnp.float32)
        dh = jnp.concatenate(dh_rows + [zero_hd], axis=0)[csr_t.gather_pos]
        dasrc = jnp.concatenate(dasrc_rows + [zero_h], axis=0)[csr_t.gather_pos]
        return dh, dasrc

    def row_new(parts, g):
        dh_rows, dasrc_rows = [], []
        for (av, dzv, p), bt in zip(parts, csr_t.buckets):
            gsl = g[bt.idx]
            dh_rows.append(jnp.einsum("nch,nchd->nhd", av, gsl))
            dasrc_rows.append(jnp.sum(dzv, axis=1))
        zero_hd = jnp.zeros((1, HEADS, D), jnp.float32)
        zero_h = jnp.zeros((1, HEADS), jnp.float32)
        dh = jnp.concatenate(dh_rows + [zero_hd], axis=0)[csr_t.gather_pos]
        dasrc = jnp.concatenate(dasrc_rows + [zero_h], axis=0)[csr_t.gather_pos]
        return dh, dasrc

    def scalarize(tree):
        return sum(jnp.sum(t).astype(jnp.float32) * 1e-20
                   for t in jax.tree_util.tree_leaves(tree) if hasattr(t, "dtype"))

    def scan_of(body):
        # the big tensors ride as ARGUMENTS: closure constants are embedded
        # in the shipped program and blow the remote-compile request limit
        def make(steps):
            @jax.jit
            def run(h, alpha_src, alpha_dst, g):
                def step(c, _):
                    hh = h * (1.0 + c * 1e-20)
                    return c + scalarize(body(hh, alpha_src, alpha_dst, g)), None
                c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=steps)
                return c
            return run
        return make

    args = (h, alpha_src, alpha_dst, g)
    t_fwd = timed_pair(scan_of(lambda hh, a, b, g: fwd_body(hh, a, b)), args, "fwd")
    t_fp = timed_pair(scan_of(lambda hh, a, b, g: fwdpass_body(hh, a, b, g)),
                      args, "bwd_fwdpass")

    def full(narrow, row):
        def body(hh, a, b, g):
            dz_flat, attd_flat, dad = fwdpass_body(hh, a, b, g)
            parts = narrow(dz_flat, attd_flat)
            dh, dasrc = row(parts, g)
            return (dad, dh, dasrc)
        return body

    def narrow_only(narrow):
        def body(hh, a, b, g):
            dz_flat, attd_flat, dad = fwdpass_body(hh, a, b, g)
            parts = narrow(dz_flat, attd_flat)
            dasrc = [jnp.sum(dzv, axis=1) for (_, dzv, _) in parts]
            return (dad, parts[0][0], dasrc)
        return body

    t_no = timed_pair(scan_of(narrow_only(narrow_old)), args, "bwd_narrow_old")
    t_nn = timed_pair(scan_of(narrow_only(narrow_new)), args, "bwd_narrow_new")
    t_ro = timed_pair(scan_of(full(narrow_old, row_old)), args, "bwd_row_old")
    t_rn = timed_pair(scan_of(full(narrow_new, row_new)), args, "bwd_row_new")

    print("\nderived (ms/step):")
    print(f"  forward-layout pass            {t_fp:8.2f}")
    print(f"  transpose narrow flows  old {t_no - t_fp:8.2f}   new {t_nn - t_fp:8.2f}")
    print(f"  dh row pull             old {t_ro - t_no:8.2f}   new {t_rn - t_nn:8.2f}")
    print(f"  FULL backward           old {t_ro:8.2f}   new {t_rn:8.2f}   (fwd {t_fwd:.2f})")
    print(f"  fwd+bwd ratio           old {(t_fwd + t_ro) / t_fwd:5.2f}x  "
          f"new {(t_fwd + t_rn) / t_fwd:5.2f}x  (criterion <= 2.2x)")


if __name__ == "__main__":
    main()
