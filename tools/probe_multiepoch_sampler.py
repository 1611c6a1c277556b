"""Probe: amortize the epoch sampler's bitmap pass across hoisted epochs.

The round-5 edge-order sampler (`sampling.sample_negatives_epoch_edges`)
reads the static `graph.edge_bitmap_fb` membership rows once per EPOCH; the
trainer hoists E epochs via vmap, so the [E_rows, W] bitmap is streamed (and
the [k, E_rows, W] word-select recomputed) once per epoch. Candidate: draw
ALL hoisted epochs' negatives in ONE call — bits [n_ep, k+1, E_rows], one
broadcasted word-select — so XLA can stream each bitmap row once and do all
n_ep×k compares in registers. If the sampler is bandwidth-bound on the
bitmap, per-step cost should drop ~n_ep×; if it is bound by the compare
VPU work or the bits generation, it won't move.

Guarantee is unchanged by construction (same candidate/bitmap/fallback
logic, batched over a leading epoch axis) and checked here against the
graph's positive sets.

Protocol: paired epoch counts (8/16), scalar fence, min of 4, per-step
normalization at the headline shape (B=2048).

STATUS (end of round 5): committed as the named next-round candidate,
NOT yet measured on-chip — the first attempt (E_LONG=24) coincided with a
tunnel wedge at end-of-round (the [n_ep, k, E, W] word-select is ~1.3 GB
if XLA fails to fuse it; suspect a device stall → watchdog kill →
~20 min tunnel recovery). Run EARLY in a fresh session, and if the long
variant stalls, drop E_LONG further or chunk the epoch axis with lax.map.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_multiepoch_sampler.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.data.synthetic import make_synthetic_dataset
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.sampling import bits_to_ints, sample_negatives_epoch_edges

BATCH = 2048
E_SHORT, E_LONG = 8, 16


def multi_epoch_edges(rng, graph, n_ep: int, n_redraws: int = 4):
    """[n_ep, E_rows] negatives in one call (the candidate form)."""
    k = n_redraws + 1
    n_fb = graph.user_fallback_neg.shape[1]
    w = graph.user_pos_bitmap.shape[1]
    rows = graph.edge_bitmap_fb  # [E_rows, W + n_fb (+pad)] STATIC
    e = rows.shape[0]
    all_bits = jax.random.bits(rng, (n_ep, k + 1, e), jnp.uint32)
    draws = bits_to_ints(all_bits[:, :k], graph.n_items)  # [n_ep, k, E]
    fb_col = bits_to_ints(all_bits[:, k], n_fb)  # [n_ep, E]
    bmp, fb_rows = rows[:, :w], rows[:, w : w + n_fb]
    dw = draws >> 5
    iw = jnp.arange(w, dtype=dw.dtype)
    sel = iw[None, None, None, :] == dw[..., None]  # [n_ep, k, E, W]
    word = jnp.sum(jnp.where(sel, bmp[None, None], 0), axis=3)  # [n_ep, k, E]
    bad = ((word >> (draws & 31)) & 1) > 0
    first_good = jnp.argmax(~bad, axis=1)  # [n_ep, E]
    chosen = jnp.take_along_axis(draws, first_good[:, None, :], axis=1)[:, 0]
    lane = jnp.arange(n_fb, dtype=fb_col.dtype)
    fallback = jnp.sum(
        jnp.where(lane[None, None, :] == fb_col[..., None], fb_rows[None], 0),
        axis=2,
    )
    return jnp.where(jnp.all(bad, axis=1), fallback.astype(chosen.dtype), chosen)


def main():
    train, test = make_synthetic_dataset(n_users=943, n_items=1682,
                                         n_interactions=100_000, seed=7)
    data = Interaction(train, test)
    graph = DeviceGraph(data, backend="auto", compute_dtype="bfloat16")
    e = graph.n_edges
    n_batches = -(-e // BATCH)
    print(f"# e={e} nb={n_batches} B={BATCH} "
          f"bitmap_fb={tuple(graph.edge_bitmap_fb.shape)}", flush=True)

    def timed(make, label):
        times = {}
        for n in (E_SHORT, E_LONG):
            fn = make(n)
            float(fn(jax.random.PRNGKey(2)))
            best = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(fn(jax.random.PRNGKey(2)))
                best.append(time.perf_counter() - t0)
            times[n] = min(best)
        per_step = ((times[E_LONG] - times[E_SHORT])
                    / ((E_LONG - E_SHORT) * n_batches) * 1e6)
        print(f"{label:<12} {per_step:8.1f} us/step   (short {times[E_SHORT]*1e3:7.1f} ms, "
              f"long {times[E_LONG]*1e3:7.1f} ms)", flush=True)
        return per_step

    def vmap_make(n):
        @jax.jit
        def fn(rng):
            negs = jax.vmap(
                lambda k: sample_negatives_epoch_edges(k, graph)
            )(jax.random.split(rng, n))
            return jnp.sum(negs).astype(jnp.float32) * 1e-20
        return fn

    def multi_make(n):
        @jax.jit
        def fn(rng):
            negs = multi_epoch_edges(rng, graph, n)
            return jnp.sum(negs).astype(jnp.float32) * 1e-20
        return fn

    t_v = timed(vmap_make, "samp_vmap")
    t_m = timed(multi_make, "samp_multi")
    print(f"delta: {t_v - t_m:+.1f} us/step ({t_v / max(t_m, 1e-9):.2f}x)")

    # guarantee check: no emitted negative is a train positive of its edge's
    # user (host-side, over every epoch of one multi draw)
    negs = np.asarray(multi_epoch_edges(jax.random.PRNGKey(5), graph, 4))
    eu = np.asarray(graph.edge_ui[:, 0])
    mat = data.interaction_mat.tocsr()
    viol = 0
    for ep in range(negs.shape[0]):
        viol += int(mat[eu, negs[ep]].sum())
    print(f"guarantee: {viol} positives emitted across "
          f"{negs.shape[0]}x{negs.shape[1]} draws "
          f"({'OK' if viol == 0 else 'FAIL'})", flush=True)


if __name__ == "__main__":
    main()
