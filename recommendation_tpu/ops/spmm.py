"""Sparse propagation primitives — the universal GNN op of the framework.

Replaces every ``torch.sparse.mm`` call in the reference (`ncl.py:419`,
`selfcf.py:479`, `directau.py:290`, `univariate/buir.py:317,334`,
`univariate/mhcn.py:440-456`, `univariate/sept_social.py:373`, ...) and the
PyG conv kernels (`lightgcn.py:17`, `graphsage.py:21-24`, `gat.py:20-23`)
with TPU-native paths (SURVEY.md §2.4 rows 1-2):

  * **dense**  — blocked MXU matmul against the materialized adjacency.
    On TPU a dense matmul runs at ~200+ TFLOP/s (bf16) while scatter-add runs
    at VPU/memory speed, so for adjacencies up to a few hundred MB the dense
    path is the fastest possible propagation. Deliberately un-CUDA-shaped.
  * **bucketed** — gather-only pull-form CSR (`graph/bucketed.py`): degree-
    bucketed padded neighbor tables + dense reductions, custom VJP through
    the prebuilt transpose. The large-graph default: no scatter in either
    pass (scatter-add measured ~1% of HBM peak on this chip — BASELINE.md).
  * **segment** — gather + ``segment_sum`` over sorted COO. General fallback,
    any size, fuses with the value computation under XLA.
  * **pallas** — reserved for a hand-tiled kernel; currently routes to the
    segment path (see ``ops/pallas_spmm.py`` for why it is shelved on this
    toolchain).

All backends are numerically equivalent (tested against a scipy oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceAdj


@jax.checkpoint
def _segment_matmul(adj: DeviceAdj, x: jnp.ndarray) -> jnp.ndarray:
    # rematerialized: the [E, d] gathered intermediate (1 GB at 4M edges ×
    # 64 dims) is recomputed in the backward pass instead of stored —
    # per-layer residual memory drops from O(E·d) to O(1)
    # (bf16 gathers with f32 accumulation were tried here and measured
    # SLOWER — 42.7k vs 45.5k examples/s at 1M edges: the convert feeding
    # segment_sum keeps the scatter in f32 anyway, and the extra converts
    # cost more than the halved gather traffic saves. The scatter-add is
    # the bound; see DESIGN.md round-2 agenda for the block-dense attack.)
    gathered = x[adj.cols] * adj.vals[:, None]
    return jax.ops.segment_sum(
        gathered,
        adj.rows,
        num_segments=adj.n_rows,
        indices_are_sorted=adj.rows_sorted,
    )


def adj_matmul(adj: DeviceAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Compute ``adj @ x`` with the adjacency's backend. x: f32[n_cols, d]."""
    if adj.backend == "bucketed" and adj.pull is not None:
        from recommendation_tpu.graph.bucketed import bucketed_matmul

        # gather-only pull-form propagation; the custom VJP pulls through
        # the prebuilt transpose, so backward is scatter-free too
        return bucketed_matmul(adj.pull, adj.pull_t, x, adj.compute_dtype)
    if adj.backend == "dense" and adj.dense is not None:
        if adj.compute_dtype == "bfloat16":
            # MXU-native bf16 inputs, f32 accumulate: ~2x HBM bandwidth on
            # the adjacency read; values stored f32 (cast fuses into the op)
            return jnp.dot(
                adj.dense.astype(jnp.bfloat16),
                x.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        return jnp.dot(adj.dense, x, preferred_element_type=jnp.float32)
    if adj.backend == "pallas":
        from recommendation_tpu.ops.pallas_spmm import pallas_spmm_or_fallback

        return pallas_spmm_or_fallback(adj, x)
    return _segment_matmul(adj, x)


def segment_softmax(
    scores: jnp.ndarray, segments: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Numerically-stable softmax of per-edge scores grouped by destination
    segment — the TPU replacement for GAT's per-edge softmax
    (`gat.py:20-23` via torch_scatter)."""
    seg_max = jax.ops.segment_max(scores, segments, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    exp = jnp.exp(scores - seg_max[segments])
    seg_sum = jax.ops.segment_sum(exp, segments, num_segments=num_segments)
    return exp / (seg_sum[segments] + 1e-16)


def segment_mean(
    values: jnp.ndarray, segments: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Per-segment mean (GraphSAGE mean aggregator)."""
    sums = jax.ops.segment_sum(values, segments, num_segments=num_segments)
    counts = jax.ops.segment_sum(
        jnp.ones_like(segments, dtype=values.dtype), segments, num_segments=num_segments
    )
    return sums / jnp.maximum(counts, 1.0)[:, None]
