"""Pallas SpMM backend — currently an explicit fallback.

A hand-tiled TPU SpMM was probed on-chip and shelved for this hardware/jax
generation: Mosaic's gather lowering only supports same-shape
``take_along_axis`` (`indices.shape == input.shape + (1,)``), so a
chunked-gather CSR kernel cannot be expressed, and a one-hot-matmul scatter
costs ~40× the dense path's FLOPs (see DESIGN.md §2.4 and the git history's
probe scripts). For the regimes that matter:

  * adjacency ≤ a few hundred MB → the dense MXU backend is speed-of-light;
  * larger → XLA's gather + ``segment_sum`` is the practical ceiling.

``backend='pallas'`` therefore routes to the segment implementation rather
than erroring, so configs remain forward-compatible with a future kernel.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceAdj

_warned = False


def pallas_spmm_or_fallback(adj: DeviceAdj, x: jnp.ndarray) -> jnp.ndarray:
    from recommendation_tpu.ops.spmm import _segment_matmul

    global _warned
    if not _warned:  # once per process — this runs inside traced code paths
        _warned = True
        logging.getLogger("recommendation_tpu").warning(
            "graph.backend='pallas': no hand-tiled SpMM kernel exists on this "
            "toolchain (Mosaic gather limits, DESIGN.md §2.4) — running the "
            "segment backend instead"
        )
    return _segment_matmul(adj, x)
