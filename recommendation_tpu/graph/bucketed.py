"""Bucketed pull-form (gather-only) sparse propagation — the large-graph
backend.

Replaces ``torch.sparse.mm`` (`ncl.py:419`, `selfcf.py:479`, ...) in the
regime where neither the dense-MXU path (adjacency too big to materialize)
nor the gather+``segment_sum`` path (scatter-add runs at ~1% of HBM peak on
this TPU — measured 45k examples/s at 1M edges, BASELINE.md) is acceptable.

Design: a *pull-form* CSR. Each destination row pulls its neighbor rows with
one big gather and reduces them densely on the VPU — **no scatter anywhere**:

  * rows are grouped into buckets by next-power-of-two degree; a bucket is a
    padded ``[n_rows_b, cap]`` index/value table (padding slots carry
    ``val == 0`` and point at row 0, contributing nothing). Total padded
    slots < 2×E, so the gather traffic is within 2× of the COO path's —
    but the reduction is a dense ``einsum`` instead of a scatter-add;
  * per-bucket outputs are concatenated and restored to row-id order with a
    single ``[n_rows, d]`` gather (``gather_pos``; degree-0 rows point at a
    trailing zeros row);
  * the backward pass would be a scatter under autodiff (the VJP of gather),
    so ``bucketed_matmul`` carries a **custom VJP that pulls through the
    prebuilt transpose**: d/dx (A@x)ᵀg = Aᵀg — both passes are gather-only.
  * edge values are refreshable **on device** (``refresh_vals``): every slot
    records the position of its edge in the owning COO array, so mask-based
    augmentation (`univariate/sept.py:53-61` semantics, done on-device in
    ``graph/augment.py``) only re-gathers a 1-D values vector — the index
    structure is static, jit-stable.

Gradients do NOT flow to the edge values (they are normalization constants /
dropout masks in every model family, never parameters — GAT's learned
attention uses ``segment_softmax``, not this op).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_CAP = 4  # smallest bucket width (bounds tiny-row padding)
CAP_STEP = 8  # caps are multiples of this up to CAP_POW2_ABOVE, pow2 beyond
CAP_POW2_ABOVE = 128  # hub tail rows are few; pow2 caps bound bucket count
# CAP_STEP=8 over 4: +15% padded slots but 23 buckets instead of 39 — the
# pull is per-GATHER-overhead-bound before it is slot-bound (measured
# 6.66 -> 6.03 ms/pull at the 1M-edge shape, tools/probe_caps.py round 4;
# finer schedules cut slots yet run SLOWER, coarser ones blow up slots)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "val", "edge", "ridx"],
    meta_fields=["cap"],
)
@dataclasses.dataclass
class Bucket:
    """Padded neighbor table for all rows whose degree rounds up to ``cap``."""

    idx: jnp.ndarray  # i32[nb, cap] source-row ids into x (0 where padded)
    val: jnp.ndarray  # f32[nb, cap] edge values (0 where padded)
    edge: jnp.ndarray  # i32[nb, cap] position in the owning COO vals (-1 pad)
    cap: int
    # i32[nb, cap] ROW-SPACE source indices (``min(gather_pos[idx],
    # total_rows - 1)``), precomputed on host for square patterns: the chain
    # path (`pull_rowspace`) otherwise issues a per-slot scalar translation
    # gather EVERY layer of EVERY step for a quantity that is fully static
    # (scalar-element gathers measured ~10 ns/slot vs ~1.2 ns for row
    # gathers — round-4). None on non-square structures, which never chain.
    ridx: Optional[jnp.ndarray] = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["buckets", "gather_pos", "node_of_row", "sep_dst", "sep_src_row"],
    meta_fields=["n_rows", "n_cols"],
)
@dataclasses.dataclass
class BucketedCSR:
    buckets: Tuple[Bucket, ...]
    gather_pos: jnp.ndarray  # i32[n_rows]: row's position in the concat
    # outputs; degree-0 rows point at the appended zeros row (== total rows)
    n_rows: int
    n_cols: int
    # i32[total_rows + 1]: destination node of each concat row (inverse of
    # gather_pos; the trailing zeros row carries an arbitrary id). Enables
    # permuted-space chaining (`pull_rowspace`); None on structures built
    # before round 3.
    node_of_row: Optional[jnp.ndarray] = None
    # SEPARABLE edge values (round 4): when the build detects
    # val(dst, src) == a[dst] * b[src] — true for every degree-normalized
    # adjacency this framework constructs (sym D^-1/2 A D^-1/2 and one-sided
    # D^-1 A) — the pull drops the per-slot multiply entirely: scale the
    # input rows by b, gather + PLAIN sum (padding slots point at a shared
    # zero row via Bucket.ridx), scale the output rows by a. Measured
    # 6.3 -> 4.6 ms/pull at the 1M-edge shape (tools/probe_pull.py).
    # f32[total_rows + 1] each, in concat-row order, last entry 0; None when
    # not detected or after refresh_vals (refreshed values get the val path).
    sep_dst: Optional[jnp.ndarray] = None
    sep_src_row: Optional[jnp.ndarray] = None

    @property
    def total_rows(self) -> int:
        return sum(int(b.idx.shape[0]) for b in self.buckets)


def _host_ridx(
    gather_pos: np.ndarray,
    idx: np.ndarray,
    total_rows: int,
    n_rows: int,
    n_cols: int,
    dead: Optional[np.ndarray] = None,
) -> Optional[jnp.ndarray]:
    """Precomputed row-space translation for one bucket's index table (see
    ``Bucket.ridx``). Only square patterns chain, so only they carry it.

    ``dead`` marks slots that are structurally absent — table padding
    (edge < 0) and build-time zero-value edges (the symmetric COO padding
    tail). They point at the shared zero row (index ``total_rows``), which
    is what lets the separable pull skip the per-slot value multiply; the
    value path is indifferent (their val is 0 either way). Contract:
    ``refresh_vals`` may change NONZERO values but never resurrects a
    build-time zero — every augmentation in the codebase multiplies by a
    mask, preserving this."""
    if n_rows != n_cols:
        return None
    gp = np.asarray(gather_pos)
    r = np.minimum(gp[np.asarray(idx)], max(total_rows - 1, 0))
    if dead is not None:
        r = np.where(dead, total_rows, r)
    return jnp.asarray(r.astype(np.int32))


def _detect_separable(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: Optional[np.ndarray],
    n_rows: int,
    n_cols: int,
) -> Optional[tuple]:
    """(a, b) with val(dst, src) == a[dst] * b[src] over nonzero edges, or
    None. Candidates cover the two normalizations the framework builds
    (`data/interaction.py::normalize_graph_mat`): symmetric
    D_r^-1/2 A D_c^-1/2 and one-sided row D_r^-1 A."""
    if vals is None or n_rows != n_cols or len(rows) == 0:
        return None
    v = np.asarray(vals, dtype=np.float64)
    nz = v != 0
    if not nz.any():
        return None
    rr = np.asarray(rows)[nz].astype(np.int64)
    cc = np.asarray(cols)[nz].astype(np.int64)
    vv = v[nz]
    if not (vv > 0).all():
        return None
    rc = np.maximum(np.bincount(rr, minlength=n_rows), 1).astype(np.float64)
    ccnt = np.maximum(np.bincount(cc, minlength=n_cols), 1).astype(np.float64)
    for a, b in (
        (1.0 / np.sqrt(rc), 1.0 / np.sqrt(ccnt)),  # symmetric norm
        (1.0 / rc, np.ones(n_cols)),  # one-sided row norm
    ):
        if np.allclose(vv, a[rr] * b[cc], rtol=1e-5, atol=0.0):
            return a.astype(np.float32), b.astype(np.float32)
    return None


def _sep_row_vectors(sep, node_of_row: np.ndarray, total_rows: int):
    """(sep_dst, sep_src_row) in concat-row order, zero-row entry = 0."""
    if sep is None:
        return None, None
    a, b = sep
    nor = np.asarray(node_of_row)[: total_rows + 1]
    sd = a[nor].astype(np.float32)
    ss = b[nor].astype(np.float32)
    sd[total_rows] = 0.0
    ss[total_rows] = 0.0
    return jnp.asarray(sd), jnp.asarray(ss)


def _cap_for_degree(deg: np.ndarray, minimum: int) -> np.ndarray:
    """Bucket cap per row: multiples of CAP_STEP up to CAP_POW2_ABOVE (tight
    padding where most rows live — 1.20× total slots vs 1.54× for pure pow2
    on a Gowalla-shaped graph), pow2 beyond (hub rows are few, so coarse caps
    there keep the bucket count ~40 instead of ~135)."""
    d = np.maximum(deg, minimum)
    stepped = (np.ceil(d / CAP_STEP) * CAP_STEP).astype(np.int64)
    pow2 = (2 ** np.ceil(np.log2(np.maximum(d, 1)))).astype(np.int64)
    return np.where(d <= CAP_POW2_ABOVE, stepped, pow2)


def build_bucketed(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: Optional[np.ndarray],
    n_rows: int,
    n_cols: int,
    edge_ids: Optional[np.ndarray] = None,
    min_cap: int = MIN_CAP,
) -> BucketedCSR:
    """Host-side one-shot builder from COO arrays (any order, padding rows
    with ``val == 0`` welcome — they land in row-0's bucket and contribute 0).

    ``edge_ids[k]`` is the position edge ``k`` occupies in the COO values
    vector that :func:`refresh_vals` will re-gather from (defaults to ``k``).
    ``vals`` may be None for a structure-only template (val tables zeroed).
    """
    e = len(rows)
    if edge_ids is None:
        edge_ids = np.arange(e, dtype=np.int32)

    # native C++ fast path (one counting-sort pass + one fill pass instead
    # of ~6 numpy passes; handles unsorted input without an argsort) —
    # bit-identical layout, parity-tested in tests/test_native.py. Runs
    # BEFORE any dtype normalization: the binding converts only what isn't
    # already i32/f32, skipping two 20M-element copies on the hot build.
    if e > 0:
        try:
            from recommendation_tpu.native import get_lib
            from recommendation_tpu.native.bucketize import build_tables_native

            lib = get_lib()
        except Exception:
            lib = None
        if lib is not None:
            built = build_tables_native(
                lib, rows, cols, vals, edge_ids, n_rows, min_cap
            )
            if built is not None:
                bks, gather_pos, node_of_row = built
                total = sum(i.shape[0] for _, i, _, _ in bks)
                sep = _detect_separable(rows, cols, vals, n_rows, n_cols)
                sd, ss = _sep_row_vectors(sep, node_of_row, total)
                return BucketedCSR(
                    buckets=tuple(
                        Bucket(
                            idx=jnp.asarray(i), val=jnp.asarray(v),
                            edge=jnp.asarray(eg), cap=c,
                            ridx=_host_ridx(
                                gather_pos, i, total, n_rows, n_cols,
                                dead=(eg < 0) | (v == 0) if vals is not None else (eg < 0),
                            ),
                        )
                        for c, i, v, eg in bks
                    ),
                    gather_pos=jnp.asarray(gather_pos),
                    n_rows=n_rows,
                    n_cols=n_cols,
                    node_of_row=jnp.asarray(node_of_row),
                    sep_dst=sd,
                    sep_src_row=ss,
                )

    rows = np.asarray(rows, dtype=np.int64)
    # CSR-derived COO is already row-sorted — the O(E) check dodges the
    # O(E log E) argsort that dominated the 10M-edge build profile
    if e == 0 or np.all(rows[:-1] <= rows[1:]):
        r = rows
        c = np.asarray(cols, dtype=np.int32)
        v = None if vals is None else np.asarray(vals, np.float32)
        eid = np.asarray(edge_ids, dtype=np.int32)
    else:
        order = np.argsort(rows, kind="stable")
        r = rows[order]
        c = np.asarray(cols, dtype=np.int32)[order]
        v = None if vals is None else np.asarray(vals, np.float32)[order]
        eid = np.asarray(edge_ids, dtype=np.int32)[order]

    deg = np.bincount(r, minlength=n_rows).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(deg)])
    caps_per_row = _cap_for_degree(deg, min_cap)

    buckets = []
    total_rows = 0
    gather_pos = np.zeros(n_rows, dtype=np.int64)
    nonzero = deg > 0
    for cap in np.unique(caps_per_row[nonzero]):
        cap = int(cap)
        rows_in = np.where(nonzero & (caps_per_row == cap))[0]
        nb = len(rows_in)
        lens = deg[rows_in]
        starts = indptr[rows_in]
        total = int(lens.sum())
        # flat (bucket-row, slot) coordinates for every real edge
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        src = np.repeat(starts, lens) + offs
        dst_row = np.repeat(np.arange(nb, dtype=np.int64), lens)

        idx = np.zeros((nb, cap), dtype=np.int32)
        val = np.zeros((nb, cap), dtype=np.float32)
        edge = np.full((nb, cap), -1, dtype=np.int32)
        idx[dst_row, offs] = c[src]
        if v is not None:
            val[dst_row, offs] = v[src]
        edge[dst_row, offs] = eid[src]
        buckets.append((idx, val, edge, cap))
        gather_pos[rows_in] = total_rows + np.arange(nb)
        total_rows += nb
    gather_pos[~nonzero] = total_rows  # the appended zeros row
    node_of_row = np.zeros(total_rows + 1, dtype=np.int64)
    node_of_row[gather_pos] = np.arange(n_rows)
    sep = _detect_separable(r, c, v, n_rows, n_cols)
    sd, ss = _sep_row_vectors(sep, node_of_row, total_rows)
    return BucketedCSR(
        buckets=tuple(
            Bucket(
                idx=jnp.asarray(idx), val=jnp.asarray(val),
                edge=jnp.asarray(edge), cap=cap,
                ridx=_host_ridx(
                    gather_pos, idx, total_rows, n_rows, n_cols,
                    dead=(edge < 0) | (val == 0) if v is not None else (edge < 0),
                ),
            )
            for idx, val, edge, cap in buckets
        ),
        gather_pos=jnp.asarray(gather_pos.astype(np.int32)),
        n_rows=n_rows,
        n_cols=n_cols,
        node_of_row=jnp.asarray(node_of_row.astype(np.int32)),
        sep_dst=sd,
        sep_src_row=ss,
    )


def mirrored_transpose(csr: BucketedCSR, e_half: int) -> BucketedCSR:
    """Transpose of a BucketedCSR built over a *mirror-layout* COO — one
    whose second half is the element-wise swap of its first half
    (``rows[k+e_half], cols[k+e_half] == cols[k], rows[k]`` for
    ``k < e_half``), as the bipartite templates are.

    For such a layout the transpose's bucket tables are IDENTICAL to the
    forward's except the slot→edge map, because (a) every destination has the
    same pull-set under the mirror bijection ``k ↔ k±e_half``, (b) each node
    id appears as a destination in exactly one half (user nodes in the first,
    item nodes in the second), so the bijection preserves within-row slot
    order, and (c) rows enter buckets in ascending node id either way. Hence:
    share ``idx``/``val``/``gather_pos`` and remap ``edge`` by the mirror —
    skipping an entire O(E log E) host build (measured ~9 s of the 10M-edge
    ``DeviceGraph`` build)."""
    def flip(b: Bucket) -> Bucket:
        e = np.asarray(b.edge)
        flipped = np.where(e >= 0, np.where(e < e_half, e + e_half, e - e_half), -1)
        return Bucket(idx=b.idx, val=b.val, edge=jnp.asarray(flipped.astype(np.int32)), cap=b.cap, ridx=b.ridx)

    return BucketedCSR(
        buckets=tuple(flip(b) for b in csr.buckets),
        gather_pos=csr.gather_pos,
        n_rows=csr.n_cols,
        n_cols=csr.n_rows,
        node_of_row=csr.node_of_row,
    )


def slot_maps(csr: BucketedCSR, n_rows: int):
    """Static edge↔slot maps for scatter-free backward passes over per-slot
    data (the bucketed GAT VJP, `models/gat.py`).

    Returns ``(pos_map, slot_node, node_of_row)`` as device i32 arrays:
      * ``pos_map[e]``  — flat slot position (concat of all buckets, row-major
        within each) of COO edge ``e`` in THIS structure's tables;
      * ``slot_node[s]`` — destination node id of flat slot ``s``;
      * ``node_of_row[r]`` — destination node id of concat row ``r`` (the
        inverse of ``gather_pos``; what ``bucketed_row_nodes`` computes on
        device, here prebuilt on host).

    With these, a transpose-structure pull can gather per-slot quantities
    computed in forward layout (attention weights, logit cotangents) by edge
    id — no scatter. Host-side one-shot, like :func:`build_bucketed`."""
    edges, rows_of_slots = [], []
    base = 0
    for b in csr.buckets:
        nb, cap = b.idx.shape
        edges.append(np.asarray(b.edge).reshape(-1))
        rows_of_slots.append(np.repeat(np.arange(base, base + nb, dtype=np.int64), cap))
        base += nb
    flat_edge = np.concatenate(edges) if edges else np.zeros(0, np.int64)
    rowof = np.concatenate(rows_of_slots) if rows_of_slots else np.zeros(0, np.int64)
    valid = flat_edge >= 0
    n_coo = int(flat_edge[valid].max()) + 1 if valid.any() else 1
    pos_map = np.zeros(n_coo, dtype=np.int64)
    pos_map[flat_edge[valid]] = np.nonzero(valid)[0]
    # node id per concat row (inverse of gather_pos; degree-0 nodes collide
    # on the trailing zeros row — harmless, those slots are never gathered);
    # reuse the builder's copy when present
    if csr.node_of_row is not None:
        node_of_row = np.asarray(csr.node_of_row).astype(np.int64)
    else:
        node_of_row = np.zeros(base + 1, dtype=np.int64)
        node_of_row[np.asarray(csr.gather_pos)] = np.arange(n_rows)
    slot_node = node_of_row[rowof]
    return (
        jnp.asarray(pos_map.astype(np.int32)),
        jnp.asarray(slot_node.astype(np.int32)),
        jnp.asarray(node_of_row.astype(np.int32)),
    )


def _check_no_resurrection(bad_count: np.ndarray) -> None:
    if int(bad_count) > 0:
        raise RuntimeError(
            f"refresh_vals: {int(bad_count)} build-time-zero edge slot(s) "
            "refreshed to a NONZERO value. The prebuilt Bucket.ridx routes "
            "such slots to the shared zero row permanently, so the row-space "
            "chain would silently drop these edges (contract in _host_ridx). "
            "Rebuild the structure instead of refreshing values that "
            "resurrect dead edges."
        )


def refresh_vals(csr: BucketedCSR, coo_vals: jnp.ndarray) -> BucketedCSR:
    """New BucketedCSR with values re-gathered from a (device) COO values
    vector — the augmentation path. Index structure untouched.

    Contract (ADVICE r4): refreshed values must never RESURRECT a build-time
    zero edge — ``Bucket.ridx`` routed those slots to the shared zero row at
    build, so the row-space chain path would silently drop them. Every
    augmentation in the codebase multiplies by a mask (preserves zeros);
    set ``RECTPU_DEBUG_CHECKS=1`` to verify at runtime (host callback —
    test/debug only, adds a sync per refresh)."""
    import os

    n = coo_vals.shape[0]
    debug_check = bool(os.environ.get("RECTPU_DEBUG_CHECKS"))

    def refill(b: Bucket) -> Bucket:
        safe = jnp.clip(b.edge, 0, n - 1)
        val = jnp.where(b.edge >= 0, coo_vals[safe], 0.0)
        if debug_check and b.ridx is not None:
            total = sum(int(bb.idx.shape[0]) for bb in csr.buckets)
            resurrected = (b.edge >= 0) & (b.ridx == total) & (val != 0)
            jax.debug.callback(_check_no_resurrection, jnp.sum(resurrected))
        return Bucket(idx=b.idx, val=val, edge=b.edge, cap=b.cap, ridx=b.ridx)

    return BucketedCSR(
        buckets=tuple(refill(b) for b in csr.buckets),
        gather_pos=csr.gather_pos,
        n_rows=csr.n_rows,
        n_cols=csr.n_cols,
        node_of_row=csr.node_of_row,
    )


def map_vals(csr: BucketedCSR, fn) -> BucketedCSR:
    """Apply ``fn`` to every bucket's value table (e.g. binarization)."""
    return BucketedCSR(
        buckets=tuple(
            Bucket(idx=b.idx, val=jnp.where(b.edge >= 0, fn(b.val), 0.0), edge=b.edge, cap=b.cap, ridx=b.ridx)
            for b in csr.buckets
        ),
        gather_pos=csr.gather_pos,
        n_rows=csr.n_rows,
        n_cols=csr.n_cols,
        node_of_row=csr.node_of_row,
    )


def pull(csr: BucketedCSR, x: jnp.ndarray, compute_dtype: str = "float32") -> jnp.ndarray:
    """Forward pull ``A @ x`` (gather + dense per-bucket reduction).

    The gather always runs on f32 WORDS: native sub-32-bit row gathers hit a
    slow TPU path (measured ON-CHIP at 2M edges, d=64: bf16 pull 36 ms vs
    f32 pull 8.2 ms — the opposite of the dense-matmul path). Under
    ``compute_dtype='bfloat16'`` the rows are bf16 PAIRS bitcast-packed into
    f32 words — half the gather bytes on the same fast path, f32
    accumulation (the bucketed analogue of the dense backend's bf16 mode).
    ``'int8'`` packs quads with a per-row scale (~4× fewer bytes). Packing
    auto-disables where it measured slower (see ``_effective_packer``)."""
    d = x.shape[1]
    packer = _effective_packer(compute_dtype, d)
    xd = packer[0](x) if packer else x.astype(jnp.float32)
    outs = []
    for b in csr.buckets:
        g = xd[b.idx]  # [nb, cap, d or packed width] gather — the traffic
        if packer:
            g = packer[1](g, d)
        # axis-reduce beats einsum here (~7% on-chip): XLA fuses the
        # val-broadcast multiply into the reduce's input, while the batched
        # matvec einsum materializes its operand separately
        outs.append(jnp.sum(g * b.val[:, :, None], axis=1))
    zero = jnp.zeros((1, d), dtype=jnp.float32)
    concat = jnp.concatenate(outs + [zero], axis=0)
    return concat[csr.gather_pos]


def _pack_bf16_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """f32[N, d] → f32[N, ⌈d/2⌉] whose bits carry bf16 PAIRS. The gather
    then moves half the bytes per slot while staying on the fast f32 gather
    path (native sub-32-bit gathers measured 4× SLOWER on this TPU —
    `pull` docstring). Zero-pads odd d."""
    n, d = x.shape
    xb = x.astype(jnp.bfloat16)
    if d % 2:
        xb = jnp.pad(xb, ((0, 0), (0, 1)))
    return jax.lax.bitcast_convert_type(xb.reshape(n, -1, 2), jnp.float32)


def _unpack_bf16_pairs(p: jnp.ndarray, d: int) -> jnp.ndarray:
    """Inverse of :func:`_pack_bf16_pairs` on the gathered rows, upcast f32."""
    b = jax.lax.bitcast_convert_type(p, jnp.bfloat16)
    return b.reshape(*p.shape[:-1], -1)[..., :d].astype(jnp.float32)


def _pack_int8_rows(x: jnp.ndarray) -> jnp.ndarray:
    """f32[N, d] → f32[N, 1 + ⌈d/4⌉]: per-row symmetric int8 quantization
    packed four-per-f32-word, the row's scale in word 0 — one f32 gather
    moves scale + values together at ~4× fewer bytes than the exact path.
    Propagation INPUTS are quantized (params and accumulation stay f32);
    ranking quality must be validated per-task — config-gated, default off."""
    n, d = x.shape
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    if d % 4:
        q = jnp.pad(q, ((0, 0), (0, 4 - d % 4)))
    words = jax.lax.bitcast_convert_type(q.reshape(n, -1, 4), jnp.float32)
    return jnp.concatenate([scale, words], axis=1)


def _unpack_int8_rows(p: jnp.ndarray, d: int) -> jnp.ndarray:
    """Inverse of :func:`_pack_int8_rows` on gathered rows, upcast f32."""
    scale = p[..., :1]
    q = jax.lax.bitcast_convert_type(p[..., 1:], jnp.int8)
    vals = q.reshape(*p.shape[:-1], -1)[..., :d].astype(jnp.float32)
    return vals * scale


_PACKERS = {
    "bfloat16": (_pack_bf16_pairs, _unpack_bf16_pairs),
    "int8": (_pack_int8_rows, _unpack_int8_rows),
}


def packed_words(compute_dtype: str, d: int) -> int:
    """f32 words per gathered row under ``compute_dtype`` packing."""
    if compute_dtype == "bfloat16":
        return -(-d // 2)
    if compute_dtype == "int8":
        return 1 + -(-d // 4)
    return d


def _effective_packer(compute_dtype: str, d: int):
    """Packing decision per row width — measured on-chip (round 3,
    `tools/probe_gather_ceiling.py` probe A, 2M random slots over 1.5M rows):

        words/row   16     32     64    128    256
        ns/slot    1.17   2.20   1.09   1.05   1.23

    The gather is ISSUE-bound below ~256 words (flat ns/slot, far from HBM
    peak), so shrinking rows does not buy bandwidth — and the 32-word point
    sits on a 2× SLOWER path than 64 (this is why bf16-pair packing at d=64
    REGRESSED the 1M-edge bench 173k -> 129k ex/s). Rule: pack only when the
    packed row still holds >= 64 words; otherwise gather plain f32 words."""
    p = _PACKERS.get(compute_dtype)
    if p is None or packed_words(compute_dtype, d) < 64:
        return None
    return p


def pull_rowspace(
    csr: BucketedCSR, xp: jnp.ndarray, compute_dtype: str = "float32"
) -> jnp.ndarray:
    """Row-space pull: input AND output live in concat-row order, so chained
    applications skip the per-layer ``concat[gather_pos]`` reorder (the
    permuted-space propagation of DESIGN.md agenda #1).

    CONVENTION (round 4): ``xp`` is ``[total_rows + 1, d]`` with the LAST
    ROW ZERO; the output has the same shape and invariant. Structurally-dead
    slots (table padding + build-time zero-value edges) point at that zero
    row via the prebuilt ``Bucket.ridx`` (the on-the-fly ``gather_pos``
    translation is a per-slot scalar gather per layer — measured ~10 ns/slot
    vs ~1.2 ns for the row gather itself).

    When the build detected SEPARABLE values (``csr.sep_dst`` — every
    degree-normalized adjacency), the per-slot value multiply is replaced by
    two row scalings around a plain gather+sum: 6.3 -> 4.6 ms/pull at the
    1M-edge shape (tools/probe_pull.py), because the multiply's operand
    materialization is the single largest non-gather cost.

    ``compute_dtype='bfloat16'`` gathers bf16 PAIRS packed in f32 words
    (half the bytes per slot, still the fast f32 gather path), accumulating
    in f32 — the bucketed analogue of the dense backend's bf16 MXU mode.
    ``'int8'`` packs quads with a per-row scale (~4× fewer bytes). Packing
    auto-disables where it measured slower (see ``_effective_packer``)."""
    d = xp.shape[1]
    packer = _effective_packer(compute_dtype, d)
    sep = csr.sep_dst is not None
    xin = xp * csr.sep_src_row[:, None] if sep else xp
    xd = packer[0](xin) if packer else xin.astype(jnp.float32)
    outs = []
    for b in csr.buckets:
        rows = b.ridx if b.ridx is not None else csr.gather_pos[b.idx]
        g = xd[rows]  # [nb, cap, d or packed width]
        if packer:
            g = packer[1](g, d)
        if sep:
            outs.append(jnp.sum(g, axis=1))
        else:
            outs.append(jnp.sum(g * b.val[:, :, None], axis=1))
    zero = jnp.zeros((1, d), jnp.float32)
    out = jnp.concatenate(outs + [zero], axis=0)  # [total_rows + 1, d]
    if sep:
        out = out * csr.sep_dst[:, None]  # zero-row scale is 0
    return out


def _gather_sum_rowspace(csr: BucketedCSR, y: jnp.ndarray) -> jnp.ndarray:
    """Plain gather + sum under the row-space convention ([total_rows + 1]
    in/out, last row zero — dead slots point there via ``Bucket.ridx``).
    The separable chain applies its folded scalings around this."""
    d = y.shape[1]
    outs = [jnp.sum(y[b.ridx], axis=1) for b in csr.buckets]
    return jnp.concatenate(outs + [jnp.zeros((1, d), jnp.float32)], axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def bucketed_chain_mean(
    n_layers: int,
    compute_dtype: str,
    fwd: BucketedCSR,
    bwd: BucketedCSR,
    x: jnp.ndarray,
) -> jnp.ndarray:
    """Fused ``mean([x, Ax, A²x, ..])`` — the LightGCN readout — entirely in
    permuted row space: one node→row gather in, ``n_layers`` row-space pulls,
    one row→node restore out. Versus ``n_layers`` separate ``bucketed_matmul``
    calls this removes ``2(n_layers-1)`` full-table reorders per train step
    (fwd + the VJP's mirrored Horner chain through ``bwd``).

    REQUIRES the pattern to be symmetric in its bucket layout (``fwd`` and
    ``bwd`` share ``gather_pos``) so forward and backward chains live in the
    same row space — from_scipy asserts this before enabling the path.
    Like ``bucketed_matmul``, values get zero cotangents.

    SEPARABLE regime: with x_l = a ⊙ G(b ⊙ x_{l-1}) (G = plain gather+sum),
    substituting y_l = b ⊙ x_l folds both scalings into ONE ab-product per
    layer — y_l = (a⊙b) ⊙ G(y_{l-1}), unscaled once at the end — saving a
    full [total_rows, d] read+write pass per pull (tools/probe_chain.py)."""
    rows = fwd.node_of_row[: fwd.total_rows]
    zero = jnp.zeros((1, x.shape[1]), jnp.float32)
    xp = jnp.concatenate([x[rows].astype(jnp.float32), zero], axis=0)
    if fwd.sep_dst is not None and _effective_packer(compute_dtype, x.shape[1]) is None:
        ab = (fwd.sep_dst * fwd.sep_src_row)[:, None]
        # every concat row has degree >= 1 so its source scale is > 0; the
        # zero row's scale is 0 by construction -> keep its inverse at 0
        inv_b = jnp.where(fwd.sep_src_row > 0, 1.0 / fwd.sep_src_row, 0.0)[:, None]
        y = xp * fwd.sep_src_row[:, None]
        acc_y = jnp.zeros_like(y)
        for _ in range(n_layers):
            y = _gather_sum_rowspace(fwd, y) * ab
            acc_y = acc_y + y
        acc = acc_y * inv_b
    else:
        acc = jnp.zeros_like(xp)
        cur = xp
        for _ in range(n_layers):
            cur = pull_rowspace(fwd, cur, compute_dtype)
            acc = acc + cur
    # gather_pos sends degree-0 nodes to index total_rows — the zero row the
    # row-space convention already carries
    restored = acc[fwd.gather_pos]
    return (x + restored) / (n_layers + 1.0)


def _chain_fwd(n_layers, compute_dtype, fwd, bwd, x):
    return bucketed_chain_mean(n_layers, compute_dtype, fwd, bwd, x), (fwd, bwd)


def _chain_bwd(n_layers, compute_dtype, res, g):
    fwd, bwd = res
    rows = fwd.node_of_row[: fwd.total_rows]
    zero = jnp.zeros((1, g.shape[1]), jnp.float32)
    gp = jnp.concatenate([g[rows].astype(jnp.float32), zero], axis=0)
    # Horner: Σ_{l=1..L} (Aᵀ)^l gp  ==  Aᵀ(gp + Aᵀ(gp + ...))
    if bwd.sep_dst is not None and _effective_packer(
        _bwd_dtype(compute_dtype), g.shape[1]
    ) is None:
        # folded-scale form (see bucketed_chain_mean): z = b' ⊙ s
        ab = (bwd.sep_dst * bwd.sep_src_row)[:, None]
        inv_b = jnp.where(bwd.sep_src_row > 0, 1.0 / bwd.sep_src_row, 0.0)[:, None]
        gp_b = gp * bwd.sep_src_row[:, None]
        z = jnp.zeros_like(gp)
        for _ in range(n_layers):
            z = _gather_sum_rowspace(bwd, z + gp_b) * ab
        s = z * inv_b
    else:
        s = jnp.zeros_like(gp)
        for _ in range(n_layers):
            s = pull_rowspace(bwd, s + gp, _bwd_dtype(compute_dtype))
    restored = s[fwd.gather_pos]
    dx = ((g + restored) / (n_layers + 1.0)).astype(g.dtype)
    return (_float0_zeros(fwd), _float0_zeros(bwd), dx)


bucketed_chain_mean.defvjp(_chain_fwd, _chain_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bucketed_matmul(
    fwd: BucketedCSR, bwd: BucketedCSR, x: jnp.ndarray, compute_dtype: str = "float32"
) -> jnp.ndarray:
    """``A @ x`` where ``fwd`` encodes A and ``bwd`` encodes Aᵀ.

    Custom VJP: the backward pass pulls the output cotangent through ``bwd``
    (grad_x = Aᵀ g), so training never emits a scatter. Values receive zero
    cotangents (non-differentiable by design, see module docstring)."""
    return pull(fwd, x, compute_dtype)


def _float0_zeros(tree):
    """Zero cotangents for a pytree that mixes float tables (zeros) and
    integer index tables (float0, the tangent dtype JAX requires for ints)."""
    return jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        tree,
    )


def _bwd_dtype(compute_dtype: str) -> str:
    """Cotangent-pull dtype: bf16 packing on gradients matches the dense
    backend's bf16 backward matmuls, but int8 would round the accumulated
    cotangent per layer (zeroing gradients below ~max|row|/254 — review
    finding, round 3), so int8 applies to FORWARD propagation inputs only."""
    return "float32" if compute_dtype == "int8" else compute_dtype


def _mm_fwd(fwd, bwd, x, compute_dtype):
    return pull(fwd, x, compute_dtype), (fwd, bwd)


def _mm_bwd(compute_dtype, res, g):
    fwd, bwd = res
    grad_x = pull(bwd, g, _bwd_dtype(compute_dtype)).astype(g.dtype)
    return (_float0_zeros(fwd), _float0_zeros(bwd), grad_x)


bucketed_matmul.defvjp(_mm_fwd, _mm_bwd)
