"""Device-resident graph structures.

The reference keeps its graph as a ``torch.sparse_coo_tensor`` and multiplies
it per batch (`ncl.py:419`, `selfcf.py:479`). TPU-first design instead:

  * ONE host→device upload at build time (SURVEY.md §3 boundary collapse);
  * adjacency as **sorted, padded COO** arrays with static shapes — the form
    XLA fuses best for ``segment_sum``-based propagation;
  * an optional **dense** materialization for graphs small enough that a
    blocked MXU matmul beats scatter (on TPUs dense matmul throughput is
    ~100× scatter throughput, so up to a few-hundred-MB adjacency the dense
    path wins — this is the deliberately non-CUDA-shaped choice);
  * degree-normalization computed **on device from an edge keep-mask**, so
    augmentation (edge dropout) never leaves the device and never changes
    array shapes — jit-stable.

``DeviceAdj`` is a pytree and can flow through ``jit``/``grad``/``shard_map``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "cols", "vals", "dense", "pull", "pull_t"],
    meta_fields=["n_rows", "n_cols", "backend", "compute_dtype", "rows_sorted", "sym_rowspace"],
)
@dataclasses.dataclass
class DeviceAdj:
    """Normalized sparse adjacency on device.

    rows/cols/vals are padded to a static length; padding entries carry
    ``val == 0`` (pointing at the last row/col), so they contribute nothing.
    ``dense`` is the materialized matrix when the dense backend is active.
    ``compute_dtype`` 'bfloat16' runs the dense propagation matmul in the
    MXU's native bf16 (f32 accumulate) — ~2× memory bandwidth; values stay
    stored f32.
    ``pull``/``pull_t`` are the gather-only tables of A and Aᵀ when the
    bucketed backend is active (`graph/bucketed.py`); their slot→edge maps
    point into ``vals`` positions, so value-level augmentation stays valid.
    """

    rows: jnp.ndarray  # i32[E_pad], sorted ascending
    cols: jnp.ndarray  # i32[E_pad]
    vals: jnp.ndarray  # f32[E_pad]
    dense: Optional[jnp.ndarray]  # f32[n_rows, n_cols] or None
    n_rows: int
    n_cols: int
    backend: str  # 'dense' | 'bucketed' | 'segment' | 'pallas'
    compute_dtype: str = "float32"
    rows_sorted: bool = False  # True -> segment_sum may use the sorted path
    pull: Optional["BucketedCSR"] = None  # bucketed tables of A
    pull_t: Optional["BucketedCSR"] = None  # bucketed tables of Aᵀ
    # True when pull and pull_t share gather_pos (symmetric sparsity +
    # degree layout) — the precondition for permuted-space chaining
    # (`bucketed_chain_mean`); checked at build in from_scipy
    sym_rowspace: bool = False

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    def transpose(self) -> "DeviceAdj":
        # Only re-sort the COO when no bucketed tables are attached: their
        # slot→edge maps index into ``vals`` positions and must stay aligned.
        if self.pull is not None or self.pull_t is not None:
            order = jnp.arange(self.vals.shape[0])
        else:
            order = jnp.argsort(self.cols)
        return DeviceAdj(
            rows=self.cols[order],
            cols=self.rows[order],
            vals=self.vals[order],
            dense=None if self.dense is None else self.dense.T,
            n_rows=self.n_cols,
            n_cols=self.n_rows,
            backend=self.backend,
            compute_dtype=self.compute_dtype,
            rows_sorted=False,
            pull=self.pull_t,
            pull_t=self.pull,
            sym_rowspace=self.sym_rowspace,
        )


# Graphs whose dense adjacency is at most this many f32 elements use the MXU
# dense path (128M elems = 512 MB; a v5e chip has 16 GB HBM).
DENSE_MAX_ELEMENTS = 128 * 1024 * 1024

# Guaranteed-negative columns per user (see ``user_fallback_neg``).
FALLBACK_NEGATIVES = 8

# Padded per-user positives table cap (i32 elements): 64M = 256 MB.
POS_TABLE_MAX_ELEMENTS = 64 * 1024 * 1024


def choose_backend(n_rows: int, n_cols: int, requested: str = "auto") -> str:
    if requested != "auto":
        return requested
    return "dense" if n_rows * n_cols <= DENSE_MAX_ELEMENTS else "bucketed"


def from_scipy(
    mat: sp.spmatrix, backend: str = "auto", pad_to: int = 8, compute_dtype: str = "float32"
) -> DeviceAdj:
    """Upload a scipy sparse matrix as a DeviceAdj (one-shot host→device)."""
    coo = sp.coo_matrix(mat, dtype=np.float32)
    if len(coo.row) == 0 or np.all(coo.row[:-1] <= coo.row[1:]):
        # CSR→COO is already row-major — skip the O(E log E) argsort that
        # dominated the 10M-edge build profile
        rows = coo.row.astype(np.int32)
        cols = coo.col.astype(np.int32)
        vals = coo.data.astype(np.float32)
    else:
        order = np.argsort(coo.row, kind="stable")
        rows = coo.row[order].astype(np.int32)
        cols = coo.col[order].astype(np.int32)
        vals = coo.data[order].astype(np.float32)
    n_rows, n_cols = coo.shape
    backend = choose_backend(n_rows, n_cols, backend)

    e_pad = max(pad_to, _round_up(len(vals), pad_to))
    # pad with (n_rows-1, n_cols-1) SELF-LOOP-shaped zero edges: padding
    # must be symmetric (same corner in both coordinates) or pull/pull_t
    # develop different degree layouts whenever nnz % pad_to != 0, silently
    # disabling the permuted-space chain (review finding, round 3)
    rows = np.pad(rows, (0, e_pad - len(rows)), constant_values=n_rows - 1)
    cols = np.pad(cols, (0, e_pad - len(cols)), constant_values=n_cols - 1)
    vals = np.pad(vals, (0, e_pad - len(vals)))

    dense = None
    if backend == "dense":
        dense = jnp.asarray(np.asarray(mat.todense(), dtype=np.float32))
    pull = pull_t = None
    sym_rowspace = False
    if backend == "bucketed":
        from recommendation_tpu.graph.bucketed import build_bucketed

        # slot→edge maps index into the padded COO vals positions, so
        # value-level augmentation (`with_vals`) refreshes both directions
        # from one [E_pad] vector
        eids = np.arange(e_pad, dtype=np.int32)
        pull = build_bucketed(rows, cols, vals, n_rows, n_cols, edge_ids=eids)
        pull_t = build_bucketed(cols, rows, vals, n_cols, n_rows, edge_ids=eids)
        # symmetric patterns (the normalized bipartite adjacency always is)
        # put both directions in the same row space — the precondition for
        # permuted-space chaining
        sym_rowspace = n_rows == n_cols and bool(
            np.array_equal(np.asarray(pull.gather_pos), np.asarray(pull_t.gather_pos))
        )
    return DeviceAdj(
        rows=jnp.asarray(rows),
        cols=jnp.asarray(cols),
        vals=jnp.asarray(vals),
        dense=dense,
        n_rows=n_rows,
        n_cols=n_cols,
        backend=backend,
        compute_dtype=compute_dtype,
        rows_sorted=True,
        pull=pull,
        pull_t=pull_t,
        sym_rowspace=sym_rowspace,
    )


def with_vals(adj: DeviceAdj, vals: jnp.ndarray) -> DeviceAdj:
    """Same sparsity pattern with new edge values (aligned to ``adj.vals``
    positions) — the single device-side hook every value-level augmentation
    goes through. Rebuilds the dense materialization and/or refreshes the
    bucketed tables as the backend requires."""
    from recommendation_tpu.graph.bucketed import refresh_vals

    dense = None
    if adj.dense is not None:
        dense = jnp.zeros_like(adj.dense).at[adj.rows, adj.cols].add(vals)
    return DeviceAdj(
        rows=adj.rows,
        cols=adj.cols,
        vals=vals,
        dense=dense,
        n_rows=adj.n_rows,
        n_cols=adj.n_cols,
        backend=adj.backend,
        compute_dtype=adj.compute_dtype,
        rows_sorted=adj.rows_sorted,
        pull=None if adj.pull is None else refresh_vals(adj.pull, vals),
        pull_t=None if adj.pull_t is None else refresh_vals(adj.pull_t, vals),
        sym_rowspace=adj.sym_rowspace,
    )


def binarized(adj: DeviceAdj) -> DeviceAdj:
    """Same sparsity pattern with all values 1 — the RAW adjacency. Used for
    GIN's unweighted neighbor sums and for bug-compatible modes of reference
    scripts that skip degree normalization (e.g. `directau.py:132-141`)."""
    return with_vals(adj, (adj.vals > 0).astype(jnp.float32))


def densify(adj: DeviceAdj) -> jnp.ndarray:
    """Materialize the dense matrix from COO on device (used to refresh the
    dense backend after an on-device re-normalization / augmentation)."""
    if adj.dense is not None:
        return adj.dense
    out = jnp.zeros((adj.n_rows, adj.n_cols), dtype=adj.vals.dtype)
    return out.at[adj.rows, adj.cols].add(adj.vals)


@jax.tree_util.register_pytree_node_class
class DeviceGraph:
    """All device-side state derived from an ``Interaction``.

    Holds the raw (static-shape) bipartite edge arrays plus prebuilt
    normalized adjacencies. Edge dropout re-derives normalization on device
    via :meth:`normalized_bipartite` with a keep-mask — no host round trip,
    no shape change (replaces `univariate/sept.py:53-61`'s scipy resampling).
    """

    def __init__(self, data, backend: str = "auto", pad_to: int = 8, compute_dtype: str = "float32"):
        self.n_users = data.user_num
        self.n_items = data.item_num
        self.n_nodes = self.n_users + self.n_items
        self.backend = choose_backend(self.n_nodes, self.n_nodes, backend)
        self.compute_dtype = compute_dtype

        e = len(data.edge_users)
        e_pad = max(pad_to, _round_up(e, pad_to))
        users = np.pad(data.edge_users, (0, e_pad - e))
        items = np.pad(data.edge_items, (0, e_pad - e))
        valid = np.zeros(e_pad, dtype=np.float32)
        valid[:e] = 1.0
        self.n_edges = e
        self.edge_users = jnp.asarray(users)  # i32[E_pad] user node ids
        self.edge_items = jnp.asarray(items)  # i32[E_pad] item ids (0-based)
        self.edge_valid = jnp.asarray(valid)  # f32[E_pad] 1 for real edges
        # (user, item) as ONE [E_pad, 2] row table: the epoch shuffle's
        # edge materialization is a single 8 B row gather instead of two
        # scalar-element gathers (~10 ns/element vs ~4 ns/row measured —
        # tools/probe_edge_shuffle.py, round 4: 28 -> 16 us/step at the
        # headline shape).
        self.edge_ui = jnp.stack([self.edge_users, self.edge_items], axis=1)

        # Prebuilt normalized bipartite adjacency (the LightGCN propagation
        # operator) and its self-loop variant D̃^-1/2(A+I)D̃^-1/2 (GCNConv-
        # style encoders: GRACE/G-BT).
        self.norm_adj = from_scipy(data.norm_adj, backend=self.backend, pad_to=pad_to, compute_dtype=compute_dtype)
        import scipy.sparse as sp
        from recommendation_tpu.data.interaction import normalize_graph_mat

        # Only GRACE/G-BT read the self-loop variant; on the bucketed
        # backend skip its two O(E) gather-table builds (host time + HBM)
        # and keep it on the segment path — correct, just not tuned for the
        # large-graph regime those encoders don't target.
        selfloops_backend = "segment" if self.backend == "bucketed" else self.backend
        self.norm_adj_selfloops = from_scipy(
            normalize_graph_mat(data.ui_adj + sp.eye(self.n_nodes, dtype=np.float32)),
            backend=selfloops_backend,
            pad_to=pad_to,
            compute_dtype=compute_dtype,
        )

        # CSR membership arrays for O(log max_degree) positive tests during
        # negative sampling: per-user sorted item lists + row pointers.
        # (An int64 u*n_items+i encoding would silently truncate to int32
        # under jax's default x64-off config and overflow past 2^31 cells.)
        mat0 = data.interaction_mat.copy()
        mat0.sort_indices()  # items sorted within each row (binary search)
        self.csr_indptr = jnp.asarray(mat0.indptr.astype(np.int32))
        self.csr_items = jnp.asarray(mat0.indices.astype(np.int32))

        # Per-user positives as a padded [n_users, max_deg] table (eval
        # masking + tests). Skipped above POS_TABLE_MAX_ELEMENTS — power-law
        # degree distributions make it O(n_users · max_degree); evaluation
        # then builds per-block tables from the host CSR instead.
        mat = data.interaction_mat
        degs = np.diff(mat.indptr)
        self.max_degree = int(degs.max()) if len(degs) else 0
        self.has_pos_table = (
            self.n_users * max(1, self.max_degree) <= POS_TABLE_MAX_ELEMENTS
        )
        if self.has_pos_table:
            # vectorized CSR → padded-table scatter: each nonzero lands at
            # (its row, its rank within the row). A per-user Python loop here
            # was a multi-minute wall at web-scale user counts (VERDICT-r2
            # weak #5); this is O(nnz) numpy.
            pos = np.full((self.n_users, max(1, self.max_degree)), -1, dtype=np.int32)
            rows = np.repeat(np.arange(self.n_users, dtype=np.int64), degs)
            offs = np.arange(mat.nnz, dtype=np.int64) - np.repeat(
                mat.indptr[:-1].astype(np.int64), degs
            )
            pos[rows, offs] = mat.indices
            self.user_positives = jnp.asarray(pos)  # i32[n_users, max_deg]
        else:
            self.user_positives = jnp.full((1, 1), -1, jnp.int32)
        self.user_degrees = jnp.asarray(degs.astype(np.int32))

        # Precomputed guaranteed negatives per user (host-side, random among
        # the user's non-positives): the branch-free redraw sampler falls
        # back to one of these when ALL its candidates collide — probability
        # density_u^k, non-negligible for near-saturated users — so it never
        # emits a positive as a negative, matching the reference's rejection
        # loop (`ncl.py:104-112`) at the cost of a [B] gather. F columns,
        # rotated randomly per draw, so a dense user's collisions don't
        # repeatedly down-rank one fixed item (a single fallback measurably
        # biased ranking on dense graphs). Saturated users (every item
        # positive) get item 0; no true negative exists for them.
        F = FALLBACK_NEGATIVES
        fb_rng = np.random.default_rng(0xFA11BACC % (2**32))
        fallback = np.zeros((self.n_users, F), dtype=np.int32)
        indptr0, indices0 = mat0.indptr, mat0.indices  # sorted rows
        # Vectorized rejection over ALL (user, slot) cells at once (the old
        # per-user while-loop was O(n_users·F) Python — VERDICT-r2 weak #5):
        # membership tests are one searchsorted into the flat int64-keyed CSR
        # (row-major + sorted indices ⇒ keys are globally sorted).
        keys = (
            np.repeat(np.arange(self.n_users, dtype=np.int64), degs) * self.n_items
            + indices0.astype(np.int64)
        )
        open_users = degs < self.n_items  # saturated users keep item 0
        pending = np.broadcast_to(open_users[:, None], (self.n_users, F)).copy()
        for _ in range(64):  # P(all collide) shrinks as density^round
            uu, ff = np.nonzero(pending)
            if len(uu) == 0:
                break
            cand = fb_rng.integers(0, self.n_items, size=len(uu))
            k = uu.astype(np.int64) * self.n_items + cand
            j = np.searchsorted(keys, k)
            miss = (j >= len(keys)) | (keys[np.minimum(j, len(keys) - 1)] != k)
            fallback[uu[miss], ff[miss]] = cand[miss]
            pending[uu[miss], ff[miss]] = False
        if pending.any():
            # near-saturated stragglers: draw the t-th NON-positive directly
            # by rank inversion (row[p] has row[p]-p non-positives below it)
            uu, ff = np.nonzero(pending)
            for u in np.unique(uu):
                row = indices0[indptr0[u]:indptr0[u + 1]].astype(np.int64)
                sel = ff[uu == u]
                t = fb_rng.integers(0, self.n_items - len(row), size=len(sel))
                p = np.searchsorted(row - np.arange(len(row)), t, side="right")
                fallback[u, sel] = (t + p).astype(np.int32)
        self.user_fallback_neg = jnp.asarray(fallback)

        # Packed membership bitmap [n_users, ceil(n_items/32)] u32: the fast
        # positive-test for negative sampling. One contiguous row gather of
        # W = ceil(n_items/32) words replaces the [B, max_degree] positives
        # gather — on power-law graphs max_degree ≫ n_items/32 (ML-100K
        # shape: 970 vs 53 columns, 18× less HBM traffic/step; measured
        # on-TPU). Built only when it actually wins (W < max_degree) and
        # fits the same element cap as the padded table.
        self._W = -(-self.n_items // 32)
        self.has_pos_bitmap = self.n_users * self._W <= POS_TABLE_MAX_ELEMENTS and (
            not self.has_pos_table or self._W < self.max_degree
        )
        if self.has_pos_bitmap:
            rows64 = np.repeat(np.arange(self.n_users, dtype=np.int64), degs)
            cols = mat.indices.astype(np.int64)
            bm_flat = np.zeros(self.n_users * self._W, dtype=np.uint32)
            np.bitwise_or.at(
                bm_flat,
                rows64 * self._W + (cols >> 5),
                (np.uint32(1) << (cols & 31).astype(np.uint32)),
            )
            self.user_pos_bitmap = jnp.asarray(
                bm_flat.view(np.int32).reshape(self.n_users, self._W)
            )
        else:
            self.user_pos_bitmap = jnp.zeros((1, 1), jnp.int32)

        # Bitmap + fallback FUSED row table [n_users, W + n_fb]: the
        # epoch-scale sampler (`sampling.sample_negatives_epoch`) gathers ONE
        # row per example covering both the membership words and the
        # guaranteed-negative candidates. A separate scalar fallback gather
        # measured 21.7 us/step — 2/3 of the whole sampling budget — while a
        # fused row gather is ~1 us/step (tools/probe_sampler.py, round 4).
        if self.has_pos_bitmap:
            fb = np.concatenate(
                [
                    np.asarray(self.user_pos_bitmap),
                    np.asarray(self.user_fallback_neg, dtype=np.int32),
                ],
                axis=1,
            )
            # pad the row to a multiple of 64 f32 words: rows narrower than
            # 64 words gather on a ~2x slower TPU path (round-3 probe A —
            # the same cliff that gates bf16 packing in graph/bucketed.py)
            wtot = fb.shape[1]
            pad = (-wtot) % 64
            if pad and self.n_users * (wtot + pad) <= POS_TABLE_MAX_ELEMENTS:
                fb = np.pad(fb, ((0, 0), (0, pad)))
            self.user_bitmap_fb = jnp.asarray(fb)
        else:
            self.user_bitmap_fb = jnp.zeros((1, 1), jnp.int32)

        # Edge-order membership rows [n_edge_rows, wtot] (round 5): the
        # fused-epoch sampler draws each epoch's negatives in STATIC edge
        # order (one per edge — an epoch is a permutation of edges) and lets
        # them ride the shuffle's single row gather
        # (`sampling.epoch_batches`). Pre-gathering the rows by edge turns
        # the per-epoch [N, wtot] random row gather (~12 us/step at the
        # headline shape, tools/probe_machinery.py) into a contiguous scan.
        self.has_edge_bitmap_fb = False
        self.edge_bitmap_fb = jnp.zeros((1, 1), jnp.int32)
        if self.has_pos_bitmap:
            fb_np = np.asarray(self.user_bitmap_fb)
            eu_np = np.asarray(self.edge_users)
            if eu_np.shape[0] * fb_np.shape[1] <= POS_TABLE_MAX_ELEMENTS:
                self.edge_bitmap_fb = jnp.asarray(fb_np[eu_np])
                self.has_edge_bitmap_fb = True

        # Dense int8 membership mask [n_users, n_items]: positive-test for
        # the mid-size envelope where the padded table is over cap but the
        # dense mask still fits (mask cap DENSE_MAX_ELEMENTS > table cap
        # POS_TABLE_MAX_ELEMENTS).
        self.has_pos_mask = self.n_users * self.n_items <= DENSE_MAX_ELEMENTS
        if self.has_pos_mask:
            self.user_pos_mask = jnp.asarray(
                (data.interaction_mat != 0).toarray().astype(np.int8)
            )
        else:
            self.user_pos_mask = jnp.zeros((1, 1), jnp.int8)

        # Structure-only bucketed templates over the STATIC bipartite COO
        # pattern (rows = [u; i+U], cols = [i+U; u]) so on-device
        # re-normalization under an edge keep-mask (`normalized_bipartite`)
        # can refresh values into gather-only pull tables without any host
        # work — augmentation stays jit-stable on the bucketed backend.
        self._bipartite_pull_tpl = None
        self._bipartite_pull_t_tpl = None
        if self.backend == "bucketed":
            from recommendation_tpu.graph.bucketed import build_bucketed, mirrored_transpose

            bi_rows = np.concatenate([users, items + self.n_users])
            bi_cols = np.concatenate([items + self.n_users, users])
            eids = np.arange(2 * e_pad, dtype=np.int32)
            self._bipartite_pull_tpl = build_bucketed(
                bi_rows, bi_cols, None, self.n_nodes, self.n_nodes, edge_ids=eids
            )
            # the pattern is symmetric and the layout is an exact mirror
            # (second half swaps the first), so Aᵀ's tables are the forward's
            # with the slot→edge map flipped by e_pad — no second host build
            self._bipartite_pull_t_tpl = mirrored_transpose(
                self._bipartite_pull_tpl, e_pad
            )

        # Dense sym-normalized interaction block R̂ = D_u^-1/2 R D_i^-1/2 for
        # the bipartite-block propagation path: the square adjacency is
        # block-anti-diagonal (A = [[0, R̂], [R̂ᵀ, 0]]), so Â @ [U; I] =
        # [R̂ @ I; R̂ᵀ @ U] — two rectangular matmuls with (U·I)/(U+I)² ≈ 4×
        # fewer elements touched than the square dense path.
        self.interaction_norm_dense = None
        if self.backend == "dense":
            deg_u = np.asarray(data.interaction_mat.sum(axis=1)).flatten()
            deg_i = np.asarray(data.interaction_mat.sum(axis=0)).flatten()
            du = np.where(deg_u > 0, deg_u ** -0.5, 0.0).astype(np.float32)
            di = np.where(deg_i > 0, deg_i ** -0.5, 0.0).astype(np.float32)
            r_hat = data.interaction_mat.multiply(du[:, None]).multiply(di[None, :])
            self.interaction_norm_dense = jnp.asarray(
                np.asarray(r_hat.todense(), dtype=np.float32)
            )

        # lazily-built slot maps for the scatter-free bucketed GAT VJP
        # (`ensure_gat_aux`) — a pytree child, NOT model state, so the O(E)
        # static index data never lands in checkpoints
        self.gat_aux = None

    def ensure_gat_aux(self):
        """Host-side one-shot slot maps for the scatter-free bucketed GAT
        attention VJP (`models/gat.py::_attention_pull`): edge→forward-slot
        and slot→node maps over ``norm_adj.pull``. Cached on the graph; call
        OUTSIDE jit (GAT.init does). No-op on non-bucketed backends."""
        if (
            self.gat_aux is None
            and self.backend == "bucketed"
            and self.norm_adj.pull is not None
            and self.norm_adj.pull_t is not None
        ):
            from recommendation_tpu.graph.bucketed import slot_maps

            pos_map, slot_node, node_of_row = slot_maps(self.norm_adj.pull, self.n_nodes)
            # Per-transpose-bucket FORWARD-slot positions, prebuilt on host
            # (round 5): the backward previously computed them per step as
            # pos_map[bt.edge] — a per-slot narrow gather (~10 ns/slot class)
            # over a quantity that is fully static. Dead slots point at 0;
            # every consumer masks them via _real_slots.
            pm = np.asarray(pos_map)
            tpos = tuple(
                jnp.asarray(
                    pm[np.maximum(np.asarray(bt.edge), 0)].astype(np.int32)
                )
                for bt in self.norm_adj.pull_t.buckets
            )
            self.gat_aux = {
                "pos_map": pos_map,
                "slot_node": slot_node,
                "node_of_row": node_of_row,
                "tpos": tpos,
            }
        return self.gat_aux

    # -- pytree protocol (so a DeviceGraph can be a jit argument) -------------

    _DATA_FIELDS = (
        "edge_users", "edge_items", "edge_valid", "edge_ui",
        "norm_adj", "norm_adj_selfloops", "interaction_norm_dense",
        "user_positives", "user_degrees", "csr_indptr", "csr_items",
        "user_pos_mask", "user_pos_bitmap", "user_fallback_neg", "user_bitmap_fb",
        "edge_bitmap_fb",
        "_bipartite_pull_tpl", "_bipartite_pull_t_tpl",
        "gat_aux",
    )
    _META_FIELDS = (
        "n_users", "n_items", "n_nodes", "n_edges", "max_degree", "backend",
        "compute_dtype", "has_pos_table", "has_pos_mask", "has_pos_bitmap",
        "has_edge_bitmap_fb", "_W",
    )

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._DATA_FIELDS)
        meta = tuple(getattr(self, f) for f in self._META_FIELDS)
        return children, meta

    @classmethod
    def tree_unflatten(cls, meta, children):
        obj = object.__new__(cls)
        for f, v in zip(cls._DATA_FIELDS, children):
            setattr(obj, f, v)
        for f, v in zip(cls._META_FIELDS, meta):
            setattr(obj, f, v)
        return obj

    # -- on-device normalized adjacency under an edge keep-mask ---------------

    def normalized_bipartite(self, keep_mask: Optional[jnp.ndarray] = None) -> DeviceAdj:
        """Build D^-1/2 (A∘mask) D^-1/2 for the bipartite graph, on device.

        ``keep_mask`` is f32[E_pad] in {0,1} over the *interaction* edges; both
        directions of a kept edge survive (matching scipy-side dropout +
        renormalize in the reference augmentors)."""
        mask = self.edge_valid if keep_mask is None else self.edge_valid * keep_mask
        u_nodes = self.edge_users
        i_nodes = self.edge_items + self.n_users
        deg = jnp.zeros(self.n_nodes, dtype=jnp.float32)
        deg = deg.at[u_nodes].add(mask)
        deg = deg.at[i_nodes].add(mask)
        inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        vals = mask * inv_sqrt[u_nodes] * inv_sqrt[i_nodes]

        rows = jnp.concatenate([u_nodes, i_nodes])
        cols = jnp.concatenate([i_nodes, u_nodes])
        both_vals = jnp.concatenate([vals, vals])
        dense = None
        if self.backend == "dense":
            dense = (
                jnp.zeros((self.n_nodes, self.n_nodes), dtype=jnp.float32)
                .at[rows, cols]
                .add(both_vals)
            )
        pull = pull_t = None
        if self._bipartite_pull_tpl is not None:
            from recommendation_tpu.graph.bucketed import refresh_vals

            pull = refresh_vals(self._bipartite_pull_tpl, both_vals)
            pull_t = refresh_vals(self._bipartite_pull_t_tpl, both_vals)
        return DeviceAdj(
            rows=rows,
            cols=cols,
            vals=both_vals,
            dense=dense,
            n_rows=self.n_nodes,
            n_cols=self.n_nodes,
            backend=self.backend,
            compute_dtype=self.compute_dtype,
            pull=pull,
            pull_t=pull_t,
            # the mirrored transpose template shares gather_pos by
            # construction, so the permuted-space chain stays available
            # under augmentation
            sym_rowspace=pull is not None,
        )
