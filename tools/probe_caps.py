"""Micro-probe: bucket-cap schedule vs padded-slot count vs pull time at the
1M-edge bench shape.

The pull is issue-bound per slot, so padded slots are pure waste: the
default schedule (MIN_CAP=4, CAP_STEP=4, pow2 above 128) pads 2.0M directed
edges to ~2.40M slots (+20%). Candidates tighten the low-degree end (where
most rows live on a uniform-random graph) at the cost of more buckets.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_caps.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import recommendation_tpu.graph.bucketed as B
from recommendation_tpu.data.synthetic import make_flat_interactions

N_USERS, N_ITEMS, N_EDGES, EMB = 50_000, 100_000, 1_000_000, 64
N_SHORT, N_LONG = 8, 24


def main():
    # force the numpy builder: the native C++ path has the cap schedule
    # compiled in and ignores the monkeypatched constants
    import recommendation_tpu.native as native_mod

    native_mod.get_lib = lambda: None

    pairs = make_flat_interactions(N_USERS, N_ITEMS, N_EDGES, seed=3)
    import scipy.sparse as sp

    from recommendation_tpu.data.interaction import normalize_graph_mat

    n = N_USERS + N_ITEMS
    r = sp.coo_matrix(
        (np.ones(len(pairs), np.float32), (pairs[:, 0], pairs[:, 1] + N_USERS)),
        shape=(n, n),
    )
    a = (r + r.T).tocsr()
    mat = normalize_graph_mat(a)
    coo = sp.coo_matrix(mat, dtype=np.float32)

    def mixed_caps(deg, minimum):
        # multiples of 4 up to 32, multiples of 8 to 128, pow2 beyond
        d = np.maximum(deg, minimum)
        c4 = (np.ceil(d / 4) * 4).astype(np.int64)
        c8 = (np.ceil(d / 8) * 8).astype(np.int64)
        pow2 = (2 ** np.ceil(np.log2(np.maximum(d, 1)))).astype(np.int64)
        return np.where(d <= 32, c4, np.where(d <= 128, c8, pow2))

    def mixed_caps2(deg, minimum):
        # multiples of 2 up to 16, of 4 to 32, of 8 to 128, pow2 beyond
        d = np.maximum(deg, minimum)
        c2 = (np.ceil(d / 2) * 2).astype(np.int64)
        c4 = (np.ceil(d / 4) * 4).astype(np.int64)
        c8 = (np.ceil(d / 8) * 8).astype(np.int64)
        pow2 = (2 ** np.ceil(np.log2(np.maximum(d, 1)))).astype(np.int64)
        return np.where(d <= 16, c2, np.where(d <= 32, c4, np.where(d <= 128, c8, pow2)))

    orig_cfd = B._cap_for_degree
    for label, min_cap, step, pow2_above, cfd in (
        ("coarse 4/8/128", 4, 8, 128, None),
        ("mixed 4to32/8", 4, 8, 128, mixed_caps),
        ("mixed2 2/4/8", 2, 8, 128, mixed_caps2),
        ("coarse-again", 4, 8, 128, None),
    ):
        B._cap_for_degree = cfd if cfd is not None else orig_cfd
        B.MIN_CAP, B.CAP_STEP, B.CAP_POW2_ABOVE = min_cap, step, pow2_above
        csr = B.build_bucketed(
            coo.row.astype(np.int32), coo.col.astype(np.int32),
            coo.data, n, n, min_cap=min_cap,
        )
        slots = sum(int(b.idx.size) for b in csr.buckets)
        xp = jax.block_until_ready(
            jnp.concatenate([
                jax.random.normal(jax.random.PRNGKey(0), (csr.total_rows, EMB)),
                jnp.zeros((1, EMB)),
            ])
        )

        def make(nsteps):
            @jax.jit
            def fn(x):
                def one(carry, _):
                    xx = x * (1.0 + carry * 1e-20)
                    out = B.pull_rowspace(csr, xx, "float32")
                    return carry + jnp.sum(out[0]) * 1e-20, None
                carry, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=nsteps)
                return carry
            return fn

        times = {}
        for nsteps in (N_SHORT, N_LONG):
            fn = make(nsteps)
            float(fn(xp))
            best = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(xp))
                best.append(time.perf_counter() - t0)
            times[nsteps] = min(best)
        per = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT)
        print(
            f"{label:<18} buckets={len(csr.buckets):3d} slots={slots/1e6:5.2f}M "
            f"(+{100 * (slots / (2 * N_EDGES) - 1):4.1f}%)  pull={per * 1e3:6.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
