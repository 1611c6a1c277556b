"""Kernel-level probes of the TPU gather ceiling (VERDICT-r2 item 2).

The bucketed backend is gather-bound at ~2.7 ns/slot (round-2 plateau across
every XLA formulation). This tool answers the question that decides where
the remaining headroom lives:

  A. Is the plateau BANDWIDTH-bound or ISSUE-bound?  Measure XLA gather
     ns/slot vs row width d ∈ {16..256} f32. Linear in d ⇒ bandwidth-bound
     (the bf16-pair packing is a ~2× win); flat ⇒ issue-bound (packing is
     free but useless; only locality/slot-count reductions help).
  B. Packed bf16-pair pull vs f32 pull at the bench shape (end-to-end).
  C. Pallas row-DMA gather: per-row `make_async_copy` issue rate — the only
     Mosaic-expressible alternative to XLA's gather (dynamic_gather crashes,
     round-2 probes). If the descriptor rate × row bytes ≪ the XLA gather's
     effective bandwidth, a hand kernel CANNOT beat XLA on this toolchain
     and the ceiling claim is proven at kernel level.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_gather_ceiling.py
Each timing is a lax.scan inside ONE jitted program (tunnel RTT ~70-80 ms),
fenced by host transfer.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 1_500_000  # table rows (≈ Gowalla-scale node count)
N_SLOTS = 2_000_000  # gathered rows per pass (≈ padded slots at 1M edges)
STEPS = 16


def _timed(fn, *args, steps=STEPS, label=""):
    """fn MUST return a scalar (reduced inside its jit): the remote tunnel
    downloads outputs at ~10-25 MB/s, so fencing on array outputs measures
    the TUNNEL, not the device (the round-3 v1 numbers did exactly that)."""
    out = fn(*args)
    assert np.asarray(out).size == 1, "probe fns must reduce to a scalar in-jit"
    float(out)
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best.append((time.perf_counter() - t0) / steps)
    t = min(best)
    print(f"{label:<34} {t * 1e3:9.2f} ms/pass", flush=True)
    return t


def probe_a_width_scaling():
    print("== A: gather ns/slot vs row width (f32) ==", flush=True)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, N_ROWS, N_SLOTS).astype(np.int32)
    )
    results = {}
    for d in (16, 32, 64, 128, 256):
        x = jnp.ones((N_ROWS, d), jnp.float32)

        @jax.jit
        def run(x, idx):
            def step(c, _):
                g = x[idx]  # [S, d]
                return c + jnp.sum(g, axis=0), None

            c, _ = jax.lax.scan(step, jnp.zeros((d,), jnp.float32), None, length=STEPS)
            return jnp.sum(c)

        t = _timed(run, x, idx, label=f"  d={d:<4} ({4 * d} B/row)")
        ns_slot = t / N_SLOTS * 1e9
        gbps = 4 * d * N_SLOTS / t / 1e9
        results[d] = (ns_slot, gbps)
        print(f"    -> {ns_slot:6.2f} ns/slot, effective {gbps:7.1f} GB/s", flush=True)
    return results


def probe_b_packed_pull():
    print("== B: f32 pull vs bf16-pair packed pull (bench shape) ==", flush=True)
    import scipy.sparse as sp

    from recommendation_tpu.graph.device import from_scipy

    rng = np.random.default_rng(1)
    n, e, d = 150_000, 1_000_000, 64
    rows = rng.integers(0, n, e)
    cols = rng.integers(0, n, e)
    mat = sp.csr_matrix(
        (np.ones(e, np.float32), (rows, cols)), shape=(n, n)
    )
    adj = from_scipy(mat, backend="bucketed")
    from recommendation_tpu.graph.bucketed import pull

    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    for mode in ("float32", "bfloat16", "int8"):

        @jax.jit
        def run(x, mode=mode):
            def step(c, _):
                return c * 0.999 + pull(adj.pull, c, mode), None

            c, _ = jax.lax.scan(step, x, None, length=STEPS)
            return jnp.sum(c)

        _timed(run, x, label=f"  pull compute_dtype={mode}")


def probe_c_pallas_dma_gather():
    print("== C: Pallas per-row DMA gather (descriptor issue rate) ==", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # d=128: Mosaic requires HBM row slices 128-aligned on the lane dim
    # (d=64 fails to compile: "Slice shape along dimension 1 must be aligned
    # to tiling (128)"). The probe's question — per-row DMA descriptor issue
    # rate — is width-independent below the bandwidth bound, so measure at
    # the expressible width and scale.
    d = 128
    chunk = 4096  # rows gathered per kernel instance
    # row i carries value i so a misrouted DMA is detectable
    x = jnp.broadcast_to(
        jnp.arange(N_ROWS, dtype=jnp.float32)[:, None], (N_ROWS, d)
    ).copy()
    idx = jnp.asarray(
        np.random.default_rng(2).integers(0, N_ROWS, chunk).astype(np.int32)
    )
    DEPTH = 8  # in-flight DMAs — measures pipelined issue rate, not latency

    def kernel(idx_ref, x_hbm, out_ref):
        def body(sems):
            def dma_for(i, slot):
                return pltpu.make_async_copy(
                    x_hbm.at[idx_ref[i]], out_ref.at[i], sems.at[slot]
                )

            for i in range(DEPTH):
                dma_for(i, i % DEPTH).start()

            def loop(i, _):
                dma_for(i, i % DEPTH).wait()

                @pl.when(i + DEPTH < chunk)
                def _():
                    dma_for(i + DEPTH, (i + DEPTH) % DEPTH).start()

                return _

            jax.lax.fori_loop(0, chunk, loop, None)

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((DEPTH,)))

    try:
        from jax.experimental.pallas.tpu import PrefetchScalarGridSpec  # noqa: F401

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        gathered = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((chunk, d), jnp.float32),
            grid_spec=grid_spec,
        )

        @jax.jit
        def run(idx, x):
            def step(c, _):
                g = gathered(idx, x)
                return c + jnp.sum(g, axis=0), None

            c, _ = jax.lax.scan(
                step, jnp.zeros((d,), jnp.float32), None, length=STEPS
            )
            return jnp.sum(c)

        t = _timed(run, idx, x, label=f"  DMA gather ({chunk} rows/pass)")
        per_row = t / chunk * 1e9
        print(
            f"    -> {per_row:7.1f} ns/row issue+wait, "
            f"{4 * d * chunk / t / 1e9:6.2f} GB/s",
            flush=True,
        )
        # correctness spot check — row values are row ids, so any misrouted
        # or dropped DMA shows up
        got = np.asarray(gathered(idx, x))
        assert np.array_equal(got[:, 0], np.asarray(idx).astype(np.float32)), (
            "DMA gather wrong"
        )
    except Exception as exc:  # toolchain limitation IS the result
        print(f"    -> UNAVAILABLE: {type(exc).__name__}: {exc}", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    probe_a_width_scaling()
    probe_b_packed_pull()
    probe_c_pallas_dma_gather()
