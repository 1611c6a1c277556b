"""Scaling-efficiency harness (BASELINE.json: examples/s at 1 chip → N).

Measures the jitted training epoch under data-parallel sharding across
1/2/4/8 devices and reports throughput + efficiency vs the 1-device run.
On this image only CPU multi-device simulation is available (one real TPU
chip, no slice), so run it on the CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/scaling_bench.py

CPU-mesh numbers validate the SCALING MACHINERY (sharding, collectives, no
serialization bottlenecks), not absolute TPU throughput; on a real slice the
same script runs unchanged.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def multihost(n_processes: int, local_devices: int):
    """Throughput-scaling run across REAL processes (DCN code path): spawns
    N CPU workers over the hybrid mesh (`parallel/distributed.py`) and
    reports aggregate examples/s vs a 1-process run of the same program.
    On a real pod the same worker runs unchanged per host."""
    import socket
    import subprocess
    import sys as _sys

    def spawn(nproc):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = []
        for pid in range(nproc):
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
            )
            if nproc > 1:
                env.update(
                    JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                    JAX_NUM_PROCESSES=str(nproc),
                    JAX_PROCESS_ID=str(pid),
                )
            procs.append(subprocess.Popen(
                [_sys.executable, __file__, "--worker"]
                + ([] if nproc > 1 else ["--single"]),
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            ))
        outs = [p.communicate(timeout=900)[0].decode() for p in procs]
        for p, o in zip(procs, outs):
            if p.returncode != 0:
                raise RuntimeError(f"worker failed:\n{o}")
        for line in outs[0].splitlines():
            if line.startswith("EXAMPLES_PER_S"):
                return float(line.split()[1])
        raise RuntimeError(f"no throughput line in:\n{outs[0]}")

    base = spawn(1)
    print(f"processes=1 ({local_devices} devices): {base:,.0f} examples/s")
    multi = spawn(n_processes)
    # STRONG scaling of a fixed global workload: ideal = N x the 1-process
    # rate (each process holds 1/N of the batch)
    eff = multi / (base * n_processes)
    print(f"processes={n_processes} ({n_processes * local_devices} devices): "
          f"{multi:,.0f} examples/s  strong-scaling efficiency={eff:.2f}")
    print("(CPU-mesh gloo numbers validate the multi-process MACHINERY, not "
          "DCN bandwidth; the same worker runs per-host on a pod.)")


def _multihost_worker(single: bool):
    import jax

    jax.config.update("jax_platforms", "cpu")
    if not single:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from recommendation_tpu.parallel.distributed import initialize

        initialize()
    import time as _time

    from recommendation_tpu.parallel import distributed as D

    t0 = _time.perf_counter()
    D._worker_train(None)
    dt = _time.perf_counter() - t0
    # _worker_train runs 8 steps over ONE GLOBAL batch of 64 (sharded across
    # every device of every process) — count the global workload once
    ex_s = 8 * 64 / dt
    print(f"EXAMPLES_PER_S {ex_s:.1f}")


def main():
    import jax

    # honor JAX_PLATFORMS even though the axon sitecustomize already consumed
    # it (see .claude/skills/verify/SKILL.md)
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    devices = jax.devices()
    print(f"platform={devices[0].platform} n_devices={len(devices)}")

    from jax.sharding import NamedSharding, PartitionSpec as P

    from recommendation_tpu.config import default_config
    from recommendation_tpu.data.interaction import Interaction
    from recommendation_tpu.data.synthetic import load_or_make_dataset
    from recommendation_tpu.graph.device import DeviceGraph
    from recommendation_tpu.models.lightgcn import LightGCN
    from recommendation_tpu.parallel.mesh import DATA_AXIS, MeshSpec, make_mesh
    from recommendation_tpu.train.loop import make_multi_epoch_fn, make_optimizer

    train, test = load_or_make_dataset()
    data = Interaction(train, test)
    config = default_config(**{"embedding.size": 64, "batch.size": 2048})
    model = LightGCN(config)
    epochs = 3

    results = {}
    n_avail = len(devices)
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]
    for n in sizes:
        graph = DeviceGraph(data, backend="dense")
        mesh = make_mesh(MeshSpec(data=n, model=1), devices[:n])
        rep = NamedSharding(mesh, P())
        # replicate everything over the sub-mesh; the epoch's batch arrays are
        # created inside jit, so GSPMD shards the scan batch dim over `data`
        # following the input shardings
        for field in graph._DATA_FIELDS:
            val = getattr(graph, field)
            setattr(graph, field, jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), val))
        params, state = model.init(jax.random.PRNGKey(0), graph)
        params = jax.device_put(params, rep)
        opt = make_optimizer(config)
        opt_state = opt.init(params)
        run = make_multi_epoch_fn(model, opt, 2048, n_epochs=epochs)
        p, o, s, loss = run(graph, params, opt_state, state, jax.random.PRNGKey(1))
        float(loss[-1])  # compile+warm
        t0 = time.perf_counter()
        p, o, s, loss = run(graph, p, o, s, jax.random.PRNGKey(2))
        float(loss[-1])
        dt = time.perf_counter() - t0
        n_batches = -(-graph.n_edges // 2048)
        ex_s = epochs * n_batches * 2048 / dt
        results[n] = ex_s
        base = results[sizes[0]]
        eff = ex_s / (base * n / sizes[0])
        print(f"devices={n}: {ex_s:,.0f} examples/s  efficiency={eff:.2f}")

    print("\nNOTE: full-graph-propagation-per-batch workloads are compute-"
          "replicated under pure DP (every device propagates the whole graph);"
          " DP speedup applies to the batch-parallel loss/grad terms. True"
          " multi-chip scaling for this workload comes from edge-sharded"
          " propagation + row-sharded tables (ShardedGraphRecommender).")

    # -- part 2: the axis that DOES scale — edge-sharded propagation ----------
    # Each device holds E/N edges, computes a partial segment-sum, and the
    # results combine via the GSPMD-inserted reduction (the SP analog,
    # SURVEY.md §2.5).
    print("\nedge-sharded segment propagation (the SP axis), 1M-edge graph:")
    from recommendation_tpu.data.synthetic import ArrayInteraction, make_flat_interactions
    from recommendation_tpu.ops.spmm import adj_matmul

    pairs = make_flat_interactions(20_000, 40_000, 1_000_000, seed=5)
    big = ArrayInteraction(pairs, 20_000, 40_000)
    results2 = {}
    for n in sizes:
        graph = DeviceGraph(big, backend="segment")
        mesh = make_mesh(MeshSpec(data=n, model=1), devices[:n])
        rep = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P(DATA_AXIS))
        adj = graph.norm_adj
        e = adj.vals.shape[0] - (adj.vals.shape[0] % n)
        adj.rows = jax.device_put(adj.rows[:e], dp)
        adj.cols = jax.device_put(adj.cols[:e], dp)
        adj.vals = jax.device_put(adj.vals[:e], dp)
        x = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(0), (graph.n_nodes, 64)), rep
        )
        prop = jax.jit(lambda a, v: adj_matmul(a, v))
        out = prop(adj, x)
        float(out[0, 0])  # compile+warm
        t0 = time.perf_counter()
        for _ in range(10):
            out = prop(adj, out * 0.01)
        float(out[0, 0])
        dt = time.perf_counter() - t0
        results2[n] = 10 / dt
        base = results2[sizes[0]]
        eff = results2[n] / (base * n / sizes[0])
        print(f"devices={n}: {results2[n]:.1f} props/s  efficiency={eff:.2f}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--multihost", type=int, default=0, metavar="N",
                    help="scaling across N real processes (DCN path)")
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--single", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.worker:
        _multihost_worker(args.single)
    elif args.multihost:
        multihost(args.multihost, args.local_devices)
    else:
        main()
