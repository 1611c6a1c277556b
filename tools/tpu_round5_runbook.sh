#!/bin/bash
# Round-5 TPU measurement runbook — the per-round checks VERDICT-r4 asked
# for, sequential (ONE TPU process at a time). Outputs land in
# results/round5/ (gitignored); the committed record is BASELINE.md round-5.
#
# Per-round rot guards (run every round, cheap):
#   prop_ab   — Mosaic compile+value smoke of every opt-in Pallas chain
#               variant (bf16 / f32 / dense_chain_mean_layer) + the
#               both-orders XLA-vs-Pallas headline A/B (VERDICT-r4 #7).
#   bench_*   — the driver metrics at HEAD.
# Round-5 evidence runs:
#   quality   — learning quality at the 50k×100k×1M shape, clustered fixture
#               (+ `--fixture flat` control) (VERDICT-r4 #4).
#   serve     — p50/p95/p99 + QPS at 1/8/60 clients (VERDICT-r4 #6).
#   gat_scale — GAT fwd+bwd/fwd ratio at the Gowalla shape (VERDICT-r4 #3).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=results/round5
mkdir -p $OUT

run() {  # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $OUT/runbook.log
  timeout "$t" "$@" >$OUT/$name.log 2>&1
  local rc=$?
  echo "--- $name rc=$rc" | tee -a $OUT/runbook.log
  tail -5 $OUT/$name.log
}

run 240  smoke         python -c "import jax,time; t=time.time(); print(jax.devices()); import jax.numpy as jnp; x=jnp.ones((1024,1024),jnp.bfloat16); print(float((x@x).sum()), f'{time.time()-t:.0f}s')"
run 1200 prop_ab       python tools/ab_prop_kernel.py
run 600  bench_quick   python bench.py --quick --skip-baseline
run 1200 bench_large   python bench.py --large --skip-baseline --quick
run 2400 quality       python tools/quality_at_scale.py
run 900  serve         python tools/serve_latency_bench.py
run 1200 gat_scale     python tools/gat_scale_bench.py
echo "runbook done $(date)" | tee -a $OUT/runbook.log
