#!/bin/bash
# Round-3 TPU measurement runbook — run the moment the tunnel is back.
# Sequential (ONE TPU process at a time), highest-value first in case the
# window is short. Outputs land in results/round3/.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=results/round3
mkdir -p $OUT

run() {  # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $OUT/runbook.log
  timeout "$t" "$@" >$OUT/$name.log 2>&1
  local rc=$?
  echo "--- $name rc=$rc" | tee -a $OUT/runbook.log
  tail -5 $OUT/$name.log
}

run 240  smoke        python -c "import jax,time; t=time.time(); print(jax.devices()); import jax.numpy as jnp; x=jnp.ones((1024,1024),jnp.bfloat16); print(float((x@x).sum()), f'{time.time()-t:.0f}s')"
run 900  ablate       python tools/ablate_step.py
run 900  probe        python tools/probe_gather_ceiling.py
run 900  bench_quick  python bench.py --quick --skip-baseline
run 1200 bench_large  python bench.py --large --skip-baseline --quick
run 1200 gat_scale    python tools/gat_scale_bench.py
echo "runbook done $(date)" | tee -a $OUT/runbook.log
