#!/bin/bash
# Round-5 measurement sweep on the real TPU. Folds in EVERY row so nothing
# falls out of the sweep again (VERDICT r4 #3): the two previously-stale rows
# (scale_2m, serve_bench) are stages here, plus the round-5 additions
# (e2e closed-loop batch, ADC flagship, multicam fwd+bwd, vmap fwd probe).
# Stage order banks the most valuable rows first in case the tunnel dies.
#
#   nohup bash benchmarks/r5_measure_all.sh > /tmp/r5_measure.log 2>&1 &
#
set -u
cd "$(dirname "$0")/.."

stage() { echo; echo "===== [$(date +%H:%M:%S)] STAGE: $* ====="; }

probe() {
  timeout 300 python -c "import jax; print('probe:', jax.devices()[0])" 2>&1
}

run_stage() {  # run_stage <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  stage "$name"
  if ! probe; then
    echo "[$name] SKIPPED: device probe failed (tunnel down)"
    return 1
  fi
  timeout "$t" "$@" 2>&1
}

run_stage headline_bench 3600 python bench.py

run_stage e2e_benchmark 3600 python benchmarks/e2e_benchmark.py

run_stage scale_2m 7200 python benchmarks/scale_2m.py

run_stage serve_bench 3600 python benchmarks/serve_bench.py

run_stage multicam_bench 10800 python benchmarks/multicam_bench.py

run_stage adc_flagship 10800 python benchmarks/adc_flagship.py

run_stage vmap_fwd_probe 7200 python benchmarks/vmap_fwd_probe.py

run_stage gather_width_probe 7200 python benchmarks/gather_width_probe.py

run_stage rollout_bench 10800 python benchmarks/rollout_bench.py

run_stage env_latency 3600 python benchmarks/env_latency.py

stage DONE
echo "round-5 sweep attempted"
