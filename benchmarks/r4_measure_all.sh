#!/bin/bash
# Round-4 measurement sweep on the real TPU (VERDICT r3 #1: replace every
# carried-forward round-2 number). Stage order banks the most valuable
# unmeasured rows FIRST in case the tunnel dies mid-sweep:
#   rollout (+LOD, chained collision), stage profile, trainer evidence
#   (train/adc/converge — VERDICT #7), multicam, res sweep, memory, shardmap.
#
#   nohup bash benchmarks/r4_measure_all.sh > /tmp/r4_measure.log 2>&1 &
#
# Each stage probes the device first — PJRT init of the axon plugin blocks
# forever when the tunnel is down, so a dead tunnel would otherwise burn every
# stage's full timeout.
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

run_stage rollout_bench 10800 python benchmarks/rollout_bench.py

run_stage stage_profile 7200 python benchmarks/stage_profile.py

run_stage train_bench 10800 python benchmarks/train_bench.py

run_stage adc_demo 10800 python benchmarks/adc_demo.py

run_stage converge_demo 10800 python benchmarks/converge_demo.py

run_stage multicam_bench 10800 python benchmarks/multicam_bench.py

run_stage res_sweep 10800 python benchmarks/res_sweep.py

run_stage memory_audit 7200 python benchmarks/memory_audit.py

run_stage shardmap_overhead 7200 python benchmarks/shardmap_overhead.py

run_stage segreduce_probe 7200 python benchmarks/segreduce_probe.py

stage DONE
echo "all stages attempted"
