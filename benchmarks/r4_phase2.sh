#!/bin/bash
# Round-4 phase-2 device run: measure the ROUND-4 code (segreduce precision
# fix, 3-tier emission autotune, bf16-sort probe, pruned collision, lax.map
# batching) after the phase-1 sweep banked the round-3-code numbers.
#
#   nohup bash benchmarks/r4_phase2.sh > /tmp/r4_phase2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

stage() { echo; echo "===== [$(date +%H:%M:%S)] STAGE: $* ====="; }

probe() {
  timeout 300 python -c "import jax; print('probe:', jax.devices()[0])" 2>&1
}

run_stage() {
  local name="$1" t="$2"; shift 2
  stage "$name"
  if ! probe; then
    echo "[$name] SKIPPED: device probe failed (tunnel down)"
    return 1
  fi
  timeout "$t" "$@" 2>&1
}

run_stage verify_drive 7200 python benchmarks/verify_drive.py

run_stage headline_probe 10800 python benchmarks/r4_headline_probe.py

run_stage stage_profile 7200 python benchmarks/stage_profile.py

run_stage rollout_bench 10800 python benchmarks/rollout_bench.py

run_stage multicam_bench 10800 python benchmarks/multicam_bench.py

stage DONE
echo "phase 2 attempted"
