#!/bin/bash
# Round-4 FINAL device sweep: re-measure every backward-touching benchmark
# against the final round-4 code (scaled-f16 gradient sort as the library
# default). Forward-only rows (rollout, multicam, collision) are untouched
# by the grad-sort work and keep their phase-2 numbers.
#
#   nohup bash benchmarks/r4_final_sweep.sh > /tmp/r4_final.log 2>&1 &
#
# Run from a snapshot (git archive HEAD | tar -x -C /tmp/finaldir +
# .jax_cache symlink) if the working tree is being edited concurrently.
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

run_stage train_bench_f16_default 7200 python benchmarks/train_bench.py

run_stage converge_full_f16_default 7200 python benchmarks/converge_demo.py

run_stage adc_demo 7200 python benchmarks/adc_demo.py

run_stage res_sweep 10800 python benchmarks/res_sweep.py

stage DONE
echo "final sweep attempted"
