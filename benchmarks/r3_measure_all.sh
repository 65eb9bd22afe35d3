#!/bin/bash
# Round-3 measurement sweep on the real TPU. Runs every pending benchmark in
# ONE sequence so fresh compiles (30s-18min each through the tunnel) land in
# the persistent cache (.jax_cache) before the driver's end-of-round bench.
#
#   nohup bash benchmarks/r3_measure_all.sh > /tmp/r3_measure.log 2>&1 &
#
# Stages print flushed banners; each tolerates failure and moves on. Before
# each stage the device is probed with a hard deadline — PJRT init of the
# axon plugin blocks forever when the tunnel is down, so without the probe a
# dead tunnel would burn every stage's full timeout.
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

run_stage verify_drive 7200 python benchmarks/verify_drive.py

# bench.py FIRST after verify: the driver re-runs it at end of round — its
# programs must be in .jax_cache even if the tunnel dies again mid-sweep.
run_stage bench_headline 10800 python bench.py

run_stage segreduce_probe 7200 python benchmarks/segreduce_probe.py

run_stage stage_profile 7200 python benchmarks/stage_profile.py

run_stage rollout_bench 10800 python benchmarks/rollout_bench.py

run_stage shardmap_overhead 7200 python benchmarks/shardmap_overhead.py

run_stage memory_audit 7200 python benchmarks/memory_audit.py

run_stage multicam_bench 10800 python benchmarks/multicam_bench.py

run_stage res_sweep 10800 python benchmarks/res_sweep.py

run_stage converge_demo 10800 python benchmarks/converge_demo.py

stage DONE
echo "all stages attempted"
