#!/bin/bash
# Round-3 measurement sweep on the real TPU. Runs every pending benchmark in
# ONE sequence so fresh compiles (30s-18min each through the tunnel) land in
# the persistent cache (.jax_cache) before the driver's end-of-round bench.
#
#   nohup bash benchmarks/r3_measure_all.sh > /tmp/r3_measure.log 2>&1 &
#
# Stages print flushed banners; each tolerates failure and moves on.
set -u
cd "$(dirname "$0")/.."

stage() { echo; echo "===== [$(date +%H:%M:%S)] STAGE: $* ====="; }

stage verify_drive
timeout 7200 python benchmarks/verify_drive.py 2>&1

# bench.py FIRST after verify: the driver re-runs it at end of round — its
# programs must be in .jax_cache even if the tunnel dies again mid-sweep.
stage bench_headline
timeout 10800 python bench.py 2>&1

stage segreduce_probe
timeout 7200 python benchmarks/segreduce_probe.py 2>&1

stage stage_profile
timeout 7200 python benchmarks/stage_profile.py 2>&1

stage rollout_bench
timeout 10800 python benchmarks/rollout_bench.py 2>&1

stage shardmap_overhead
timeout 7200 python benchmarks/shardmap_overhead.py 2>&1

stage memory_audit
timeout 7200 python benchmarks/memory_audit.py 2>&1

stage res_sweep
timeout 10800 python benchmarks/res_sweep.py 2>&1

stage converge_demo
timeout 10800 python benchmarks/converge_demo.py 2>&1

stage DONE
echo "all stages attempted"
