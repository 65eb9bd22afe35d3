"""Round-4 headline probe: bf16 gradient sort end-to-end + segreduce precision.

Two questions, one device run (VERDICT r3 next #4/#5):
  1. Does grad_sort_bf16 buy the expected ~20-25 ms at 1080p/1M (the 11-op
     gid sort is the largest backward stage and its cost is proportional to
     payload bytes)? Measured fwd+bwd step time for f32 vs bf16 payloads.
  2. Did the segreduce precision fix (Precision.HIGHEST on the one-hot
     matmul — the MXU's default f32 path truncates inputs to bf16, which was
     the round-3 parity drift) restore grad parity to ~1e-4, and what does
     the bf16 sort's quantization add on top?

Prints one JSON line; also appended by hand into docs/BENCH_AUX_r04.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    from bench import (autotune, bench_backend, make_bench_scene_device,
                       parity_check)
    from sage3d_tpu.renderer.camera import make_camera

    scene = make_bench_scene_device()
    cam1080 = make_camera(position=[0.0, -6.0, 1.5],
                          forward=[0.0, 1.0, -0.05],
                          width=1920, height=1080, focal_mm=14.0)
    budgets = autotune(scene, cam1080)
    print(f"[probe {time.strftime('%H:%M:%S')}] budgets: {budgets}",
          file=sys.stderr, flush=True)

    rows = {}
    for name, bf16 in (("f32_sort", False), ("bf16_sort", True)):
        mpix, dt, compile_s = bench_backend(scene, cam1080, "pallas", budgets,
                                            grad_sort_bf16=bf16)
        rows[name] = {"step_s": round(dt, 4), "mpix_per_s": round(mpix, 2),
                      "compile_s": round(compile_s, 1)}
        print(f"[probe {time.strftime('%H:%M:%S')}] {name}: {dt:.4f}s "
              f"({mpix:.2f} Mpix/s)", file=sys.stderr, flush=True)

    cam800 = make_camera(position=[0.0, -6.0, 1.5], forward=[0.0, 1.0, -0.05],
                         width=800, height=800, focal_mm=14.0)
    budgets800 = autotune(scene, cam800)
    parity = {"800x800_f32": parity_check(scene, cam800, budgets800)}
    print(f"[probe] parity 800 f32: {parity['800x800_f32']}", file=sys.stderr,
          flush=True)
    parity["1080p_f32"] = parity_check(scene, cam1080, budgets)
    print(f"[probe] parity 1080 f32: {parity['1080p_f32']}", file=sys.stderr,
          flush=True)

    print(json.dumps({"headline_probe": rows, "parity": parity,
                      "budgets": budgets}))


if __name__ == "__main__":
    main()
