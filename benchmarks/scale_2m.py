"""Scene-size scale point: 2M Gaussians at 1080p (beyond the fused-key rank
field, so binning automatically uses the two-key sort), fwd and fwd+bwd.

Run:  timeout 7200 python benchmarks/scale_2m.py > /tmp/scale_2m.log 2>&1
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from bench import WIDTH, HEIGHT, bench_backend, make_bench_scene_device
from sage3d_tpu.renderer.camera import make_camera
from sage3d_tpu.renderer.render import autotune_all, render


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    n = 2_000_000
    scene = make_bench_scene_device(n)
    cam = make_camera(position=[0.0, -6.0, 1.5], forward=[0.0, 1.0, -0.05],
                      width=WIDTH, height=HEIGHT, focal_mm=14.0)
    # pair_margin + grad_margin: same honesty policy as the headline bench —
    # tight measured capacities, packed backward, overflow must report 0.
    budgets = autotune_all(scene, cam, pair_margin=1.05, grad_margin=1.2)
    log(f"2M budgets: {budgets}")
    mpix, dt, compile_s = bench_backend(scene, cam, "pallas", budgets)
    overflow = int(jax.device_get(jax.jit(
        lambda s: render(s, cam, backend="pallas",
                         **__import__("sage3d_tpu.renderer.render",
                                      fromlist=["budget_kwargs"]
                                      ).budget_kwargs(budgets)
                         )["overflow"])(scene)))
    log(f"2M fwd+bwd: {dt*1e3:.1f} ms ({mpix:.2f} Mpix/s) overflow={overflow}")
    print(json.dumps({"n_gaussians": n, "fwdbwd_ms": round(dt * 1e3, 1),
                      "fwdbwd_mpix_s": round(mpix, 2), "overflow": overflow,
                      "binning_path": "two-key (n > 2^20)",
                      "budgets": budgets}))


if __name__ == "__main__":
    main()
