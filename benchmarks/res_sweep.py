"""Resolution sweep: fwd and fwd+bwd throughput at 800x800, 1080p and 4K.

4K (3840x2160, 8160 tiles) exceeds the fused int32 key budget and exercises
the two-key binning path plus larger tile grids on the REAL device — the
CPU-interpret stress test covers correctness, this measures it.

Run:  timeout 7200 python benchmarks/res_sweep.py > /tmp/res_sweep.log 2>&1
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

from bench import bench_backend, make_bench_scene_device
from sage3d_tpu.renderer.camera import make_camera
from sage3d_tpu.renderer.render import autotune_all, render


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def fwd_only(scene, camera, budgets, iters=8):
    @jax.jit
    def loop(s, c):
        def body(i, c):
            s2 = s._replace(opacity_logits=s.opacity_logits + c * 0)
            from sage3d_tpu.renderer.render import budget_kwargs
            out = render(s2, camera, backend="pallas",
                         **budget_kwargs(budgets))
            return jnp.sum(out["rgb"]) * 1e-12 + out[
                "overflow"].astype(jnp.float32) * 0
        return jax.lax.fori_loop(0, iters, body, c)

    float(jax.device_get(loop(scene, jnp.float32(0.0))))
    t0 = time.time()
    float(jax.device_get(loop(scene, jnp.float32(0.0))))
    return (time.time() - t0) / iters


def main():
    scene = make_bench_scene_device()
    results = {}
    for name, (w, h) in {"800x800": (800, 800), "1080p": (1920, 1080),
                         "4k": (3840, 2160)}.items():
        cam = make_camera(position=[0.0, -6.0, 1.5],
                          forward=[0.0, 1.0, -0.05], width=w, height=h,
                          focal_mm=14.0)
        # headline-bench capacity policy: tight measured budgets + the packed
        # backward (grad_margin), overflow asserted 0 per row
        budgets = autotune_all(scene, cam, pair_margin=1.05, grad_margin=1.2)
        log(f"{name} budgets: {budgets}")
        dt_f = fwd_only(scene, cam, budgets)
        log(f"{name} fwd: {dt_f*1e3:.1f} ms ({w*h/dt_f/1e6:.2f} Mpix/s)")
        mpix_fb, dt_fb, _ = bench_backend(scene, cam, "pallas", budgets)
        log(f"{name} fwd+bwd: {dt_fb*1e3:.1f} ms ({mpix_fb:.2f} Mpix/s)")
        overflow = int(jax.device_get(jax.jit(
            lambda s: render(s, cam, backend="pallas",
                             **__import__("sage3d_tpu.renderer.render",
                                          fromlist=["budget_kwargs"]
                                          ).budget_kwargs(budgets)
                             )["overflow"])(scene)))
        results[name] = {"fwd_ms": round(dt_f * 1e3, 1),
                         "fwd_mpix_s": round(w * h / dt_f / 1e6, 2),
                         "fwdbwd_ms": round(dt_fb * 1e3, 1),
                         "fwdbwd_mpix_s": round(mpix_fb, 2),
                         "overflow": overflow,
                         "budgets": budgets}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
