"""Adaptive-density-control demo on the real TPU: grow a sparse scene.

Starts from a 20k-Gaussian init inside a 60k-slot capacity, fits 3 orbit
views at 128x128 with per-group learning rates, densifying every 15 steps —
demonstrates the full trainable-renderer loop (render -> grad -> ADC) on
device.

Run:  timeout 7200 python benchmarks/adc_demo.py > /tmp/adc_demo.log 2>&1
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    from sage3d_tpu.parallel.trainer import (AdaptiveConfig, TrainerConfig,
                                             fit_scene_adaptive,
                                             make_orbit_targets)
    from sage3d_tpu.renderer.scene import synthetic_room

    gt = synthetic_room(60_000, seed=3)
    cameras, targets = make_orbit_targets(gt, n_views=3, radius=5.0,
                                          width=128, height=128,
                                          backend="xla")
    targets = jax.block_until_ready(targets)
    init = synthetic_room(20_000, seed=9)

    t0 = time.time()
    fitted, history = fit_scene_adaptive(
        init, cameras, targets,
        TrainerConfig(steps=60, group_lrs=True, scene_extent=8.0,
                      log_every=15, backend="pallas",
                      pair_capacity=1 << 18, tile_capacity=8192),
        AdaptiveConfig(densify_every=15, grad_threshold=1e-6,
                       max_new_fraction=0.2),
        capacity=60_000, verbose=True)
    wall = time.time() - t0
    rounds = [h for h in history if "n_alive" in h]
    print(json.dumps({
        "init_gaussians": 20_000, "capacity": 60_000,
        "final_alive": rounds[-1]["n_alive"] if rounds else None,
        "psnr_first": history[0]["psnr"], "psnr_last": history[-1]["psnr"],
        "steps": 60, "wall_s": round(wall, 1),
        "densify_rounds": len(rounds)}))


if __name__ == "__main__":
    main()
