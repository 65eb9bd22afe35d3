"""ADC at flagship scale (VERDICT r4 #8): densify-from-sparse on the device.

One adaptive-density-control fit that starts from a sparse init (160k live
Gaussians) inside a 1M-slot capacity and grows through >=512k live Gaussians,
fitting 4 orbit views of a 1M-Gaussian ground-truth room at 256x256 — the
regime real InteriorGS training would exercise (SURVEY.md section 7.2 step 8).
Records the PSNR-vs-step curve, the live-count growth per densify round, and
peak HBM from the device's memory stats.

Run:  timeout 10800 python benchmarks/adc_flagship.py > /tmp/adc_flagship.log 2>&1
"""

import json
import time

import jax
import jax.numpy as jnp

from _util import REPO_ROOT, log  # noqa: F401  (path + cache side effects)

CAPACITY = 1_000_000
INIT_LIVE = 160_000
VIEWS, RES = 4, 256
STEPS, DENSIFY_EVERY = 220, 20   # 7 densify rounds (<=140) + 80 recovery


def main():
    from sage3d_tpu.parallel.trainer import (AdaptiveConfig, TrainerConfig,
                                             fit_scene_adaptive)
    from sage3d_tpu.renderer.camera import make_camera, stack_cameras
    from sage3d_tpu.renderer.render import (autotune_all, budget_kwargs,
                                            render)
    from sage3d_tpu.renderer.scene import importance_subset, synthetic_room
    import numpy as np

    gt = synthetic_room(1_000_000, seed=3)
    cams = []
    for i in range(VIEWS):
        ang = 2 * np.pi * i / VIEWS
        pos = [5.0 * np.cos(ang), 5.0 * np.sin(ang), 1.5]
        cams.append(make_camera(pos, [-np.cos(ang), -np.sin(ang), -0.1],
                                width=RES, height=RES))
    # GT targets rendered with per-view autotuned budgets (make_orbit_targets'
    # default budgets would silently truncate a 1M scene).
    targets = []
    for c in cams:
        budgets = autotune_all(gt, c)
        out = render(gt, c, backend="pallas", **budget_kwargs(budgets))
        targets.append(out["rgb"])
    targets = jax.block_until_ready(jnp.stack(targets))
    cameras = stack_cameras(cams)
    log(f"GT targets ready: {VIEWS}x{RES}x{RES}")

    # Init = a DIFFERENT sparse room, not a subset of GT: an importance
    # subset of the ground truth already reproduces it at ~27-29 dB at this
    # resolution, so per-Gaussian gradients are ~0 and densification has
    # nothing to chase (v1/v2 runs stalled at 182k/215k live). Real training
    # starts misfit — strong gradients everywhere drive the classic
    # clone/split growth.
    init = importance_subset(synthetic_room(400_000, seed=11), INIT_LIVE)
    t0 = time.time()
    fitted, history = fit_scene_adaptive(
        init, cameras, targets,
        TrainerConfig(steps=STEPS, group_lrs=True, scene_extent=8.0,
                      log_every=10, backend="pallas",
                      pair_capacity=1 << 22, tile_capacity=8192),
        # grad_threshold 1e-9: at 4x256x256 on a 1M-capacity scene the
        # per-Gaussian accumulated grads are ~1e-8-1e-6, so the adc_demo's
        # 1e-6 gate admits only ~5k candidates/round (measured in the r5
        # sweep: 160k -> 171k over 3 rounds). densify_prune ranks candidates
        # by gradient and caps at max_new_fraction, so a near-zero threshold
        # means "top-gradient half each round" — the classic 3DGS behavior
        # at this signal scale.
        AdaptiveConfig(densify_every=DENSIFY_EVERY, densify_until=140,
                       grad_threshold=1e-9, max_new_fraction=0.5),
        capacity=CAPACITY, verbose=True)
    wall = time.time() - t0

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items()
               if "peak" in k or "bytes_in_use" in k or "limit" in k}
    except Exception as e:  # memory_stats is best-effort through the tunnel
        mem = {"unavailable": str(e)}

    rounds = [h for h in history if "n_alive" in h]
    print(json.dumps({
        "metric": "adc_flagship_densify_from_sparse",
        "init_live": INIT_LIVE, "capacity": CAPACITY,
        "alive_per_round": [r["n_alive"] for r in rounds],
        "final_alive": rounds[-1]["n_alive"] if rounds else None,
        "grew_through_512k": bool(rounds and
                                  max(r["n_alive"] for r in rounds) >= 512_000),
        "psnr_curve": [{"step": h["step"], "psnr": round(h["psnr"], 2)}
                       for h in history],
        "steps": STEPS, "wall_s": round(wall, 1),
        "s_per_step": round(wall / STEPS, 3),
        "views": VIEWS, "res": RES,
        "peak_hbm": mem,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
