"""Interactive env step latency: the benchmark-harness path, not the jitted
rollout. Measures the per-step cost of the runner's actual call sequence
(get_rgb -> apply_cmd_for -> measure reads) on the reference env camera
(640x480) — the path the closed-loop e2e batch is bound by. Round 5 made
get_rgb a single jitted dispatch (env/vln_env.py render path); this probe
quantifies it.

Run:  timeout 3600 python benchmarks/env_latency.py > /tmp/env_latency.log 2>&1
"""

import json
import time

import jax

from _util import log  # noqa: F401  (path + cache side effects)

N_GAUSS = 200_000
STEPS = 30


def main():
    import numpy as np

    from sage3d_tpu.env.vln_env import GaussianVLNEnv
    from sage3d_tpu.renderer.scene import synthetic_room

    semantic_map = [
        {"category_label": "Wall", "instance_id": 0, "item_id": "label_0",
         "mask_coords_m": [[0.0, t / 10.0] for t in range(101)]
         + [[t / 10.0, 0.0] for t in range(101)],
         "bbox_m": [0, 0, 10, 10]},
    ]
    scene = synthetic_room(N_GAUSS, seed=50)
    env = GaussianVLNEnv(scene, map_json=semantic_map,
                         width=640, height=480)
    env.set_start_pose([0.0, -2.0, 0.5], [0.0, 0.0, 0.0, 1.0])
    log(f"env up: backend={env.backend} {env.width}x{env.height} "
        f"{N_GAUSS} Gaussians")

    # warm-up: compile the capture + step programs
    t0 = time.time()
    env.get_rgb()
    env.apply_cmd_for(0.2, 0.0, 0.1, 1.0)
    compile_s = time.time() - t0
    log(f"warm-up (compile) {compile_s:.1f}s")

    t0 = time.time()
    for _ in range(STEPS):
        frame = env.get_rgb()
        assert frame.shape == (480, 640, 3)
        env.apply_cmd_for(0.2, 0.0, 0.1, 1.0)
        env.get_collision_count()
        np.asarray(env.get_agent_pos())
    wall = time.time() - t0

    print(json.dumps({
        "metric": "interactive_env_step_latency",
        "steps": STEPS,
        "s_per_step": round(wall / STEPS, 3),
        "steps_per_s": round(STEPS / wall, 2),
        "compile_s": round(compile_s, 1),
        "resolution": "640x480", "n_gaussians": N_GAUSS,
        "backend": env.backend,
        "note": "runner call sequence (capture+step+reads); jitted single-"
                "dispatch capture path (round 5)",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
