"""One complete closed-loop SAGE-Bench batch on the real device (VERDICT r4 #2).

Mirrors the reference's primary entry point (run_benchmark.py:1963-2387):

  1. builds a 2-scene world on disk — scene PLYs (synthetic InteriorGS-scale
     rooms), 2D semantic maps, GVLN ``test_*.json`` files with 5 instructions
     per scene (4 VLN types + 1 Goal-less), i.e. 10 episodes total covering
     BOTH metric sets (all 13 measures);
  2. starts the scripted socket policy server (the wire-compatible stand-in
     for mllm_server.py);
  3. runs ``python -m sage3d_tpu.cli run-benchmark --test-dir ...`` as a real
     subprocess against the real TPU;
  4. SIGKILLs that subprocess mid-batch (after >=2 measurement JSONs exist),
     then reruns it to completion — exercising the file-existence resume the
     reference uses (run_benchmark.py:369-405, --skip-completed);
  5. audits the artifacts: measurements JSONs (13 distinct measures across the
     batch), episode.log, trajectory PNGs, batch_test_summary.json;
  6. prints one JSON row with wall-time/episode for BENCH_AUX_r05.

Run directly on the TPU host: ``python benchmarks/e2e_benchmark.py``.
"""

import json
import math
import os
import shutil
import signal
import subprocess
import sys
import time

from _util import REPO_ROOT, log  # noqa: E402  (path setup side effect)

# The PARENT process only builds fixture files and audits artifacts — the
# real TPU belongs to the CLI subprocess. Without this, scene construction
# runs jnp ops through the tunnel (minutes) and contends with the subprocess.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

WORLD = os.environ.get("E2E_WORLD", "/tmp/sage3d_e2e_r5")
PORT = int(os.environ.get("E2E_PORT", "55417"))
N_GAUSS = int(os.environ.get("E2E_GAUSS", "200000"))
MAX_STEPS = int(os.environ.get("E2E_MAX_STEPS", "30"))
BOUNDS = (0.0, 10.0, 0.0, 10.0)

VLN_MEASURES = {
    "distance_to_goal", "success", "oracle_success", "path_length", "spl",
    "navigation_error", "collision_count", "continuous_success_ratio",
    "integrated_collision_penalty", "path_smoothness",
}
NOGOAL_MEASURES = {
    "episode_time", "explored_areas", "exploration_coverage",
    "collision_count", "path_length", "path_smoothness",
}


def _semantic_map():
    wall = []
    for i in range(101):
        t = i / 10.0
        wall += [[0.0, t], [10.0, t], [t, 0.0], [t, 10.0]]
    table = [[y / 10.0, x / 10.0] for y in range(60, 71) for x in range(70, 81)]
    return [
        {"category_label": "Wall", "instance_id": 0, "item_id": "label_0",
         "mask_coords_m": wall, "bbox_m": [0, 0, 10, 10]},
        {"category_label": "Table", "instance_id": 3, "item_id": "label_3",
         "mask_coords_m": table, "bbox_m": [7.0, 6.0, 8.0, 7.0]},
    ]


def _gvln(scene_name):
    from sage3d_tpu.utils.transforms import (map_to_world_xy,
                                             world_quat_from_map_yaw)

    def world_pt(mx, my, z=0.5):
        wx, wy = map_to_world_xy(mx, my, BOUNDS)
        return [float(wx), float(wy), z]

    waypoints = [(2.0, 2.0), (4.0, 3.0), (6.0, 5.0), (7.3, 6.3)]
    points = []
    for i, (mx, my) in enumerate(waypoints):
        if i < len(waypoints) - 1:
            nx, ny = waypoints[i + 1]
            rot = list(world_quat_from_map_yaw(math.atan2(ny - my, nx - mx)))
        else:
            rot = [0.0, 0.0, 0.0, 1.0]
        points.append({"position": world_pt(mx, my), "rotation": rot})

    instructions = [
        {"generated_instruction": "Walk forward and stop at the table.",
         "instruction_type": t, "start": "label_0", "end": "label_3"}
        for t in ("AC", "SD", "RR", "Att")
    ] + [
        {"generated_instruction": "Explore the room freely.",
         "instruction_type": "Goal-less", "start": "label_0",
         "end": "label_0"},
    ]
    return {"scenes": [{
        "scene_id": 1, "scene_name": scene_name,
        "samples": [{"trajectory_id": "1", "instructions": instructions,
                     "points": points}],
    }]}


def build_world():
    from sage3d_tpu.renderer.scene import save_ply, synthetic_room

    shutil.rmtree(WORLD, ignore_errors=True)
    scenes, maps, tests = (os.path.join(WORLD, d)
                           for d in ("scenes", "maps", "tests"))
    for d in (scenes, maps, tests):
        os.makedirs(d)
    for i, name in enumerate(["roomA", "roomB"]):
        save_ply(synthetic_room(num_gaussians=N_GAUSS, seed=50 + i),
                 os.path.join(scenes, f"{name}.ply"))
        with open(os.path.join(
                maps, f"2D_Semantic_Map_{name}_Complete.json"), "w") as f:
            json.dump(_semantic_map(), f)
        with open(os.path.join(tests, f"test_{name}.json"), "w") as f:
            json.dump(_gvln(name), f)
    log(f"world built at {WORLD} (2 scenes x {N_GAUSS} Gaussians, "
        f"5 instructions each)")


def launch_batch(out_dir):
    cmd = [sys.executable, "-m", "sage3d_tpu.cli", "run-benchmark",
           "--test-dir", os.path.join(WORLD, "tests"),
           "--scenes-root", os.path.join(WORLD, "scenes"),
           "--map-root", os.path.join(WORLD, "maps"),
           "--output-dir", out_dir,
           "--model-type", "scripted", "--port", str(PORT),
           "--max-steps", str(MAX_STEPS)]
    return subprocess.Popen(cmd, cwd=REPO_ROOT, start_new_session=True,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)


def count_measurements(out_dir):
    n = 0
    for root, _, files in os.walk(out_dir):
        if os.path.basename(root) == "measurements":
            n += sum(1 for f in files if f.endswith(".json"))
    return n


def main():
    build_world()
    out_dir = os.path.join(WORLD, "out")

    from sage3d_tpu.serve.scripted_server import ScriptedPolicyServer
    server = ScriptedPolicyServer(
        port=PORT,
        script=["MOVE_FORWARD"] * 5 + ["TURN_LEFT"] + ["MOVE_FORWARD"] * 4)
    server.start()
    log(f"scripted policy server on :{PORT}")

    try:
        # ---- run 1: kill mid-batch once >=2 episodes are on disk ----------
        log("run 1: launching (will be SIGKILLed mid-batch)")
        p1 = launch_batch(out_dir)
        t0 = time.time()
        killed_at = None
        while p1.poll() is None and time.time() - t0 < 1800:
            if count_measurements(out_dir) >= 2:
                killed_at = count_measurements(out_dir)
                os.killpg(p1.pid, signal.SIGKILL)
                break
            time.sleep(2.0)
        p1.wait(timeout=60)
        if killed_at is None:
            raise RuntimeError("run 1 finished before the mid-batch kill - "
                               "increase episode count")
        log(f"run 1 killed after {killed_at} episodes "
            f"({time.time() - t0:.1f} s in)")

        # ---- run 2: resume to completion -----------------------------------
        log("run 2: resuming to completion")
        t1 = time.time()
        p2 = launch_batch(out_dir)
        out, _ = p2.communicate(timeout=3600)
        wall2 = time.time() - t1
        if p2.returncode != 0:
            sys.stderr.write(out[-4000:])
            raise RuntimeError(f"run 2 failed rc={p2.returncode}")

        # ---- audit the artifacts -------------------------------------------
        with open(os.path.join(out_dir, "batch_test_summary.json")) as f:
            summary = json.load(f)
        bs = summary["batch_summary"]
        n_meas = count_measurements(out_dir)
        pngs, logs, seen_measures = 0, 0, set()
        per_ep = {}
        for root, _, files in os.walk(out_dir):
            pngs += sum(1 for f in files if f.endswith(".png"))
            logs += sum(1 for f in files if f == "episode.log")
            if os.path.basename(root) == "measurements":
                for f in files:
                    with open(os.path.join(root, f)) as fh:
                        m = json.load(fh)
                    keys = set(m.get("measurements", {}))
                    seen_measures |= keys
                    per_ep[os.path.join(os.path.basename(
                        os.path.dirname(os.path.dirname(root))), f)] = \
                        sorted(keys)
        missing = (VLN_MEASURES | NOGOAL_MEASURES) - seen_measures
        resumed = bs["total_episodes"] - killed_at
        skipped = sum(r.get("num_skipped", 0)
                      for r in summary["file_results"])

        row = {
            "metric": "e2e_benchmark_closed_loop_device",
            "episodes_total": bs["total_episodes"],
            "json_files": bs["total_json_files"],
            "episodes_before_kill": killed_at,
            "episodes_resumed_after_kill": resumed,
            "resume_skips_observed": skipped > 0,
            "wall_s_run2": round(wall2, 1),
            "wall_s_per_resumed_episode": round(wall2 / max(resumed, 1), 1),
            "max_steps": MAX_STEPS,
            "n_gaussians_per_scene": N_GAUSS,
            "measurement_jsons": n_meas,
            "trajectory_pngs": pngs,
            "episode_logs": logs,
            "distinct_measures_seen": len(seen_measures),
            "all_13_measures_present": not missing,
            "missing_measures": sorted(missing),
            "file_statuses": [r["status"] for r in summary["file_results"]],
        }
        print(json.dumps(row))
        with open(os.path.join(REPO_ROOT, "docs", "E2E_BENCH_r05.json"),
                  "w") as f:
            json.dump({"row": row, "batch_summary": bs,
                       "per_episode_measures": per_ep}, f, indent=1)
    finally:
        server.stop()


if __name__ == "__main__":
    main()
