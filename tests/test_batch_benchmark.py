"""Batch benchmark mode: discovery, scene/map auto-matching, env hot-swap,
per-episode artifacts (trajectory PNG + episode.log), batch summary.

Covers VERDICT r1 missing #1/#2/#7 against the reference workflow
(run_benchmark.py:307-339, 408-523, 2137-2351, 781-994, 1075-1128).
"""

import json
import math

import numpy as np
import pytest

from sage3d_tpu.bench.batch import (find_matching_map_file,
                                    find_matching_scene_file,
                                    find_test_json_files,
                                    get_scene_name_from_json,
                                    run_batch_benchmark)
from sage3d_tpu.env.vln_env import GaussianVLNEnv
from sage3d_tpu.renderer.scene import save_ply, synthetic_room
from sage3d_tpu.utils.transforms import map_to_world_xy, world_quat_from_map_yaw

BOUNDS = (0.0, 10.0, 0.0, 10.0)


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


def _world_pt(mx, my, z=0.5):
    wx, wy = map_to_world_xy(mx, my, BOUNDS)
    return [float(wx), float(wy), z]


def _gvln(scene_name):
    waypoints = [(2.0, 2.0), (4.0, 3.0), (6.0, 5.0), (7.3, 6.3)]
    points = []
    for i, (mx, my) in enumerate(waypoints):
        if i < len(waypoints) - 1:
            nx, ny = waypoints[i + 1]
            rot = list(world_quat_from_map_yaw(math.atan2(ny - my, nx - mx)))
        else:
            rot = [0.0, 0.0, 0.0, 1.0]
        points.append({"position": _world_pt(mx, my), "rotation": rot})
    return {"scenes": [{
        "scene_id": 1, "scene_name": scene_name,
        "samples": [{
            "trajectory_id": "1",
            "instructions": [
                {"generated_instruction": "Walk to the table.",
                 "instruction_type": "AC", "start": "label_0",
                 "end": "label_3"}],
            "points": points,
        }],
    }]}


@pytest.fixture(scope="module")
def batch_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("batch")
    scenes = tmp / "scenes"
    maps = tmp / "maps"
    tests_dir = tmp / "tests"
    for d in (scenes, maps, tests_dir / "nested"):
        d.mkdir(parents=True)
    for i, name in enumerate(["roomA", "roomB"]):
        save_ply(synthetic_room(num_gaussians=200, seed=20 + i),
                 str(scenes / f"{name}.ply"))
        with open(maps / f"2D_Semantic_Map_{name}_Complete.json", "w") as f:
            json.dump(_semantic_map(), f)
    with open(tests_dir / "test_roomA.json", "w") as f:
        json.dump(_gvln("roomA"), f)
    with open(tests_dir / "nested" / "test_roomB.json", "w") as f:
        json.dump(_gvln("roomB"), f)
    # a non-matching file that must be ignored by discovery
    with open(tests_dir / "notes.json", "w") as f:
        json.dump({}, f)
    return tmp


def test_discovery_and_matching(batch_world):
    files = find_test_json_files(batch_world / "tests")
    names = sorted(f.split("/")[-1] for f in files)
    assert names == ["test_roomA.json", "test_roomB.json"]
    file_a = next(f for f in files if f.endswith("test_roomA.json"))
    file_b = next(f for f in files if f.endswith("test_roomB.json"))
    assert get_scene_name_from_json(file_a) == "roomA"
    scene = find_matching_scene_file(file_a, batch_world / "scenes")
    assert scene.endswith("roomA.ply")
    mp = find_matching_map_file(file_b, batch_world / "maps")
    assert mp.endswith("2D_Semantic_Map_roomB_Complete.json")
    assert find_matching_scene_file(file_a, batch_world / "maps") == ""


def test_batch_run_hot_swap_and_artifacts(batch_world):
    env = GaussianVLNEnv(str(batch_world / "scenes" / "roomA.ply"),
                         map_json=None, width=64, height=48, backend="xla")

    def policy(images, instruction, current_yaw, depth_images=None):
        return {"vx": 0.3, "vy": 0.0, "yaw_rate": 0.0, "duration_s": 1.0,
                "stop": False, "parsed_from": "scripted"}

    out_dir = batch_world / "out"
    summary = run_batch_benchmark(
        env, batch_world / "tests", batch_world / "scenes",
        batch_world / "maps", policy, out_dir, max_steps=4,
        model_info="test-policy", quiet=True)

    bs = summary["batch_summary"]
    assert bs["total_json_files"] == 2
    assert bs["total_episodes"] == 2
    assert all(r["status"] == "ok" for r in summary["file_results"])
    assert (out_dir / "batch_test_summary.json").exists()
    # env hot-swapped per file; ends on the LAST file's map (roomA: the
    # nested/test_roomB.json path sorts before tests/test_roomA.json)
    assert env.semantic_map_path.endswith(
        "2D_Semantic_Map_roomA_Complete.json")
    # per-episode artifacts: measurements JSON, episode.log, trajectory PNG
    for scene_name in ("roomA", "roomB"):
        ep_dir = out_dir / scene_name / "1-0"
        assert (ep_dir / "measurements" / "1-0.json").exists()
        assert (ep_dir / "episode.log").exists()
        assert (ep_dir / "trajectory_1-0.png").exists()
        log = (ep_dir / "episode.log").read_text()
        assert "[EPISODE]" in log and "[MEASURE]" in log

    # resume: re-running skips everything
    summary2 = run_batch_benchmark(
        env, batch_world / "tests", batch_world / "scenes",
        batch_world / "maps", policy, out_dir, max_steps=4, quiet=True)
    assert all(r.get("num_skipped", 0) == 1
               for r in summary2["file_results"])


def test_batch_covers_all_13_measures(batch_world, tmp_path):
    """A batch mixing VLN and Goal-less instructions must emit BOTH metric
    sets — all 13 distinct measures — through the artifact files (the CPU
    mirror of the on-device e2e run, benchmarks/e2e_benchmark.py; guards the
    adapted-episode nogoal inference in tasks.infer_task_type)."""
    gvln = _gvln("roomA")
    sample = gvln["scenes"][0]["samples"][0]
    sample["instructions"].append(
        {"generated_instruction": "Explore the room freely.",
         "instruction_type": "Goal-less", "start": "label_0",
         "end": "label_0"})
    tests_dir = tmp_path / "tests"
    tests_dir.mkdir()
    with open(tests_dir / "test_roomA.json", "w") as f:
        json.dump(gvln, f)

    env = GaussianVLNEnv(str(batch_world / "scenes" / "roomA.ply"),
                         map_json=None, width=64, height=48, backend="xla")

    def policy(images, instruction, current_yaw, depth_images=None):
        return {"vx": 0.3, "vy": 0.0, "yaw_rate": 0.0, "duration_s": 1.0,
                "stop": False, "parsed_from": "scripted"}

    out_dir = tmp_path / "out"
    run_batch_benchmark(env, tests_dir, batch_world / "scenes",
                        batch_world / "maps", policy, out_dir, max_steps=3,
                        quiet=True)
    seen = set()
    for mdir in out_dir.glob("roomA/*/measurements/*.json"):
        with open(mdir) as f:
            seen |= set(json.load(f)["measurements"])
    assert seen == {
        "distance_to_goal", "success", "oracle_success", "path_length",
        "spl", "navigation_error", "collision_count",
        "continuous_success_ratio", "integrated_collision_penalty",
        "path_smoothness", "episode_time", "explored_areas",
        "exploration_coverage"}


def test_batch_file_sharding(batch_world):
    files = find_test_json_files(batch_world / "tests")
    shard0 = [f for i, f in enumerate(files) if i % 2 == 0]
    shard1 = [f for i, f in enumerate(files) if i % 2 == 1]
    assert len(shard0) == 1 and len(shard1) == 1
    assert set(shard0) | set(shard1) == set(files)


def test_cli_run_benchmark_task_type_plumbing(tmp_path, monkeypatch):
    """--task-type/--input-type flags reach the episode runner (reference
    run_benchmark.py CLI surface)."""
    import json as _json

    from sage3d_tpu import cli
    from tests.test_bench_harness import make_gvln_json

    traj, mp = make_gvln_json(tmp_path)
    # single-scene mode with the scripted in-process policy via socket
    from sage3d_tpu.serve.scripted_server import ScriptedPolicyServer
    from sage3d_tpu.renderer.scene import synthetic_room, save_ply

    scene_ply = tmp_path / "scene.ply"
    save_ply(synthetic_room(120, seed=3), str(scene_ply))
    with ScriptedPolicyServer(port=0) as srv:
        rc = cli.main([
            "run-benchmark", "--scene", str(scene_ply), "--map", str(mp),
            "--test-json", str(traj), "--model-type", "scripted",
            "--port", str(srv.port), "--task-type", "pointnav",
            "--input-type", "rgb", "--output-dir", str(tmp_path / "out"),
            "--set", "renderer.width=48", "--set", "renderer.height=48",
            "--set", "benchmark.max_steps=3",
        ])
    assert rc == 0
    meas = list((tmp_path / "out").rglob("*.json"))
    assert meas   # measurement/summary files written
    # the forced task type landed in the episode record
    ep_files = [p for p in meas if p.parent.name == "measurements"]
    assert ep_files
    rec = _json.loads(ep_files[0].read_text())
    assert rec["episode_info"]["task_type"] == "pointnav"


def test_cli_reference_alias_flags(tmp_path, monkeypatch):
    """--max-steps/--goal-radius/--save-videos (reference flag names) reach
    the runner, same as --set benchmark.<field>= overrides."""
    import sage3d_tpu.bench.runner as runner_mod
    from sage3d_tpu import cli
    from sage3d_tpu.renderer.scene import save_ply, synthetic_room
    from tests.test_bench_harness import make_gvln_json

    traj, mp = make_gvln_json(tmp_path)
    scene_ply = tmp_path / "scene.ply"
    save_ply(synthetic_room(120, seed=3), str(scene_ply))

    seen = {}

    def fake_run_benchmark(env, episodes, policy, **kw):
        seen.update(kw)
        seen["goal_radius"] = episodes[0]["goals"][0].get("radius")
        return {"metrics": {}}

    monkeypatch.setattr(runner_mod, "run_benchmark", fake_run_benchmark)
    rc = cli.main([
        "run-benchmark", "--scene", str(scene_ply), "--map", str(mp),
        "--test-json", str(traj), "--model-type", "scripted",
        "--output-dir", str(tmp_path / "out"),
        "--max-steps", "7", "--goal-radius", "0.9", "--save-videos"])
    assert rc == 0
    assert seen["max_steps"] == 7
    assert seen["record_video"] is True
    assert seen["goal_radius"] == 0.9
