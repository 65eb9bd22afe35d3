"""Auxiliary subsystems: config tree, logging, CLI, MLLM server, visualization,
scene bundles, checkpointing."""

import json
import math
from pathlib import Path

import numpy as np
import pytest


def test_config_defaults_and_overrides(tmp_path):
    from sage3d_tpu.utils.config import Config, load_config, to_dict
    cfg = load_config(overrides=["renderer.tile_capacity=2048",
                                 "benchmark.max_steps=50",
                                 "physics.disable_collision=true",
                                 "benchmark.max_episodes=7"])
    assert cfg.renderer.tile_capacity == 2048
    assert cfg.benchmark.max_steps == 50
    assert cfg.physics.disable_collision is True
    assert cfg.benchmark.max_episodes == 7
    # JSON file layer
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"renderer": {"width": 320}, "silent": True}))
    cfg2 = load_config(str(p))
    assert cfg2.renderer.width == 320 and cfg2.silent is True
    # fast-mode bundle
    cfg2.apply_fast_mode("ultra")
    assert cfg2.benchmark.max_steps == 100
    assert isinstance(to_dict(cfg2), dict)


def test_episode_logger(tmp_path, capsys):
    from sage3d_tpu.utils.logging import EpisodeLogger
    log_file = tmp_path / "ep.log"
    with EpisodeLogger(str(log_file), quiet=True) as log:
        log("[DEBUG] hidden")
        log("[ERROR] shown")
        log("plain line hidden in quiet mode")
    out = capsys.readouterr().out
    assert "[ERROR] shown" in out
    assert "[DEBUG] hidden" not in out
    content = log_file.read_text()
    assert "[DEBUG] hidden" in content  # file gets everything


def test_mllm_server_action_extraction():
    from sage3d_tpu.serve.mllm_server import extract_action
    assert extract_action("I should TURN_LEFT now") == "TURN_LEFT"
    assert extract_action("move ahead slowly") == "MOVE_FORWARD"
    assert extract_action("we are done here") == "STOP"
    assert extract_action("turn to the right side") == "TURN_RIGHT"
    assert extract_action("???") == "MOVE_FORWARD"


def test_mllm_server_roundtrip():
    from sage3d_tpu.serve.mllm_server import CallableAdapter, MLLMServer
    from sage3d_tpu.serve.protocol import encode_image_b64, socket_request
    import numpy as np

    def fake_model(images, instruction):
        assert len(images) == 1
        return f"Given '{instruction[:10]}' I will TURN_LEFT."

    with MLLMServer(CallableAdapter(fake_model), port=0) as srv:
        img = encode_image_b64(np.zeros((8, 8, 3), np.uint8))
        resp = socket_request("127.0.0.1", srv.port,
                              {"images": [img], "query": "go to the door"})
        assert resp["result"] == "TURN_LEFT"
        resp2 = socket_request("127.0.0.1", srv.port, {"action": "reset"})
        assert resp2["result"] == "reset_ok"
        assert srv.stats["requests"] == 1


def test_cli_run_benchmark_end_to_end(tmp_path):
    """Full CLI drive: scene PLY + map + test json + scripted server."""
    from sage3d_tpu.cli import main as cli_main
    from sage3d_tpu.renderer.scene import save_ply, synthetic_room
    from sage3d_tpu.serve.scripted_server import ScriptedPolicyServer

    # assets
    scene = synthetic_room(num_gaussians=150, seed=4)
    ply = tmp_path / "scene.ply"
    save_ply(scene, ply)
    from tests.test_bench_harness import make_gvln_json
    traj_path, map_path = make_gvln_json(tmp_path)

    with ScriptedPolicyServer(script=["MOVE_FORWARD", "STOP"]) as srv:
        rc = cli_main([
            "run-benchmark", "--scene", str(ply), "--map", str(map_path),
            "--test-json", str(traj_path), "--output-dir",
            str(tmp_path / "out"), "--port", str(srv.port),
            "--max-episodes", "1", "--set", "renderer.width=48",
            "--set", "renderer.height=48", "--set", "benchmark.max_steps=5",
        ])
    assert rc == 0
    assert (tmp_path / "out" / "batch_test_summary.json").exists()


def test_visualize_trajectory(tmp_path):
    from sage3d_tpu.bench.visualize import visualize_trajectory
    from tests.test_bench_harness import make_semantic_map, world_pt
    traj = [world_pt(2 + i * 0.5, 2 + i * 0.4) for i in range(8)]
    out = visualize_trajectory(
        traj, make_semantic_map(), tmp_path / "traj.png",
        gt_locations=traj, goal_world=traj[-1],
        measurements={"success": 1.0, "spl": 0.9, "navigation_error": 0.1,
                      "collision_count": 0})
    assert out is not None and out.exists() and out.stat().st_size > 1000


def test_scene_bundle_roundtrip(tmp_path):
    from sage3d_tpu.data.scene_build import build_scene_bundle, load_scene_bundle
    from sage3d_tpu.renderer.scene import save_ply, synthetic_room

    scene = synthetic_room(num_gaussians=100, seed=6)
    ply = tmp_path / "0042.ply"
    save_ply(scene._replace(semantic_ids=scene.semantic_ids * 0 - 1), ply)
    labels = [{"label": "table", "ins_id": 3, "bounding_box": [
        {"x": -2.0, "y": -2.0, "z": 0.0}, {"x": 2.0, "y": -2.0, "z": 0.0},
        {"x": 2.0, "y": 2.0, "z": 0.0}, {"x": -2.0, "y": 2.0, "z": 0.0},
        {"x": -2.0, "y": -2.0, "z": 2.0}, {"x": 2.0, "y": -2.0, "z": 2.0},
        {"x": 2.0, "y": 2.0, "z": 2.0}, {"x": -2.0, "y": 2.0, "z": 2.0}]}]
    lp = tmp_path / "labels.json"
    lp.write_text(json.dumps(labels))
    manifest = build_scene_bundle(ply, lp, "map.json", tmp_path / "bundles")
    assert manifest.exists()
    loaded, sem_map = load_scene_bundle(manifest)
    ids = np.asarray(loaded.semantic_ids)
    assert (ids == 3).sum() > 0       # gaussians inside the bbox got the id
    assert (ids == -1).sum() > 0      # and outside ones stayed unlabeled
    # resume
    manifest2 = build_scene_bundle(ply, lp, "map.json", tmp_path / "bundles")
    assert manifest2 == manifest


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from sage3d_tpu.parallel.checkpoint import (latest_step,
                                                restore_train_state,
                                                save_train_state)
    from sage3d_tpu.parallel.train import TrainState
    state = TrainState(
        params={"means": jnp.arange(12.0).reshape(4, 3)},
        opt_state={"m": jnp.zeros((4, 3))},
        step=jnp.int32(7))
    step = save_train_state(tmp_path / "ckpt", state)
    assert step == 7
    assert latest_step(tmp_path / "ckpt") == 7
    template = TrainState(
        params={"means": jnp.zeros((4, 3))},
        opt_state={"m": jnp.zeros((4, 3))},
        step=jnp.int32(0))
    restored = restore_train_state(tmp_path / "ckpt", template)
    np.testing.assert_allclose(np.asarray(restored.params["means"]),
                               np.arange(12.0).reshape(4, 3))
    assert int(restored.step) == 7


def test_package_exports():
    import sage3d_tpu
    for name in ("render", "render_batch", "GaussianVLNEnv", "SimpleVLNEnv",
                 "adapt_gvln_to_episodes", "default_measures",
                 "TaskTypeManager", "query_vlm", "ObjectBasedSuccessEvaluator"):
        assert hasattr(sage3d_tpu, name), name
