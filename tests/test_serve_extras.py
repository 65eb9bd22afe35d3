"""Fault injection, stateful adapter, profiling utilities."""

import numpy as np

from sage3d_tpu.serve.chaos import FlakyPolicy, PolicyFault
from sage3d_tpu.serve.stateful_adapter import (StatefulVLNAdapter,
                                               action_to_velocity,
                                               parse_motion_text)


def test_parse_motion_text():
    assert parse_motion_text("move forward 75 cm") == ["MOVE_FORWARD"] * 3
    assert parse_motion_text("move forward 25 cm") == ["MOVE_FORWARD"]
    assert parse_motion_text("turn left 60 degree") == ["TURN_LEFT"] * 2
    assert parse_motion_text("turn right 30 degree") == ["TURN_RIGHT"]
    assert parse_motion_text("we are done") == ["STOP"]
    assert parse_motion_text("???") == ["MOVE_FORWARD"]
    # queue capped at 3
    assert len(parse_motion_text("move forward 500 cm")) == 3


def test_action_to_velocity():
    v = action_to_velocity("MOVE_FORWARD")
    assert v["vx"] == 0.25 and not v["stop"]
    v = action_to_velocity("TURN_LEFT")
    assert v["yaw_rate"] > 0
    assert action_to_velocity("STOP")["stop"]


def test_stateful_adapter_queue_and_reset():
    calls = []

    def model(frames, instruction):
        calls.append(len(frames))
        return "move forward 75 cm"

    ad = StatefulVLNAdapter(model)
    assert ad.generate_response(["f1"], "go") == "MOVE_FORWARD"
    # two queued actions drain WITHOUT calling the model again
    assert ad.generate_response(["f2"], "go") == "MOVE_FORWARD"
    assert ad.generate_response(["f3"], "go") == "MOVE_FORWARD"
    assert len(calls) == 1
    # queue empty -> model called with full history
    ad.generate_response(["f4"], "go")
    assert calls[-1] == 4
    ad.reset()
    assert ad.frame_history == [] and ad.pending == []


def test_flaky_policy_runner_resilience():
    """The runner must survive a 60%-faulty policy and still finish."""
    from sage3d_tpu.bench.runner import run_episode
    from sage3d_tpu.env.vln_env import GaussianVLNEnv
    from sage3d_tpu.renderer.scene import synthetic_room
    from tests.test_bench_harness import make_gvln_json
    import tempfile
    from pathlib import Path
    from sage3d_tpu.bench.episodes import adapt_gvln_to_episodes

    with tempfile.TemporaryDirectory() as td:
        traj, mp = make_gvln_json(Path(td))
        env = GaussianVLNEnv(synthetic_room(120, seed=3), map_json=str(mp),
                             width=48, height=48, backend="xla")
        ep = adapt_gvln_to_episodes(traj, "x.ply")[0]

        def base(images, instruction, current_yaw=0.0, depth_images=None, **kw):
            return {"vx": 0.3, "vy": 0.0, "yaw_rate": 0.0, "duration_s": 1.0,
                    "stop": False}

        flaky = FlakyPolicy(base, fault_rate=0.6, seed=7)
        rec = run_episode(env, ep, flaky, max_steps=8)
        assert rec["episode_info"]["steps_run"] >= 1
        assert flaky.faults_injected > 0
        assert "measurements" in rec   # episode completed despite faults


def test_render_cost_model():
    from sage3d_tpu.utils.profiling import render_cost_model
    m = render_cost_model(1_000_000, 1920, 1080, 6_000_000)
    assert m["total_flops"] > 0 and m["total_bytes"] > 0
    assert m["compositing"]["flops"] > m["projection"]["flops"]


def test_video_prompt_adapter_8frame_wire_roundtrip():
    """NaVILA-class hosting (navila_server.py:264-315): the server builds the
    8-slot video prompt, feeds ALL frames to the model, returns raw text; the
    navila client config (8-frame history + TextOutputParser) parses it."""
    from sage3d_tpu.serve.client import create_vlm_client
    from sage3d_tpu.serve.mllm_server import MLLMServer, VideoPromptAdapter

    seen = {}

    def fake_model(frames, prompt):
        seen["n_frames"] = len(frames)
        seen["prompt"] = prompt
        return "I should turn left 30 degrees."

    adapter = VideoPromptAdapter(fake_model, num_video_frames=8)
    with MLLMServer(adapter, port=0) as srv:
        client = create_vlm_client(model_name="navila", host="127.0.0.1",
                                   port=srv.port)
        img = np.zeros((16, 16, 3), np.uint8)
        resp = client.query([img], "go to the kitchen", current_yaw=0.0)

    assert seen["n_frames"] == 8                      # front-padded history
    assert seen["prompt"].count("<image>") == 8       # 7 history + 1 current
    assert '"go to the kitchen"' in seen["prompt"]
    assert resp["yaw_rate"] > 0 and not resp["stop"]  # parsed client-side


def test_video_prompt_adapter_frame_normalization():
    from sage3d_tpu.serve.mllm_server import VideoPromptAdapter
    ad = VideoPromptAdapter(lambda f, p: "stop", num_video_frames=4)
    assert ad.normalize_frames([]) == []
    assert ad.normalize_frames([1, 2]) == [1, 1, 1, 2]
    assert ad.normalize_frames([1, 2, 3, 4, 5, 6]) == [3, 4, 5, 6]


def test_jax_policy_server_wire_roundtrip():
    """TPU-hostable JAX policy (serve/jax_policy.py): jitted CNN behind the
    MLLM wire protocol; the mllm-family client gets a canonical action."""
    import jax
    from sage3d_tpu.serve.client import create_vlm_client
    from sage3d_tpu.serve.jax_policy import (ACTIONS, cnn_policy_apply,
                                             init_cnn_policy,
                                             make_jax_policy_server)

    params = init_cnn_policy(jax.random.PRNGKey(0), height=32, width=32,
                             frames=2)
    logits = cnn_policy_apply(
        params, jax.numpy.zeros((2, 32, 32, 3), jax.numpy.float32))
    assert logits.shape == (len(ACTIONS),)

    with make_jax_policy_server(port=0, params=params, height=32, width=32,
                                frames=2) as srv:
        client = create_vlm_client(input_type="rgb", output_type="text",
                                   protocol="socket", host="127.0.0.1",
                                   port=srv.port)
        img = np.zeros((16, 16, 3), np.uint8)
        resp = client.query([img], "go forward", current_yaw=0.0)
    assert "error" not in resp
    assert srv.stats["requests"] == 1


def test_batch_policy_server_microbatches_concurrent_clients():
    """serve/batch_server.py: N concurrent clients share device launches —
    all get valid actions, and at least one batch carried multiple requests."""
    import threading

    from sage3d_tpu.serve.batch_server import from_jax_policy
    from sage3d_tpu.serve.client import create_vlm_client

    with from_jax_policy(height=32, width=32, frames=2, max_batch=4,
                         max_wait_s=0.2) as srv:
        results = {}

        def one(i):
            client = create_vlm_client(input_type="rgb", output_type="text",
                                       protocol="socket", host="127.0.0.1",
                                       port=srv.port)
            img = np.full((16, 16, 3), i * 10, np.uint8)
            results[i] = client.query([img], "go", current_yaw=0.0)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)

    assert len(results) == 6
    assert all("error" not in r for r in results.values())
    assert srv.stats["requests"] == 6
    assert srv.stats["batches"] < 6          # batching actually happened
    assert srv.stats["max_batch_seen"] >= 2
