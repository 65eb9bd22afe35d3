"""Secondary benchmarks: closed-loop rollout rate + capsule collision queries/s.

BASELINE.json config #4: "Physics rollout: agent capsule collision queries +
rendering along a SAGE-Bench trajectory (100 steps)". The entire rollout is
ONE device program (env/rollout.py); collision throughput is measured as
batched capsule queries against the full 1M-Gaussian scene.

Run:  python benchmarks/rollout_bench.py
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
    import numpy as np
    from bench import make_bench_scene_device
    from sage3d_tpu.env.rollout import rollout, rollout_batch
    from sage3d_tpu.ops.collision import agent_capsule, capsule_query
    from sage3d_tpu.physics.occupancy import grid_from_mask
    from sage3d_tpu.renderer.camera import agent_camera

    scene = make_bench_scene_device(1_000_000)

    obstacle = np.zeros((400, 400), np.uint8)
    obstacle[:4, :] = 1
    obstacle[-4:, :] = 1
    obstacle[:, :4] = 1
    obstacle[:, -4:] = 1
    grid = grid_from_mask(obstacle, bounds=[-10.0, 10.0, -8.0, 8.0])

    n_steps = 100

    def tuned(width, height, s=None):
        # Episode budgets must hold across every pose the agent visits:
        # probe 8 yaws x 2 positions and tighten capacity to the worst
        # measured post-cull pair count x1.5 (autotune_poses).
        from sage3d_tpu.renderer.camera import stack_cameras
        from sage3d_tpu.renderer.render import autotune_poses
        cams = stack_cameras([
            agent_camera(pos, yaw=i * 0.7854, width=width, height=height)
            for pos in ((0.0, -6.0), (1.5, -1.0)) for i in range(8)])
        from sage3d_tpu.renderer.render import budget_kwargs
        b = autotune_poses(scene if s is None else s, cams, pair_margin=1.5)
        return budget_kwargs(b)

    def measure(fn):
        t0 = time.time()
        float(jax.device_get(fn()))
        compile_s = time.time() - t0
        t0 = time.time()
        float(jax.device_get(fn()))
        return time.time() - t0, compile_s

    budgets160 = tuned(160, 128)

    def run_single():
        out = rollout(scene, grid, start_xy=jnp.asarray([0.0, -6.0]),
                      start_yaw=jnp.float32(1.57),
                      goal_xy=jnp.asarray([3.0, 3.0]), n_steps=n_steps,
                      width=160, height=128, backend="pallas",
                      use_capsule=True, **budgets160)
        return out["goal_distance"][-1] + out["min_clearance"][-1] * 0

    rollout_s, compile_s = measure(run_single)
    steps_per_s = n_steps / rollout_s

    # vmap-batched episodes (aggregate env-steps/s, the RL env convention)
    B = 8
    rng = np.random.default_rng(0)
    starts = rng.uniform([-4, -6.5], [4, -5], (B, 2)).astype(np.float32)
    goals = rng.uniform([-4, 2], [4, 4], (B, 2)).astype(np.float32)
    yaws = np.full((B,), 1.57, np.float32)

    def run_batch():
        # SAME backend as the single-episode row: the round-2 numbers compared
        # a pallas single against an xla batch, so the "batching gain" also
        # folded in a backend change (ADVICE r2). Both rows are pallas now.
        out = rollout_batch(scene, grid, starts, yaws, goals, n_steps=n_steps,
                            width=160, height=128, backend="pallas",
                            use_capsule=True, **budgets160)
        return jnp.sum(out["goal_distance"][:, -1])

    batch_s, batch_compile_s = measure(run_batch)
    batch_steps_per_s = B * n_steps / batch_s

    # round 4: same batch through lax.map (sequential episodes, ONE program)
    # — at full-scene budgets the vmapped pair sorts made batch-8 SLOWER in
    # aggregate than one env (r3 sweep: 17.2 vs 42.6); this row isolates it.
    def run_batch_map():
        out = rollout_batch(scene, grid, starts, yaws, goals, n_steps=n_steps,
                            width=160, height=128, backend="pallas",
                            use_capsule=True, batch_mode="map", **budgets160)
        return jnp.sum(out["goal_distance"][:, -1])

    batch_map_s, _ = measure(run_batch_map)
    batch_map_steps_per_s = B * n_steps / batch_map_s

    # 640x480 single-env rate (the reference env's native resolution)
    budgets640 = tuned(640, 480)

    def run_640():
        out = rollout(scene, grid, start_xy=jnp.asarray([0.0, -6.0]),
                      start_yaw=jnp.float32(1.57),
                      goal_xy=jnp.asarray([3.0, 3.0]), n_steps=20,
                      width=640, height=480, backend="pallas",
                      use_capsule=True, **budgets640)
        return out["goal_distance"][-1] + out["min_clearance"][-1] * 0

    s640, _ = measure(run_640)
    steps_640_per_s = 20 / s640

    # LOD tier: policy frames render an importance subset (collision still
    # queries the full 1M scene) — the round-3 answer to "batch 8 is 1.31x":
    # per-env cost at 160x128 was dominated by full-scene projection/binning.
    from sage3d_tpu.renderer.scene import importance_subset
    lod = jax.block_until_ready(importance_subset(scene, 131072))
    budgets_lod = tuned(160, 128, s=lod)

    def run_single_lod():
        out = rollout(scene, grid, start_xy=jnp.asarray([0.0, -6.0]),
                      start_yaw=jnp.float32(1.57),
                      goal_xy=jnp.asarray([3.0, 3.0]), n_steps=n_steps,
                      width=160, height=128, backend="pallas",
                      use_capsule=True,
                      render_scene=lod, **budgets_lod)
        return out["goal_distance"][-1] + out["min_clearance"][-1] * 0

    lod_s, _ = measure(run_single_lod)
    lod_steps_per_s = n_steps / lod_s

    def run_batch_lod():
        out = rollout_batch(scene, grid, starts, yaws, goals, n_steps=n_steps,
                            width=160, height=128, backend="pallas",
                            use_capsule=True,
                            render_scene=lod, **budgets_lod)
        return jnp.sum(out["goal_distance"][:, -1])

    batch_lod_s, _ = measure(run_batch_lod)
    batch_lod_steps_per_s = B * n_steps / batch_lod_s

    # standalone capsule-query throughput: B capsules x 1M Gaussians
    b = 256
    xy = jax.random.uniform(jax.random.PRNGKey(1), (b, 2), jnp.float32, -5, 5)
    p0, p1, r = agent_capsule(xy)

    iters = 8

    @jax.jit
    def q_chain(s, p0, p1):
        # iterations chained in ONE program with a carry-dependent perturbation
        # — per-call dispatch through the tunnel is seconds and would otherwise
        # be what gets measured (see .claude/skills/verify timing rules)
        def body(_, carry):
            out = capsule_query(s, p0 + carry * 1e-9, p1, r)
            return jnp.sum(out["clearance"])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(jax.device_get(q_chain(scene, p0, p1)))
    t0 = time.time()
    v = float(jax.device_get(q_chain(scene, p0, p1)))
    query_s = (time.time() - t0) / iters
    queries_per_s = b / query_s

    # pruned query (round 4): Morton-chunked accel, chunk-AABB cond skip.
    # Clustered batch = the realistic rollout workload (one agent region);
    # the same spread batch as above = the pruning-hostile case.
    from sage3d_tpu.ops.collision import (build_collision_accel,
                                          capsule_query_pruned)
    accel = jax.block_until_ready(build_collision_accel(scene))
    xy_c = jnp.asarray([0.5, -2.0]) + jax.random.uniform(
        jax.random.PRNGKey(2), (b, 2), jnp.float32, -0.5, 0.5)
    p0c, p1c, _ = agent_capsule(xy_c)

    def pruned_chain(p0x, p1x):
        @jax.jit
        def chain(a, p0x, p1x):
            def body(_, carry):
                out = capsule_query_pruned(a, p0x + carry * 1e-9, p1x, r)
                return jnp.sum(out["clearance"])
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        float(jax.device_get(chain(accel, p0x, p1x)))
        t0 = time.time()
        float(jax.device_get(chain(accel, p0x, p1x)))
        return b * iters / (time.time() - t0)

    pruned_clustered_qps = pruned_chain(p0c, p1c)
    pruned_spread_qps = pruned_chain(p0, p1)
    visited = int(jax.device_get(
        jax.jit(lambda a: capsule_query_pruned(a, p0c, p1c, r)[
            "chunks_visited"])(accel)))

    # rollout with the pruned query plugged in (full-scene render, so the
    # delta vs run_single isolates the collision stage's share)
    def run_single_pruned():
        out = rollout(scene, grid, start_xy=jnp.asarray([0.0, -6.0]),
                      start_yaw=jnp.float32(1.57),
                      goal_xy=jnp.asarray([3.0, 3.0]), n_steps=n_steps,
                      width=160, height=128, backend="pallas",
                      use_capsule=True, collision_accel=accel, **budgets160)
        return out["goal_distance"][-1] + out["min_clearance"][-1] * 0

    pruned_roll_s, _ = measure(run_single_pruned)
    pruned_steps_per_s = n_steps / pruned_roll_s

    print(json.dumps({
        "backend_all_rows": "pallas",
        "rollout_100step_s": round(rollout_s, 3),
        "env_steps_per_s_160x128": round(steps_per_s, 2),
        "batch8_env_steps_per_s_160x128": round(batch_steps_per_s, 2),
        "batch8_map_env_steps_per_s_160x128": round(batch_map_steps_per_s, 2),
        "env_steps_per_s_640x480": round(steps_640_per_s, 2),
        "lod131k_env_steps_per_s_160x128": round(lod_steps_per_s, 2),
        "lod131k_batch8_env_steps_per_s_160x128": round(
            batch_lod_steps_per_s, 2),
        "budgets_lod_160x128": budgets_lod,
        "rollout_compile_s": round(compile_s, 1),
        "batch_compile_s": round(batch_compile_s, 1),
        "budgets_160x128": budgets160,
        "capsule_queries_per_s_vs_1m_gaussians": round(queries_per_s, 1),
        "capsule_query_batch": b,
        "gaussian_capsule_pairs_per_s": round(queries_per_s * 1e6, 0),
        "pruned_queries_per_s_clustered": round(pruned_clustered_qps, 1),
        "pruned_queries_per_s_spread": round(pruned_spread_qps, 1),
        "pruned_chunks_visited_clustered": visited,
        "pruned_chunks_total": int(accel.aabb_min.shape[0]),
        "pruned_rollout_env_steps_per_s_160x128": round(
            pruned_steps_per_s, 2),
    }))


if __name__ == "__main__":
    main()
