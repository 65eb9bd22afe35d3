"""Fully-jitted rollout: one device program renders, decides, moves, measures."""

import jax.numpy as jnp
import numpy as np

from sage3d_tpu.env.rollout import rollout
from sage3d_tpu.physics.occupancy import grid_from_mask
from sage3d_tpu.renderer.scene import synthetic_room


def test_jit_rollout_runs_and_moves():
    scene = synthetic_room(num_gaussians=400, seed=13)
    obstacle = np.zeros((200, 200), np.uint8)
    obstacle[:2, :] = 1
    obstacle[-2:, :] = 1
    obstacle[:, :2] = 1
    obstacle[:, -2:] = 1
    grid = grid_from_mask(obstacle, bounds=[-5.0, 5.0, -5.0, 5.0])

    out = rollout(scene, grid, start_xy=[2.0, 2.0], start_yaw=0.0,
                  goal_xy=[-2.0, -2.0], n_steps=12, width=64, height=48,
                  backend="xla", pair_capacity=1 << 14, tile_capacity=512,
                  use_capsule=True)
    assert out["positions"].shape == (12, 3)
    moved = float(jnp.linalg.norm(out["final_pos"][:2] - jnp.asarray([2.0, 2.0])))
    assert moved > 0.3          # the policy actually drives
    assert np.isfinite(np.asarray(out["min_clearance"])).all()
    assert np.isfinite(np.asarray(out["mean_depth"])).all()
    # goal distance should not increase overall (policy seeks the goal)
    gd = np.asarray(out["goal_distance"])
    assert gd[-1] < gd[0] + 0.5


def test_rollout_batch_matches_single():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sage3d_tpu.env.rollout import rollout, rollout_batch
    from sage3d_tpu.physics.occupancy import grid_from_mask
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = synthetic_room(num_gaussians=500, seed=2)
    obstacle = np.zeros((100, 100), np.uint8)
    obstacle[:3, :] = obstacle[-3:, :] = 1
    obstacle[:, :3] = obstacle[:, -3:] = 1
    grid = grid_from_mask(obstacle, bounds=[-5.0, 5.0, -4.0, 4.0])

    starts = np.array([[0.0, -3.0], [0.5, -2.5]], np.float32)
    yaws = np.array([1.57, 1.3], np.float32)
    goals = np.array([[2.0, 2.0], [-2.0, 2.0]], np.float32)
    kw = dict(n_steps=5, width=64, height=48, backend="xla",
              pair_capacity=1 << 14, tile_capacity=512, use_capsule=True)

    batched = rollout_batch(scene, grid, starts, yaws, goals, **kw)
    single0 = rollout(scene, grid, starts[0], yaws[0], goals[0], **kw)
    np.testing.assert_allclose(np.asarray(batched["positions"][0]),
                               np.asarray(single0["positions"]), atol=1e-5)
    assert batched["goal_distance"].shape == (2, 5)

    # batch_mode="map" (the big-budget fast path on v5e: sequential episodes
    # in one program) must be a pure execution-strategy switch
    mapped = rollout_batch(scene, grid, starts, yaws, goals,
                           batch_mode="map", **kw)
    for k in ("positions", "goal_distance", "total_collisions",
              "min_clearance"):
        np.testing.assert_allclose(np.asarray(mapped[k]),
                                   np.asarray(batched[k]), atol=1e-5,
                                   err_msg=k)


def test_rollout_with_lod_render_scene():
    """Policy frames from an importance-LOD subset; collision vs full scene."""
    import jax.numpy as jnp

    from sage3d_tpu.renderer.scene import importance_subset, synthetic_room

    scene = synthetic_room(800, seed=5)
    lod = importance_subset(scene, 256)
    assert lod.num_gaussians == 256
    # top-importance invariant: every kept score >= every dropped score
    import numpy as np
    s = np.exp(np.asarray(scene.log_scales))
    area = s[:, 0] * s[:, 1] + s[:, 0] * s[:, 2] + s[:, 1] * s[:, 2]
    score = np.asarray(scene.opacities) * area
    kept = np.sort(score)[-256:]
    assert np.min(kept) >= np.sort(score)[-257]

    obstacle = np.zeros((200, 200), np.uint8)
    obstacle[:2, :] = 1
    obstacle[-2:, :] = 1
    obstacle[:, :2] = 1
    obstacle[:, -2:] = 1
    grid = grid_from_mask(obstacle, bounds=[-5.0, 5.0, -5.0, 5.0])
    out = rollout(scene, grid, start_xy=jnp.asarray([0.0, 0.0]),
                  start_yaw=jnp.float32(0.0), goal_xy=jnp.asarray([2.0, 0.0]),
                  n_steps=4, width=64, height=64, backend="xla",
                  pair_capacity=1 << 14, tile_capacity=256, render_scene=lod)
    assert out["positions"].shape == (4, 3)
    assert bool(jnp.all(jnp.isfinite(out["min_clearance"])))


def test_rollout_with_pruned_collision_matches_dense():
    """collision_accel plugs the spatially-pruned capsule query into the
    jitted episode; clearance below the margin must match the dense query."""
    from sage3d_tpu.ops.collision import build_collision_accel

    scene = synthetic_room(num_gaussians=600, seed=4)
    obstacle = np.zeros((200, 200), np.uint8)
    obstacle[:2, :] = 1
    obstacle[-2:, :] = 1
    obstacle[:, :2] = 1
    obstacle[:, -2:] = 1
    grid = grid_from_mask(obstacle, bounds=[-5.0, 5.0, -5.0, 5.0])
    accel = build_collision_accel(scene, chunk=256)

    kw = dict(start_xy=[1.0, 1.0], start_yaw=0.5, goal_xy=[-2.0, -2.0],
              n_steps=8, width=64, height=48, backend="xla",
              pair_capacity=1 << 14, tile_capacity=512, use_capsule=True)
    dense = rollout(scene, grid, **kw)
    pruned = rollout(scene, grid, collision_accel=accel, **kw)
    np.testing.assert_allclose(np.asarray(pruned["positions"]),
                               np.asarray(dense["positions"]), atol=1e-5)
    dc = np.asarray(dense["min_clearance"])
    pc = np.asarray(pruned["min_clearance"])
    below = dc < 2.0   # default prune_margin
    np.testing.assert_allclose(pc[below], dc[below], rtol=1e-5, atol=1e-5)
    assert np.all(pc <= 2.0 + 1e-6)
