"""Physics layer: occupancy collision parity, motion semantics, capsule query."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage3d_tpu.physics.agent import apply_cmd, init_agent
from sage3d_tpu.physics.occupancy import (
    OccupancyGrid, check_collision_world, check_path_collision_world,
    clearance_world, grid_from_mask, grid_from_semantic_map)
from sage3d_tpu.ops.collision import agent_capsule, capsule_query
from sage3d_tpu.renderer.scene import make_scene


def simple_map_instances():
    """A 10x10 m map-frame room with one wall strip, in semantic-map schema."""
    coords_wall = [[5.0, x / 10.0] for x in range(0, 101)]  # wall along y=5
    coords_floor = [[y / 10.0, x / 10.0] for y in range(0, 101, 10)
                    for x in range(0, 101, 10)]
    return [
        {"category_label": "Wall", "instance_id": 0, "mask_coords_m": coords_wall},
        {"category_label": "floor", "instance_id": 1, "mask_coords_m": coords_floor},
    ]


@pytest.fixture(scope="module")
def grid():
    return grid_from_semantic_map(simple_map_instances(), robot_radius_m=0.08)


def to_world(mx, my, bounds):
    # inverse of the detector mapping: world = -(mirror(map))
    min_x, max_x, min_y, max_y = bounds
    return -((min_x + max_x) - mx), -((min_y + max_y) - my)


def test_grid_build(grid):
    assert grid.obstacle.shape == (int(np.ceil(10 / 0.05)) + 1,) * 2
    assert int(grid.obstacle.sum()) > 0


def test_wall_collision_roundtrip(grid):
    b = np.asarray(grid.bounds)
    # map-frame point on the wall (y=5) -> world frame -> must collide
    wx, wy = to_world(5.0, 5.0, b)
    assert bool(check_collision_world(grid, jnp.array([wx, wy])))
    # far from wall -> free
    wx2, wy2 = to_world(5.0, 2.0, b)
    assert not bool(check_collision_world(grid, jnp.array([wx2, wy2])))
    # inflation: 5 cm from the wall is inside the 8 cm robot radius
    wx3, wy3 = to_world(5.0, 5.05, b)
    assert bool(check_collision_world(grid, jnp.array([wx3, wy3])))
    # 20 cm away is outside the inflation
    wx4, wy4 = to_world(5.0, 5.2, b)
    assert not bool(check_collision_world(grid, jnp.array([wx4, wy4])))


def test_out_of_bounds_is_collision(grid):
    assert bool(check_collision_world(grid, jnp.array([1000.0, 1000.0])))


def test_path_collision(grid):
    b = np.asarray(grid.bounds)
    s = jnp.array(to_world(5.0, 2.0, b))
    e = jnp.array(to_world(5.0, 8.0, b))   # crosses the wall at y=5
    assert bool(check_path_collision_world(grid, s, e))
    e2 = jnp.array(to_world(8.0, 2.0, b))  # parallel to wall, stays at y=2
    assert not bool(check_path_collision_world(grid, s, e2))


def test_clearance_decreases_toward_wall(grid):
    b = np.asarray(grid.bounds)
    far = clearance_world(grid, jnp.array(to_world(5.0, 2.0, b)))
    near = clearance_world(grid, jnp.array(to_world(5.0, 4.7, b)))
    assert float(far) > float(near) > 0.0


def test_agent_free_motion(grid):
    b = np.asarray(grid.bounds)
    wx, wy = to_world(5.0, 2.0, b)
    st = init_agent([wx, wy, 0.5], yaw=0.0)
    # move 0.15 m along +x (robot forward, yaw=0): free space
    st2 = apply_cmd(st, grid, vx=0.5, vy=0.0, yaw_rate=0.0, duration_s=0.3)
    moved = float(jnp.linalg.norm(st2.pos[:2] - st.pos[:2]))
    assert moved == pytest.approx(0.15, abs=0.02)
    assert int(st2.total_collisions) == 0
    assert not bool(st2.collision_detected)


def test_agent_motion_capped_at_20cm(grid):
    b = np.asarray(grid.bounds)
    wx, wy = to_world(5.0, 2.0, b)
    st = init_agent([wx, wy, 0.5], yaw=0.0)
    st2 = apply_cmd(st, grid, vx=1.0, vy=0.0, yaw_rate=0.0, duration_s=1.0)
    moved = float(jnp.linalg.norm(st2.pos[:2] - st.pos[:2]))
    assert moved == pytest.approx(0.20, abs=0.011)


def test_agent_blocked_by_wall(grid):
    b = np.asarray(grid.bounds)
    # world direction toward the wall: map +y maps to world -y (mirror+negate
    # flips the axis direction twice => forward in map y is -y in world)
    wx, wy = to_world(5.0, 4.85, b)
    st = init_agent([wx, wy, 0.5], yaw=0.0)
    # Try to cross the wall: compute world-frame direction toward map (5.0, 5.0)
    tx, ty = to_world(5.0, 6.0, b)
    yaw = float(np.arctan2(ty - wy, tx - wx))
    st = init_agent([wx, wy, 0.5], yaw=yaw)
    st2 = apply_cmd(st, grid, vx=1.0, vy=0.0, yaw_rate=0.0, duration_s=0.4)
    moved = float(jnp.linalg.norm(st2.pos[:2] - st.pos[:2]))
    # wall at map y=5 inflated by 0.08 => blocked well before 0.2
    assert moved < 0.1
    assert bool(st2.collision_detected)
    assert int(st2.total_collisions) == 1
    # agent never ends up inside an obstacle
    assert not bool(check_collision_world(grid, st2.pos[:2]))


def test_agent_yaw_integration(grid):
    b = np.asarray(grid.bounds)
    wx, wy = to_world(5.0, 2.0, b)
    st = init_agent([wx, wy, 0.5], yaw=3.0)
    st2 = apply_cmd(st, grid, vx=0.0, vy=0.0, yaw_rate=0.5, duration_s=1.0)
    assert float(st2.yaw) == pytest.approx(3.5 - 2 * np.pi, abs=1e-5)


def test_capsule_query_hits_near_gaussian():
    scene = make_scene(
        means=[[0.0, 0.0, 0.4], [3.0, 0.0, 0.4]],
        scales=[[0.2, 0.2, 0.2], [0.2, 0.2, 0.2]],
        quats=[[1, 0, 0, 0]] * 2,
        opacities=[0.9, 0.9],
        colors=[[1, 0, 0]] * 2,
        semantic_ids=[11, 22],
    )
    p0, p1, r = agent_capsule(jnp.array([[0.05, 0.0], [1.5, 0.0]]))
    out = capsule_query(scene, p0, p1, r, chunk=2)
    assert bool(out["hit"][0])           # capsule overlapping first gaussian
    assert int(out["nearest_id"][0]) == 11
    assert not bool(out["hit"][1])       # midway: 1.5m from both, no contact
    assert float(out["clearance"][1]) > 0
    assert float(out["clearance"][0]) < 0


def test_capsule_query_opacity_threshold():
    scene = make_scene(
        means=[[0.0, 0.0, 0.4]], scales=[[0.2] * 3], quats=[[1, 0, 0, 0]],
        opacities=[0.1], colors=[[1, 0, 0]], semantic_ids=[5],
    )
    p0, p1, r = agent_capsule(jnp.array([[0.0, 0.0]]))
    out = capsule_query(scene, p0, p1, r, chunk=1)
    assert not bool(out["hit"][0])       # transparent gaussian is not solid


def test_capsule_clearance_gradient():
    scene = make_scene(
        means=[[2.0, 0.0, 0.4]], scales=[[0.2] * 3], quats=[[1, 0, 0, 0]],
        opacities=[0.9], colors=[[1, 0, 0]], semantic_ids=[5],
    )

    def clearance_at(x):
        p0, p1, r = agent_capsule(jnp.stack([x, jnp.zeros_like(x)], -1)[None])
        return capsule_query(scene, p0, p1, r, chunk=1)["clearance"][0]

    g = jax.grad(clearance_at)(jnp.float32(0.0))
    assert float(g) < 0  # moving toward the gaussian reduces clearance


def test_capsule_query_matches_dense_reference():
    """Channel-math kernel vs a straightforward dense NumPy evaluation."""
    import numpy as np
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = synthetic_room(500, seed=11)
    rng = np.random.default_rng(0)
    xy = rng.uniform(-2, 2, (7, 2)).astype(np.float32)
    p0, p1, r = agent_capsule(jnp.asarray(xy))
    out = capsule_query(scene, p0, p1, r, chunk=128)

    mu = np.asarray(scene.means)
    q = np.asarray(scene.quats)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], -1)], axis=1)       # (N, 3, 3)
    inv_s = np.exp(-np.asarray(scene.log_scales))
    op = np.asarray(scene.opacities)

    a = np.asarray(p0)
    b = np.asarray(p1)
    d = b - a
    dd = np.sum(d * d, axis=1, keepdims=True)
    rel = mu[None] - a[:, None]                                 # (B, N, 3)
    t = np.clip(np.einsum("bnk,bk->bn", rel, d) / dd, 0, 1)
    diff = rel - t[..., None] * d[:, None]
    dist = np.sqrt(np.sum(diff ** 2, -1) + 1e-20)
    local = np.einsum("nij,bni->bnj", R, diff)
    maha = np.sqrt(np.sum((local * inv_s[None]) ** 2, -1) + 1e-20)
    solid = op[None] >= 0.5
    support = 2.0 * dist / np.maximum(maha, 1e-6)
    clear = np.where(solid, dist - support - float(r), 1e9)
    want = clear.min(axis=1)

    np.testing.assert_allclose(np.asarray(out["clearance"]), want,
                               rtol=2e-4, atol=2e-4)


def test_pruned_capsule_query_matches_dense():
    """Spatial pruning must be invisible below the margin: hit/hit_count
    exact, clearance equal wherever the dense value is below prune_margin,
    and most chunks skipped for a localized query batch."""
    import numpy as np
    from sage3d_tpu.ops.collision import (build_collision_accel,
                                          capsule_query_pruned)
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = synthetic_room(4000, seed=3)
    accel = build_collision_accel(scene, chunk=256)

    rng = np.random.default_rng(1)
    xy = rng.uniform(-1.5, 1.5, (9, 2)).astype(np.float32)
    p0, p1, r = agent_capsule(jnp.asarray(xy))

    dense = capsule_query(scene, p0, p1, r, chunk=512)
    margin = 1.0
    pruned = capsule_query_pruned(accel, p0, p1, r, prune_margin=margin)

    np.testing.assert_array_equal(np.asarray(pruned["hit"]),
                                  np.asarray(dense["hit"]))
    np.testing.assert_array_equal(np.asarray(pruned["hit_count"]),
                                  np.asarray(dense["hit_count"]))
    dc = np.asarray(dense["clearance"])
    pc = np.asarray(pruned["clearance"])
    below = dc < margin
    np.testing.assert_allclose(pc[below], dc[below], rtol=1e-5, atol=1e-5)
    assert np.all(pc[~below] == margin)
    # clustered queries in a room-scale scene must skip a good share of chunks
    visited = int(pruned["chunks_visited"])
    n_chunks = accel.aabb_min.shape[0]
    assert visited < n_chunks, (visited, n_chunks)


def test_pruned_query_skips_far_chunks():
    """A query far from everything visits zero chunks and reports margin."""
    import numpy as np
    from sage3d_tpu.ops.collision import (build_collision_accel,
                                          capsule_query_pruned)
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = synthetic_room(1000, seed=5)
    accel = build_collision_accel(scene, chunk=256)
    p0, p1, r = agent_capsule(jnp.array([[500.0, 500.0]]))
    out = capsule_query_pruned(accel, p0, p1, r, prune_margin=0.5)
    assert int(out["chunks_visited"]) == 0
    assert float(out["clearance"][0]) == 0.5
    assert not bool(out["hit"][0])
    assert int(out["nearest_id"][0]) == -1
