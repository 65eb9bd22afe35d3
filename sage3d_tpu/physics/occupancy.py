"""2D occupancy-grid collision queries: the primary physics query of SAGE-Bench.

TPU-native re-design of the reference's SemanticMap2DCollisionDetector
(collision_detector.py:26-288). Grid construction (instance rasterization + EDT
inflation) is one-time host preprocessing, exactly as in the reference; the
query path — the part called tens of thousands of times per episode from the
motion loop — is a pure jittable gather, so it fuses into the vectorized agent
step (physics/agent.py) instead of being a Python call per 1 cm micro-step.

Parity notes (each pinned by tests):
  * obstacle categories: only 'wall' and 'unable area' (collision_detector.py:107)
  * inflation: euclidean distance transform <= robot_radius (:119-127)
  * world->map: negate then mirror about bounds (:146-189)
  * pixel mapping: round-to-nearest, origin at (min_x, min_y), 0.05 m/px (:134-138)
  * out-of-bounds: 2-px tolerance clamps, beyond that counts as collision (:213-225)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_SCALE = 0.05
RUNTIME_ROBOT_RADIUS = 0.08   # simple_env.py:136-141
PLANNING_ROBOT_RADIUS = 0.2   # vln_trajectory_generator.py:64-65
OOB_MARGIN_PX = 2

OBSTACLE_CATEGORIES = ("wall", "unable area")


class OccupancyGrid(NamedTuple):
    """Static scene collision data, device-resident. Pytree (arrays only)."""

    obstacle: jnp.ndarray   # (H, W) uint8 inflated obstacle mask
    dist_m: jnp.ndarray     # (H, W) float32 distance-to-obstacle (meters)
    bounds: jnp.ndarray     # (4,) float32: min_x, max_x, min_y, max_y
    scale: jnp.ndarray      # () float32 meters/pixel

    @property
    def height(self) -> int:
        return self.obstacle.shape[0]

    @property
    def width(self) -> int:
        return self.obstacle.shape[1]


def _edt(mask_free: np.ndarray, sampling: float) -> np.ndarray:
    from scipy.ndimage import distance_transform_edt
    return distance_transform_edt(mask_free, sampling=sampling).astype(np.float32)


def grid_from_semantic_map(
    map_json,
    robot_radius_m: float = RUNTIME_ROBOT_RADIUS,
    scale: float = DEFAULT_SCALE,
) -> OccupancyGrid:
    """Build the inflated occupancy grid from a 2D semantic-map JSON.

    Accepts a path or the loaded list of instance dicts (the schema produced by
    data/semantic_map.py, matching the reference semantic_map_builder output).
    """
    if isinstance(map_json, (str, Path)):
        with open(map_json) as f:
            instances = json.load(f)
    else:
        instances = map_json

    all_x, all_y = [], []
    for inst in instances:
        for y, x in inst.get("mask_coords_m", []):
            all_y.append(float(y))
            all_x.append(float(x))
    if not all_x:
        raise ValueError("semantic map contains no coordinates")
    min_x, max_x = min(all_x), max(all_x)
    min_y, max_y = min(all_y), max(all_y)

    h = int(np.ceil((max_y - min_y) / scale)) + 1
    w = int(np.ceil((max_x - min_x) / scale)) + 1

    obstacle = np.zeros((h, w), np.uint8)
    for inst in instances:
        if str(inst.get("category_label", "")).lower() in OBSTACLE_CATEGORIES:
            for y, x in inst.get("mask_coords_m", []):
                px = int(round((float(x) - min_x) / scale))
                py = int(round((float(y) - min_y) / scale))
                if 0 <= py < h and 0 <= px < w:
                    obstacle[py, px] = 1

    dist_m = _edt(obstacle == 0, sampling=scale)
    if robot_radius_m > 0:
        inflated = (dist_m <= robot_radius_m).astype(np.uint8)
    else:
        inflated = obstacle

    return OccupancyGrid(
        obstacle=jnp.asarray(inflated),
        dist_m=jnp.asarray(dist_m),
        bounds=jnp.asarray([min_x, max_x, min_y, max_y], jnp.float32),
        scale=jnp.float32(scale),
    )


def grid_from_mask(obstacle: np.ndarray, bounds, scale: float = DEFAULT_SCALE,
                   robot_radius_m: float = RUNTIME_ROBOT_RADIUS) -> OccupancyGrid:
    """Build a grid directly from a raw obstacle mask (tests, synthetic scenes)."""
    obstacle = np.asarray(obstacle, np.uint8)
    dist_m = _edt(obstacle == 0, sampling=scale)
    inflated = (dist_m <= robot_radius_m).astype(np.uint8) if robot_radius_m > 0 \
        else obstacle
    return OccupancyGrid(
        obstacle=jnp.asarray(inflated),
        dist_m=jnp.asarray(dist_m),
        bounds=jnp.asarray(bounds, jnp.float32),
        scale=jnp.float32(scale),
    )


def world_to_map_xy_jnp(grid: OccupancyGrid, wx, wy):
    """World (x, y) -> map-frame meters (negate, then mirror; traced)."""
    min_x, max_x, min_y, max_y = (grid.bounds[0], grid.bounds[1],
                                  grid.bounds[2], grid.bounds[3])
    mx = (min_x + max_x) + wx
    my = (min_y + max_y) + wy
    return mx, my


def check_collision_world(grid: OccupancyGrid, pos_xy: jnp.ndarray) -> jnp.ndarray:
    """Collision test for world-frame positions. Fully vectorized and jittable.

    pos_xy: (..., 2). Returns bool (...,). Reproduces check_collision_3d
    (collision_detector.py:191-237) including the 2-px out-of-bounds tolerance.
    """
    mx, my = world_to_map_xy_jnp(grid, pos_xy[..., 0], pos_xy[..., 1])
    px = jnp.round((mx - grid.bounds[0]) / grid.scale).astype(jnp.int32)
    py = jnp.round((my - grid.bounds[2]) / grid.scale).astype(jnp.int32)
    h, w = grid.obstacle.shape
    severely_out = ((py < -OOB_MARGIN_PX) | (py >= h + OOB_MARGIN_PX)
                    | (px < -OOB_MARGIN_PX) | (px >= w + OOB_MARGIN_PX))
    pyc = jnp.clip(py, 0, h - 1)
    pxc = jnp.clip(px, 0, w - 1)
    hit = grid.obstacle[pyc, pxc] == 1
    return severely_out | hit


def check_path_collision_world(grid: OccupancyGrid, start_xy, end_xy,
                               num_samples: int = 10) -> jnp.ndarray:
    """Swept path test via linear sampling (collision_detector.py:239-261)."""
    t = (jnp.arange(1, num_samples + 1, dtype=jnp.float32) / num_samples)
    pts = (start_xy[None, :] * (1.0 - t[:, None]) + end_xy[None, :] * t[:, None])
    return jnp.any(check_collision_world(grid, pts))


def clearance_world(grid: OccupancyGrid, pos_xy: jnp.ndarray) -> jnp.ndarray:
    """Distance-to-nearest-obstacle (meters) at world positions (bilinear).

    Not in the reference (it only has the boolean test); used by the capsule
    query fallback and by planners that want gradients of clearance.
    """
    mx, my = world_to_map_xy_jnp(grid, pos_xy[..., 0], pos_xy[..., 1])
    fx = (mx - grid.bounds[0]) / grid.scale
    fy = (my - grid.bounds[2]) / grid.scale
    h, w = grid.dist_m.shape
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 2)
    tx = jnp.clip(fx - x0, 0.0, 1.0)
    ty = jnp.clip(fy - y0, 0.0, 1.0)
    d00 = grid.dist_m[y0, x0]
    d01 = grid.dist_m[y0, x0 + 1]
    d10 = grid.dist_m[y0 + 1, x0]
    d11 = grid.dist_m[y0 + 1, x0 + 1]
    return ((1 - ty) * ((1 - tx) * d00 + tx * d01)
            + ty * ((1 - tx) * d10 + tx * d11))
