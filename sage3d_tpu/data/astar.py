"""Grid path planning: reference-parity A* plus a batched TPU wavefront planner.

The reference plans one endpoint pair at a time with heapq A* over the occupancy
grid (vln_trajectory_generator.py:253-286 ``astar_pixel``, 8-connected, octile
heuristic) and finds snap-on targets via a boundary BFS (:309-344). Both are
reproduced here (host numpy, used where exact parity matters), plus a TPU-native
alternative: ``wavefront_distances`` — Bellman-Ford/Dijkstra relaxation by
iterated 3x3 min-convolution under ``lax.while_loop``, which computes the
geodesic distance field from MANY sources at once on the VPU; paths are then
recovered by greedy descent. For the trajectory-generation workload (thousands
of candidate pairs per scene), one wavefront per endpoint replaces thousands of
serial A* runs.
"""

from __future__ import annotations

import heapq
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SQRT2 = math.sqrt(2.0)


# ---------------------------------------------------------------------------
# Reference-parity host A*
# ---------------------------------------------------------------------------

_NEIGHBORS = [(-1, -1, SQRT2), (-1, 0, 1.0), (-1, 1, SQRT2),
              (0, -1, 1.0), (0, 1, 1.0),
              (1, -1, SQRT2), (1, 0, 1.0), (1, 1, SQRT2)]

# reference neighbor order, (dx, dy) in its (x, y) coordinate tuples
_REF_DIRS = [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)]


def astar_pixel(grid: np.ndarray, start: Tuple[int, int],
                goal: Tuple[int, int]) -> Optional[List[Tuple[int, int]]]:
    """8-connected A* on an obstacle grid (1 = blocked), (x, y) tuples.

    Exact-parity port of the reference planner semantics
    (vln_trajectory_generator.py:253-286): euclidean heuristic, same neighbor
    expansion order, grid indexed grid[y, x]. Returns the (x, y) pixel path
    including both endpoints, or None if unreachable.
    """
    h, w = grid.shape
    open_set = [(0.0, start)]
    came_from = {}
    g_score = {start: 0.0}
    gx, gy = goal
    while open_set:
        _, cur = heapq.heappop(open_set)
        if cur == goal:
            path = [cur]
            while cur in came_from:
                cur = came_from[cur]
                path.append(cur)
            return path[::-1]
        for dx, dy in _REF_DIRS:
            nx, ny = cur[0] + dx, cur[1] + dy
            if not (0 <= nx < w and 0 <= ny < h):
                continue
            if grid[ny, nx] == 1:
                continue
            nb = (nx, ny)
            tg = g_score[cur] + math.hypot(nx - cur[0], ny - cur[1])
            if nb not in g_score or tg < g_score[nb]:
                came_from[nb] = cur
                g_score[nb] = tg
                f = tg + math.hypot(nx - gx, ny - gy)
                heapq.heappush(open_set, (f, nb))
    return None


def boundary_pixels(mask_coords) -> List[Tuple[int, int]]:
    """4-neighborhood boundary of a (y, x) pixel set
    (vln_trajectory_generator.py:290-299)."""
    s = set((int(y), int(x)) for (y, x) in mask_coords)
    out = []
    for (y, x) in s:
        if any(n not in s for n in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1))):
            out.append((y, x))
    return out


def nearest_free_pixel_on_side(instance_mask, base_map: np.ndarray,
                               towards_px: Optional[Tuple[int, int]] = None,
                               max_search_dist: int = 50
                               ) -> Optional[Tuple[int, int]]:
    """BFS from the instance boundary to the nearest free pixel, optionally on
    the side facing ``towards_px`` (vln_trajectory_generator.py:309-344).

    instance_mask: (y, x) pixels; base_map: obstacle grid (1 = blocked);
    returns (x, y) like the reference.
    """
    from collections import deque
    h, w = base_map.shape
    b_pixels = boundary_pixels(instance_mask)
    if not b_pixels:
        return None
    visited = set()
    q = deque()
    for (by, bx) in b_pixels:
        if 0 <= bx < w and 0 <= by < h:
            visited.add((bx, by))
            q.append((bx, by, 0))
    while q:
        x, y, d = q.popleft()
        if d > max_search_dist:
            break
        if 0 <= x < w and 0 <= y < h and base_map[y, x] == 0:
            if towards_px is None:
                return (x, y)
            bx, by = np.mean([(px, py) for (py, px) in instance_mask], axis=0)
            v_point = np.array([x - bx, y - by])
            v_towards = np.array([towards_px[0] - bx, towards_px[1] - by])
            if np.dot(v_point, v_towards) >= 0:
                return (x, y)
        for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nx, ny = x + dx, y + dy
            if 0 <= nx < w and 0 <= ny < h and (nx, ny) not in visited:
                visited.add((nx, ny))
                q.append((nx, ny, d + 1))
    return None


def instance_centroid_px(mask_coords) -> Optional[Tuple[int, int]]:
    """Centroid of (y, x) mask pixels, returned as (x, y)
    (vln_trajectory_generator.py:289-295)."""
    if not mask_coords:
        return None
    m = np.asarray(mask_coords, float)
    c = m.mean(axis=0)
    return (int(round(c[1])), int(round(c[0])))


# ---------------------------------------------------------------------------
# TPU wavefront planner (batched geodesic distance fields)
# ---------------------------------------------------------------------------

INF = 1e9


@jax.jit
def wavefront_distances(free: jnp.ndarray, sources: jnp.ndarray) -> jnp.ndarray:
    """Geodesic distance field(s) by iterated 8-neighbor min-relaxation.

    Args:
      free: (H, W) bool free-space grid.
      sources: (B, 2) int32 (row, col) source pixels.

    Returns (B, H, W) float32 distances in pixels (diagonals cost sqrt(2));
    unreachable cells hold +INF. One `while_loop` iteration relaxes every cell
    against its 8 neighbors — pure VPU work, batched over all sources, and the
    loop runs only until no distance changes (O(longest shortest path) steps).
    """
    h, w = free.shape
    b = sources.shape[0]
    free_f = jnp.where(free, 0.0, INF)[None]            # (1, H, W) obstacle mask
    dist0 = jnp.full((b, h, w), INF)
    dist0 = dist0.at[jnp.arange(b), sources[:, 0], sources[:, 1]].set(0.0)
    dist0 = dist0 + free_f                                # sources in walls => INF

    def shift(x, dy, dx, fill=INF):
        # shifted[y, x] = x[y - dy, x - dx], edges filled
        p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=fill)
        return p[:, 1 - dy:1 - dy + h, 1 - dx:1 - dx + w]

    def relax(dist):
        best = dist
        for dy, dx, cost in _NEIGHBORS:
            best = jnp.minimum(best, shift(dist, dy, dx) + cost)
        return jnp.minimum(best + free_f, INF)

    def cond(carry):
        dist, changed, it = carry
        # safety bound ONLY — the loop exits on convergence. A shortest
        # 8-connected path can wind through O(h*w) cells (serpentine floor
        # plans), so an h+w-scaled cap would silently mark long paths
        # unreachable while serial A* finds them.
        return changed & (it < h * w + 64)

    def body(carry):
        dist, _, it = carry
        # relax several steps per convergence check to amortize the reduction
        new = dist
        for _ in range(8):
            new = relax(new)
        return new, jnp.any(new < dist - 1e-6), it + 8

    dist, _, _ = jax.lax.while_loop(cond, body, (dist0, jnp.asarray(True),
                                                 jnp.int32(0)))
    return dist


def descend_path(dist: np.ndarray, goal: Tuple[int, int],
                 max_len: int = 10000) -> Optional[List[Tuple[int, int]]]:
    """Greedy steepest-descent from ``goal`` back to the wavefront source."""
    h, w = dist.shape
    cur = tuple(int(v) for v in goal)
    if not np.isfinite(dist[cur]) or dist[cur] >= INF:
        return None
    path = [cur]
    for _ in range(max_len):
        cy, cx = cur
        if dist[cy, cx] == 0.0:
            return path[::-1]
        best, best_d = None, dist[cy, cx]
        for dy, dx, cost in _NEIGHBORS:
            ny, nx = cy + dy, cx + dx
            if 0 <= ny < h and 0 <= nx < w and dist[ny, nx] < best_d:
                best, best_d = (ny, nx), dist[ny, nx]
        if best is None:
            return None
        cur = best
        path.append(cur)
    return None


def plan_many(free: np.ndarray, starts: np.ndarray, goals: np.ndarray,
              batch: int = 16):
    """Batched planning: one wavefront per unique start, greedy path recovery.

    Returns list of (path or None) matching the reference A* reachability
    semantics (path exists iff A* would find one — both compute shortest
    8-connected geodesics on the same grid).
    """
    free_j = jnp.asarray(free)
    out = []
    for i in range(0, len(starts), batch):
        src = jnp.asarray(starts[i:i + batch], jnp.int32)
        dists = np.asarray(wavefront_distances(free_j, src))
        for d, goal in zip(dists, goals[i:i + batch]):
            out.append(descend_path(d, tuple(int(v) for v in goal)))
    return out
