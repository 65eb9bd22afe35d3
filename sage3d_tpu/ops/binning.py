"""Tile binning: turn projected Gaussians into per-tile depth-ordered work lists.

TPU-native replacement for the CUDA rasterizer's duplicate-and-radix-sort binning
(the stage Isaac Sim's renderer performs on GPU for the reference's 3DGS scenes).
The GPU idiom — dynamic-size key arrays + radix sort by (tile << 32 | depth) — is
re-designed for XLA's static-shape world:

  1. Gaussians are globally argsorted by depth ONCE per camera.
  2. Each visible Gaussian emits up to MAX_TILES_PER_GAUSSIAN (tile, gaussian)
     pairs into a fixed-capacity flat buffer via cumsum offsets + scatter-drop.
     Overflow is counted, never silently wrong order.
  3. A single STABLE sort by tile id orders pairs; because pairs were generated
     in depth order, stability gives per-tile depth order for free — no 64-bit
     key needed (XLA sort on TPU is fastest on one 32-bit key).
  4. Per-tile [start, count) ranges come from a vectorized searchsorted.

Everything is static-shaped and jittable; capacities are static ints chosen per
scene/resolution bucket (recompilation per bucket, like any XLA program).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians

TILE_W = 32  # 32x32-pixel tiles = 1024 px: reshapes to the VPU-native (8, 128)
TILE_H = 32


class TileBins(NamedTuple):
    pair_gauss: jnp.ndarray   # (P,) int32 gaussian index per pair, depth-ordered per tile
    tile_start: jnp.ndarray   # (T,) int32 first pair index of each tile
    tile_count: jnp.ndarray   # (T,) int32 number of pairs of each tile
    n_pairs: jnp.ndarray      # () int32 total valid pairs (<= capacity)
    overflow: jnp.ndarray     # () int32 pairs dropped due to capacity
    tiles_x: int
    tiles_y: int


def _tb_flatten(tb: TileBins):
    return (tb.pair_gauss, tb.tile_start, tb.tile_count, tb.n_pairs, tb.overflow), (
        tb.tiles_x, tb.tiles_y)


jax.tree_util.register_pytree_node(
    TileBins, _tb_flatten, lambda aux, ch: TileBins(*ch, *aux))


def num_tiles(width: int, height: int, tile_w: int = TILE_W, tile_h: int = TILE_H):
    tx = -(-width // tile_w)
    ty = -(-height // tile_h)
    return tx, ty


@partial(jax.jit, static_argnames=("width", "height", "pair_capacity",
                                   "max_tiles_per_gaussian", "tile_w", "tile_h"))
def bin_gaussians(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    pair_capacity: int,
    max_tiles_per_gaussian: int = 128,
    tile_w: int = TILE_W,
    tile_h: int = TILE_H,
) -> TileBins:
    """Build per-tile depth-ordered Gaussian lists. Indices carry no gradient."""
    tiles_x, tiles_y = num_tiles(width, height, tile_w, tile_h)
    n_tiles = tiles_x * tiles_y
    n = proj.depths.shape[0]

    means2d = jax.lax.stop_gradient(proj.means2d)
    radii = proj.radii.astype(jnp.float32)

    # 1. Global depth sort (invisible to the back).
    order = jnp.argsort(jnp.where(proj.visible, jax.lax.stop_gradient(proj.depths),
                                  jnp.inf))
    mx = means2d[order, 0]
    my = means2d[order, 1]
    r = radii[order]
    vis = proj.visible[order] & (r > 0)

    # 2. Tile rectangle touched by each Gaussian (clamped to the grid).
    x0 = jnp.clip(jnp.floor((mx - r) / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r) / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r) / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    count = jnp.where(vis, nx * ny, 0)
    # Gaussians spanning more tiles than the static cap keep the first
    # max_tiles_per_gaussian tiles (row-major within their rect) and are counted.
    clipped = jnp.maximum(count - max_tiles_per_gaussian, 0)
    count_c = jnp.minimum(count, max_tiles_per_gaussian)

    offsets = jnp.cumsum(count_c) - count_c          # exclusive prefix sum
    total = offsets[-1] + count_c[-1] if n > 0 else jnp.int32(0)

    # 3. Emit pairs: k-th tile of gaussian g lands at offsets[g] + k.
    # One vectorized (N, K) scatter; invalid slots target index==capacity and
    # are dropped by the scatter mode (never written).
    pair_tile = jnp.full((pair_capacity,), jnp.int32(n_tiles), jnp.int32)
    pair_gauss = jnp.zeros((pair_capacity,), jnp.int32)
    g_ids = jnp.arange(n, dtype=jnp.int32)
    k = jnp.arange(max_tiles_per_gaussian, dtype=jnp.int32)[None, :]   # (1, K)
    nx_safe = jnp.maximum(nx, 1)[:, None]
    valid = k < count_c[:, None]                                       # (N, K)
    tid = (y0[:, None] + k // nx_safe) * tiles_x + (x0[:, None] + k % nx_safe)
    idx = jnp.where(valid, offsets[:, None] + k, pair_capacity)
    pair_tile = pair_tile.at[idx.reshape(-1)].set(
        jnp.where(valid, tid, n_tiles).reshape(-1), mode="drop")
    pair_gauss = pair_gauss.at[idx.reshape(-1)].set(
        jnp.broadcast_to(g_ids[:, None], idx.shape).reshape(-1), mode="drop")

    dropped = jnp.sum(clipped) + jnp.maximum(total - pair_capacity, 0)

    # 4. Stable sort by tile id; padding (tile == n_tiles) sinks to the end.
    pair_tile, pair_gauss = jax.lax.sort(
        (pair_tile, pair_gauss), dimension=0, is_stable=True, num_keys=1)

    # 5. Per-tile ranges. pair_gauss values index the DEPTH-SORTED arrays, so
    # map back to original gaussian indices for downstream gathers.
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(pair_tile, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(pair_tile, tile_ids, side="right").astype(jnp.int32)
    tile_count = tile_end - tile_start

    pair_gauss_orig = order.astype(jnp.int32)[pair_gauss]

    return TileBins(
        pair_gauss=pair_gauss_orig,
        tile_start=tile_start,
        tile_count=tile_count,
        n_pairs=jnp.minimum(total, pair_capacity).astype(jnp.int32),
        overflow=dropped.astype(jnp.int32),
        tiles_x=tiles_x,
        tiles_y=tiles_y,
    )
