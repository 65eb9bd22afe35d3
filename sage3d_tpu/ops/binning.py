"""Tile binning: turn projected Gaussians into per-tile depth-ordered work lists.

TPU-native replacement for the CUDA rasterizer's duplicate-and-radix-sort
binning. The design is driven by measured XLA-on-TPU cost facts (traced
inputs): lax.sort is FAST (~1 ms/M elements), while scatters and 1-D gathers
with traced indices are 2-3 orders of magnitude slower per element. So the
binning is built from sorts and elementwise math ONLY — no scatters:

  1. Gaussians are argsorted by depth ONCE; the inverse permutation gives each
     Gaussian a 20-bit depth rank (one small N-scatter, the only one).
  2. Every visible Gaussian emits K1 candidate (tile, gaussian) entries
     elementwise from its tile rect (row-major); Gaussians spanning more than
     K1 tiles are handled by a second fixed block: the M_BIG largest spanners
     (by tile count, via one N-argsort) emit up to K2 entries each. Everything
     else overflows with an exact count — never silently wrong.
  3. Entries carry a fused int32 key  tile * 2^20 + depth_rank  (tile < 2047,
     rank < 2^20 fits int32); invalid entries get INT32_MAX. ONE unstable
     single-key sort orders all entries per-tile front-to-back and sinks the
     padding to the end.
  4. Per-tile [start, count) ranges come from a small searchsorted (T queries).

Everything is static-shaped and jittable; the entry budget is
N*K1 + M_BIG*K2, fixed at trace time.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians

TILE_W = 32  # 32x32-pixel tiles = 1024 px: reshapes to the VPU-native (8, 128)
TILE_H = 32

RANK_BITS = 20            # depth rank field of the fused key (N <= 2^20)
MAX_N = 1 << RANK_BITS
K1_DEFAULT = 16           # candidate entries per ordinary Gaussian
M_BIG_DEFAULT = 8192      # large-spanning Gaussians given extended budgets
K2_DEFAULT = 256          # entries per large Gaussian
INVALID_KEY = jnp.int32(2**31 - 1)


class TileBins(NamedTuple):
    pair_gauss: jnp.ndarray   # (P,) int32 gaussian index per pair, depth-ordered per tile
    tile_start: jnp.ndarray   # (T,) int32 first pair index of each tile
    tile_count: jnp.ndarray   # (T,) int32 number of pairs of each tile
    n_pairs: jnp.ndarray      # () int32 total valid pairs
    overflow: jnp.ndarray     # () int32 pairs dropped by the K1/K2/M budgets
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


def _emit_block(x0, y0, nx, count, sel, rank, tiles_x, k_budget: int):
    """(B, k_budget) fused keys + gaussian ids for the k-th tiles of each
    selected Gaussian's rect (row-major); invalid slots get INVALID_KEY."""
    k = jnp.arange(k_budget, dtype=jnp.int32)[None, :]
    nx_safe = jnp.maximum(nx, 1)[:, None]
    valid = sel[:, None] & (k < count[:, None])
    tid = (y0[:, None] + k // nx_safe) * tiles_x + (x0[:, None] + k % nx_safe)
    key = jnp.where(valid, tid * MAX_N + rank[:, None], INVALID_KEY)
    return key


@partial(jax.jit, static_argnames=("width", "height", "pair_capacity",
                                   "max_tiles_per_gaussian", "tile_w", "tile_h",
                                   "k_small", "m_big", "k_big"))
def bin_gaussians(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    pair_capacity: int = 0,      # kept for API compat; budget is K1/M/K2 now
    max_tiles_per_gaussian: int = 0,   # kept for API compat
    tile_w: int = TILE_W,
    tile_h: int = TILE_H,
    k_small: int = K1_DEFAULT,
    m_big: int = M_BIG_DEFAULT,
    k_big: int = K2_DEFAULT,
) -> TileBins:
    """Build per-tile depth-ordered Gaussian lists. Indices carry no gradient."""
    del pair_capacity, max_tiles_per_gaussian
    tiles_x, tiles_y = num_tiles(width, height, tile_w, tile_h)
    n_tiles = tiles_x * tiles_y
    n = proj.depths.shape[0]
    assert n <= MAX_N, f"depth-rank field supports up to {MAX_N} Gaussians"
    assert (n_tiles + 1) * MAX_N < 2**31, (
        f"{n_tiles} tiles overflow the fused int32 key; use smaller tiles "
        f"or shard the image (parallel/sharded_render.py)")
    m_big = max(min(m_big, n // 8), 1)  # scale the big-budget to the scene

    means2d = jax.lax.stop_gradient(proj.means2d)
    radii = proj.radii.astype(jnp.float32)
    depths = jax.lax.stop_gradient(proj.depths)

    # 1. Depth ranks (front-to-back). One small scatter inverts the argsort.
    order = jnp.argsort(jnp.where(proj.visible, depths, jnp.inf))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)

    # 2. Tile rect per Gaussian.
    mx = means2d[:, 0]
    my = means2d[:, 1]
    r = radii
    vis = proj.visible & (r > 0)
    x0 = jnp.clip(jnp.floor((mx - r) / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r) / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r) / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    nx = x1 - x0 + 1
    count = jnp.where(vis, nx * (y1 - y0 + 1), 0)

    small = count <= k_small
    key_small = _emit_block(x0, y0, nx, jnp.minimum(count, k_small),
                            vis & small, rank, tiles_x, k_small)

    # Large spanners: top m_big by count (one more N-argsort), budget k_big.
    big_score = jnp.where(vis & ~small, count, -1)
    big_idx = jnp.argsort(-big_score)[:m_big]
    big_sel = big_score[big_idx] > 0
    key_big = _emit_block(
        x0[big_idx], y0[big_idx], nx[big_idx],
        jnp.minimum(count[big_idx], k_big), big_sel, rank[big_idx],
        tiles_x, k_big)

    g_small = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                               (n, k_small))
    g_big = jnp.broadcast_to(big_idx[:, None].astype(jnp.int32),
                             (m_big, k_big))
    keys = jnp.concatenate([key_small.reshape(-1), key_big.reshape(-1)])
    gauss = jnp.concatenate([g_small.reshape(-1), g_big.reshape(-1)])

    # 3. One unstable single-key sort orders everything.
    keys_sorted, pair_gauss = jax.lax.sort(
        (keys, gauss), dimension=0, is_stable=False, num_keys=1)

    # 4. Tile ranges via a T-query searchsorted on the fused keys.
    tile_ids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(keys_sorted, tile_ids * MAX_N,
                              side="left").astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]

    # Overflow accounting: big Gaussians clipped at k_big, plus non-selected
    # large spanners dropped entirely.
    clipped_big = jnp.sum(jnp.where(big_sel,
                                    jnp.maximum(count[big_idx] - k_big, 0), 0))
    n_big_total = jnp.sum((vis & ~small).astype(jnp.int32))
    n_big_kept = jnp.sum(big_sel.astype(jnp.int32))
    dropped_whole = jnp.sum(
        jnp.where(vis & ~small, count, 0)) - jnp.sum(
        jnp.where(big_sel, count[big_idx], 0))
    del n_big_total, n_big_kept

    return TileBins(
        pair_gauss=pair_gauss,
        tile_start=tile_start,
        tile_count=tile_count,
        n_pairs=bounds[-1],
        overflow=(clipped_big + dropped_whole).astype(jnp.int32),
        tiles_x=tiles_x,
        tiles_y=tiles_y,
    )
