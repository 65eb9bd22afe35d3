"""Tile binning: turn projected Gaussians into per-tile depth-ordered work lists.

TPU-native replacement for the CUDA rasterizer's duplicate-and-radix-sort
binning. The design is driven by measured XLA-on-TPU cost facts (traced
inputs): lax.sort is FAST (~1 ms/M elements), while scatters and 1-D gathers
with traced indices are 2-3 orders of magnitude slower per element. So the
binning is built from sorts and elementwise math ONLY — no big scatters:

  1. Each visible Gaussian gets a depth RANK (front-to-back, ties broken by
     index — the oracle's stable order) from an argsort whose inverse comes
     from a SECOND argsort, never a scatter (sorts are ~1-2 ms at 1M rows,
     the unique-index inverse scatter was ~13 ms). Raw f32-bit depth codes
     (the CUDA-3DGS key trick) were tried and rejected: planar scenes have
     EXACTLY equal depths, and codes cannot express index tie-breaking, so
     oracle parity broke.
  2. Every visible Gaussian emits up to K1 candidate (tile, gaussian) entries
     elementwise from its TIGHT AABB tile rect (per-axis cutoff-ellipse
     extents, row-major), each candidate additionally CULLED by an exact
     conservative circle test (tile-rect distance to the mean vs the cutoff
     radius) that removes the AABB corners an anisotropic splat never touches.
     Gaussians spanning more than K1 tiles are handled by a second fixed
     block: the M_BIG largest spanners (by tile count, via one N-argsort) emit
     up to K2 entries each. Everything else overflows with an exact count —
     never silently wrong. `suggest_budgets` sizes (K1, M_BIG, K2) and the
     pair capacity from one cheap elementwise probe so production configs run
     overflow-free.
  3. Entries carry a fused int32 key  tile * 2^rank_bits + depth_rank, where
     rank_bits takes every bit the tile field does not need (>= 20); invalid
     entries get INT32_MAX. ONE unstable single-key sort orders all entries
     per-tile front-to-back and sinks the padding to the end. When the fused
     key cannot fit int32 (> 2047 tiles, e.g. 4K frames; or N > 2^rank_bits)
     the binning automatically switches to an equivalent two-key sort
     (tile, rank) — slightly slower, resolution- and scene-size-unlimited.
  4. Per-tile [start, count) ranges come from a small searchsorted (T queries).

Everything is static-shaped and jittable; the entry budget is
N*K1 + M_BIG*K2, fixed at trace time.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .projection import ALPHA_MIN, ProjectedGaussians

TILE_W = 32  # 32x32-pixel tiles = 1024 px: reshapes to the VPU-native (8, 128)
TILE_H = 32

RANK_BITS = 20            # depth-code field width of the fused key
MAX_N = 1 << RANK_BITS    # number of distinct depth codes (NOT a cap on N)
K1_DEFAULT = 16           # candidate entries per ordinary Gaussian
M_BIG_DEFAULT = 8192      # large-spanning Gaussians given extended budgets
K2_DEFAULT = 256          # entries per large Gaussian
INVALID_KEY = 2**31 - 1   # python int: a jnp scalar here would become a
                          # device-array constant fetched at every lowering


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


def _tile_rect(proj: ProjectedGaussians, tiles_x: int, tiles_y: int,
               tile_w: int, tile_h: int):
    """Tight per-Gaussian tile rect (from the per-axis AABB extents) + circle
    cull data. Returns (vis, x0, y0, nx, count, mx, my, r2)."""
    means2d = jax.lax.stop_gradient(proj.means2d)
    mx = means2d[:, 0]
    my = means2d[:, 1]
    ex = proj.extents[:, 0]
    ey = proj.extents[:, 1]
    r = proj.radii.astype(jnp.float32)
    vis = proj.visible & (r > 0)
    x0 = jnp.clip(jnp.floor((mx - ex) / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + ex) / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - ey) / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + ey) / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    nx = x1 - x0 + 1
    count = jnp.where(vis, nx * (y1 - y0 + 1), 0)
    return vis, x0, y0, nx, count, mx, my, r * r


def _emit_block(x0, y0, nx, count, sel, mx, my, r2, tiles_x, n_tiles,
                tile_w: int, tile_h: int, k_budget: int):
    """(B, k_budget) tile ids for the k-th tiles of each selected Gaussian's
    rect (row-major), with the corner-circle cull applied per candidate:
    a tile whose pixel rect lies entirely outside the cutoff circle cannot
    receive alpha >= ALPHA_MIN from this Gaussian (the cutoff radius bounds
    the Mahalanobis level set), so it is culled exactly and conservatively.
    Invalid/culled slots get tile id ``n_tiles`` (sorts after all real tiles).
    """
    k = jnp.arange(k_budget, dtype=jnp.int32)[None, :]
    nx_safe = jnp.maximum(nx, 1)[:, None]
    valid = sel[:, None] & (k < count[:, None])
    # k // nx and k % nx with a TRACED divisor: integer division lowers to a
    # slow multi-op sequence on the VPU, so divide in f32 via reciprocal and
    # repair the (at most +-1) rounding with two exact integer comparisons.
    inv = 1.0 / nx_safe.astype(jnp.float32)
    q = jnp.floor(k.astype(jnp.float32) * inv).astype(jnp.int32)
    r = k - q * nx_safe
    q = jnp.where(r < 0, q - 1, jnp.where(r >= nx_safe, q + 1, q))
    r = k - q * nx_safe
    tx = x0[:, None] + r
    ty = y0[:, None] + q
    # distance from the Gaussian mean to the tile's pixel rect
    fx0 = tx.astype(jnp.float32) * tile_w
    fy0 = ty.astype(jnp.float32) * tile_h
    dx = jnp.maximum(jnp.maximum(fx0 - mx[:, None],
                                 mx[:, None] - (fx0 + tile_w)), 0.0)
    dy = jnp.maximum(jnp.maximum(fy0 - my[:, None],
                                 my[:, None] - (fy0 + tile_h)), 0.0)
    valid = valid & (dx * dx + dy * dy <= r2[:, None])
    return jnp.where(valid, ty * tiles_x + tx, n_tiles)


EMIT_GB = 1024  # Gaussians per emission-kernel grid step (lane dim)
EMIT_KB = 128   # max candidate-tile rows per grid step: the kernel keeps ~13
                # live (k, gb) f32 temporaries, so an un-tiled k_budget of 512
                # at gb=1024 needs ~26 MB of scoped VMEM (> the 16 MB limit,
                # observed as a Mosaic stack OOM on device). Tiling k into the
                # grid caps the working set at ~6.8 MB for any budget.
ATTR_ROWS = 16  # emission attr table rows (2 f32 sublane tiles):
                # [x0, y0, nx, count_eff, mx, my, cut2, rank(bitcast),
                #  conic_a, conic_b, conic_c, 5 x pad]


def _emit_kernel(tiles_x: int, n_tiles: int, mult: int, tile_w: int,
                 tile_h: int, k_blk: int, attrs_ref, rank_ref, out_ref):
    """Fused tile-id emission: rect walk + exact ellipse-tile cull + key build
    for ``k_budget`` candidate tiles of EMIT_GB Gaussians, one elementwise pass.

    Same rect walk as `_emit_block`, re-oriented (k on sublanes, Gaussians on
    lanes). The XLA version materialized a dozen (N, k) intermediates and
    measured ~35 ms at 1M/1080p (emit + keys + concat); here the only HBM
    traffic is the attribute block in and the key block out.

    The cull is EXACT, not a bounding circle: a candidate tile survives iff
    the minimum of the Mahalanobis quadratic m2(p) = a dx^2 + 2b dx dy + c dy^2
    over the tile's pixel rect is <= cut2 = 2 ln(op / ALPHA_MIN) — i.e. iff
    SOME point of the tile could receive alpha >= ALPHA_MIN (which the
    compositors zero out, projection.py:196 / composite_pallas.py:112, so a
    culled pair contributes exactly nothing and parity is bit-safe). The min
    of the convex quadratic over the rect is 0 when the mean lies inside,
    else it lies on the boundary: each of the 4 edges restricts m2 to a 1-D
    convex quadratic whose clamped vertex evaluates in closed form. For
    anisotropic splats the bounding-circle test kept the whole AABB; this
    keeps only tiles the cutoff ELLIPSE actually reaches, shrinking every
    downstream P-proportional stage (sort, feature gather, fwd/bwd kernels,
    gradient reduction).

    ``mult`` > 0 emits fused int32 keys tid*mult+rank (INVALID_KEY when
    culled); ``mult`` == 0 emits the tile id itself (n_tiles when culled) for
    the two-key sort path, whose ranks ride a separate int32 operand upstream
    (ranks can exceed 2^24, so they never pass through this kernel's f32s).
    """
    x0 = attrs_ref[0:1, :]
    y0 = attrs_ref[1:2, :]
    nx = attrs_ref[2:3, :]
    count = attrs_ref[3:4, :]
    mx = attrs_ref[4:5, :]
    my = attrs_ref[5:6, :]
    cut2 = attrs_ref[6:7, :]
    ca = attrs_ref[8:9, :]
    cb = attrs_ref[9:10, :]
    cc = attrs_ref[10:11, :]

    kb = pl.program_id(1)
    kf = (jax.lax.broadcasted_iota(jnp.int32, (k_blk, 1), 0)
          + kb * k_blk).astype(jnp.float32)
    nxs = jnp.maximum(nx, 1.0)   # padded rows carry nx=0 (and count=0)
    inv = 1.0 / nxs
    q = jnp.floor(kf * inv)                       # (k, GB)
    r = kf - q * nxs
    q = jnp.where(r < 0, q - 1.0, jnp.where(r >= nxs, q + 1.0, q))
    r = kf - q * nxs
    tx = x0 + r
    ty = y0 + q
    fx0 = tx * float(tile_w)
    fy0 = ty * float(tile_h)
    # Tile pixel rect relative to the mean: x' in [x_lo, x_hi], y' likewise.
    x_lo = fx0 - mx
    x_hi = x_lo + float(tile_w)
    y_lo = fy0 - my
    y_hi = y_lo + float(tile_h)
    inside = (x_lo <= 0.0) & (x_hi >= 0.0) & (y_lo <= 0.0) & (y_hi >= 0.0)
    inv_a = 1.0 / jnp.maximum(ca, 1e-20)   # conic is PD (cov dilation), but
    inv_c = 1.0 / jnp.maximum(cc, 1e-20)   # padded rows carry zeros

    def vedge(xe):   # min over y' in [y_lo, y_hi] at fixed x' = xe
        t = jnp.clip(-cb * xe * inv_c, y_lo, y_hi)
        return (ca * xe) * xe + (2.0 * cb * xe + cc * t) * t

    def hedge(ye):   # min over x' in [x_lo, x_hi] at fixed y' = ye
        t = jnp.clip(-cb * ye * inv_a, x_lo, x_hi)
        return (cc * ye) * ye + (2.0 * cb * ye + ca * t) * t

    m2 = jnp.minimum(jnp.minimum(vedge(x_lo), vedge(x_hi)),
                     jnp.minimum(hedge(y_lo), hedge(y_hi)))
    m2 = jnp.where(inside, 0.0, m2)
    # 1e-3 relative+absolute margin >> f32 rounding of this ~10-op chain:
    # over-keeps a hair's width of tiles, never drops a contributing pair.
    valid = (kf < count) & (m2 <= cut2 * 1.001 + 1e-3)
    tid = (ty * float(tiles_x) + tx).astype(jnp.int32)
    if mult:
        rank = rank_ref[0:1, :]
        key = tid * mult + rank
        out_ref[...] = jnp.where(valid, key, INVALID_KEY)
    else:
        out_ref[...] = jnp.where(valid, tid, n_tiles)


@functools.lru_cache(maxsize=64)
def _get_emit_call(nb: int, gb: int, k_budget: int, tiles_x: int,
                   n_tiles: int, mult: int, tile_w: int, tile_h: int,
                   interpret: bool):
    k_blk = min(k_budget, EMIT_KB)
    k_pad = -(-k_budget // k_blk) * k_blk
    kernel = functools.partial(_emit_kernel, tiles_x, n_tiles, mult,
                               tile_w, tile_h, k_blk)

    def call(attrs, ranks):
        # Grid is (gaussian block, k block) with k fastest-varying: the attrs
        # / rank input blocks have the same index for every k step, so Mosaic
        # skips the redundant re-fetches.
        out = pl.pallas_call(
            kernel,
            grid=(nb, k_pad // k_blk),
            in_specs=[
                pl.BlockSpec((ATTR_ROWS, gb), lambda b, kb: (0, b)),
                pl.BlockSpec((1, gb), lambda b, kb: (0, b)),
            ],
            out_specs=pl.BlockSpec((k_blk, gb), lambda b, kb: (kb, b)),
            out_shape=jax.ShapeDtypeStruct((k_pad, nb * gb), jnp.int32),
            interpret=interpret,
        )(attrs, ranks)
        return out[:k_budget] if k_pad != k_budget else out

    return call


def _emit_fused(attrs, rank, tiles_x, n_tiles, tile_w: int, tile_h: int,
                k_budget: int, mult: int):
    """Pallas-fused `_emit_block`(+key build): returns (k_budget, N_pad)
    int32 keys (mult>0) or tile ids (mult==0), k-major — pair order is
    irrelevant pre-sort, so no transposes anywhere. The matching per-entry
    Gaussian-id / rank arrays are plain XLA broadcasts of the same layout.

    ``attrs``: (ATTR_ROWS, n) f32 rows (layout at ATTR_ROWS above);
    ``rank``: (n,) int32.
    """
    n = attrs.shape[1]
    gb = min(EMIT_GB, max(128, n))
    n_pad = -(-n // gb) * gb
    attrs = jnp.pad(attrs, ((0, 0), (0, n_pad - n)))
    ranks2 = jnp.pad(rank[None, :], ((0, 0), (0, n_pad - n)))
    call = _get_emit_call(n_pad // gb, gb, k_budget, tiles_x, n_tiles, mult,
                          tile_w, tile_h, jax.default_backend() != "tpu")
    out = call(attrs, ranks2)                             # (k, n_pad)
    return out, n_pad




@partial(jax.jit, static_argnames=("width", "height", "pair_capacity",
                                   "max_tiles_per_gaussian", "tile_w", "tile_h",
                                   "k_small", "m_big", "k_big", "m_mid",
                                   "k_mid"))
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
    m_mid: int = 0,
    k_mid: int = 0,
) -> TileBins:
    """Build per-tile depth-ordered Gaussian lists. Indices carry no gradient.

    Emission tiers: every Gaussian gets ``k_small`` slots; the top ``m_big``
    spanners (by AABB tile count) get ``k_big``. When ``m_mid``/``k_mid`` are
    set, a THIRD tier slots the mid-size spanners (k_small < count <= k_mid)
    at ``k_mid`` each, and the big tier only takes count > k_mid — at
    1080p/1M this cuts the sorted emission array ~40% (the k_small budget no
    longer has to cover the mid population), shrinking the emit kernel, the
    pair sort, and every downstream P-sized stage. Budget choice including
    the 3-tier option lives in ``_pick_budgets``.
    """
    del pair_capacity, max_tiles_per_gaussian
    tiles_x, tiles_y = num_tiles(width, height, tile_w, tile_h)
    n_tiles = tiles_x * tiles_y
    n = proj.depths.shape[0]
    # Rank-field width adapts to the tile count: every bit the tile field
    # does not need goes to the depth rank, so small frames can bin scenes
    # far beyond 2^20 Gaussians; when either field would not fit int32 the
    # two-key sort below takes over — no resolution or scene-size cap.
    rank_bits = min(((2**31 - 1) // max(n_tiles, 1)).bit_length() - 1, 31)
    fused_ok = rank_bits >= RANK_BITS and n <= (1 << rank_bits)
    m_big = max(min(m_big, n), 1)  # never exceed the scene size

    depths = jax.lax.stop_gradient(proj.depths)

    # 1. Depth ranks (front-to-back, ties by index — the oracle's stable
    # order). The inverse permutation comes from a SECOND argsort, not a
    # scatter: 1M-row sorts are ~1-2 ms while the unique-index scatter this
    # replaces measured ~13 ms (scatters serialize per element on TPU).
    order = jnp.argsort(jnp.where(proj.visible, depths, jnp.inf),
                        stable=True)
    rank = jnp.argsort(order).astype(jnp.int32)

    # 2. Tile rect per Gaussian (tight AABB + circle cull).
    vis, x0, y0, nx, count, mx, my, _ = _tile_rect(
        proj, tiles_x, tiles_y, tile_w, tile_h)

    small = count <= k_small
    mult = (1 << rank_bits) if fused_ok else 0
    use_mid = m_mid > 0 and k_mid > k_small
    m_mid = max(min(m_mid, n), 1) if use_mid else 1

    # Large spanners: top m_big by count (one more N-argsort), budget k_big.
    # With the mid tier active the big tier only takes count > k_mid.
    big_floor = k_mid if use_mid else k_small
    big_score = jnp.where(vis & (count > big_floor), count, -1)
    big_idx = jnp.argsort(-big_score)[:m_big]
    big_sel = big_score[big_idx] > 0
    if use_mid:
        mid_score = jnp.where(vis & ~small & (count <= k_mid), count, -1)
        mid_idx = jnp.argsort(-mid_score)[:m_mid]
        mid_sel = mid_score[mid_idx] > 0

    # Emission + cull + key build fused in a Pallas kernel (k-major layout —
    # pair order is irrelevant pre-sort). Outputs are fused keys (mult>0) or
    # raw tile ids (two-key path); the per-entry Gaussian-id / rank operands
    # are XLA broadcasts of the same (k, n_pad) layout. The big-spanner
    # selection gathers ONE (n, ATTR_ROWS) row table at big_idx (row gathers
    # are ~10 ns/row) instead of 10+ separate 1-D gathers (~230 ns/element
    # each); the int32 rank rides the f32 table bitcast (exact at any
    # magnitude). cut2 is the opacity-aware alpha cutoff the exact ellipse
    # cull tests against (projection.py:150).
    cut2 = 2.0 * jnp.log(
        jnp.maximum(jax.lax.stop_gradient(proj.opacities), ALPHA_MIN)
        / ALPHA_MIN)
    conics = jax.lax.stop_gradient(proj.conics)   # indices carry no gradient
    rows = jnp.stack([
        x0.astype(jnp.float32), y0.astype(jnp.float32),
        nx.astype(jnp.float32), count.astype(jnp.float32), mx, my, cut2,
        jax.lax.bitcast_convert_type(rank, jnp.float32),
        conics[:, 0], conics[:, 1], conics[:, 2],
    ], axis=1)                                              # (n, 11)
    rows = jnp.pad(rows, ((0, 0), (0, ATTR_ROWS - rows.shape[1])))
    attrs_small = jnp.transpose(rows, (1, 0))
    attrs_small = attrs_small.at[3].set(jnp.where(
        vis & small, jnp.minimum(count, k_small), 0).astype(jnp.float32))
    attrs_big = jnp.transpose(rows[big_idx], (1, 0))        # (ATTR_ROWS, m)
    count_big = attrs_big[3]    # exact: tile counts < 2^24
    attrs_big = attrs_big.at[3].set(
        jnp.where(big_sel, jnp.minimum(count_big, float(k_big)), 0.0))
    rank_big = jax.lax.bitcast_convert_type(attrs_big[7], jnp.int32)
    out_small, n_pad_s = _emit_fused(attrs_small, rank, tiles_x, n_tiles,
                                     tile_w, tile_h, k_small, mult)
    out_big, n_pad_b = _emit_fused(attrs_big, rank_big, tiles_x, n_tiles,
                                   tile_w, tile_h, k_big, mult)

    g_small = jnp.broadcast_to(
        jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, n_pad_s - n))[None, :],
        (k_small, n_pad_s))
    g_big = jnp.broadcast_to(
        jnp.pad(big_idx.astype(jnp.int32), (0, n_pad_b - m_big))[None, :],
        (k_big, n_pad_b))
    key_parts = [out_small.reshape(-1), out_big.reshape(-1)]
    gauss_parts = [g_small.reshape(-1), g_big.reshape(-1)]
    if use_mid:
        attrs_mid = jnp.transpose(rows[mid_idx], (1, 0))
        attrs_mid = attrs_mid.at[3].set(
            jnp.where(mid_sel, attrs_mid[3], 0.0))  # count <= k_mid by sel
        rank_mid = jax.lax.bitcast_convert_type(attrs_mid[7], jnp.int32)
        out_mid, n_pad_m = _emit_fused(attrs_mid, rank_mid, tiles_x, n_tiles,
                                       tile_w, tile_h, k_mid, mult)
        g_mid = jnp.broadcast_to(
            jnp.pad(mid_idx.astype(jnp.int32), (0, n_pad_m - m_mid))[None, :],
            (k_mid, n_pad_m))
        key_parts.insert(1, out_mid.reshape(-1))
        gauss_parts.insert(1, g_mid.reshape(-1))
    gauss = jnp.concatenate(gauss_parts)

    # 3. One sort orders everything per-tile front-to-back.
    tile_ids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    if fused_ok:
        keys = jnp.concatenate(key_parts)
        keys_sorted, pair_gauss = jax.lax.sort(
            (keys, gauss), dimension=0, is_stable=False, num_keys=1)
        bounds = jnp.searchsorted(keys_sorted, tile_ids * mult,
                                  side="left").astype(jnp.int32)
    else:
        # 4K+ path: two-key sort, no resolution cap from the fused key.
        # Ranks can exceed 2^24, so they ride their own int32 broadcast and
        # never pass through the kernel's f32 lanes.
        tids = jnp.concatenate(key_parts)
        rank_small = jnp.broadcast_to(
            jnp.pad(rank, (0, n_pad_s - n))[None, :], (k_small, n_pad_s))
        rank_big2 = jnp.broadcast_to(
            jnp.pad(rank_big, (0, n_pad_b - m_big))[None, :],
            (k_big, n_pad_b))
        rank_parts = [rank_small.reshape(-1), rank_big2.reshape(-1)]
        if use_mid:
            rank_mid2 = jnp.broadcast_to(
                jnp.pad(rank_mid, (0, n_pad_m - m_mid))[None, :],
                (k_mid, n_pad_m))
            rank_parts.insert(1, rank_mid2.reshape(-1))
        ranks = jnp.concatenate(rank_parts)
        tids_sorted, _, pair_gauss = jax.lax.sort(
            (tids, ranks, gauss), dimension=0, is_stable=False, num_keys=2)
        bounds = jnp.searchsorted(tids_sorted, tile_ids,
                                  side="left").astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]

    # Overflow accounting (conservative overestimate: AABB counts, pre-cull):
    # big Gaussians clipped at k_big, plus non-selected spanners dropped whole
    # (spanner counts not covered by the big tier or, when active, the mid
    # tier — mid entries are never clipped since selection caps count<=k_mid).
    clipped_big = jnp.sum(jnp.where(big_sel,
                                    jnp.maximum(count[big_idx] - k_big, 0), 0))
    covered = jnp.sum(jnp.where(big_sel, count[big_idx], 0))
    if use_mid:
        covered = covered + jnp.sum(jnp.where(mid_sel, count[mid_idx], 0))
    dropped_whole = jnp.sum(jnp.where(vis & ~small, count, 0)) - covered

    return TileBins(
        pair_gauss=pair_gauss,
        tile_start=tile_start,
        tile_count=tile_count,
        n_pairs=bounds[-1],
        overflow=(clipped_big + dropped_whole).astype(jnp.int32),
        tiles_x=tiles_x,
        tiles_y=tiles_y,
    )


SUGGEST_THRESHOLDS = (4, 8, 16, 32, 64, 128)


@partial(jax.jit, static_argnames=("width", "height", "tile_w", "tile_h"))
def pair_count_stats(proj: ProjectedGaussians, width: int, height: int,
                     tile_w: int = TILE_W, tile_h: int = TILE_H):
    """Cheap elementwise probe of the binning workload (no sort): per-Gaussian
    AABB tile counts reduced to the scalars `suggest_budgets` needs."""
    tiles_x, tiles_y = num_tiles(width, height, tile_w, tile_h)
    vis, _, _, _, count, _, _, _ = _tile_rect(proj, tiles_x, tiles_y,
                                              tile_w, tile_h)
    exceed = jnp.stack([jnp.sum((count > k).astype(jnp.int32))
                        for k in SUGGEST_THRESHOLDS])
    # sum_count can exceed int32 on huge scenes (2M Gaussians x >1k tiles
    # each); x64 is off, so return 256 chunk partials (each safely < 2^31:
    # chunk <= ceil(N/256) Gaussians x count < n_tiles) and let the host sum
    # them in Python ints (see _pick_budgets).
    n = count.shape[0]
    pad = (-n) % 256
    parts = jnp.sum(jnp.pad(count, (0, pad)).reshape(256, -1), axis=1)
    return {
        "n_visible": jnp.sum(vis.astype(jnp.int32)),
        "sum_count_parts": parts,
        "max_count": jnp.max(count),
        "exceed": exceed,   # aligned with SUGGEST_THRESHOLDS
    }


def _pow2_at_least(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def suggest_budgets(proj: ProjectedGaussians, width: int, height: int,
                    tile_w: int = TILE_W, tile_h: int = TILE_H) -> dict:
    """Overflow-free static budgets for `bin_gaussians` + the pair capacity,
    chosen from one device probe (host fetches 4 scalars). Minimises the
    emission-array size N*k1 + m*k2 subject to zero dropped pairs.

    Returns {"k_small", "m_big", "k_big", "pair_capacity", "n_pairs_upper"}.
    Re-run per (scene, resolution) bucket; each choice is one cached compile.
    NOTE: takes an already-projected scene; prefer renderer.render.
    autotune_budgets(scene, camera), which runs projection + stats as ONE
    jitted program (required on the tunneled TPU, where eager is slow).
    """
    stats = jax.device_get(pair_count_stats(proj, width, height,
                                            tile_w=tile_w, tile_h=tile_h))
    return _pick_budgets(stats, proj.depths.shape[0])


def _pick_budgets(stats: dict, n: int) -> dict:
    """Host-side budget choice from fetched `pair_count_stats` scalars.

    Considers both the 2-tier (small/big) and the 3-tier (small/mid/big)
    emission layouts and picks the smaller total emission array — at
    1080p/1M the mid tier roughly halves the sorted array (the k_small
    budget no longer has to cover the mid-size spanner population). The
    3-tier form costs one extra N-argsort + emit call, so it must win by
    >=20% to be chosen."""
    max_count = int(stats["max_count"])
    sum_count = sum(int(p) for p in stats["sum_count_parts"])
    exceed = [int(e) for e in stats["exceed"]]
    k_big = max(_pow2_at_least(max_count), 8)

    def msize(n_exceed):
        return max(_pow2_at_least(n_exceed + max(n_exceed // 8, 16)), 32)

    best = None
    for k1, e1 in zip(SUGGEST_THRESHOLDS, exceed):
        emission = n * k1 + msize(e1) * k_big
        if best is None or emission < best[0]:
            best = (emission, k1, msize(e1), 0, 0)
    for i, (k1, e1) in enumerate(zip(SUGGEST_THRESHOLDS, exceed)):
        for k2, e2 in zip(SUGGEST_THRESHOLDS[i + 1:], exceed[i + 1:]):
            m_mid = msize(e1 - e2)
            m_big3 = msize(e2)
            emission = n * k1 + m_mid * k2 + m_big3 * k_big
            if emission < best[0] * 0.8:
                best = (emission, k1, m_big3, m_mid, k2)
    _, k_small, m_big, m_mid, k_mid = best
    # 128-multiple (the kernel's chunk size), NOT pow2: every downstream stage
    # (feature row-gather, VJP sort + gradient-row gather + cumsum) is
    # proportional to the static capacity, so pow2-rounding a 5.03M workload
    # to 8.4M would tax the whole pipeline ~40% for nothing.
    pair_capacity = -(-(sum_count + 1024) // 128) * 128
    return {
        "k_small": int(k_small),
        "m_big": int(m_big),
        "k_big": int(k_big),
        "m_mid": int(m_mid),
        "k_mid": int(k_mid),
        "pair_capacity": int(pair_capacity),
        "n_pairs_upper": sum_count,
    }
