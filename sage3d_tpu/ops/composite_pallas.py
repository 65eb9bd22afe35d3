"""Pallas TPU compositing kernels: hand-scheduled forward + analytic backward.

The production rasterizer core (BASELINE.json north star). Same math as
ops/composite_xla.py, re-scheduled for the TPU memory system:

  * Grid = one step per 32x32 tile. Each step walks its depth-ordered pair
    list in 128-Gaussian chunks with a double-buffered manual DMA pipeline
    (HBM -> VMEM, semaphores), and STOPS as soon as every pixel of the tile is
    saturated (transmittance < 1e-4) — the early termination that gives tiled
    rasterizers their 10-100x win on dense scenes. Skipped chunks are neither
    fetched nor computed.
  * Layout chosen for Mosaic's constraints and vreg efficiency: per-pair
    features live FEATURE-MAJOR in HBM as (16, P) (lane dim of HBM DMA slices
    must be 128-aligned), each (16, 128) chunk block is transposed in-VMEM to
    (128, 16); the alpha matrix is (128 pairs on SUBLANES) x (1024 pixels on
    LANES), so every per-pixel state row is a dense (1, 1024) vector (8 vregs,
    no lane padding) and the out block is a dense (NCH, NPIX). Front-to-back
    transmittance is an exact fp32 prefix product over sublanes via masked
    pltpu.roll doubling.
  * Backward is a SINGLE forward-order sweep per tile: the suffix sums CUDA
    implementations obtain by back-to-front traversal come from the identity
    B_g = sum_{j>g} c_j w_j = (gbar . acc) - prefix_incl(c w), with acc the
    saved forward output. d(feats) rows reduce over the pixel sublanes and
    stream back to HBM through the same DMA pipeline into a zero-initialized
    aliased buffer, so early-terminated tails stay zero.
  * Per-pair features are built ONCE in pair-major jnp (gathers) — autodiff's
    gather transpose scatter-adds pair gradients back onto the Gaussians, so
    the custom_vjp boundary is exactly the flat compositor.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE_H, TILE_W, TileBins
from .gather_ops import gather_rows, gather_rows_unique
from .projection import ALPHA_MAX, ALPHA_MIN, ProjectedGaussians

CHUNK = 128          # Gaussians per chunk = lane count of the alpha matrix
NPIX = TILE_W * TILE_H  # 1024 pixels per tile = sublane count
NFEAT = 16           # feature rows per pair (padded to 16)
NCH = 8              # out channels: r,g,b,depth,alpha,trans,best_w,best_id
TRANS_EPS = 1e-4     # classic 3DGS early-termination threshold


def _pixel_rows():
    """Tile-local pixel-center coordinates as (1, NPIX) lane rows."""
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = (pix % TILE_W).astype(jnp.float32) + 0.5
    py = (pix // TILE_W).astype(jnp.float32) + 0.5
    return px, py


def _sub_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)


def _alpha_matrix(co_t, lane_count, ox, oy):
    """(CHUNK, NPIX) alpha of each pair at each tile pixel; plus raw pre-clamp.

    ``co_t`` is the transposed (CHUNK, NFEAT) attribute block — columns are
    (CHUNK, 1) sublane vectors broadcast against the (1, NPIX) pixel rows:
    [a, b, c (conic), Cx, Cy (GLOBAL screen mean), opacity, r, g, b, depth,
    sem, pad...]. The tile-LOCAL quadratic coefficients are derived here from
    the tile origin (ox, oy): attributes are therefore purely per-Gaussian,
    so the host-side build is ONE row-gather instead of per-pair math.
    Pairs on sublanes / pixels on lanes keeps per-pixel state rows dense.
    """
    a = co_t[:, 0:1]
    b = co_t[:, 1:2]
    c = co_t[:, 2:3]
    cx = co_t[:, 3:4] - ox
    cy = co_t[:, 4:5] - oy
    w0 = -0.5 * (a * cx * cx + c * cy * cy) - b * cx * cy
    wx = a * cx + b * cy
    wy = c * cy + b * cx
    px, py = _pixel_rows()
    power = (w0 + wx * px + wy * py
             - 0.5 * a * (px * px) - 0.5 * c * (py * py) - b * (px * py))
    raw = co_t[:, 5:6] * jnp.exp(jnp.minimum(power, 0.0))
    raw = jnp.where(power > 0.0, 0.0, raw)
    raw = jnp.where(_sub_iota() < lane_count, raw, 0.0)
    alpha = jnp.minimum(raw, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha, raw


def _scan_products(one_minus_alpha):
    """Inclusive prefix product over sublanes via masked roll doubling."""
    x = one_minus_alpha
    sub = _sub_iota()
    k = 1
    while k < CHUNK:
        rolled = pltpu.roll(x, k, 0)
        x = x * jnp.where(sub >= k, rolled, 1.0)
        k *= 2
    return x  # x[g, :] = prod_{j<=g} (1 - alpha_j)


def _scan_sums(v):
    """Inclusive prefix sum over sublanes via masked roll doubling."""
    x = v
    sub = _sub_iota()
    k = 1
    while k < CHUNK:
        rolled = pltpu.roll(x, k, 0)
        x = x + jnp.where(sub >= k, rolled, 0.0)
        k *= 2
    return x


def _shift_one(x, fill):
    rolled = pltpu.roll(x, 1, 0)
    return jnp.where(_sub_iota() >= 1, rolled, fill)


# Row-count-parameterized variants (the backward works on half chunks to keep
# its larger working set resident in VMEM).

def _alpha_half(co_t, lane_count, ox, oy, rows: int):
    a = co_t[:, 0:1]
    b = co_t[:, 1:2]
    c = co_t[:, 2:3]
    cx = co_t[:, 3:4] - ox
    cy = co_t[:, 4:5] - oy
    w0 = -0.5 * (a * cx * cx + c * cy * cy) - b * cx * cy
    wx = a * cx + b * cy
    wy = c * cy + b * cx
    px, py = _pixel_rows()
    power = (w0 + wx * px + wy * py
             - 0.5 * a * (px * px) - 0.5 * c * (py * py) - b * (px * py))
    raw = co_t[:, 5:6] * jnp.exp(jnp.minimum(power, 0.0))
    raw = jnp.where(power > 0.0, 0.0, raw)
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    raw = jnp.where(sub < lane_count, raw, 0.0)
    alpha = jnp.minimum(raw, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha, raw


def _scan_products_n(x, rows: int):
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    k = 1
    while k < rows:
        rolled = pltpu.roll(x, k, 0)
        x = x * jnp.where(sub >= k, rolled, 1.0)
        k *= 2
    return x


def _scan_sums_n(v, rows: int):
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    x = v
    k = 1
    while k < rows:
        rolled = pltpu.roll(x, k, 0)
        x = x + jnp.where(sub >= k, rolled, 0.0)
        k *= 2
    return x


def _shift_one_n(x, fill, rows: int):
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    rolled = pltpu.roll(x, 1, 0)
    return jnp.where(sub >= 1, rolled, fill)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(tiles_x, tile_start_ref, tile_count_ref, feats_hbm, out_ref,
                scratch, sems):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    n_chunks = pl.cdiv(count, CHUNK)
    ox = ((t % tiles_x) * TILE_W).astype(jnp.float32)
    oy = ((t // tiles_x) * TILE_H).astype(jnp.float32)

    def dma(slot, k):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK)],
            scratch.at[slot], sems.at[slot])

    @pl.when(n_chunks > 0)
    def _prefetch():
        dma(0, 0).start()

    def cond(carry):
        k, acc, trans, best_w, best_id = carry
        return (k < n_chunks) & (jnp.max(trans) > TRANS_EPS)

    def body(carry):
        k, acc, trans, best_w, best_id = carry

        @pl.when(k + 1 < n_chunks)
        def _next():
            dma((k + 1) % 2, k + 1).start()

        dma(k % 2, k).wait()
        co_t = jnp.transpose(scratch[k % 2], (1, 0))  # (CHUNK, NFEAT)
        lane_count = jnp.minimum(count - k * CHUNK, CHUNK)
        alpha, _ = _alpha_matrix(co_t, lane_count, ox, oy)  # (CHUNK, NPIX)
        incl = _scan_products(1.0 - alpha)
        excl = _shift_one(incl, 1.0)
        w = alpha * trans * excl                      # (CHUNK, NPIX)

        acc = acc + jnp.concatenate([
            jnp.sum(w * co_t[:, 6:7], axis=0, keepdims=True),
            jnp.sum(w * co_t[:, 7:8], axis=0, keepdims=True),
            jnp.sum(w * co_t[:, 8:9], axis=0, keepdims=True),
            jnp.sum(w * co_t[:, 9:10], axis=0, keepdims=True),
            jnp.sum(w, axis=0, keepdims=True),
        ], axis=0)                                    # (5, NPIX)

        cmax = jnp.max(w, axis=0, keepdims=True)      # (1, NPIX)
        sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NPIX), 0)
        first_max = jnp.min(jnp.where((w == cmax) & (cmax > 0.0), sub, CHUNK),
                            axis=0, keepdims=True)
        sel = jnp.sum(jnp.where(sub == first_max, co_t[:, 10:11], 0.0),
                      axis=0, keepdims=True)
        better = cmax > best_w
        best_w = jnp.where(better, cmax, best_w)
        best_id = jnp.where(better, sel, best_id)
        trans = trans * incl[CHUNK - 1:CHUNK, :]
        return k + 1, acc, trans, best_w, best_id

    init = (jnp.int32(0),
            jnp.zeros((5, NPIX), jnp.float32),
            jnp.ones((1, NPIX), jnp.float32),
            jnp.zeros((1, NPIX), jnp.float32),
            jnp.full((1, NPIX), -1.0, jnp.float32))
    k_end, acc, trans, best_w, best_id = jax.lax.while_loop(cond, body, init)

    # Early exit leaves the next chunk's prefetch in flight; drain it so the
    # semaphore state is clean for the next grid step.
    @pl.when((k_end >= 1) & (k_end < n_chunks))
    def _drain_prefetch():
        dma(k_end % 2, k_end).wait()

    out_ref[0, 0:5, :] = acc
    out_ref[0, 5:6, :] = trans
    out_ref[0, 6:7, :] = best_w
    out_ref[0, 7:8, :] = best_id


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(tiles_x, tile_start_ref, tile_count_ref, feats_hbm, fwd_ref,
                gout_ref, dfeats_init_hbm, dfeats_hbm, scratch, dscratch,
                sems, dsems):
    del dfeats_init_hbm  # aliased into dfeats_hbm (pre-zeroed)
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    n_chunks = pl.cdiv(count, CHUNK)
    ox = ((t % tiles_x) * TILE_W).astype(jnp.float32)
    oy = ((t // tiles_x) * TILE_H).astype(jnp.float32)

    def dma_in(slot, k):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK)],
            scratch.at[slot], sems.at[slot])

    def dma_out(slot, k):
        return pltpu.make_async_copy(
            dscratch.at[slot],
            dfeats_hbm.at[:, pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK)],
            dsems.at[slot])

    @pl.when(n_chunks > 0)
    def _prefetch():
        dma_in(0, 0).start()

    g0 = gout_ref[0, 0:1, :]                          # (1, NPIX)
    g1 = gout_ref[0, 1:2, :]
    g2 = gout_ref[0, 2:3, :]
    g3 = gout_ref[0, 3:4, :]
    g4 = gout_ref[0, 4:5, :]
    g_t = gout_ref[0, 5:6, :]
    s_pix = (g0 * fwd_ref[0, 0:1, :] + g1 * fwd_ref[0, 1:2, :]
             + g2 * fwd_ref[0, 2:3, :] + g3 * fwd_ref[0, 3:4, :]
             + g4 * fwd_ref[0, 4:5, :])
    t_fin = fwd_ref[0, 5:6, :]

    def cond(carry):
        k, trans, prefix = carry
        return (k < n_chunks) & (jnp.max(trans) > TRANS_EPS)

    def body(carry):
        k, trans, prefix = carry

        @pl.when(k + 1 < n_chunks)
        def _next():
            dma_in((k + 1) % 2, k + 1).start()

        dma_in(k % 2, k).wait()
        # wait for the out-DMA that used this dscratch slot two chunks ago
        @pl.when(k >= 2)
        def _drain():
            dma_out(k % 2, k - 2).wait()

        co_full = jnp.transpose(scratch[k % 2], (1, 0))  # (CHUNK, NFEAT)
        lane_count = jnp.minimum(count - k * CHUNK, CHUNK)

        # Process the chunk in HALF-sized sub-blocks: the backward needs ~15
        # live (rows, NPIX) matrices, and at rows=CHUNK that overflows VMEM
        # into spill traffic. rows=CHUNK//2 keeps the working set resident;
        # transmittance/prefix carries chain across the halves exactly.
        dsub_parts = []
        for h in range(2):
            half = CHUNK // 2
            co_t = co_full[h * half:(h + 1) * half, :]   # (half, NFEAT)
            lc = jnp.clip(lane_count - h * half, 0, half)
            alpha, raw = _alpha_half(co_t, lc, ox, oy, half)
            incl = _scan_products_n(1.0 - alpha, half)
            excl = _shift_one_n(incl, 1.0, half)
            t_at = trans * excl
            w = alpha * t_at                              # (half, NPIX)

            c = (co_t[:, 6:7] * g0 + co_t[:, 7:8] * g1 + co_t[:, 8:9] * g2
                 + co_t[:, 9:10] * g3 + g4)
            incl_cw = prefix + _scan_sums_n(c * w, half)
            om = 1.0 - alpha
            dalpha = c * t_at - (s_pix - incl_cw) / om - g_t * t_fin / om
            active = (alpha > 0.0) & (raw <= ALPHA_MAX)
            dalpha = jnp.where(active, dalpha, 0.0)
            dpower = dalpha * alpha

            op = co_t[:, 5:6]
            dop = jnp.sum(dalpha * alpha, axis=1,
                          keepdims=True) / jnp.where(op > 0, op, 1.0)

            # power = -0.5(a dx^2 + c dy^2) - b dx dy, dx = px - (Cx - ox)
            px, py = _pixel_rows()
            ca = co_t[:, 0:1]
            cb = co_t[:, 1:2]
            cc = co_t[:, 2:3]
            dx = px - (co_t[:, 3:4] - ox)                 # (half, NPIX)
            dy = py - (co_t[:, 4:5] - oy)
            d_a = jnp.sum(dpower * (-0.5 * dx * dx), axis=1, keepdims=True)
            d_b = jnp.sum(dpower * (-dx * dy), axis=1, keepdims=True)
            d_c = jnp.sum(dpower * (-0.5 * dy * dy), axis=1, keepdims=True)
            d_cx = jnp.sum(dpower * (ca * dx + cb * dy), axis=1, keepdims=True)
            d_cy = jnp.sum(dpower * (cc * dy + cb * dx), axis=1, keepdims=True)
            df_r = jnp.sum(g0 * w, axis=1, keepdims=True)
            df_g = jnp.sum(g1 * w, axis=1, keepdims=True)
            df_b = jnp.sum(g2 * w, axis=1, keepdims=True)
            df_d = jnp.sum(g3 * w, axis=1, keepdims=True)
            zeros = jnp.zeros((half, 1), jnp.float32)
            dsub_parts.append(jnp.concatenate(
                [d_a, d_b, d_c, d_cx, d_cy, dop, df_r, df_g, df_b, df_d,
                 zeros, zeros, zeros, zeros, zeros, zeros], axis=1))

            trans = trans * incl[half - 1:half, :]
            prefix = incl_cw[half - 1:half, :]

        dchunk = jnp.concatenate(dsub_parts, axis=0)      # (CHUNK, NFEAT)
        dscratch[k % 2] = jnp.transpose(dchunk, (1, 0))   # (NFEAT, CHUNK)
        dma_out(k % 2, k).start()
        return k + 1, trans, prefix

    init = (jnp.int32(0), jnp.ones((1, NPIX), jnp.float32),
            jnp.zeros((1, NPIX), jnp.float32))
    k_end, _, _ = jax.lax.while_loop(cond, body, init)

    # Early exit leaves the next chunk's input prefetch in flight; drain it.
    @pl.when((k_end >= 1) & (k_end < n_chunks))
    def _drain_prefetch():
        dma_in(k_end % 2, k_end).wait()

    # drain the last (up to two) in-flight output DMAs
    @pl.when(k_end >= 2)
    def _d1():
        dma_out(k_end % 2, k_end - 2).wait()

    @pl.when(k_end >= 1)
    def _d2():
        dma_out((k_end - 1) % 2, k_end - 1).wait()


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=32)
def _get_flat_composite(n_tiles: int, tiles_x: int, p_al: int, interpret: bool):
    """custom_vjp'd flat compositor for a static (tiles, capacity) config."""
    fwd_kernel = functools.partial(_fwd_kernel, tiles_x)
    bwd_kernel = functools.partial(_bwd_kernel, tiles_x)

    def fwd_call(feats_t, tile_start, tile_count):
        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, NCH, NPIX), lambda t, s, c: (t, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, NFEAT, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            fwd_kernel,
            grid_spec=grid,
            out_shape=jax.ShapeDtypeStruct((n_tiles, NCH, NPIX), jnp.float32),
            interpret=interpret,
        )(tile_start, tile_count, feats_t)

    def bwd_call(feats_t, tile_start, tile_count, fwd_out, gout):
        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, NCH, NPIX), lambda t, s, c: (t, 0, 0)),
                pl.BlockSpec((1, NCH, NPIX), lambda t, s, c: (t, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, NFEAT, CHUNK), jnp.float32),
                pltpu.VMEM((2, NFEAT, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        zeros = jnp.zeros_like(feats_t)
        return pl.pallas_call(
            bwd_kernel,
            grid_spec=grid,
            out_shape=jax.ShapeDtypeStruct(feats_t.shape, jnp.float32),
            input_output_aliases={5: 0},  # zeros arg (incl. prefetch) -> out
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(tile_start, tile_count, feats_t, fwd_out, gout, zeros)

    @jax.custom_vjp
    def flat_composite(feats_t, tile_start, tile_count):
        return fwd_call(feats_t, tile_start, tile_count)

    def _fwd(feats_t, tile_start, tile_count):
        out = fwd_call(feats_t, tile_start, tile_count)
        return out, (feats_t, tile_start, tile_count, out)

    def _bwd(res, gout):
        feats_t, tile_start, tile_count, fwd_out = res
        dfeats = bwd_call(feats_t, tile_start, tile_count, fwd_out, gout)
        return dfeats, None, None

    flat_composite.defvjp(_fwd, _bwd)
    return flat_composite


@functools.partial(jax.jit, static_argnames=("width", "height", "tile_capacity",
                                              "pair_capacity"))
def composite_tiles_pallas(
    proj: ProjectedGaussians,
    semantic_ids: jnp.ndarray,
    bins: TileBins,
    width: int,
    height: int,
    tile_capacity: int = 4096,
    pair_capacity: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Composite via the Pallas kernels. Same output schema as composite_tiles.

    ``pair_capacity`` (static, 0 = the binning entry budget) trims the sorted
    pair array: the aligned work layout and feature gathers are sized by it,
    so callers bound memory/time; trimmed pairs are counted as overflow.
    """
    tiles_x, tiles_y = bins.tiles_x, bins.tiles_y
    n_tiles = tiles_x * tiles_y
    full_p = bins.pair_gauss.shape[0]
    if pair_capacity and pair_capacity < full_p:
        pair_gauss_t = bins.pair_gauss[:pair_capacity]
    else:
        pair_capacity = full_p
        pair_gauss_t = bins.pair_gauss
    trim_overflow = jnp.maximum(bins.n_pairs - pair_capacity, 0)
    tile_start_t = jnp.minimum(bins.tile_start, pair_capacity)
    tile_count_t = jnp.clip(
        jnp.minimum(bins.tile_start + bins.tile_count, pair_capacity)
        - tile_start_t, 0, None)

    # 128-aligned per-tile pair layout (Mosaic DMA lane alignment) with
    # feature-major storage. The whole build is autodiffed jnp — its gather
    # transpose scatter-adds pair gradients back onto the Gaussians.
    count_c = jnp.minimum(tile_count_t, tile_capacity)
    padded_counts = -(-count_c // CHUNK) * CHUNK
    aligned_end = jnp.cumsum(padded_counts)
    aligned_start = (aligned_end - padded_counts).astype(jnp.int32)
    p_al = (-(-pair_capacity // CHUNK)) * CHUNK + CHUNK * n_tiles  # static

    # Per-position tile bookkeeping WITHOUT per-position gathers: random
    # gathers cost ~10 ns/row on TPU, so an 8.6M searchsorted (11 chained
    # gathers) would dominate the whole render. Instead scatter the per-tile
    # values at their aligned starts and forward-fill with a monotonic
    # cummax — three cheap scans replace five giant gathers.
    # Per-position tile bookkeeping at CHUNK granularity: every aligned tile
    # span is a whole number of 128-pair chunks, so per-tile values broadcast
    # from (n_chunks,) to positions with pure elementwise math. jnp.repeat
    # with a static total length keeps everything 128x smaller than
    # per-position fills (and avoids traced-index scatters, which XLA
    # serializes, and 1-D traced gathers at ~230 ns/element).
    c_cap = p_al // CHUNK
    nc = (padded_counts // CHUNK).astype(jnp.int32)   # chunks per tile
    total_chunks = aligned_end[-1] // CHUNK

    def chunk_fill(values):  # (T,) -> (c_cap,) per-chunk copy of my tile's value
        return jnp.repeat(values, nc, total_repeat_length=c_cap)

    ch_start = chunk_fill(aligned_start)              # aligned start of my tile
    ch_fend = chunk_fill(aligned_start + count_c.astype(jnp.int32))
    ch_pair0 = chunk_fill(bins.tile_start)
    lane = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
    pos2 = (jnp.arange(c_cap, dtype=jnp.int32) * CHUNK)[:, None] + lane
    chunk_valid = (jnp.arange(c_cap, dtype=jnp.int32) < total_chunks)[:, None]
    within = pos2 - ch_start[:, None]
    valid = (chunk_valid & (pos2 < ch_fend[:, None])).reshape(-1)
    # invalid positions index out of range -> gather_rows_unique yields zeros
    orig = jnp.where(valid.reshape(pos2.shape),
                     jnp.clip(ch_pair0[:, None] + within, 0,
                              pair_capacity - 1),
                     pair_capacity).reshape(-1)

    # Analytic inverse of the aligned layout over the SORTED pair domain (for
    # the gather backward): sorted pair p of tile t sits at aligned position
    # aligned_start[t] + (p - tile_start[t]). Per-position tile values come
    # from a tiny delta-scatter + cumsum (deltas may be negative; the running
    # sum still reconstructs each tile's value on its own span).
    def fill_pairs(values):  # (T,) -> (P,) value of my tile at each position
        deltas = jnp.diff(values, prepend=jnp.zeros((1,), values.dtype))
        sc = jnp.zeros((pair_capacity,), jnp.int32).at[tile_start_t].add(
            deltas.astype(jnp.int32), mode="drop")
        return jnp.cumsum(sc)

    pos_p = jnp.arange(pair_capacity, dtype=jnp.int32)
    offset_p = fill_pairs(aligned_start.astype(jnp.int32)
                          - tile_start_t.astype(jnp.int32))
    end_p = fill_pairs((tile_start_t + count_c).astype(jnp.int32))
    inv = jnp.where(pos_p < end_p, pos_p + offset_p, p_al)

    # Attribute build: the per-Gaussian table is assembled ONCE (N rows), then
    # per-pair features come from a SINGLE row-gather + one transpose. Big
    # random gathers are the wrapper's true cost on TPU (~10 ns/row), so one
    # gather of 16-float rows beats 12 per-column gathers by an order of
    # magnitude; tile-local coefficients are derived INSIDE the kernel from
    # the global mean + tile origin.
    n = proj.depths.shape[0]
    attrs = jnp.stack([
        proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2],
        proj.means2d[:, 0], proj.means2d[:, 1],
        proj.opacities,
        proj.colors[:, 0], proj.colors[:, 1], proj.colors[:, 2],
        proj.depths,
        semantic_ids.astype(jnp.float32),
        jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    ], axis=1)                                                # (N, 16)
    # Two ROW-gathers (16 floats/row amortize the per-row gather cost ~25x
    # better than 1-D gathers on TPU): Gaussian attrs -> sorted pair order,
    # then sorted pairs -> the 128-aligned layout. Both use custom VJPs so the
    # backward is sort+segment-sum / unique-scatter instead of XLA's
    # serialized duplicated scatter-add (ops/gather_ops.py).
    pair_attrs_sorted = gather_rows(attrs, pair_gauss_t)      # (P, 16)
    pair_attrs = gather_rows_unique(pair_attrs_sorted, orig, inv)  # (P_al, 16)
    pair_attrs = pair_attrs.at[:, 5].multiply(valid.astype(jnp.float32))
    feats_t = pair_attrs.T                                    # (16, P_al)

    flat = _get_flat_composite(n_tiles, tiles_x, p_al, _use_interpret())
    out = flat(feats_t, aligned_start, count_c.astype(jnp.int32))

    imgs = out.transpose(0, 2, 1).reshape(tiles_y, tiles_x, TILE_H, TILE_W,
                                           NCH)
    imgs = imgs.transpose(0, 2, 1, 3, 4).reshape(
        tiles_y * TILE_H, tiles_x * TILE_W, NCH)
    imgs = imgs[:height, :width]

    return {
        "rgb": imgs[..., 0:3],
        "depth_acc": imgs[..., 3],
        "alpha": imgs[..., 4],
        "trans": imgs[..., 5],
        "semantic": jax.lax.stop_gradient(imgs[..., 7]).astype(jnp.int32),
        "tile_overflow": jnp.sum(jnp.maximum(tile_count_t - tile_capacity, 0))
        + trim_overflow,
    }
