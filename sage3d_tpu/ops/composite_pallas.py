"""Pallas TPU compositing kernels: hand-scheduled forward + analytic backward.

The production rasterizer core (BASELINE.json north star). Same math as
ops/composite_xla.py, re-scheduled for the TPU memory system:

  * Work is a FLAT list of (tile, 128-Gaussian chunk) slots, depth-ordered and
    tile-major. The Pallas grid walks the list; per-pair features stream through
    VMEM via the automatic block pipeline (double-buffered DMA, zero manual
    semaphores), so HBM traffic is exactly one pass over the binned pair data.
  * The per-tile output block acts as the accumulator: consecutive slots of the
    same tile map to the same out block, which Pallas keeps resident in VMEM and
    flushes once per tile — the classic revisited-block accumulation idiom.
  * Layout: Gaussians on SUBLANES (128 = chunk), pixels on LANES (1024 = one
    32x32 tile), so per-pixel state is a compact (1, 1024) row and the
    front-to-back transmittance scan is a log-step doubling product over
    sublanes — exact fp32, no log/exp roundtrip, matching the oracle's cumprod
    bit-for-bit up to reassociation.
  * Backward is a SINGLE forward-order sweep per tile: the suffix sums the CUDA
    implementations obtain by back-to-front traversal come from the identity
    B_g = sum_{j>g} c_j w_j = (gbar . acc) - prefix_incl(c w), where acc is the
    saved forward output — no reverse pass, no stored per-pair state.

Per-pair quadratic coefficients are computed OUTSIDE the kernel (autodiffed
jnp), so the custom_vjp boundary is exactly the flat compositor; the pair->
Gaussian scatter-add of gradients falls out of JAX's gather transpose.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE_H, TILE_W, TileBins
from .projection import ALPHA_MAX, ALPHA_MIN, ProjectedGaussians
from .composite_xla import quad_coeffs

CHUNK = 128          # Gaussians per slot = sublane count of the alpha matrix
NPIX = TILE_W * TILE_H  # 1024 pixels per tile = lane count
NFEAT = 16           # feature rows per pair (padded to a lane-friendly 16)
NCH = 8              # out channels: r,g,b,depth,alpha,trans,best_w,best_id


def _iota_pixels():
    """Tile-local pixel-center coordinate rows, each (1, NPIX)."""
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)  # Mosaic: int iota only
    px = (pix % TILE_W).astype(jnp.float32) + 0.5
    py = (pix // TILE_W).astype(jnp.float32) + 0.5
    return px, py


def _alpha_matrix(co, lane_count):
    """(CHUNK, NPIX) alpha of each pair at each tile pixel; also raw pre-clamp."""
    px, py = _iota_pixels()
    power = (co[:, 0:1]
             + co[:, 1:2] * px + co[:, 2:3] * py
             + co[:, 3:4] * (px * px) + co[:, 4:5] * (py * py)
             + co[:, 5:6] * (px * py))
    raw = co[:, 6:7] * jnp.exp(jnp.minimum(power, 0.0))
    raw = jnp.where(power > 0.0, 0.0, raw)
    sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    valid = sub < lane_count
    raw = jnp.where(valid, raw, 0.0)
    alpha = jnp.minimum(raw, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha, raw


def _scan_products(one_minus_alpha):
    """Inclusive prefix product over sublanes via log-step doubling (exact)."""
    x = one_minus_alpha
    k = 1
    while k < CHUNK:
        shifted = jnp.concatenate(
            [jnp.ones((k, NPIX), x.dtype), x[:-k, :]], axis=0)
        x = x * shifted
        k *= 2
    return x  # x[g] = prod_{j<=g} (1 - alpha_j)


def _scan_sums(v):
    """Inclusive prefix sum over sublanes via log-step doubling."""
    x = v
    k = 1
    while k < CHUNK:
        shifted = jnp.concatenate(
            [jnp.zeros((k, NPIX), x.dtype), x[:-k, :]], axis=0)
        x = x + shifted
        k *= 2
    return x


def _shift_one(x, fill):
    return jnp.concatenate(
        [jnp.full((1, NPIX), fill, x.dtype), x[:-1, :]], axis=0)


def _fwd_kernel(tile_ref, first_ref, lanecnt_ref, feats_ref, out_ref):
    j = pl.program_id(0)

    @pl.when(first_ref[j] == 1)
    def _init():
        out_ref[0, 0:5, :] = jnp.zeros((5, NPIX), jnp.float32)
        out_ref[0, 5:6, :] = jnp.ones((1, NPIX), jnp.float32)      # trans
        out_ref[0, 6:7, :] = jnp.zeros((1, NPIX), jnp.float32)     # best_w
        out_ref[0, 7:8, :] = jnp.full((1, NPIX), -1.0, jnp.float32)  # best_id

    @pl.when(lanecnt_ref[j] > 0)
    def _compute():
        co = feats_ref[:, :]                          # (CHUNK, NFEAT)
        alpha, _ = _alpha_matrix(co, lanecnt_ref[j])
        incl = _scan_products(1.0 - alpha)            # (CHUNK, NPIX)
        excl = _shift_one(incl, 1.0)
        t_prev = out_ref[0, 5:6, :]                   # (1, NPIX)
        w = alpha * t_prev * excl

        out_ref[0, 0:1, :] += jnp.sum(w * co[:, 7:8], axis=0, keepdims=True)
        out_ref[0, 1:2, :] += jnp.sum(w * co[:, 8:9], axis=0, keepdims=True)
        out_ref[0, 2:3, :] += jnp.sum(w * co[:, 9:10], axis=0, keepdims=True)
        out_ref[0, 3:4, :] += jnp.sum(w * co[:, 10:11], axis=0, keepdims=True)
        out_ref[0, 4:5, :] += jnp.sum(w, axis=0, keepdims=True)
        out_ref[0, 5:6, :] = t_prev * incl[CHUNK - 1:CHUNK, :]

        # Semantic: keep the single largest-weight pair (first on ties).
        best_w = out_ref[0, 6:7, :]
        cmax = jnp.max(w, axis=0, keepdims=True)
        sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NPIX), 0)
        first_max = jnp.min(jnp.where((w == cmax) & (cmax > 0.0), sub, CHUNK),
                            axis=0, keepdims=True)
        sel = jnp.sum(jnp.where(sub == first_max, co[:, 11:12], 0.0),
                      axis=0, keepdims=True)
        better = cmax > best_w
        out_ref[0, 6:7, :] = jnp.where(better, cmax, best_w)
        out_ref[0, 7:8, :] = jnp.where(better, sel, out_ref[0, 7:8, :])


def _bwd_kernel(tile_ref, first_ref, lanecnt_ref, feats_ref, fwd_ref, gout_ref,
                dfeats_ref, tc_ref, pc_ref):
    j = pl.program_id(0)

    @pl.when(first_ref[j] == 1)
    def _init():
        tc_ref[:, :] = jnp.ones((1, NPIX), jnp.float32)   # running transmittance
        pc_ref[:, :] = jnp.zeros((1, NPIX), jnp.float32)  # running sum of c*w

    dfeats_ref[:, :] = jnp.zeros((CHUNK, NFEAT), jnp.float32)

    @pl.when(lanecnt_ref[j] > 0)
    def _compute():
        co = feats_ref[:, :]
        alpha, raw = _alpha_matrix(co, lanecnt_ref[j])
        incl = _scan_products(1.0 - alpha)
        excl = _shift_one(incl, 1.0)
        t_prev = tc_ref[:, :]
        t_at = t_prev * excl                         # transmittance before each pair
        w = alpha * t_at

        g0 = gout_ref[0, 0:1, :]
        g1 = gout_ref[0, 1:2, :]
        g2 = gout_ref[0, 2:3, :]
        g3 = gout_ref[0, 3:4, :]
        g4 = gout_ref[0, 4:5, :]
        g_t = gout_ref[0, 5:6, :]

        # S(pixel) = gbar . acc over the five blended feature channels.
        s_pix = (g0 * fwd_ref[0, 0:1, :] + g1 * fwd_ref[0, 1:2, :]
                 + g2 * fwd_ref[0, 2:3, :] + g3 * fwd_ref[0, 3:4, :]
                 + g4 * fwd_ref[0, 4:5, :])
        t_fin = fwd_ref[0, 5:6, :]

        c = (co[:, 7:8] * g0 + co[:, 8:9] * g1 + co[:, 9:10] * g2
             + co[:, 10:11] * g3 + g4)               # (CHUNK, NPIX)
        cw = c * w
        incl_cw = pc_ref[:, :] + _scan_sums(cw)
        b_suffix = s_pix - incl_cw
        om = 1.0 - alpha
        dalpha = c * t_at - b_suffix / om - g_t * t_fin / om

        active = (alpha > 0.0) & (raw <= ALPHA_MAX)
        dalpha = jnp.where(active, dalpha, 0.0)
        dpower = dalpha * alpha
        # d opacity: alpha = op * exp(power) => dop = dalpha * alpha / op.
        op = co[:, 6:7]
        dop = jnp.sum(jnp.where(active, dalpha * alpha, 0.0), axis=1,
                      keepdims=True) / jnp.where(op > 0, op, 1.0)

        px, py = _iota_pixels()
        d0 = jnp.sum(dpower, axis=1, keepdims=True)
        d1 = jnp.sum(dpower * px, axis=1, keepdims=True)
        d2 = jnp.sum(dpower * py, axis=1, keepdims=True)
        d3 = jnp.sum(dpower * (px * px), axis=1, keepdims=True)
        d4 = jnp.sum(dpower * (py * py), axis=1, keepdims=True)
        d5 = jnp.sum(dpower * (px * py), axis=1, keepdims=True)
        df_r = jnp.sum(g0 * w, axis=1, keepdims=True)
        df_g = jnp.sum(g1 * w, axis=1, keepdims=True)
        df_b = jnp.sum(g2 * w, axis=1, keepdims=True)
        df_d = jnp.sum(g3 * w, axis=1, keepdims=True)

        zeros = jnp.zeros((CHUNK, 1), jnp.float32)
        dfeats_ref[:, :] = jnp.concatenate(
            [d0, d1, d2, d3, d4, d5, dop, df_r, df_g, df_b, df_d,
             zeros, zeros, zeros, zeros, zeros], axis=1)

        tc_ref[:, :] = t_prev * incl[CHUNK - 1:CHUNK, :]
        pc_ref[:, :] = incl_cw[CHUNK - 1:CHUNK, :]


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=32)
def _get_flat_composite(n_slots: int, n_tiles: int, interpret: bool):
    """custom_vjp'd flat compositor for a static (slots, tiles) configuration."""
    out_rows = n_tiles + 1  # last row = dummy tile for padding slots

    grid_fwd = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_slots,),
        in_specs=[
            pl.BlockSpec((CHUNK, NFEAT), lambda j, t, f, c: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, NCH, NPIX), lambda j, t, f, c: (t[j], 0, 0)),
    )

    def fwd_call(feats_al, tile_of, first_flag, lane_count):
        return pl.pallas_call(
            _fwd_kernel,
            grid_spec=grid_fwd,
            out_shape=jax.ShapeDtypeStruct((out_rows, NCH, NPIX), jnp.float32),
            interpret=interpret,
        )(tile_of, first_flag, lane_count, feats_al)

    grid_bwd = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_slots,),
        in_specs=[
            pl.BlockSpec((CHUNK, NFEAT), lambda j, t, f, c: (j, 0)),
            pl.BlockSpec((1, NCH, NPIX), lambda j, t, f, c: (t[j], 0, 0)),
            pl.BlockSpec((1, NCH, NPIX), lambda j, t, f, c: (t[j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((CHUNK, NFEAT), lambda j, t, f, c: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, NPIX), jnp.float32),
            pltpu.VMEM((1, NPIX), jnp.float32),
        ],
    )

    def bwd_call(feats_al, tile_of, first_flag, lane_count, fwd_out, gout):
        return pl.pallas_call(
            _bwd_kernel,
            grid_spec=grid_bwd,
            out_shape=jax.ShapeDtypeStruct(feats_al.shape, jnp.float32),
            interpret=interpret,
        )(tile_of, first_flag, lane_count, feats_al, fwd_out, gout)

    @jax.custom_vjp
    def flat_composite(feats_al, tile_of, first_flag, lane_count):
        return fwd_call(feats_al, tile_of, first_flag, lane_count)

    def _fwd(feats_al, tile_of, first_flag, lane_count):
        out = fwd_call(feats_al, tile_of, first_flag, lane_count)
        return out, (feats_al, tile_of, first_flag, lane_count, out)

    def _bwd(res, gout):
        feats_al, tile_of, first_flag, lane_count, fwd_out = res
        dfeats = bwd_call(feats_al, tile_of, first_flag, lane_count, fwd_out,
                          gout)
        return dfeats, None, None, None

    flat_composite.defvjp(_fwd, _bwd)
    return flat_composite


@functools.partial(jax.jit, static_argnames=("width", "height", "tile_capacity"))
def composite_tiles_pallas(
    proj: ProjectedGaussians,
    semantic_ids: jnp.ndarray,
    bins: TileBins,
    width: int,
    height: int,
    tile_capacity: int = 1024,
) -> Dict[str, jnp.ndarray]:
    """Composite via the Pallas kernels. Same output schema as composite_tiles."""
    tiles_x, tiles_y = bins.tiles_x, bins.tiles_y
    n_tiles = tiles_x * tiles_y
    pair_capacity = bins.pair_gauss.shape[0]
    n_slots = n_tiles + pair_capacity // CHUNK

    count_c = jnp.minimum(bins.tile_count, tile_capacity)
    n_chunks_t = jnp.maximum(-(-count_c // CHUNK), 1)   # >=1: every tile visited
    chunk_end = jnp.cumsum(n_chunks_t)
    chunk_start = chunk_end - n_chunks_t
    total_chunks = chunk_end[-1]

    slots = jnp.arange(n_slots, dtype=jnp.int32)
    valid_slot = slots < total_chunks
    tile_of = jnp.clip(jnp.searchsorted(chunk_end, slots, side="right"),
                       0, n_tiles - 1).astype(jnp.int32)
    chunk_in_tile = slots - chunk_start[tile_of]
    tile_of = jnp.where(valid_slot, tile_of, n_tiles)
    first_flag = jnp.where((chunk_in_tile == 0) | ~valid_slot, 1, 0).astype(jnp.int32)
    lane_count = jnp.where(
        valid_slot,
        jnp.clip(count_c[jnp.clip(tile_of, 0, n_tiles - 1)]
                 - chunk_in_tile * CHUNK, 0, CHUNK),
        0).astype(jnp.int32)

    # Gather per-slot pair windows and build tile-local features (autodiffed:
    # the transpose of this gather scatter-adds pair grads back to Gaussians).
    lane = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
    pair_idx = bins.tile_start[jnp.clip(tile_of, 0, n_tiles - 1)][:, None] \
        + chunk_in_tile[:, None] * CHUNK + lane
    lvalid = lane < lane_count[:, None]
    pair_idx = jnp.clip(pair_idx, 0, pair_capacity - 1)
    g = jnp.where(lvalid, bins.pair_gauss[pair_idx], 0)       # (S, CHUNK)

    tile_col = (tile_of % tiles_x).astype(jnp.float32) * TILE_W
    tile_row = (jnp.clip(tile_of, 0, n_tiles - 1) // tiles_x).astype(jnp.float32) * TILE_H
    origin = jnp.stack([tile_col, tile_row], axis=-1)          # (S, 2)

    means_l = proj.means2d[g] - origin[:, None, :]
    coeffs = quad_coeffs(means_l, proj.conics[g])              # (S, CHUNK, 6)
    opac = jnp.where(lvalid, proj.opacities[g], 0.0)
    feats = jnp.concatenate([
        coeffs,
        opac[..., None],
        proj.colors[g],
        proj.depths[g][..., None],
        semantic_ids[g].astype(jnp.float32)[..., None],
        jnp.zeros(g.shape + (4,), jnp.float32),
    ], axis=-1)                                                # (S, CHUNK, 16)
    feats_al = feats.reshape(n_slots * CHUNK, NFEAT)

    flat = _get_flat_composite(n_slots, n_tiles, _use_interpret())
    out = flat(feats_al, tile_of, first_flag, lane_count)      # (T+1, 8, NPIX)
    out = out[:n_tiles]

    def untile(x):
        c = x.shape[-1] if x.ndim == 3 else 1
        x = x.reshape(tiles_y, tiles_x, TILE_H, TILE_W, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE_H, tiles_x * TILE_W, c)
        return x[:height, :width]

    imgs = out.reshape(n_tiles, NCH, TILE_H, TILE_W).transpose(0, 2, 3, 1)
    imgs = imgs.reshape(tiles_y, tiles_x, TILE_H, TILE_W, NCH)
    imgs = imgs.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE_H, tiles_x * TILE_W, NCH)
    imgs = imgs[:height, :width]

    return {
        "rgb": imgs[..., 0:3],
        "depth_acc": imgs[..., 3],
        "alpha": imgs[..., 4],
        "trans": imgs[..., 5],
        "semantic": jax.lax.stop_gradient(imgs[..., 7]).astype(jnp.int32),
        "tile_overflow": jnp.sum(jnp.maximum(bins.tile_count - tile_capacity, 0)),
    }
