"""Pallas TPU compositing kernels: hand-scheduled forward + analytic backward.

The production rasterizer core (BASELINE.json north star). Same math as
ops/composite_xla.py, re-scheduled for the TPU memory system:

  * Grid = one step per 32x32 tile. Each step walks its depth-ordered pair
    list in 128-Gaussian chunks with a double-buffered manual DMA pipeline
    (HBM -> VMEM, semaphores), and STOPS as soon as every pixel of the tile is
    saturated (transmittance < 1e-4) — the early termination that gives tiled
    rasterizers their 10-100x win on dense scenes. Skipped chunks are neither
    fetched nor computed.
  * The kernel reads the SORTED pair-feature array directly, stored as
    feature-major 128-pair blocks (CB, NFEAT, 128) — Mosaic HBM DMa slices
    must be 128-aligned in the lane dim, so narrow (P, 16) rows cannot be
    sliced; dense (NFEAT, 128) blocks can. A tile's span starts at an
    arbitrary pair offset, so each chunk fetches a TWO-block window and
    extracts its 128 pairs with one dynamic lane rotate (pltpu.roll with a
    traced shift) — this replaces the round-1 "aligned layout", an 8.5M-row
    host-side re-gather that cost more than the kernel itself.
  * The alpha matrix is (128 pairs on SUBLANES) x (1024 pixels on LANES), so
    every per-pixel state row is a dense (1, 1024) vector (8 vregs, no lane
    padding). Front-to-back transmittance is an exact fp32 prefix product
    over sublanes via masked pltpu.roll doubling. Tile-LOCAL quadratic
    coefficients are derived in-kernel from the global screen mean + tile
    origin, so per-pair features are purely per-Gaussian and the host-side
    build is ONE row-gather of the (N, 16) attribute table.
  * Backward is a SINGLE forward-order sweep per tile: the suffix sums CUDA
    implementations obtain by back-to-front traversal come from the identity
    B_g = sum_{j>g} c_j w_j = (gbar . acc) - prefix_incl(c w), with acc the
    saved forward output. Per-pair gradient blocks stream back to HBM through
    a second DMA pipeline into a zero-initialized aliased CHUNK-SLOT buffer
    (one (NFEAT, 128) slot per (tile, chunk), so slots never overlap and
    early-terminated tails stay zero).
  * The custom_vjp boundary is `attrs -> tile images`: its backward fuses the
    chunk-slot gradient rows back onto the Gaussians by segment-summing the
    slot buffer DIRECTLY — every gradient row carries its own Gaussian id
    (GID_COL, written by the kernel), so one 11-operand sort groups rows by
    Gaussian and a cumsum + boundary lookup reduces them. No pair->slot
    index maps, no row gather (65 ms at 5M pairs), and never a duplicated
    scatter-add (XLA serializes those on TPU).
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
from .segreduce import segment_reduce_sorted

CHUNK = 128          # Gaussians per chunk = block lane count
NPIX = TILE_W * TILE_H  # 1024 pixels per tile = lane count of the alpha matrix
NFEAT = 16           # feature rows per block (padded to 16)
NCH = 8              # out channels: r,g,b,depth,alpha,trans,best_w,best_id
NGRAD = 10           # real gradient channels: d_a..d_cy, dop, df_r..df_d
GID_COL = 11         # attr column carrying the Gaussian id (f32-exact < 2^24)
TRANS_EPS = 1e-4     # classic 3DGS early-termination threshold
GUARD_BLOCKS = 2     # feature-array tail blocks so window DMAs stay in range
# Default gradient-sort payload mode. "f32" = exact, restored as default in
# round 5: packing the gradient buffer by the forward's measured k_end cut
# the sorted rows ~9.7x (4.69M padded -> 485k at 1080p/1M), so payload width
# stopped mattering — on-device min-of-3: f32 18.53 vs f16 18.38 Mpix/s.
# "f16" (per-channel absmax-scaled, 2^-11 rounding, trainer-certified in
# round 4) remains available; "bf16" (2^-8) FAILED the round-4 convergence
# gates and must stay opt-in.
GRAD_SORT_DEFAULT = "f32"


def _pixel_rows():
    """Tile-local pixel-center coordinates as (1, NPIX) lane rows."""
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = (pix % TILE_W).astype(jnp.float32) + 0.5
    py = (pix // TILE_W).astype(jnp.float32) + 0.5
    return px, py


def _row_iota(rows: int, base: int = 0):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + base


def _window_pairs(block2, off):
    """(2, NFEAT, CHUNK) window -> (CHUNK, NFEAT) pair attributes starting at
    lane offset ``off`` (traced): one dynamic lane rotate + slice + transpose.
    """
    cat = jnp.concatenate([block2[0], block2[1]], axis=1)  # (NFEAT, 2*CHUNK)
    shift = (2 * CHUNK - off) % (2 * CHUNK)
    rolled = pltpu.roll(cat, shift, 1)
    return jnp.transpose(rolled[:, :CHUNK], (1, 0))        # (CHUNK, NFEAT)


def _alpha_rows(co, n_valid, ox, oy, rows: int):
    """(rows, NPIX) alpha of each pair at each tile pixel.

    ``co`` is the (rows, NFEAT) attribute block — columns are (rows, 1)
    sublane vectors broadcast against the (1, NPIX) pixel rows:
    [a, b, c (conic), Cx, Cy (GLOBAL screen mean), opacity, r, g, b, depth,
    sem, pad...]. Rows >= ``n_valid`` are masked to 0 (identity for scans).
    """
    a = co[:, 0:1]
    b = co[:, 1:2]
    c = co[:, 2:3]
    cx = co[:, 3:4] - ox
    cy = co[:, 4:5] - oy
    w0 = -0.5 * (a * cx * cx + c * cy * cy) - b * cx * cy
    wx = a * cx + b * cy
    wy = c * cy + b * cx
    px, py = _pixel_rows()
    power = (w0 + wx * px + wy * py
             - 0.5 * a * (px * px) - 0.5 * c * (py * py) - b * (px * py))
    raw = co[:, 5:6] * jnp.exp(jnp.minimum(power, 0.0))
    raw = jnp.where(power > 0.0, 0.0, raw)
    raw = jnp.where(_row_iota(rows) < n_valid, raw, 0.0)
    alpha = jnp.minimum(raw, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha, raw


def _scan_products(x, rows: int):
    """Inclusive prefix product over sublanes via masked roll doubling."""
    sub = _row_iota(rows)
    k = 1
    while k < rows:
        rolled = pltpu.roll(x, k, 0)
        x = x * jnp.where(sub >= k, rolled, 1.0)
        k *= 2
    return x  # x[g, :] = prod_{j<=g} x_in[j, :]


def _scan_sums(v, rows: int):
    """Inclusive prefix sum over sublanes via masked roll doubling."""
    sub = _row_iota(rows)
    x = v
    k = 1
    while k < rows:
        rolled = pltpu.roll(x, k, 0)
        x = x + jnp.where(sub >= k, rolled, 0.0)
        k *= 2
    return x


def _shift_one(x, fill, rows: int):
    rolled = pltpu.roll(x, 1, 0)
    return jnp.where(_row_iota(rows) >= 1, rolled, fill)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(tiles_x, tile_start_ref, tile_count_ref, feats_hbm, out_ref,
                kend_ref, scratch, sems):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    cb0 = start // CHUNK
    off = start - cb0 * CHUNK
    n_chunks = pl.cdiv(count, CHUNK)
    ox = ((t % tiles_x) * TILE_W).astype(jnp.float32)
    oy = ((t // tiles_x) * TILE_H).astype(jnp.float32)

    def dma(slot, k):
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(cb0 + k, 2)], scratch.at[slot], sems.at[slot])

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
        co = _window_pairs(scratch[k % 2], off)       # (CHUNK, NFEAT)
        n_valid = jnp.minimum(count - k * CHUNK, CHUNK)
        alpha, _ = _alpha_rows(co, n_valid, ox, oy, CHUNK)   # (CHUNK, NPIX)
        incl = _scan_products(1.0 - alpha, CHUNK)
        excl = _shift_one(incl, 1.0, CHUNK)
        w = alpha * trans * excl                      # (CHUNK, NPIX)

        acc = acc + jnp.concatenate([
            jnp.sum(w * co[:, 6:7], axis=0, keepdims=True),
            jnp.sum(w * co[:, 7:8], axis=0, keepdims=True),
            jnp.sum(w * co[:, 8:9], axis=0, keepdims=True),
            jnp.sum(w * co[:, 9:10], axis=0, keepdims=True),
            jnp.sum(w, axis=0, keepdims=True),
        ], axis=0)                                    # (5, NPIX)

        cmax = jnp.max(w, axis=0, keepdims=True)      # (1, NPIX)
        sub2 = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NPIX), 0)
        first_max = jnp.min(jnp.where((w == cmax) & (cmax > 0.0), sub2, CHUNK),
                            axis=0, keepdims=True)
        sel = jnp.sum(jnp.where(sub2 == first_max, co[:, 10:11], 0.0),
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
    # Chunks actually processed before early termination. The backward's
    # chunk-slot gradient buffer is packed by THIS count (not the full
    # per-tile chunk budget): the bwd kernel replays the identical
    # transmittance recurrence, so its stop chunk is bit-equal to k_end —
    # every P-proportional backward stage (slot buffer, gradient sort,
    # segment reduction) shrinks by the measured early-termination factor.
    # (1, 8, 128) block: Mosaic requires the trailing two block dims be
    # (8, 128)-divisible — a (1, 128) row block fails to lower on real TPU.
    kend_ref[...] = jnp.zeros((1, 8, 128), jnp.int32) + k_end


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

HALF = CHUNK // 2    # backward sub-block rows (VMEM working-set control)


def _bwd_kernel(tiles_x, tile_start_ref, tile_count_ref, chunk0_ref,
                allowed_ref, feats_hbm, fwd_ref, gout_ref, dfeats_init_hbm,
                dfeats_hbm, scratch, dscratch, sems, dsems):
    del dfeats_init_hbm  # aliased into dfeats_hbm (pre-zeroed)
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    ch0 = chunk0_ref[t]
    cb0 = start // CHUNK
    off = start - cb0 * CHUNK
    # Loop bound = the forward's measured k_end (capacity-clipped upstream):
    # the transmittance recurrence below replays the forward bit-exactly, so
    # bounding at k_end processes exactly the chunks the forward touched.
    n_chunks = allowed_ref[t]
    ox = ((t % tiles_x) * TILE_W).astype(jnp.float32)
    oy = ((t // tiles_x) * TILE_H).astype(jnp.float32)

    def dma_in(slot, k):
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(cb0 + k, 2)], scratch.at[slot], sems.at[slot])

    def dma_out(slot, k):
        return pltpu.make_async_copy(
            dscratch.at[slot], dfeats_hbm.at[ch0 + k], dsems.at[slot])

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

        co_full = _window_pairs(scratch[k % 2], off)  # (CHUNK, NFEAT)
        n_valid = jnp.minimum(count - k * CHUNK, CHUNK)

        # Process the chunk in HALF-sized sub-blocks: the backward needs ~12
        # live (rows, NPIX) matrices, and at rows=CHUNK that overflows VMEM
        # into spill traffic. rows=HALF keeps the working set resident;
        # transmittance/prefix carries chain across the halves exactly.
        dsub_parts = []
        for h in range(2):
            co = co_full[h * HALF:(h + 1) * HALF, :]   # (HALF, NFEAT)
            lc = jnp.clip(n_valid - h * HALF, 0, HALF)
            alpha, raw = _alpha_rows(co, lc, ox, oy, HALF)
            incl = _scan_products(1.0 - alpha, HALF)
            excl = _shift_one(incl, 1.0, HALF)
            t_at = trans * excl
            w = alpha * t_at                              # (HALF, NPIX)

            c = (co[:, 6:7] * g0 + co[:, 7:8] * g1 + co[:, 8:9] * g2
                 + co[:, 9:10] * g3 + g4)
            incl_cw = prefix + _scan_sums(c * w, HALF)
            om = 1.0 - alpha
            dalpha = c * t_at - (s_pix - incl_cw) / om - g_t * t_fin / om
            active = (alpha > 0.0) & (raw <= ALPHA_MAX)
            dalpha = jnp.where(active, dalpha, 0.0)
            dpower = dalpha * alpha

            op = co[:, 5:6]
            dop = jnp.sum(dalpha * alpha, axis=1,
                          keepdims=True) / jnp.where(op > 0, op, 1.0)

            # power = -0.5(a dx^2 + c dy^2) - b dx dy, dx = px - (Cx - ox)
            px, py = _pixel_rows()
            ca = co[:, 0:1]
            cb = co[:, 1:2]
            cc = co[:, 2:3]
            dx = px - (co[:, 3:4] - ox)                 # (HALF, NPIX)
            dy = py - (co[:, 4:5] - oy)
            d_a = jnp.sum(dpower * (-0.5 * dx * dx), axis=1, keepdims=True)
            d_b = jnp.sum(dpower * (-dx * dy), axis=1, keepdims=True)
            d_c = jnp.sum(dpower * (-0.5 * dy * dy), axis=1, keepdims=True)
            d_cx = jnp.sum(dpower * (ca * dx + cb * dy), axis=1, keepdims=True)
            d_cy = jnp.sum(dpower * (cc * dy + cb * dx), axis=1, keepdims=True)
            df_r = jnp.sum(g0 * w, axis=1, keepdims=True)
            df_g = jnp.sum(g1 * w, axis=1, keepdims=True)
            df_b = jnp.sum(g2 * w, axis=1, keepdims=True)
            df_d = jnp.sum(g3 * w, axis=1, keepdims=True)
            zeros = jnp.zeros((HALF, 1), jnp.float32)
            # GID_COL carries the pair's Gaussian id alongside its gradient
            # row, so the VJP can segment-sum the slot buffer DIRECTLY (one
            # 11-operand sort) with no pair->slot index maps and no 64-byte
            # row gather. Rows the kernel never touches stay all-zero (id 0,
            # payload 0) and sum harmlessly into Gaussian 0; masked rows
            # beyond n_valid have garbage-but-in-range ids with zero payload.
            dsub_parts.append(jnp.concatenate(
                [d_a, d_b, d_c, d_cx, d_cy, dop, df_r, df_g, df_b, df_d,
                 zeros, co[:, GID_COL:GID_COL + 1], zeros, zeros, zeros,
                 zeros], axis=1))

            trans = trans * incl[HALF - 1:HALF, :]
            prefix = incl_cw[HALF - 1:HALF, :]

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
def _get_attr_composite(n_tiles: int, tiles_x: int, n_blocks: int, c_cap: int,
                        n_gauss: int, interpret: bool,
                        grad_sort: str = "f32"):
    """custom_vjp'd attrs->tiles compositor for a static shape config.

    fwd: one (N,16)->(P,16) row gather + block packing + the Pallas forward.
    bwd: the Pallas backward kernel into the chunk-slot gradient buffer,
    then ONE (gid, slotpos) sort + ONE row gather + cumsum/boundary
    segment-sum back to d_attrs — the TPU-fast replacement for the
    duplicated scatter-add a CUDA rasterizer would use.
    """
    fwd_kernel = functools.partial(_fwd_kernel, tiles_x)
    bwd_kernel = functools.partial(_bwd_kernel, tiles_x)
    p_pad = n_blocks * CHUNK

    def fwd_call(feats3, tile_start, tile_count):
        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, NCH, NPIX), lambda t, s, c: (t, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda t, s, c: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 2, NFEAT, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out, kend = pl.pallas_call(
            fwd_kernel,
            grid_spec=grid,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, NCH, NPIX), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),
            ],
            interpret=interpret,
        )(tile_start, tile_count, feats3)
        return out, kend[:, 0, 0]

    def bwd_call(feats3, tile_start, tile_count, chunk0, allowed, fwd_out,
                 gout):
        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, NCH, NPIX), lambda t, s, c, z, a: (t, 0, 0)),
                pl.BlockSpec((1, NCH, NPIX), lambda t, s, c, z, a: (t, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 2, NFEAT, CHUNK), jnp.float32),
                pltpu.VMEM((2, NFEAT, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        zeros = jnp.zeros((c_cap, NFEAT, CHUNK), jnp.float32)
        return pl.pallas_call(
            bwd_kernel,
            grid_spec=grid,
            out_shape=jax.ShapeDtypeStruct((c_cap, NFEAT, CHUNK), jnp.float32),
            input_output_aliases={7: 0},  # zeros arg (incl. prefetch) -> out
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(tile_start, tile_count, chunk0, allowed, feats3, fwd_out, gout,
          zeros)

    def _gather_feats(attrs, pair_gauss):
        idx = jnp.concatenate(
            [pair_gauss, jnp.zeros((p_pad - pair_gauss.shape[0],), jnp.int32)])
        rows = attrs[idx]                             # (P_pad, 16) row gather
        # feature-major 128-pair blocks (Mosaic lane-aligned DMA units)
        return rows.reshape(n_blocks, CHUNK, NFEAT).transpose(0, 2, 1)

    @jax.custom_vjp
    def attr_composite(attrs, pair_gauss, tile_start, tile_count):
        feats3 = _gather_feats(attrs, pair_gauss)
        return fwd_call(feats3, tile_start, tile_count)

    def _fwd(attrs, pair_gauss, tile_start, tile_count):
        feats3 = _gather_feats(attrs, pair_gauss)
        out, kend = fwd_call(feats3, tile_start, tile_count)
        return (out, kend), (feats3, tile_start, tile_count, kend, out)

    def _bwd(res, gouts):
        feats3, tile_start, tile_count, kend, fwd_out = res
        gout = gouts[0]   # kend is int32 metadata — its cotangent is float0
        # Pack gradient chunk slots by the forward's MEASURED k_end, not the
        # worst-case per-tile chunk budget: slot [chunk0[t], chunk0[t] +
        # allowed[t]) per tile, contiguous. Tiles past the static capacity
        # get clipped chunk budgets (counted upstream as overflow via
        # sum(kend) > c_cap — autotune sizes c_cap so this never clips).
        csum = jnp.cumsum(kend)
        chunk0 = (csum - kend).astype(jnp.int32)
        allowed = jnp.clip(jnp.minimum(kend, c_cap - chunk0),
                           0, None).astype(jnp.int32)
        dslots = bwd_call(feats3, tile_start, tile_count, chunk0, allowed,
                          fwd_out, gout)
        # Segment-sum the slot buffer directly: every gradient row carries
        # its own Gaussian id (GID_COL, written by the kernel), so ONE sort
        # whose payload is the NGRAD real gradient channels groups rows by
        # Gaussian — no pair->slot position map, no 64-byte row gather
        # (measured: the row gather was 65 ms at 5M pairs, the payload sort
        # is ~45 ms; ids+payload live in lane-major (NFEAT, P) form so the
        # column extracts are free slices).
        p_grad = c_cap * CHUNK
        dcols = dslots.transpose(1, 0, 2).reshape(NFEAT, p_grad)
        ids = dcols[GID_COL].astype(jnp.int32)
        # Sort cost scales with payload bytes (the dominant backward-glue
        # line). Three payload modes:
        #   "f32"  (DEFAULT): exact rows, parity ~1e-4.
        #   "f16"  (~7% end-to-end): per-channel absmax-scaled float16 —
        #          11 mantissa bits, rounding ~2^-11 of the channel max,
        #          8x finer than bf16; the scaling makes it invariant to
        #          the user's loss scale (raw f16 would overflow at 65k).
        #   "bf16" (~7%): raw bfloat16, rounding 2^-8 of each row. This is
        #          numerically IDENTICAL to the round-3 MXU default-
        #          precision drift (training trajectories bit-match —
        #          docs/PERF_NOTES.md) and a round-4 trainer A/B showed it
        #          DEGRADES no-ADC fine convergence (f32 28.18 dB rising
        #          vs bf16 24.80 falling at step 125), so it must never be
        #          the default. Kept for ADC-dominated runs (bf16 fit
        #          still reached 42.3 dB at 600 steps).
        # Segment accumulation stays f32 in the reduction kernel either way.
        vals = [dcols[j] for j in range(NGRAD)]
        if grad_sort == "f16":
            # all NGRAD channel absmaxes in ONE pass over the block
            absmax = jnp.max(jnp.abs(dcols[:NGRAD]), axis=1)    # (NGRAD,)
            scales = jnp.float32(30000.0) / jnp.maximum(
                absmax, jnp.float32(1e-30))
            ops = tuple((v * scales[j]).astype(jnp.float16)
                        for j, v in enumerate(vals))
        elif grad_sort == "bf16":
            ops = tuple(v.astype(jnp.bfloat16) for v in vals)
        else:
            ops = tuple(vals)
        sorted_ = jax.lax.sort((ids,) + ops, dimension=0, is_stable=False,
                               num_keys=1)
        if grad_sort in ("f16", "bf16"):
            payload = tuple(v.astype(jnp.float32) for v in sorted_[1:])
        else:
            payload = sorted_[1:]
        # Segment-sum of the now-contiguous per-Gaussian runs. Round 2 used a
        # (P, 10) cumsum + one P-sized boundary scatter + cummax fill (~45 ms
        # at 1080p/1M); the Pallas one-hot-matmul reduction does the same in
        # one pass over the rows (ops/segreduce.py).
        dg = segment_reduce_sorted(sorted_[0], payload, n_gauss)
        if grad_sort == "f16":
            # segment sums are linear, so the unscale divides the (N, NGRAD)
            # OUTPUT instead of the P-sized payload — one fewer full pass
            dg = dg / scales[None, :]
        d_attrs = jnp.concatenate(
            [dg, jnp.zeros((n_gauss, NFEAT - NGRAD), jnp.float32)], axis=1)
        return d_attrs, None, None, None

    attr_composite.defvjp(_fwd, _bwd)
    return attr_composite


@functools.partial(jax.jit, static_argnames=("width", "height", "tile_capacity",
                                              "pair_capacity",
                                              "grad_sort_bf16", "grad_sort",
                                              "grad_capacity"))
def composite_tiles_pallas(
    proj: ProjectedGaussians,
    semantic_ids: jnp.ndarray,
    bins: TileBins,
    width: int,
    height: int,
    tile_capacity: int = 4096,
    pair_capacity: int = 0,
    grad_sort_bf16: bool = False,
    grad_sort: str = None,
    grad_capacity: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Composite via the Pallas kernels. Same output schema as composite_tiles.

    ``pair_capacity`` (static, 0 = the binning entry budget) trims the sorted
    pair array: the feature gather and kernel work lists are sized by it, so
    callers bound memory/time; trimmed pairs are counted as overflow.

    ``grad_capacity`` (static, in CHUNK-sized slots; 0 = the safe upper bound
    pair_capacity//CHUNK + n_tiles) sizes the backward's gradient slot
    buffer. The forward reports per-tile early-termination chunk counts
    (k_end), and the backward packs its slots by those counts — on saturated
    scenes only ~20-30% of the pair list is ever composited, so the dominant
    gradient sort + segment reduction shrink by the same factor. Autotune it
    from a measured forward (renderer.render.autotune_all(grad_margin=...));
    if a run's total k_end exceeds the capacity the clipped chunks' gradients
    are dropped and COUNTED in ``tile_overflow`` — never silently wrong.
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
    count_c = jnp.minimum(tile_count_t, tile_capacity).astype(jnp.int32)

    # Backward gradient slots are packed at RUN time from the forward's
    # per-tile early-termination chunk counts (see _bwd in
    # _get_attr_composite); here only the static capacity is chosen.
    if grad_capacity and grad_capacity > 0:
        c_cap = int(grad_capacity)
    else:
        c_cap = pair_capacity // CHUNK + n_tiles       # safe upper bound
    n_blocks = pair_capacity // CHUNK + GUARD_BLOCKS   # feature blocks

    # Per-Gaussian attribute table, assembled ONCE (N rows); tile-local
    # quadratic coefficients are derived INSIDE the kernel from the global
    # mean + tile origin, so attributes are purely per-Gaussian. GID_COL
    # carries each Gaussian's own index so the backward kernel can tag its
    # gradient rows (see _bwd: the id rides along and the VJP segment-sums
    # the slot buffer with one sort, no index maps).
    n = proj.depths.shape[0]
    # Gradient routing rides a float32 Gaussian id (GID_COL), exact only for
    # n < 2^24. Binning itself has no scene-size cap (two-key path), so fail
    # LOUDLY here instead of silently mis-routing gradients on a giant scene.
    if n >= (1 << 24):
        raise ValueError(
            f"composite_tiles_pallas: {n} Gaussians >= 2^24; the f32 id "
            "channel of the backward would mis-route gradients. Use the XLA "
            "compositor or shard the scene.")
    attrs = jnp.stack([
        proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2],
        proj.means2d[:, 0], proj.means2d[:, 1],
        proj.opacities,
        proj.colors[:, 0], proj.colors[:, 1], proj.colors[:, 2],
        proj.depths,
        semantic_ids.astype(jnp.float32),
        jnp.arange(n, dtype=jnp.float32),              # GID_COL
        jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
    ], axis=1)                                                # (N, 16)

    # grad_sort: "f16" (default: scaled float16, ~7% faster, trainer-
    # certified) | "f32" (exact) | "bf16"; grad_sort_bf16=True is the
    # legacy alias for "bf16".
    mode = grad_sort if grad_sort is not None else (
        "bf16" if grad_sort_bf16 else GRAD_SORT_DEFAULT)
    if mode not in ("f32", "f16", "bf16"):
        raise ValueError(f"unknown grad_sort mode: {mode}")
    flat = _get_attr_composite(n_tiles, tiles_x, n_blocks, c_cap, n,
                               _use_interpret(), mode)
    out, kend = flat(attrs, pair_gauss_t, tile_start_t, count_c)
    # Gradient-slot accounting: chunks past the static capacity are clipped
    # in the backward (their gradients dropped) — count them as overflow so
    # an undersized grad_capacity can never pass silently.
    grad_chunks = jnp.sum(kend)
    grad_overflow = jnp.maximum(grad_chunks - c_cap, 0) * CHUNK

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
        "grad_chunks": grad_chunks,
        "tile_overflow": jnp.sum(jnp.maximum(tile_count_t - tile_capacity, 0))
        + trim_overflow + grad_overflow,
    }
