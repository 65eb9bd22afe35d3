"""Anatomy of the forward compositor kernel at the 1080p/1M headline size.

The fwd Pallas kernel is ~43 ms of the ~160 ms step (speed-of-light table in
PERF_NOTES). Its per-chunk body has four cost blocks on (128, 1024) tiles:

  A. alpha quadratic + exp            (_alpha_rows)
  B. prefix-product transmittance scan (_scan_products: 7 masked-roll rounds)
  C. 5 weighted sublane reductions     (the blend accumulate)
  D. semantic argmax block             (max/min reduces + compares)

This probe times kernel VARIANTS with each block stubbed out (results are
WRONG for variants — timing only). Early termination is DISABLED in every
variant (including 'full') so all variants process identical chunk counts;
the full kernel is also timed with ET on, for the reference point. The
deltas bound what an MXU offload (e.g. blend accumulate as a (8,128)x
(128,1024) matmul, scan as a triangular matmul) could buy.

Run:  timeout 7200 python benchmarks/kernel_anatomy.py > /tmp/anatomy.log 2>&1
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import log  # noqa: E402

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import WIDTH, HEIGHT, autotune, make_bench_scene_device
from sage3d_tpu.ops import composite_pallas as cp
from sage3d_tpu.ops.binning import bin_gaussians
from sage3d_tpu.ops.projection import project_gaussians
from sage3d_tpu.renderer.camera import make_camera

CHUNK, NPIX, NFEAT, NCH = cp.CHUNK, cp.NPIX, cp.NFEAT, cp.NCH
TRANS_EPS = cp.TRANS_EPS


def _variant_kernel(tiles_x, tile_start_ref, tile_count_ref, feats_hbm,
                    out_ref, scratch, sems, *, early_term, do_exp, do_scan,
                    do_blend, do_argmax):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    cb0 = start // CHUNK
    off = start - cb0 * CHUNK
    n_chunks = pl.cdiv(count, CHUNK)
    ox = ((t % tiles_x) * cp.TILE_W).astype(jnp.float32)
    oy = ((t // tiles_x) * cp.TILE_H).astype(jnp.float32)

    def dma(slot, k):
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(cb0 + k, 2)], scratch.at[slot], sems.at[slot])

    @pl.when(n_chunks > 0)
    def _prefetch():
        dma(0, 0).start()

    def cond(carry):
        k, acc, trans, best_w, best_id = carry
        if early_term:
            return (k < n_chunks) & (jnp.max(trans) > TRANS_EPS)
        return k < n_chunks

    def body(carry):
        k, acc, trans, best_w, best_id = carry

        @pl.when(k + 1 < n_chunks)
        def _next():
            dma((k + 1) % 2, k + 1).start()

        dma(k % 2, k).wait()
        co = cp._window_pairs(scratch[k % 2], off)
        n_valid = jnp.minimum(count - k * CHUNK, CHUNK)
        if do_exp:
            alpha, _ = cp._alpha_rows(co, n_valid, ox, oy, CHUNK)
        else:
            # quadratic only, no exp/clip chain (timing stub)
            a = co[:, 0:1]
            c = co[:, 2:3]
            px, py = cp._pixel_rows()
            alpha = jnp.minimum(
                jnp.abs(co[:, 5:6] * (a * px + c * py + co[:, 1:2])) * 1e-3,
                0.5)
            alpha = jnp.where(cp._row_iota(CHUNK) < n_valid, alpha, 0.0)
        if do_scan:
            incl = cp._scan_products(1.0 - alpha, CHUNK)
            excl = cp._shift_one(incl, 1.0, CHUNK)
            w = alpha * trans * excl
            new_trans = trans * incl[CHUNK - 1:CHUNK, :]
        else:
            w = alpha * trans
            new_trans = trans * (1.0 - jnp.max(alpha, axis=0, keepdims=True))
        if do_blend:
            acc = acc + jnp.concatenate([
                jnp.sum(w * co[:, 6:7], axis=0, keepdims=True),
                jnp.sum(w * co[:, 7:8], axis=0, keepdims=True),
                jnp.sum(w * co[:, 8:9], axis=0, keepdims=True),
                jnp.sum(w * co[:, 9:10], axis=0, keepdims=True),
                jnp.sum(w, axis=0, keepdims=True),
            ], axis=0)
        else:
            acc = acc + w[0:1, :] * jnp.float32(1e-9)
        if do_argmax:
            cmax = jnp.max(w, axis=0, keepdims=True)
            sub2 = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NPIX), 0)
            first_max = jnp.min(
                jnp.where((w == cmax) & (cmax > 0.0), sub2, CHUNK),
                axis=0, keepdims=True)
            sel = jnp.sum(jnp.where(sub2 == first_max, co[:, 10:11], 0.0),
                          axis=0, keepdims=True)
            better = cmax > best_w
            best_w = jnp.where(better, cmax, best_w)
            best_id = jnp.where(better, sel, best_id)
        return k + 1, acc, new_trans, best_w, best_id

    init = (jnp.int32(0),
            jnp.zeros((5, NPIX), jnp.float32),
            jnp.ones((1, NPIX), jnp.float32),
            jnp.zeros((1, NPIX), jnp.float32),
            jnp.full((1, NPIX), -1.0, jnp.float32))
    k_end, acc, trans, best_w, best_id = jax.lax.while_loop(cond, body, init)

    @pl.when((k_end >= 1) & (k_end < n_chunks))
    def _drain_prefetch():
        dma(k_end % 2, k_end).wait()

    out_ref[0, 0:5, :] = acc[0:5, :]
    out_ref[0, 5:6, :] = trans
    out_ref[0, 6:7, :] = best_w
    out_ref[0, 7:8, :] = best_id


def make_variant(n_tiles, tiles_x, **flags):
    kern = functools.partial(_variant_kernel, tiles_x, **flags)

    def call(feats3, tile_start, tile_count):
        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, NCH, NPIX), lambda t, s, c: (t, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 2, NFEAT, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kern, grid_spec=grid,
            out_shape=jax.ShapeDtypeStruct((n_tiles, NCH, NPIX), jnp.float32),
            interpret=cp._use_interpret(),
        )(tile_start, tile_count, feats3)

    return call


def main(tiny="--tiny" in sys.argv[1:]):
    # --tiny: 20k Gaussians at 256x256 in interpret mode — a CPU shakeout of
    # the harness (variant kernels compile+run), not a measurement.
    scene = make_bench_scene_device(20_000 if tiny else 1_000_000)
    camera = make_camera(position=[0.0, -6.0, 1.5],
                         forward=[0.0, 1.0, -0.05],
                         width=256 if tiny else WIDTH,
                         height=256 if tiny else HEIGHT, focal_mm=14.0)
    budgets = autotune(scene, camera)
    log(f"budgets: {budgets}")
    PAIR_CAP = budgets["pair_capacity"]

    W, H = camera.width, camera.height

    @jax.jit
    def prepare(s):
        proj = project_gaussians(s, camera)
        bins = bin_gaussians(proj, W, H, k_small=budgets["k_small"],
                             m_big=budgets["m_big"], k_big=budgets["k_big"],
                             m_mid=budgets.get("m_mid", 0),
                             k_mid=budgets.get("k_mid", 0))
        n = proj.depths.shape[0]
        attrs = jnp.stack([
            proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2],
            proj.means2d[:, 0], proj.means2d[:, 1], proj.opacities,
            proj.colors[:, 0], proj.colors[:, 1], proj.colors[:, 2],
            proj.depths, jnp.zeros((n,), jnp.float32),
            jnp.arange(n, dtype=jnp.float32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32)],
            axis=1)
        return attrs, bins

    attrs, bins = jax.block_until_ready(prepare(scene))
    tiles_x, tiles_y = bins.tiles_x, bins.tiles_y
    n_tiles = tiles_x * tiles_y
    pair_gauss = bins.pair_gauss[:PAIR_CAP]
    tile_start = jnp.minimum(bins.tile_start, PAIR_CAP)
    count_c = jnp.minimum(
        jnp.clip(jnp.minimum(bins.tile_start + bins.tile_count, PAIR_CAP)
                 - tile_start, 0, None),
        budgets["tile_capacity"]).astype(jnp.int32)
    n_blocks = PAIR_CAP // CHUNK + cp.GUARD_BLOCKS

    @jax.jit
    def pack(attrs, pair_gauss):
        p_pad = n_blocks * CHUNK
        idx = jnp.concatenate(
            [pair_gauss,
             jnp.zeros((p_pad - pair_gauss.shape[0],), jnp.int32)])
        return attrs[idx].reshape(n_blocks, CHUNK, NFEAT).transpose(0, 2, 1)

    feats3 = jax.block_until_ready(pack(attrs, pair_gauss))

    def timed(name, call, iters=6):
        @jax.jit
        def loop(feats3, tile_start, count_c, c):
            def body(i, c):
                out = call(feats3 + c * 0, tile_start, count_c)
                return c + jnp.sum(out[:, 0:5, ::128]) * 1e-9
            return jax.lax.fori_loop(0, iters, body, c)

        t0 = time.time()
        float(jax.device_get(loop(feats3, tile_start, count_c,
                                  jnp.float32(0.0))))
        first = time.time() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            float(jax.device_get(loop(feats3, tile_start, count_c,
                                      jnp.float32(0.0))))
            best = min(best, (time.time() - t0) / iters)
        log(f"{name}: {best * 1e3:.1f} ms (first {first:.1f}s)")
        return best

    def timed_vmapped(name, call, b=4, iters=6):
        """The same kernel vmapped over a leading batch of b identical
        workloads — pins whether a BATCHED pallas grid itself degrades
        (the remaining suspect in the vmapped-render collapse)."""
        feats_b = jnp.broadcast_to(feats3[None], (b,) + feats3.shape)
        ts_b = jnp.broadcast_to(tile_start[None], (b,) + tile_start.shape)
        cc_b = jnp.broadcast_to(count_c[None], (b,) + count_c.shape)

        @jax.jit
        def loop(feats_b, ts_b, cc_b, c):
            def body(i, c):
                out = jax.vmap(call)(feats_b + c * 0, ts_b, cc_b)
                return c + jnp.sum(out[:, :, 0:5, ::128]) * 1e-9
            return jax.lax.fori_loop(0, iters, body, c)

        t0 = time.time()
        float(jax.device_get(loop(feats_b, ts_b, cc_b, jnp.float32(0.0))))
        first = time.time() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            float(jax.device_get(loop(feats_b, ts_b, cc_b,
                                      jnp.float32(0.0))))
            best = min(best, (time.time() - t0) / iters)
        log(f"{name}: {best * 1e3:.1f} ms for batch {b} (first {first:.1f}s)")
        return best

    base = dict(early_term=False, do_exp=True, do_scan=True, do_blend=True,
                do_argmax=True)
    t_et = timed("full kernel, EARLY TERM ON (production)",
                 make_variant(n_tiles, tiles_x, **{**base,
                                                   "early_term": True}))
    t_full = timed("full kernel, ET off (anatomy baseline)",
                   make_variant(n_tiles, tiles_x, **base))
    t_noargmax = timed("no semantic-argmax block",
                       make_variant(n_tiles, tiles_x,
                                    **{**base, "do_argmax": False}))
    t_noscan = timed("no transmittance scan",
                     make_variant(n_tiles, tiles_x,
                                  **{**base, "do_scan": False}))
    t_noblend = timed("no blend reductions",
                      make_variant(n_tiles, tiles_x,
                                   **{**base, "do_blend": False}))
    t_noexp = timed("no exp (quadratic stub)",
                    make_variant(n_tiles, tiles_x,
                                 **{**base, "do_exp": False}))
    t_vm = timed_vmapped("full kernel ET on, vmapped batch",
                         make_variant(n_tiles, tiles_x,
                                      **{**base, "early_term": True}))
    log(f"vmapped-vs-4x-single ratio: {t_vm / (4 * t_et):.2f}")
    log("--- anatomy (deltas vs ET-off baseline) ---")
    log(f"early-termination saves: {1e3 * (t_full - t_et):.1f} ms")
    log(f"argmax block:  {1e3 * (t_full - t_noargmax):.1f} ms")
    log(f"scan block:    {1e3 * (t_full - t_noscan):.1f} ms")
    log(f"blend reduces: {1e3 * (t_full - t_noblend):.1f} ms")
    log(f"alpha exp etc: {1e3 * (t_full - t_noexp):.1f} ms")


if __name__ == "__main__":
    main()
