"""Binning-stage breakdown at the 1080p/1M headline config.

Separates: rank argsorts, the emission block (tile-id math incl. traced-
divisor div/mod), the fused-key sort (with a FULL consumer — slicing one
element lets XLA simplify a sort away), and searchsorted ranges. Also probes
a float-reciprocal div/mod replacement for the emission.

Run:  timeout 7200 python benchmarks/bin_profile.py > /tmp/bin_prof.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from bench import WIDTH, HEIGHT, autotune, make_bench_scene_device
from sage3d_tpu.ops import binning as B
from sage3d_tpu.ops.projection import project_gaussians
from sage3d_tpu.renderer.camera import make_camera


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(name, fn, args, iters=6):
    @jax.jit
    def loop(c, *a):
        def body(i, c):
            return c + fn(c, *a)
        return jax.lax.fori_loop(0, iters, body, c)

    t0 = time.time()
    float(jax.device_get(loop(jnp.float32(0.0), *args)))
    first = time.time() - t0
    t0 = time.time()
    float(jax.device_get(loop(jnp.float32(0.0), *args)))
    dt = (time.time() - t0) / iters
    log(f"{name}: {dt * 1e3:.1f} ms/iter (first {first:.1f}s)")
    return dt


scene = make_bench_scene_device()
camera = make_camera(position=[0.0, -6.0, 1.5], forward=[0.0, 1.0, -0.05],
                     width=WIDTH, height=HEIGHT, focal_mm=14.0)
budgets = autotune(scene, camera)
log(f"budgets: {budgets}")
K1 = budgets["k_small"]
MB = budgets["m_big"]
K2 = budgets["k_big"]

proj = jax.block_until_ready(jax.jit(
    lambda s: project_gaussians(s, camera))(scene))
tiles_x, tiles_y = B.num_tiles(WIDTH, HEIGHT)
n_tiles = tiles_x * tiles_y
n = proj.depths.shape[0]


def consume(x):
    return jnp.sum(x[:: max(x.shape[0] // 4096, 1)].astype(jnp.float32)) * 1e-9


def full_bin(c, proj):
    proj = proj._replace(depths=proj.depths + c * 0)
    bins = B.bin_gaussians(proj, WIDTH, HEIGHT, k_small=K1, m_big=MB,
                           k_big=K2)
    return (consume(bins.pair_gauss) + bins.n_pairs.astype(jnp.float32) * 1e-9
            + consume(bins.tile_start))


timed("bin_gaussians full", full_bin, (proj,))


def ranks_only(c, proj):
    depths = proj.depths + c * 0
    order = jnp.argsort(jnp.where(proj.visible, depths, jnp.inf))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    return consume(rank)


timed("rank argsort+invert", ranks_only, (proj,))


def emit_only(c, proj):
    proj = proj._replace(depths=proj.depths + c * 0)
    vis, x0, y0, nx, count, mx, my, r2 = B._tile_rect(
        proj, tiles_x, tiles_y, B.TILE_W, B.TILE_H)
    small = count <= K1
    tid_small = B._emit_block(x0, y0, nx, jnp.minimum(count, K1),
                              vis & small, mx + c * 0, my, r2, tiles_x,
                              n_tiles, B.TILE_W, B.TILE_H, K1)
    big_score = jnp.where(vis & ~small, count, -1)
    big_idx = jnp.argsort(-big_score)[:MB]
    big_sel = big_score[big_idx] > 0
    tid_big = B._emit_block(
        x0[big_idx], y0[big_idx], nx[big_idx],
        jnp.minimum(count[big_idx], K2), big_sel, mx[big_idx], my[big_idx],
        r2[big_idx], tiles_x, n_tiles, B.TILE_W, B.TILE_H, K2)
    return consume(tid_small.reshape(-1)) + consume(tid_big.reshape(-1))


timed("emit blocks (tile-id math)", emit_only, (proj,))

# the sort at emission size with a full-ish consumer
E = n * K1 + MB * K2
keys = jax.block_until_ready(
    jax.random.randint(jax.random.PRNGKey(3), (E,), 0, 2**30, jnp.int32))
vals = jax.block_until_ready(
    jax.random.randint(jax.random.PRNGKey(4), (E,), 0, 2**20, jnp.int32))


def sort_full(c, keys, vals):
    ks, vs = jax.lax.sort((keys + c.astype(jnp.int32) * 0, vals),
                          dimension=0, is_stable=False, num_keys=1)
    return consume(ks) + consume(vs)


timed(f"2-op sort ({E/1e6:.1f}M) full consumer", sort_full, (keys, vals))


# float-reciprocal div/mod replacement inside the emission
def emit_fdiv(c, proj):
    vis, x0, y0, nx, count, mx, my, r2 = B._tile_rect(
        proj, tiles_x, tiles_y, B.TILE_W, B.TILE_H)
    k = jnp.arange(K1, dtype=jnp.int32)[None, :]
    nx_safe = jnp.maximum(nx, 1)[:, None]
    inv = 1.0 / nx_safe.astype(jnp.float32)
    q = jnp.floor(k.astype(jnp.float32) * inv).astype(jnp.int32)
    r = k - q * nx_safe
    q = jnp.where(r < 0, q - 1, jnp.where(r >= nx_safe, q + 1, q))
    r = k - q * nx_safe
    valid = vis[:, None] & (k < count[:, None])
    tx = x0[:, None] + r
    ty = y0[:, None] + q
    fx0 = tx.astype(jnp.float32) * B.TILE_W + c * 0
    fy0 = ty.astype(jnp.float32) * B.TILE_H
    dx = jnp.maximum(jnp.maximum(fx0 - mx[:, None],
                                 mx[:, None] - (fx0 + B.TILE_W)), 0.0)
    dy = jnp.maximum(jnp.maximum(fy0 - my[:, None],
                                 my[:, None] - (fy0 + B.TILE_H)), 0.0)
    valid = valid & (dx * dx + dy * dy <= r2[:, None])
    tid = jnp.where(valid, ty * tiles_x + tx, n_tiles)
    return consume(tid.reshape(-1))


def emit_only_small(c, proj):
    vis, x0, y0, nx, count, mx, my, r2 = B._tile_rect(
        proj, tiles_x, tiles_y, B.TILE_W, B.TILE_H)
    small = count <= K1
    tid_small = B._emit_block(x0, y0, nx, jnp.minimum(count, K1),
                              vis & small, mx + c * 0, my, r2, tiles_x,
                              n_tiles, B.TILE_W, B.TILE_H, K1)
    return consume(tid_small.reshape(-1))


timed("emit small block (int div/mod)", emit_only_small, (proj,))
timed("emit small block (f32-recip div)", emit_fdiv, (proj,))


# Sort on the REAL key distribution: ~72% INVALID_KEY duplicate tail (random
# probes above use uniform keys, which may behave differently).
import numpy as _np

kk = jax.random.randint(jax.random.PRNGKey(7), (E,), 0, 2**30, jnp.int32)
mask = jax.random.uniform(jax.random.PRNGKey(8), (E,)) < 0.72
kk = jax.block_until_ready(jnp.where(mask, jnp.int32(2**31 - 1), kk))
vv = jax.block_until_ready(
    jax.random.randint(jax.random.PRNGKey(9), (E,), 0, 2**20, jnp.int32))


def sort_dup(c, kk, vv):
    ks, vs = jax.lax.sort((kk + c.astype(jnp.int32) * 0, vv),
                          dimension=0, is_stable=False, num_keys=1)
    return consume(ks) + consume(vs)


timed(f"2-op sort ({E/1e6:.1f}M, 72% INVALID dups)", sort_dup, (kk, vv))


# Residual isolation: emission + concat + key build, NO sort (consume the
# pre-sort arrays) — the gap to "bin_gaussians full" is sort+searchsorted.
def emit_concat_keys(c, proj):
    proj = proj._replace(depths=proj.depths + c * 0)
    depths = jax.lax.stop_gradient(proj.depths)
    order = jnp.argsort(jnp.where(proj.visible, depths, jnp.inf), stable=True)
    rank = jnp.argsort(order).astype(jnp.int32)
    vis, x0, y0, nx, count, mx, my, r2 = B._tile_rect(
        proj, tiles_x, tiles_y, B.TILE_W, B.TILE_H)
    small = count <= K1
    tid_small = B._emit_block(x0, y0, nx, jnp.minimum(count, K1),
                              vis & small, mx, my, r2, tiles_x, n_tiles,
                              B.TILE_W, B.TILE_H, K1)
    big_score = jnp.where(vis & ~small, count, -1)
    big_idx = jnp.argsort(-big_score)[:MB]
    big_sel = big_score[big_idx] > 0
    tid_big = B._emit_block(
        x0[big_idx], y0[big_idx], nx[big_idx],
        jnp.minimum(count[big_idx], K2), big_sel, mx[big_idx], my[big_idx],
        r2[big_idx], tiles_x, n_tiles, B.TILE_W, B.TILE_H, K2)
    g_small = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                               (n, K1))
    g_big = jnp.broadcast_to(big_idx[:, None].astype(jnp.int32), (MB, K2))
    rank_small = jnp.broadcast_to(rank[:, None], (n, K1))
    rank_big = jnp.broadcast_to(rank[big_idx][:, None], (MB, K2))
    tids = jnp.concatenate([tid_small.reshape(-1), tid_big.reshape(-1)])
    ranks = jnp.concatenate([rank_small.reshape(-1), rank_big.reshape(-1)])
    gauss = jnp.concatenate([g_small.reshape(-1), g_big.reshape(-1)])
    keys = jnp.where(tids < n_tiles, tids * (1 << 20) + ranks,
                     B.INVALID_KEY)
    return consume(keys) + consume(gauss)


timed("emit+concat+keys (no sort)", emit_concat_keys, (proj,))


