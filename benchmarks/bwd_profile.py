"""Micro-profile of the Pallas backward path at the 1080p/1M headline config.

Separates the backward cost centers behind the custom VJP (gid-channel
design): (a) the bwd Pallas kernel, (b) the 11-operand segment-sort,
(c) cumsum, (d) boundary lookups.

Run:  timeout 7200 python benchmarks/bwd_profile.py > /tmp/bwd_prof.log 2>&1
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
from sage3d_tpu.ops import composite_pallas as cp
from sage3d_tpu.ops.binning import bin_gaussians
from sage3d_tpu.ops.projection import project_gaussians
from sage3d_tpu.renderer.camera import make_camera


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


scene = make_bench_scene_device()
camera = make_camera(position=[0.0, -6.0, 1.5], forward=[0.0, 1.0, -0.05],
                     width=WIDTH, height=HEIGHT, focal_mm=14.0)
budgets = autotune(scene, camera)
log(f"budgets: {budgets}")

CHUNK = cp.CHUNK
NFEAT = cp.NFEAT
NGRAD = cp.NGRAD
PAIR_CAP = budgets["pair_capacity"]


@jax.jit
def prepare(s):
    proj = project_gaussians(s, camera)
    bins = bin_gaussians(proj, WIDTH, HEIGHT, k_small=budgets["k_small"],
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
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32)], axis=1)
    return attrs, bins


attrs, bins = jax.block_until_ready(prepare(scene))
tiles_x, tiles_y = bins.tiles_x, bins.tiles_y
n_tiles = tiles_x * tiles_y
pair_gauss = bins.pair_gauss[:PAIR_CAP]
tile_start = jnp.minimum(bins.tile_start, PAIR_CAP)
count_c = jnp.minimum(
    jnp.clip(jnp.minimum(bins.tile_start + bins.tile_count, PAIR_CAP)
             - tile_start, 0, None), budgets["tile_capacity"]).astype(jnp.int32)
c_cap = PAIR_CAP // CHUNK + n_tiles
n_blocks = PAIR_CAP // CHUNK + cp.GUARD_BLOCKS
p_grad = c_cap * CHUNK
n_gauss = attrs.shape[0]

flat = cp._get_attr_composite(n_tiles, tiles_x, n_blocks, c_cap,
                              n_gauss, False)


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


def flat_fwd(c, attrs, pair_gauss, tile_start, count_c):
    out, _ = flat(attrs + c * 0, pair_gauss, tile_start, count_c)
    return jnp.sum(out[:, 0:3, :]) * 1e-9


t_f = timed("flat fwd", flat_fwd,
            (attrs, pair_gauss, tile_start, count_c))


def flat_fb(c, attrs, pair_gauss, tile_start, count_c):
    def loss(a):
        out, _ = flat(a, pair_gauss, tile_start, count_c)
        return jnp.sum(out[:, 0:5, :] ** 2) * 1e-9
    return jax.grad(loss)(attrs + c * 0)[0, 0]


t_fb = timed("flat fwd+bwd", flat_fb,
             (attrs, pair_gauss, tile_start, count_c))


# fusion stages on synthetic slot gradients
dcols = jax.block_until_ready(
    jax.random.normal(jax.random.PRNGKey(0), (NFEAT, p_grad), jnp.float32))
ids0 = jax.block_until_ready(
    jax.random.randint(jax.random.PRNGKey(1), (p_grad,), 0, n_gauss,
                       jnp.int32))


def fusion(c, dcols, ids):
    dcols = dcols + c * 0
    sorted_ = jax.lax.sort(
        (ids,) + tuple(dcols[j] for j in range(NGRAD)),
        dimension=0, is_stable=False, num_keys=1)
    gid_s = sorted_[0]
    ct = jnp.stack(sorted_[1:], axis=1)
    csum = jnp.cumsum(ct, axis=0)
    change = gid_s[1:] != gid_s[:-1]
    is_last = jnp.concatenate([change, jnp.array([True])])
    ar = jnp.arange(p_grad, dtype=jnp.int32)
    idx = jnp.where(is_last, gid_s, n_gauss + ar)
    hi = jnp.zeros((n_gauss + p_grad,), jnp.int32).at[idx].set(
        ar + 1, unique_indices=True)[:n_gauss]
    hi = jax.lax.cummax(hi)
    zero_row = jnp.zeros((1, NGRAD), jnp.float32)
    csum_ext = jnp.concatenate([zero_row, csum], axis=0)
    ghi = csum_ext[hi]
    dg = ghi - jnp.concatenate([zero_row, ghi[:-1]], axis=0)
    return jnp.sum(dg) * 1e-9


t_fu = timed("fusion total (11-op sort + cumsum + bounds)", fusion,
             (dcols, ids0))


# the CURRENT backward glue: 11-op sort + Pallas segmented reduction
from sage3d_tpu.ops.segreduce import segment_reduce_sorted


def sort_segreduce(c, dcols, ids):
    dcols = dcols + c * 0
    sorted_ = jax.lax.sort(
        (ids,) + tuple(dcols[j] for j in range(NGRAD)),
        dimension=0, is_stable=False, num_keys=1)
    dg = segment_reduce_sorted(sorted_[0], sorted_[1:], n_gauss)
    return jnp.sum(dg) * 1e-9


t_sr = timed("glue (f32 sort) : 11-op sort + segreduce", sort_segreduce,
             (dcols, ids0))


def sort_segreduce_bf16(c, dcols, ids):
    dcols = dcols + c * 0
    sorted_ = jax.lax.sort(
        (ids,) + tuple(dcols[j].astype(jnp.bfloat16) for j in range(NGRAD)),
        dimension=0, is_stable=False, num_keys=1)
    vals = tuple(v.astype(jnp.float32) for v in sorted_[1:])
    dg = segment_reduce_sorted(sorted_[0], vals, n_gauss)
    return jnp.sum(dg) * 1e-9


t_sr16 = timed("glue (bf16 sort, DEFAULT): sort + segreduce",
               sort_segreduce_bf16, (dcols, ids0))


# the forward feature row-gather alone (attrs[pair_gauss] + block packing)
def gather_only(c, attrs, pair_gauss):
    p_pad = n_blocks * CHUNK
    idx = jnp.concatenate(
        [pair_gauss, jnp.zeros((p_pad - pair_gauss.shape[0],), jnp.int32)])
    rows = (attrs + c * 0)[idx]
    feats3 = rows.reshape(n_blocks, CHUNK, NFEAT).transpose(0, 2, 1)
    return jnp.sum(feats3[:, 0, ::64]) * 1e-9


t_g = timed("fwd feature row-gather + packing", gather_only,
            (attrs, pair_gauss))


# binning emission stats: exceed counts for 3-tier budget planning
from sage3d_tpu.ops.binning import SUGGEST_THRESHOLDS, pair_count_stats


@jax.jit
def _stats(s):
    proj = project_gaussians(s, camera)
    return pair_count_stats(proj, WIDTH, HEIGHT)


st = jax.device_get(_stats(scene))
log(f"binning stats: n_visible={int(st['n_visible'])} "
    f"sum_count={sum(int(p) for p in st['sum_count_parts'])} "
    f"max_count={int(st['max_count'])} "
    f"exceed{SUGGEST_THRESHOLDS}={list(map(int, st['exceed']))}")


def sort11(c, dcols, ids):
    dcols = dcols + c * 0
    sorted_ = jax.lax.sort(
        (ids,) + tuple(dcols[j] for j in range(NGRAD)),
        dimension=0, is_stable=False, num_keys=1)
    acc = jnp.sum(sorted_[0][:1024].astype(jnp.float32)) * 1e-9
    for o in sorted_[1:]:
        acc = acc + o[0] * 1e-9
    return acc


t_s = timed("fusion: 11-op sort only", sort11, (dcols, ids0))


def cumsum10(c, dcols):
    ct = jnp.stack([dcols[j] + c * 0 for j in range(NGRAD)], axis=1)
    csum = jnp.cumsum(ct, axis=0)
    return jnp.sum(csum[-1]) * 1e-9


t_c = timed("fusion: stack+cumsum only", cumsum10, (dcols,))

# `flat` is built at the library DEFAULT (bf16 grad sort since round 4), so
# the kernel+misc residual must subtract the MATCHING bf16 glue timing.
log(f"bwd kernel+misc (fb - fwd - bf16 glue): "
    f"{1e3 * (t_fb - t_f - t_sr16):.1f} ms")
log(f"old fusion parts: sort {1e3 * t_s:.1f}  cumsum {1e3 * t_c:.1f}  "
    f"bounds {1e3 * (t_fu - t_s - t_c):.1f}  total {1e3 * t_fu:.1f}")
log(f"glue f32: sort {1e3 * t_s:.1f}  segreduce {1e3 * (t_sr - t_s):.1f}"
    f"  total {1e3 * t_sr:.1f}   glue bf16 (default): {1e3 * t_sr16:.1f}")
log(f"fwd kernel alone {1e3 * t_f:.1f}  gather {1e3 * t_g:.1f}")
