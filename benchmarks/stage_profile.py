"""Stage-level profile of the Pallas render pipeline on the real TPU.

Times each pipeline prefix (projection -> binning -> feature pack -> forward
kernel -> fwd+bwd) as its own jitted program so stage costs fall out by
subtraction. Every program follows the tunneled-TPU timing discipline:
on-device inputs, iterations chained through a data-dependent carry inside
one fori_loop, wall time around a host readback of a scalar that depends on
every stage output (DCE trap: an unconsumed stage is deleted, see
docs/PERF_NOTES.md).

Run:  timeout 7200 python benchmarks/stage_profile.py > /tmp/stage_prof.log 2>&1
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
from sage3d_tpu.ops.binning import bin_gaussians
from sage3d_tpu.ops.projection import project_gaussians
from sage3d_tpu.renderer.camera import make_camera
from sage3d_tpu.renderer.render import render


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(name, build, iters=6):
    """build() -> jitted fn(scene, carry)->carry. Times steady-state."""
    fn = build()

    @jax.jit
    def loop(s, c):
        def body(i, c):
            return fn(s, c)
        return jax.lax.fori_loop(0, iters, body, c)

    t0 = time.time()
    float(jax.device_get(loop(scene, jnp.float32(0.0))))
    compile_s = time.time() - t0
    t0 = time.time()
    float(jax.device_get(loop(scene, jnp.float32(0.0))))
    dt = (time.time() - t0) / iters
    log(f"{name}: {dt * 1e3:.1f} ms/iter (first {compile_s:.1f}s)")
    return dt


scene = make_bench_scene_device()
camera = make_camera(position=[0.0, -6.0, 1.5], forward=[0.0, 1.0, -0.05],
                     width=WIDTH, height=HEIGHT, focal_mm=14.0)
budgets = autotune(scene, camera)
log(f"budgets: {budgets}")
from sage3d_tpu.renderer.render import budget_kwargs
KW = budget_kwargs(budgets)


def build_proj():
    def fn(s, c):
        s = s._replace(opacity_logits=s.opacity_logits + c * 0)
        p = project_gaussians(s, camera)
        return jnp.sum(p.means2d) * 1e-9 + jnp.sum(p.conics) * 1e-12
    return fn


def build_binning():
    def fn(s, c):
        s = s._replace(opacity_logits=s.opacity_logits + c * 0)
        p = project_gaussians(s, camera)
        # consume the SORTED outputs so the sort isn't DCE'd
        b = bin_gaussians(p, WIDTH, HEIGHT, k_small=KW["k_small"],
                          m_big=KW["m_big"], k_big=KW["k_big"],
                          m_mid=KW["m_mid"], k_mid=KW["k_mid"])
        return (jnp.sum(b.pair_gauss[:1024].astype(jnp.float32)) * 1e-9
                + b.n_pairs.astype(jnp.float32) * 1e-9
                + jnp.sum(b.tile_count.astype(jnp.float32)) * 1e-12)
    return fn


def build_fwd():
    def fn(s, c):
        s = s._replace(opacity_logits=s.opacity_logits + c * 0)
        out = render(s, camera, backend="pallas", **KW)
        return jnp.sum(out["rgb"]) * 1e-9 + jnp.sum(out["alpha"]) * 1e-12
    return fn


def build_fwd_bwd():
    def loss(opacity_logits, s, c):
        s = s._replace(opacity_logits=opacity_logits + c * 0)
        out = render(s, camera, backend="pallas", **KW)
        return (jnp.sum(out["rgb"] ** 2) * 1e-9
                + jnp.sum(out["depth_acc"]) * 1e-12
                + jnp.sum(out["alpha"]) * 1e-12)
    grad = jax.grad(loss, argnums=0)

    def fn(s, c):
        return c + grad(s.opacity_logits, s, c)[0]
    return fn


def build_fwd_bwd_full():
    """Gradients to ALL scene params (the training configuration)."""
    def loss(params, s, c):
        s = s._replace(means=params["means"],
                       opacity_logits=params["opacity_logits"] + c * 0,
                       log_scales=params["log_scales"])
        out = render(s, camera, backend="pallas", **KW)
        return (jnp.sum(out["rgb"] ** 2) * 1e-9
                + jnp.sum(out["depth_acc"]) * 1e-12)
    grad = jax.grad(loss, argnums=0)

    def fn(s, c):
        g = grad({"means": s.means, "opacity_logits": s.opacity_logits,
                  "log_scales": s.log_scales}, s, c)
        return c + g["opacity_logits"][0] + jnp.sum(g["means"][0]) * 1e-6
    return fn


t_proj = timed("projection", build_proj)
t_bin = timed("projection+binning", build_binning)
t_fwd = timed("full fwd (pallas)", build_fwd)
t_fb = timed("full fwd+bwd (opacity grad)", build_fwd_bwd)
t_fbf = timed("full fwd+bwd (means+opacity+scales grad)", build_fwd_bwd_full)

log(f"stage deltas: binning={1e3 * (t_bin - t_proj):.1f} ms, "
    f"gather+kernel+untile={1e3 * (t_fwd - t_bin):.1f} ms, "
    f"backward total={1e3 * (t_fb - t_fwd):.1f} ms")
log(f"headline equivalent: {WIDTH * HEIGHT / t_fb / 1e6:.2f} Mpix/s "
    f"(full-grad {WIDTH * HEIGHT / t_fbf / 1e6:.2f})")
