"""Pin the vmapped FORWARD collapse: which render stage degrades under vmap?

Round-4 phase 2: 8-camera vmap forward runs ~2x slower per pixel than
lax.map (7.9 vs 15.4 Mpix/s); `vmap_sort_probe.py` cleared the primitive
sorts/gathers for the FORWARD shapes (2-op sort batches fine) — so the
collapse "lives in the vmapped Pallas/emission path" (PERF_NOTES, open).
This probe times each pipeline PREFIX per execution strategy at flagship
shapes so the collapsing stage falls out by subtraction:

  strategies: single camera / vmap over B / lax.map over B  (same program
  shape discipline as stage_profile.py: fori_loop-chained, data-dependent
  carry, readback-timed)
  prefixes:   projection -> +binning(emission+sort) -> +gather+fwd kernel

Run:  timeout 10800 python benchmarks/vmap_fwd_probe.py > /tmp/vfp.log 2>&1
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import log  # noqa: E402

from bench import WIDTH, HEIGHT, autotune, make_bench_scene_device  # noqa: E402
from sage3d_tpu.ops.binning import bin_gaussians  # noqa: E402
from sage3d_tpu.ops.projection import project_gaussians  # noqa: E402
from sage3d_tpu.renderer.camera import make_camera, stack_cameras  # noqa: E402
from sage3d_tpu.renderer.render import budget_kwargs, render  # noqa: E402

B = 8


def main(n_gauss=1_000_000, width=WIDTH, height=HEIGHT, iters=3):
    scene = make_bench_scene_device(n_gauss)
    cams = stack_cameras([
        make_camera(position=[0.0 + 0.4 * i, -6.0 + 0.3 * i, 1.5],
                    forward=[0.1 * (i - 3.5), 1.0, -0.05],
                    width=width, height=height, focal_mm=14.0)
        for i in range(B)])
    cam0 = jax.tree_util.tree_map(lambda x: x[0], cams)
    budgets = autotune(scene, cam0)
    kw = budget_kwargs(budgets)
    log(f"budgets: {budgets}")

    def proj_stage(s, cam):
        p = project_gaussians(s, cam)
        return jnp.sum(p.means2d) * 1e-9 + jnp.sum(p.conics) * 1e-12

    def bin_stage(s, cam):
        p = project_gaussians(s, cam)
        b = bin_gaussians(p, width, height, k_small=kw["k_small"],
                          m_big=kw["m_big"], k_big=kw["k_big"],
                          m_mid=kw["m_mid"], k_mid=kw["k_mid"])
        return (jnp.sum(b.pair_gauss[::4096].astype(jnp.float32)) * 1e-9
                + b.n_pairs.astype(jnp.float32) * 1e-9
                + jnp.sum(b.tile_count.astype(jnp.float32)) * 1e-12)

    def fwd_stage(s, cam):
        out = render(s, cam, backend="pallas", **kw)
        return jnp.sum(out["rgb"]) * 1e-9 + jnp.sum(out["alpha"]) * 1e-12

    def timed(name, fn, mode):
        @jax.jit
        def loop(s, c):
            def body(i, c):
                s2 = s._replace(opacity_logits=s.opacity_logits + c * 0)
                if mode == "single":
                    v = fn(s2, cam0)
                elif mode == "vmap":
                    v = jnp.sum(jax.vmap(lambda cc: fn(s2, cc))(cams))
                else:
                    v = jnp.sum(jax.lax.map(lambda cc: fn(s2, cc), cams))
                return c + v * 1e-6
            return jax.lax.fori_loop(0, iters, body, c)

        t0 = time.time()
        float(jax.device_get(loop(scene, jnp.float32(0.0))))
        first = time.time() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            float(jax.device_get(loop(scene, jnp.float32(0.0))))
            best = min(best, (time.time() - t0) / iters)
        per_cam = best if mode == "single" else best / B
        log(f"{name:26s} [{mode:6s}]: {best * 1e3:8.1f} ms "
            f"({per_cam * 1e3:7.1f} ms/cam, first {first:.0f}s)")
        return best

    rows = {}
    for sname, fn in (("projection", proj_stage), ("proj+binning", bin_stage),
                      ("full_fwd", fwd_stage)):
        for mode in ("single", "map", "vmap"):
            rows[f"{sname}.{mode}"] = round(timed(sname, fn, mode), 4)

    # per-camera stage deltas per strategy
    report = {"metric": "vmap_fwd_probe", "batch": B, "width": width,
              "height": height, "n_gaussians": n_gauss,
              "rows_s": rows, "budgets": budgets,
              "device": str(jax.devices()[0])}
    for mode in ("single", "map", "vmap"):
        div = 1 if mode == "single" else B
        proj = rows[f"projection.{mode}"] / div
        binn = rows[f"proj+binning.{mode}"] / div
        fwd = rows[f"full_fwd.{mode}"] / div
        report[f"stage_ms_per_cam.{mode}"] = {
            "projection": round(proj * 1e3, 1),
            "binning": round((binn - proj) * 1e3, 1),
            "gather+kernel": round((fwd - binn) * 1e3, 1)}
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    if "--small" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        main(n_gauss=5000, width=128, height=96, iters=2)
    else:
        main()
