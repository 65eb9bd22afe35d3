"""BASELINE config #3: batch of 8 cameras at 1080p, RGB + semantic-ID buffer.

vmap-batched semantic rendering of the full 1M-Gaussian scene — the Isaac
camera-farm replacement pattern (data/images.py uses the same shape for
training-data generation). Budgets are shared across the batch via
autotune_poses (worst probed pose x margin); throughput counts ALL pixels of
the batch. Forward (the config's workload) and fwd+bwd both measured.

Run:  timeout 10800 python benchmarks/multicam_bench.py [--small]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import log  # noqa: E402 (jax cache + repo path config)


def main(n_gauss=1_000_000, width=1920, height=1080, batch=8, iters=4):
    from bench import make_bench_scene_device
    from sage3d_tpu.renderer.camera import make_camera, stack_cameras
    from sage3d_tpu.renderer.render import autotune_poses, render

    scene = make_bench_scene_device(n_gauss)
    cams = stack_cameras([
        make_camera(position=[0.0 + 0.4 * i, -6.0 + 0.3 * i, 1.5],
                    forward=[0.1 * (i - 3.5), 1.0, -0.05],
                    width=width, height=height, focal_mm=14.0)
        for i in range(batch)])
    budgets = autotune_poses(scene, cams, pair_margin=1.2, grad_margin=1.3)
    log(f"shared budgets over {batch} cams: {budgets}")
    from sage3d_tpu.renderer.render import budget_kwargs
    kw = budget_kwargs(budgets)

    def one_fwd(s, cam):
        out = render(s, cam, backend="pallas", **kw)
        # consume rgb + semantic + overflow so nothing is DCE'd
        return (jnp.sum(out["rgb"] ** 2) * 1e-9
                + jnp.sum(out["semantic"]) * 1e-12
                + out["overflow"] * 1.0)

    @jax.jit
    def fwd_loop(s, c):
        def body(i, c):
            s2 = s._replace(opacity_logits=s.opacity_logits + c * 0)
            vals = jax.vmap(lambda cam: one_fwd(s2, cam))(cams)
            return jnp.sum(vals) * 1e-6
        return jax.lax.fori_loop(0, iters, body, c)

    def bwd_loss(op, s, c):
        s2 = s._replace(opacity_logits=op + c * 0)
        return jnp.sum(jax.vmap(lambda cam: one_fwd(s2, cam))(cams))

    gfn = jax.grad(bwd_loss)

    @jax.jit
    def bwd_loop(s, c):
        def body(i, c):
            g = gfn(s.opacity_logits, s, c)
            return c + g[0] * 1e-6
        return jax.lax.fori_loop(0, iters, body, c)

    px = batch * width * height

    def timeit(loop):
        t0 = time.time()
        float(jax.device_get(loop(scene, jnp.float32(0.0))))
        first = time.time() - t0
        t0 = time.time()
        float(jax.device_get(loop(scene, jnp.float32(0.0))))
        dt = (time.time() - t0) / iters
        return dt, first

    # Round-4 variant: lax.map (sequential cameras, ONE program) instead of
    # vmap. The round-3 sweep measured the vmapped batch at ~1/3 the
    # per-pixel rate of a single camera (5.58 vs 16.7 Mpix/s fwd) with no
    # HBM spill (AOT memory analysis: 6.3 GB temp) — this row isolates
    # whether batching-by-vmap itself is the regression.
    @jax.jit
    def fwd_loop_seq(s, c):
        def body(i, c):
            s2 = s._replace(opacity_logits=s.opacity_logits + c * 0)
            vals = jax.lax.map(lambda cam: one_fwd(s2, cam), cams)
            return jnp.sum(vals) * 1e-6
        return jax.lax.fori_loop(0, iters, body, c)

    # Round-5: the supported batch path's TRAINING number — lax.map fwd+bwd
    # (VERDICT r4 missing #4; vmap fwd+bwd measured 5.66 Mpix/s in phase 2).
    def bwd_loss_seq(op, s, c):
        s2 = s._replace(opacity_logits=op + c * 0)
        return jnp.sum(jax.lax.map(lambda cam: one_fwd(s2, cam), cams))

    gfn_seq = jax.grad(bwd_loss_seq)

    @jax.jit
    def bwd_loop_seq(s, c):
        def body(i, c):
            g = gfn_seq(s.opacity_logits, s, c)
            return c + g[0] * 1e-6
        return jax.lax.fori_loop(0, iters, body, c)

    fwd_dt, fwd_first = timeit(fwd_loop)
    log(f"fwd batch-{batch}: {fwd_dt*1e3:.1f} ms "
        f"({px/fwd_dt/1e6:.1f} Mpix/s, first {fwd_first:.0f}s)")
    seq_dt, seq_first = timeit(fwd_loop_seq)
    log(f"fwd lax.map-{batch}: {seq_dt*1e3:.1f} ms "
        f"({px/seq_dt/1e6:.1f} Mpix/s, first {seq_first:.0f}s)")
    bwd_dt, bwd_first = timeit(bwd_loop)
    log(f"fwd+bwd batch-{batch}: {bwd_dt*1e3:.1f} ms "
        f"({px/bwd_dt/1e6:.1f} Mpix/s, first {bwd_first:.0f}s)")
    bwd_seq_dt, bwd_seq_first = timeit(bwd_loop_seq)
    log(f"fwd+bwd lax.map-{batch}: {bwd_seq_dt*1e3:.1f} ms "
        f"({px/bwd_seq_dt/1e6:.1f} Mpix/s, first {bwd_seq_first:.0f}s)")

    print(json.dumps({
        "metric": "multicam_semantic_batch",
        "batch": batch, "width": width, "height": height,
        "n_gaussians": n_gauss,
        "fwd_s": round(fwd_dt, 4),
        "fwd_mpix_per_s": round(px / fwd_dt / 1e6, 2),
        "fwd_seq_s": round(seq_dt, 4),
        "fwd_seq_mpix_per_s": round(px / seq_dt / 1e6, 2),
        "fwd_bwd_s": round(bwd_dt, 4),
        "fwd_bwd_mpix_per_s": round(px / bwd_dt / 1e6, 2),
        "fwd_bwd_seq_s": round(bwd_seq_dt, 4),
        "fwd_bwd_seq_mpix_per_s": round(px / bwd_seq_dt / 1e6, 2),
        "budgets": budgets,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    if "--small" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        main(n_gauss=5000, width=128, height=96, batch=4, iters=2)
    else:
        main()
