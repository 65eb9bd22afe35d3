"""Diagnose the train-bench regression: backend and vmap isolation.

(a) xla-backend training at the same config — diverges too? (dynamics) or
    converges? (pallas-kernel gradient issue at extreme overdraw density)
(b) pallas single-view step time vs (c) 4-view vmapped step time.

Run:  timeout 7200 python benchmarks/train_diag.py > /tmp/train_diag.log 2>&1
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from sage3d_tpu.parallel.mesh import make_mesh
    from sage3d_tpu.parallel.train import (TrainState, make_chained_steps,
                                           make_group_optimizer,
                                           make_train_step, scene_params)
    from sage3d_tpu.parallel.trainer import make_orbit_targets, psnr
    from sage3d_tpu.renderer.camera import make_camera
    from sage3d_tpu.renderer.render import autotune_all, render
    from sage3d_tpu.renderer.scene import synthetic_room

    n = 100_000
    scene = synthetic_room(n, seed=3)
    cameras, targets = make_orbit_targets(scene, n_views=4, radius=5.0,
                                          width=256, height=256,
                                          backend="xla")
    targets = jax.block_until_ready(targets)
    key = jax.random.PRNGKey(0)
    init = scene._replace(
        means=scene.means + 0.03 * jax.random.normal(key, scene.means.shape),
        opacity_logits=jnp.zeros_like(scene.opacity_logits))
    cam0 = jax.tree_util.tree_map(lambda x: x[0], cameras)
    budgets = autotune_all(init, cam0)
    log(f"budgets: {budgets}")
    kw = dict(pair_capacity=budgets["pair_capacity"],
              tile_capacity=budgets["tile_capacity"],
              k_small=budgets["k_small"], m_big=budgets["m_big"],
              k_big=budgets["k_big"])
    mesh = make_mesh((1, 1))

    # (b)/(c): pallas step time, single view vs vmapped 4 views
    def one_view_loss(op, s, c):
        s = s._replace(opacity_logits=op + c * 0)
        out = render(s, cam0, backend="pallas", **kw)
        return jnp.sum(out["rgb"] ** 2) * 1e-9

    g1 = jax.jit(jax.grad(one_view_loss))

    @jax.jit
    def loop1(s, c):
        def body(i, c):
            return c + g1(s.opacity_logits, s, c)[0]
        return jax.lax.fori_loop(0, 6, body, c)

    t0 = time.time()
    float(jax.device_get(loop1(init, jnp.float32(0.0))))
    log(f"single-view grad compile {time.time()-t0:.1f}s")
    t0 = time.time()
    float(jax.device_get(loop1(init, jnp.float32(0.0))))
    log(f"(b) single-view pallas fwd+bwd: {(time.time()-t0)/6*1e3:.1f} ms")

    def vmap_loss(op, s, c):
        s = s._replace(opacity_logits=op + c * 0)
        def one(cam):
            return jnp.sum(render(s, cam, backend="pallas", **kw)["rgb"] ** 2)
        return jnp.sum(jax.vmap(one)(cameras)) * 1e-9

    g4 = jax.jit(jax.grad(vmap_loss))

    @jax.jit
    def loop4(s, c):
        def body(i, c):
            return c + g4(s.opacity_logits, s, c)[0]
        return jax.lax.fori_loop(0, 6, body, c)

    t0 = time.time()
    float(jax.device_get(loop4(init, jnp.float32(0.0))))
    log(f"vmap-4 grad compile {time.time()-t0:.1f}s")
    t0 = time.time()
    float(jax.device_get(loop4(init, jnp.float32(0.0))))
    log(f"(c) vmapped-4-view pallas fwd+bwd: {(time.time()-t0)/6*1e3:.1f} ms")

    # (a) xla-backend training convergence, 50 steps
    opt = make_group_optimizer(extent=8.0)
    step, _ = make_train_step(init, cameras, mesh, optimizer=opt,
                              backend="xla", **kw)
    run25 = make_chained_steps(step, 25)
    params = scene_params(init)
    st = TrainState(params=params, opt_state=opt.init(params),
                    step=jnp.zeros((), jnp.int32))
    with mesh:
        t0 = time.time()
        st, loss = run25(st, cameras, targets)
        l25 = float(jax.device_get(loss))
        log(f"(a) xla 25 steps: psnr={psnr(l25):.2f} "
            f"(compile+run {time.time()-t0:.1f}s)")
        st, loss = run25(st, cameras, targets)
        l50 = float(jax.device_get(loss))
        log(f"(a) xla 50 steps: psnr={psnr(l50):.2f}")


if __name__ == "__main__":
    main()
