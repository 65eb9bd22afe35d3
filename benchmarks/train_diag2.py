"""Isolate the train-step slowdown: shard_map wrapper vs direct autodiff,
opacity-only vs full-param gradients.

Run:  timeout 7200 python benchmarks/train_diag2.py > /tmp/train_diag2.log 2>&1
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


def timed(name, fn, args, iters=4):
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


def main():
    from sage3d_tpu.parallel.mesh import make_mesh
    from sage3d_tpu.parallel.train import (TRAINABLE, TrainState,
                                           make_group_optimizer,
                                           make_train_step, scene_params,
                                           with_params)
    from sage3d_tpu.parallel.trainer import make_orbit_targets
    from sage3d_tpu.renderer.render import autotune_all, render
    from sage3d_tpu.renderer.scene import synthetic_room

    n = 100_000
    scene = synthetic_room(n, seed=3)
    cameras, targets = make_orbit_targets(scene, n_views=4, radius=5.0,
                                          width=256, height=256,
                                          backend="xla")
    targets = jax.block_until_ready(targets)
    cam0 = jax.tree_util.tree_map(lambda x: x[0], cameras)
    budgets = autotune_all(scene, cam0)
    log(f"budgets: {budgets}")
    kw = dict(pair_capacity=budgets["pair_capacity"],
              tile_capacity=budgets["tile_capacity"],
              k_small=budgets["k_small"], m_big=budgets["m_big"],
              k_big=budgets["k_big"])

    params = scene_params(scene)

    # (1) direct: vmap views, full-param grad, NO shard_map
    def direct_loss(p, s, tg, c):
        s = with_params(s, p)._replace(
            opacity_logits=p["opacity_logits"] + c * 0)
        def one(cam, t):
            out = render(s, cam, backend="pallas", **kw)
            return jnp.sum((out["rgb"] - t) ** 2)
        return jnp.sum(jax.vmap(one)(cameras, tg)) * 1e-9

    gfull = jax.grad(direct_loss)

    def direct_step(c, p, s, tg):
        g = gfull(p, s, tg, c)
        return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g)) * 1e-9

    timed("direct full-param grad (4 views)", direct_step,
          (params, scene, targets))

    # (2) the real train_step via shard_map on a 1x1 mesh
    mesh = make_mesh((1, 1))
    opt = make_group_optimizer(extent=8.0)
    step, _ = make_train_step(scene, cameras, mesh, optimizer=opt,
                              backend="pallas", **kw)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    with mesh:
        t0 = time.time()
        state, loss = step(state, cameras, targets)
        float(jax.device_get(loss))
        log(f"train_step compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(4):
            state, loss = step(state, cameras, targets)
        float(jax.device_get(loss))
        log(f"train_step (shard_map): {(time.time()-t0)/4*1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
