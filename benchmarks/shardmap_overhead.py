"""Sharded-vs-direct train-step overhead on the ONE real chip (VERDICT r2 #5).

Runs the SAME training workload through (a) the direct single-chip path and
(b) the shard_map-wrapped path forced on a (1, 1) mesh — the structural
counterpart to the emulated-mesh timing: it bounds what the SPMD wrapper
itself costs when communication is free. Chained steps per program (tunnel
dispatch discipline).

Run:  timeout 7200 python benchmarks/shardmap_overhead.py > /tmp/smo.log 2>&1
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import log  # noqa: E402 (jax cache + repo path config)


def main():
    from sage3d_tpu.parallel.mesh import make_mesh
    from sage3d_tpu.parallel.train import (TrainState, make_chained_steps,
                                           make_group_optimizer,
                                           make_train_step, pad_scene_to,
                                           scene_params)
    from sage3d_tpu.parallel.trainer import make_orbit_targets
    from sage3d_tpu.renderer.camera import make_camera
    from sage3d_tpu.renderer.render import autotune_all
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = pad_scene_to(synthetic_room(100_000, seed=3), 4)
    cameras, targets = make_orbit_targets(scene, n_views=4, radius=5.0,
                                          width=256, height=256,
                                          backend="xla")
    targets = jax.block_until_ready(targets)
    cam0 = jax.tree_util.tree_map(lambda x: x[0], cameras)
    budgets = autotune_all(scene, cam0)
    kw = dict(pair_capacity=budgets["pair_capacity"],
              tile_capacity=budgets["tile_capacity"],
              k_small=budgets["k_small"], m_big=budgets["m_big"],
              k_big=budgets["k_big"],
              m_mid=budgets.get("m_mid", 0), k_mid=budgets.get("k_mid", 0))
    mesh = make_mesh((1, 1))
    opt = make_group_optimizer(extent=8.0)
    params = scene_params(scene)

    def measure(force):
        step, _ = make_train_step(scene, cameras, mesh, optimizer=opt,
                                  backend="pallas",
                                  force_shard_map=force, **kw)
        run = make_chained_steps(step, 10)
        st = TrainState(params=params, opt_state=opt.init(params),
                        step=jnp.zeros((), jnp.int32))
        with mesh:
            t0 = time.time()
            st, loss = run(st, cameras, targets)
            float(jax.device_get(loss))
            compile_s = time.time() - t0
            t0 = time.time()
            st, loss = run(st, cameras, targets)
            float(jax.device_get(loss))
            dt = (time.time() - t0) / 10
        log(f"force_shard_map={force}: {dt*1e3:.1f} ms/step "
            f"(compile {compile_s:.0f}s)")
        return dt

    direct = measure(False)
    wrapped = measure(True)
    print(json.dumps({
        "direct_step_ms": round(direct * 1e3, 1),
        "shard_map_1x1_step_ms": round(wrapped * 1e3, 1),
        "wrapper_overhead_x": round(wrapped / direct, 3),
    }))


if __name__ == "__main__":
    main()
