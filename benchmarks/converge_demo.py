"""Convergence-grade scene fit on the real TPU (VERDICT r2 #6).

Self-fit: render 6 orbit views of a 100k-Gaussian synthetic room, perturb the
scene, and recover it by gradient descent with classic-3DGS per-group learning
rates + adaptive density control, training until the PSNR plateaus. The
training loop is the production pattern: `densify_every` steps chained in ONE
jitted scan per densify round (make_chained_adc_steps — per-call dispatch on
the tunneled device would otherwise dominate), densify/prune between rounds.

Run:  timeout 7200 python benchmarks/converge_demo.py > /tmp/converge.log 2>&1
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import log  # noqa: E402 (jax cache + repo path config)


def main(n=100_000, capacity=131_072, densify_every=100, densify_until=1200,
         max_steps=2000, plateau_db=0.05, n_views=6, width=256, height=256,
         target_db=28.0, grad_sort=None):
    from sage3d_tpu.parallel.densify import (DensifyConfig, DensifyState,
                                             densify_prune,
                                             init_densify_state)
    from sage3d_tpu.parallel.mesh import make_mesh
    from sage3d_tpu.parallel.train import (TrainState, make_chained_adc_steps,
                                           make_group_optimizer,
                                           make_train_step, scene_params,
                                           with_params)
    from sage3d_tpu.parallel.trainer import (make_orbit_targets, psnr,
                                             with_capacity)
    from sage3d_tpu.renderer.camera import make_camera
    from sage3d_tpu.renderer.render import autotune_all
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = synthetic_room(n, seed=3)
    cameras, targets = make_orbit_targets(scene, n_views=n_views, radius=5.0,
                                          width=width, height=height,
                                          backend="xla")
    targets = jax.block_until_ready(targets)
    log("targets rendered")

    key = jax.random.PRNGKey(0)
    init = scene._replace(
        means=scene.means + 0.02 * jax.random.normal(key, scene.means.shape))
    template = with_capacity(init, capacity)

    cam0 = jax.tree_util.tree_map(lambda x: x[0], cameras)
    budgets = autotune_all(template, cam0)
    log(f"budgets: {budgets}")
    kw = dict(pair_capacity=budgets["pair_capacity"],
              tile_capacity=budgets["tile_capacity"],
              k_small=budgets["k_small"], m_big=budgets["m_big"],
              k_big=budgets["k_big"],
              m_mid=budgets.get("m_mid", 0), k_mid=budgets.get("k_mid", 0),
              grad_sort=grad_sort)

    mesh = make_mesh((1, 1))
    opt = make_group_optimizer(extent=8.0)
    train_step, _ = make_train_step(template, cameras, mesh, optimizer=opt,
                                    backend="pallas", **kw)
    run_round = make_chained_adc_steps(train_step, densify_every)

    params = scene_params(template)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    dstate = init_densify_state(capacity)
    dcfg = DensifyConfig(grad_threshold=2e-4, split_scale=0.05,
                         prune_opacity=0.005, max_new_fraction=0.05)
    semantic_ids = template.semantic_ids

    curve = []
    t0 = time.time()
    best_psnr = -1e9
    stall_rounds = 0
    step = 0
    dkey = jax.random.PRNGKey(1)
    with mesh:
        while step < max_steps:
            state, gacc, loss = run_round(state, cameras, targets)
            step += densify_every
            dstate = DensifyState(grad_accum=dstate.grad_accum + gacc,
                                  n_steps=dstate.n_steps + densify_every)
            info = {}
            if step <= densify_until:
                dkey, sub = jax.random.split(dkey)
                new_params, dstate, opt_state, semantic_ids, info = \
                    densify_prune(state.params, dstate, sub, dcfg,
                                  opt_state=state.opt_state,
                                  semantic_ids=semantic_ids)
                info = {k: int(jax.device_get(v)) for k, v in info.items()}
                state = TrainState(new_params, opt_state, state.step)
            mse = float(jax.device_get(loss))
            db = psnr(mse)
            rec = {"step": step, "psnr_db": round(db, 3),
                   "elapsed_s": round(time.time() - t0, 1), **info}
            curve.append(rec)
            log(f"step {step}: {db:.2f} dB "
                f"alive={info.get('n_alive', '-')} "
                f"({rec['elapsed_s']}s)")
            # Plateau = TWO consecutive rounds without beating the best by
            # plateau_db (a single noisy dip must not end the run).
            if db > best_psnr + plateau_db:
                stall_rounds = 0
            elif step > densify_until:
                stall_rounds += 1
                if stall_rounds >= 2:
                    log("plateau reached")
                    break
            best_psnr = max(best_psnr, db)

    wall = time.time() - t0
    final = max(r["psnr_db"] for r in curve)
    print(json.dumps({
        "metric": "selffit_psnr_db",
        "final_psnr_db": final,   # best round (the converged level; the very
                                  # last round can sit in a noise dip)
        "steps": curve[-1]["step"],
        "wall_s": round(wall, 1),
        "steps_per_s": round(curve[-1]["step"] / wall, 2),
        "n_gaussians": n, "capacity": capacity, "n_views": n_views,
        "grad_sort": grad_sort or "default(f16)",
        "curve": curve,
    }))
    assert final >= target_db, f"plateau below target: {final} dB"


if __name__ == "__main__":
    # bf16-gradient-sort convergence evidence: `python converge_demo.py bf16`
    # runs the identical fit with the half-payload gradient sort, so its PSNR
    # can be compared against the f32 path before any promotion decision.
    # `steps=N` / `until=N` shorten the schedule for same-session A/Bs.
    kw = {}
    for tok in sys.argv[1:]:
        if tok in ("f32", "f16", "bf16"):
            kw["grad_sort"] = tok
        if tok.startswith("steps="):
            kw["max_steps"] = int(tok.split("=")[1])
        if tok.startswith("until="):
            kw["densify_until"] = int(tok.split("=")[1])
        if tok.startswith("target="):
            kw["target_db"] = float(tok.split("=")[1])
    main(**kw)
