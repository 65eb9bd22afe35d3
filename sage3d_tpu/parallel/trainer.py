"""Scene-optimization training loop: fit Gaussian scenes to target renders.

The user-facing trainer over parallel/train.py's sharded step: loads a scene
(PLY or synthetic), renders/loads target images, runs Adam with periodic orbax
checkpoints and resume, and reports PSNR. Runs single-chip or over a
(data x tile) mesh; this is the workload class the reference could not express
at all (its renderer was a closed engine).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..renderer.camera import Camera, stack_cameras
from ..renderer.render import render
from ..renderer.scene import GaussianScene
from .checkpoint import restore_train_state, save_train_state
from .mesh import make_mesh
from .train import (TrainState, make_optimizer, make_train_step, pad_scene_to,
                    scene_params, with_params)


@dataclass
class TrainerConfig:
    lr: float = 1e-3
    steps: int = 200
    mesh_shape: tuple = (1, 1)
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 100
    log_every: int = 20
    backend: str = "xla"
    pair_capacity: int = 1 << 20
    tile_capacity: int = 1024
    group_lrs: bool = False     # classic 3DGS per-group rates (see
    scene_extent: float = 1.0   # parallel.train.make_group_optimizer)

    def make_opt(self):
        from .train import make_group_optimizer
        if self.group_lrs:
            return make_group_optimizer(extent=self.scene_extent)
        return make_optimizer(self.lr)


def psnr(mse: float) -> float:
    import math
    return 10.0 * math.log10(1.0 / max(mse, 1e-12))


def fit_scene(
    scene: GaussianScene,
    cameras: Camera,
    targets: jnp.ndarray,
    config: TrainerConfig = TrainerConfig(),
    verbose: bool = True,
):
    """Optimize ``scene`` so its renders match ``targets`` (B, H, W, 3).

    Returns (fitted_scene, history). Resumes from config.checkpoint_dir if a
    checkpoint exists.
    """
    mesh = make_mesh(config.mesh_shape)
    n_tile = config.mesh_shape[1]
    template = pad_scene_to(scene, max(n_tile, 1))
    opt = config.make_opt()
    train_step, _ = make_train_step(
        template, cameras, mesh, optimizer=opt, backend=config.backend,
        pair_capacity=config.pair_capacity, tile_capacity=config.tile_capacity)

    params = scene_params(template)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    if config.checkpoint_dir:
        restored = restore_train_state(config.checkpoint_dir, state)
        if restored is not None:
            state = restored
            if verbose:
                print(f"[trainer] resumed at step {int(state.step)}")

    history = []
    t0 = time.time()
    with mesh:
        start = int(state.step)
        for step in range(start, config.steps):
            state, loss = train_step(state, cameras, targets)
            if (step + 1) % config.log_every == 0 or step + 1 == config.steps:
                mse = float(jax.device_get(loss))
                history.append({"step": step + 1, "mse": mse,
                                "psnr": psnr(mse),
                                "elapsed_s": time.time() - t0})
                if verbose:
                    h = history[-1]
                    print(f"[trainer] step {h['step']} mse={h['mse']:.6f} "
                          f"psnr={h['psnr']:.2f}dB t={h['elapsed_s']:.1f}s")
            if config.checkpoint_dir and \
                    (step + 1) % config.checkpoint_every == 0:
                save_train_state(config.checkpoint_dir, state)
    if config.checkpoint_dir:
        save_train_state(config.checkpoint_dir, state)

    fitted = with_params(template, state.params)
    return fitted, history


@dataclass
class AdaptiveConfig:
    densify_every: int = 50       # 0 = never
    densify_until: int = 10_000   # no density control after this step
    opacity_reset_every: int = 0  # 0 = never
    grad_threshold: float = 2e-4
    split_scale: float = 0.05
    prune_opacity: float = 0.005
    max_new_fraction: float = 0.1


def with_capacity(scene: GaussianScene, capacity: int) -> GaussianScene:
    """Pad ``scene`` to a fixed slot capacity; extra slots are PARKED (dead)
    so adaptive density control can grow into them without reallocation."""
    from .densify import DEAD_LOGIT, PARK_POS
    n = scene.num_gaussians
    assert capacity >= n
    pad = capacity - n
    if pad == 0:
        return scene
    return GaussianScene(
        means=jnp.pad(scene.means, ((0, pad), (0, 0)),
                      constant_values=PARK_POS),
        log_scales=jnp.pad(scene.log_scales, ((0, pad), (0, 0))),
        quats=jnp.pad(scene.quats, ((0, pad), (0, 0))).at[n:, 0].set(1.0),
        opacity_logits=jnp.pad(scene.opacity_logits, (0, pad),
                               constant_values=DEAD_LOGIT),
        sh=jnp.pad(scene.sh, ((0, pad), (0, 0), (0, 0))),
        semantic_ids=jnp.pad(scene.semantic_ids, (0, pad),
                             constant_values=-1),
    )


def fit_scene_adaptive(
    scene: GaussianScene,
    cameras: Camera,
    targets: jnp.ndarray,
    config: TrainerConfig = TrainerConfig(),
    adaptive: AdaptiveConfig = AdaptiveConfig(),
    capacity: Optional[int] = None,
    seed: int = 0,
    verbose: bool = True,
):
    """fit_scene + classic 3DGS adaptive density control (densify/prune).

    ``capacity`` fixes the slot count (default 2x the initial scene); live
    Gaussians grow/shrink inside it with static shapes (parallel/densify.py).
    Returns (fitted_scene, history); history entries carry live-count info.
    """
    from .densify import (DensifyConfig, accumulate, densify_prune,
                          init_densify_state, reset_opacity)

    cap = capacity or 2 * scene.num_gaussians
    mesh = make_mesh(config.mesh_shape)
    n_tile = config.mesh_shape[1]
    template = pad_scene_to(with_capacity(scene, cap), max(n_tile, 1))
    opt = config.make_opt()
    train_step, _ = make_train_step(
        template, cameras, mesh, optimizer=opt, backend=config.backend,
        pair_capacity=config.pair_capacity, tile_capacity=config.tile_capacity)

    params = scene_params(template)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    dstate = init_densify_state(template.num_gaussians)
    dcfg = DensifyConfig(grad_threshold=adaptive.grad_threshold,
                         split_scale=adaptive.split_scale,
                         prune_opacity=adaptive.prune_opacity,
                         max_new_fraction=adaptive.max_new_fraction)
    key = jax.random.PRNGKey(seed)
    semantic_ids = template.semantic_ids

    history = []
    t0 = time.time()
    with mesh:
        for step in range(config.steps):
            state, loss, gnorm = train_step.adc(state, cameras, targets)
            dstate = accumulate(dstate, gnorm[:, None])
            info = None
            if adaptive.densify_every \
                    and (step + 1) % adaptive.densify_every == 0 \
                    and step + 1 <= adaptive.densify_until:
                key, sub = jax.random.split(key)
                new_params, dstate, opt_state, semantic_ids, info = \
                    densify_prune(state.params, dstate, sub, dcfg,
                                  opt_state=state.opt_state,
                                  semantic_ids=semantic_ids)
                state = TrainState(new_params, opt_state, state.step)
            if adaptive.opacity_reset_every and \
                    (step + 1) % adaptive.opacity_reset_every == 0:
                from .densify import zero_opacity_moments
                state = state._replace(
                    params=reset_opacity(state.params),
                    opt_state=zero_opacity_moments(state.opt_state))
            if (step + 1) % config.log_every == 0 or info is not None \
                    or step + 1 == config.steps:
                mse = float(jax.device_get(loss))
                h = {"step": step + 1, "mse": mse, "psnr": psnr(mse),
                     "elapsed_s": time.time() - t0}
                if info is not None:
                    h.update({k: int(jax.device_get(v))
                              for k, v in info.items()})
                history.append(h)
                if verbose:
                    extra = (f" alive={h['n_alive']} new={h['n_new']} "
                             f"pruned={h['n_pruned']}" if info is not None
                             else "")
                    print(f"[trainer/adc] step {h['step']} "
                          f"mse={h['mse']:.6f} psnr={h['psnr']:.2f}dB"
                          f"{extra}")

    fitted = with_params(template, state.params)._replace(
        semantic_ids=semantic_ids)
    return fitted, history


def make_orbit_targets(scene: GaussianScene, n_views: int = 4,
                       radius: float = 5.0, width: int = 128,
                       height: int = 128, backend: str = "xla"):
    """Render ground-truth targets from an orbit of cameras (test/demo data)."""
    import numpy as np
    from ..renderer.camera import make_camera
    cams = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        pos = [radius * np.cos(ang), radius * np.sin(ang), 1.5]
        cams.append(make_camera(pos, [-np.cos(ang), -np.sin(ang), -0.1],
                                width=width, height=height))
    cameras = stack_cameras(cams)
    targets = jax.vmap(lambda c: render(scene, c, backend=backend)["rgb"])(
        cameras)
    return cameras, targets
