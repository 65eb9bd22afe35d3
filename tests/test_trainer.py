"""Scene-fitting trainer: loss decreases, checkpoints resume."""

import jax.numpy as jnp
import numpy as np

from sage3d_tpu.parallel.trainer import (TrainerConfig, fit_scene,
                                         make_orbit_targets)
from sage3d_tpu.renderer.scene import synthetic_room


def test_fit_scene_reduces_loss(tmp_path):
    gt = synthetic_room(num_gaussians=256, seed=31)
    cameras, targets = make_orbit_targets(gt, n_views=2, width=64, height=64)

    rng = np.random.default_rng(0)
    noisy = gt._replace(
        opacity_logits=gt.opacity_logits
        + jnp.asarray(rng.normal(0, 0.3, gt.opacity_logits.shape), jnp.float32),
        sh=gt.sh + jnp.asarray(rng.normal(0, 0.1, gt.sh.shape), jnp.float32))

    cfg = TrainerConfig(lr=5e-3, steps=12, log_every=4,
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        checkpoint_every=6, pair_capacity=1 << 14,
                        tile_capacity=512)
    fitted, history = fit_scene(noisy, cameras, targets, cfg, verbose=False)
    assert history[-1]["mse"] < history[0]["mse"]

    # resume: a new run continues from the checkpoint instead of restarting
    cfg2 = TrainerConfig(**{**cfg.__dict__, "steps": 16})
    fitted2, history2 = fit_scene(noisy, cameras, targets, cfg2, verbose=False)
    assert history2[0]["step"] > 12  # resumed past the first run's steps
