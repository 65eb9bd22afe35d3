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


def test_chained_steps_match_sequential():
    """make_chained_steps(N) must produce the same state/loss as N separate
    train_step calls (it exists to amortize dispatch, not change math)."""
    import jax
    import jax.numpy as jnp
    from sage3d_tpu.parallel.mesh import make_mesh
    from sage3d_tpu.parallel.train import (TrainState, make_chained_steps,
                                           make_group_optimizer,
                                           make_train_step, scene_params)
    from sage3d_tpu.parallel.trainer import make_orbit_targets
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = synthetic_room(300, seed=4)
    cams, targets = make_orbit_targets(scene, n_views=2, radius=4.0,
                                       width=48, height=48)
    mesh = make_mesh((1, 1))
    opt = make_group_optimizer(extent=4.0)
    step, _ = make_train_step(scene, cams, mesh, optimizer=opt,
                              backend="xla", pair_capacity=1 << 14,
                              tile_capacity=256)
    params = scene_params(scene)
    s0 = TrainState(params=params, opt_state=opt.init(params),
                    step=jnp.zeros((), jnp.int32))
    with mesh:
        s_seq = s0
        for _ in range(3):
            s_seq, loss_seq = step(s_seq, cams, targets)
        run3 = make_chained_steps(step, 3)
        s_chn, loss_chn = run3(s0, cams, targets)
    assert abs(float(loss_seq) - float(loss_chn)) < 1e-6
    for k in params:
        assert float(jnp.abs(s_seq.params[k] - s_chn.params[k]).max()) < 1e-5
    assert int(s_chn.step) == 3


def test_group_optimizer_rates_differ_per_group():
    import jax.numpy as jnp
    from sage3d_tpu.parallel.train import GROUP_LRS, make_group_optimizer

    opt = make_group_optimizer(extent=2.0)
    params = {k: jnp.ones((4, 2)) for k in GROUP_LRS}
    state = opt.init(params)
    grads = {k: jnp.ones((4, 2)) for k in GROUP_LRS}
    updates, _ = opt.update(grads, state, params)
    # adam's first step is ~ -lr * sign(grad); means scaled by extent
    assert abs(float(updates["opacity_logits"][0, 0]) + 5e-2) < 1e-5
    assert abs(float(updates["means"][0, 0]) + 1.6e-4 * 2.0) < 1e-6
    assert abs(float(updates["sh"][0, 0]) + 2.5e-3) < 1e-6


def test_chained_adc_steps_match_sequential():
    """make_chained_adc_steps(N) == N separate .adc calls: same state, same
    summed gradient-norm accumulator, same final loss."""
    import jax
    import jax.numpy as jnp
    from sage3d_tpu.parallel.mesh import make_mesh
    from sage3d_tpu.parallel.train import (TrainState, make_chained_adc_steps,
                                           make_group_optimizer,
                                           make_train_step, scene_params)
    from sage3d_tpu.parallel.trainer import make_orbit_targets
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = synthetic_room(300, seed=4)
    cams, targets = make_orbit_targets(scene, n_views=2, radius=4.0,
                                       width=48, height=48)
    mesh = make_mesh((1, 1))
    opt = make_group_optimizer(extent=4.0)
    step, _ = make_train_step(scene, cams, mesh, optimizer=opt,
                              backend="xla", pair_capacity=1 << 14,
                              tile_capacity=256)
    params = scene_params(scene)
    s0 = TrainState(params=params, opt_state=opt.init(params),
                    step=jnp.zeros((), jnp.int32))
    with mesh:
        s_seq = s0
        acc = jnp.zeros((scene.num_gaussians,), jnp.float32)
        for _ in range(3):
            s_seq, loss_seq, gnorm = step.adc(s_seq, cams, targets)
            acc = acc + gnorm
        run3 = make_chained_adc_steps(step, 3)
        s_chn, acc_chn, loss_chn = run3(s0, cams, targets)
    assert abs(float(loss_seq) - float(loss_chn)) < 1e-6
    assert float(jnp.abs(acc - acc_chn).max()) < 1e-5
    for k in params:
        assert float(jnp.abs(s_seq.params[k] - s_chn.params[k]).max()) < 1e-5
