"""Multi-device sharding on the virtual 8-device CPU mesh.

Tile-sharded rendering must match single-device output exactly, and the
FSDP-style sharded train step must run and reduce the loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage3d_tpu.parallel.mesh import make_mesh
from sage3d_tpu.parallel.sharded_render import render_tile_sharded
from sage3d_tpu.parallel.train import (init_train_state, make_train_step,
                                       pad_scene_to, with_params)
from sage3d_tpu.renderer.camera import agent_camera, make_camera, stack_cameras
from sage3d_tpu.renderer.render import render
from sage3d_tpu.renderer.scene import synthetic_room

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

W, H = 64, 64


@pytest.fixture(scope="module")
def scene():
    return synthetic_room(num_gaussians=512, seed=21)


@pytest.fixture(scope="module")
def cam():
    return make_camera(position=[0.0, -4.0, 1.2], forward=[0.0, 1.0, -0.1],
                       width=W, height=H)


def test_tile_sharded_matches_single(scene, cam):
    mesh = make_mesh((1, 2))
    ref = render(scene, cam, backend="xla")
    out = render_tile_sharded(scene, cam, mesh, backend="xla")
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), rtol=1e-4, atol=1e-4)
    sem_match = (np.asarray(out["semantic"]) == np.asarray(ref["semantic"])).mean()
    assert sem_match > 0.99


def test_tile_sharded_8dev(scene, cam):
    mesh = make_mesh((1, 8))
    ref = render(scene, cam, backend="xla")
    out = render_tile_sharded(scene, cam, mesh, backend="xla")
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
                               rtol=1e-4, atol=2e-4)


def test_sharded_train_step_reduces_loss(scene, cam):
    mesh = make_mesh((2, 4))
    template = pad_scene_to(scene, 4)
    # targets: render of a perturbed scene (so there is signal to fit)
    cams = stack_cameras([
        agent_camera((0.0, -4.0), yaw=1.57, width=W, height=H),
        agent_camera((0.5, -4.2), yaw=1.4, width=W, height=H),
    ])
    targets = jax.vmap(lambda c: render(template, c, backend="xla")["rgb"])(cams)
    train_step, _ = make_train_step(template, cams, mesh, backend="xla")

    rng = np.random.default_rng(0)
    noisy = {k: v + jnp.asarray(rng.normal(0, 0.01, v.shape), v.dtype)
             for k, v in
             {k: getattr(template, k) for k in
              ("means", "log_scales", "quats", "opacity_logits", "sh")}.items()}
    from sage3d_tpu.parallel.train import make_optimizer, TrainState
    opt = make_optimizer(5e-3)
    state = TrainState(params=noisy, opt_state=opt.init(noisy),
                       step=jnp.zeros((), jnp.int32))
    train_step, opt2 = make_train_step(template, cams, mesh, optimizer=opt,
                                       backend="xla")

    with mesh:
        state, loss0 = train_step(state, cams, targets)
        for _ in range(5):
            state, loss = train_step(state, cams, targets)
    assert np.isfinite(float(loss0))
    assert float(loss) < float(loss0), (float(loss0), float(loss))


def test_param_shards_land_on_devices(scene):
    mesh = make_mesh((1, 8))
    template = pad_scene_to(scene, 8)
    from sage3d_tpu.parallel.train import make_optimizer
    state = init_train_state(template, make_optimizer(), mesh)
    sharding = state.params["means"].sharding
    assert sharding.is_fully_replicated is False
