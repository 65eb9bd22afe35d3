"""Sharded 3DGS scene optimization: the framework's flagship training step.

Scene reconstruction/refinement — optimizing Gaussian parameters against target
renders — is the differentiable renderer's core workload (what the Isaac-based
reference could not do at all: its renderer was a closed black box). The
multi-chip layout is FSDP-style over the mesh from parallel/mesh.py:

  * "data" axis: cameras/target images split (DP across hosts/DCN).
  * "tile" axis: image rows band-split (spatial SP) AND Gaussian parameters +
    Adam state sharded on the same axis (TP/ZeRO-like). Forward all-gathers
    the parameter shards over ICI; the gradient transpose is a reduce-scatter,
    so each device only ever materializes its own parameter/optimizer shard.

Everything below is one jitted SPMD program; XLA overlaps the all-gather with
projection math and the reduce-scatter with the backward compositing sweep.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.binning import TILE_H
from ..renderer.camera import Camera
from ..renderer.render import render
from ..renderer.scene import GaussianScene

TRAINABLE = ("means", "log_scales", "quats", "opacity_logits", "sh")


class TrainState(NamedTuple):
    params: Dict[str, jnp.ndarray]
    opt_state: optax.OptState
    step: jnp.ndarray


def scene_params(scene: GaussianScene) -> Dict[str, jnp.ndarray]:
    return {k: getattr(scene, k) for k in TRAINABLE}


def with_params(scene: GaussianScene, params: Dict[str, jnp.ndarray]) -> GaussianScene:
    return scene._replace(**params)


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    return optax.adam(lr)


# Classic 3DGS per-group learning rates (positions far slower than opacity):
# keys match TRAINABLE; means scale with scene extent via `extent`.
GROUP_LRS = {"means": 1.6e-4, "log_scales": 5e-3, "quats": 1e-3,
             "opacity_logits": 5e-2, "sh": 2.5e-3}


def make_group_optimizer(extent: float = 1.0,
                         lrs: Dict[str, float] = GROUP_LRS
                         ) -> optax.GradientTransformation:
    """Per-parameter-group Adam, the classic 3DGS schedule: a single global
    rate either freezes opacity (too low) or explodes positions (too high) —
    scene fitting needs both ends of a ~300x spread simultaneously."""
    tx = {k: optax.adam(lr * (extent if k == "means" else 1.0))
          for k, lr in lrs.items()}
    return optax.multi_transform(tx, {k: k for k in lrs})


def param_sharding(mesh: Mesh, tile_axis: str = "tile") -> NamedSharding:
    """Gaussian-axis sharding for params/optimizer state (FSDP-style)."""
    return NamedSharding(mesh, P(tile_axis))


def all_gather_bucketed(x: jnp.ndarray, axis_name: str,
                        n_buckets: int) -> jnp.ndarray:
    """All-gather a sharded array in ``n_buckets`` chunks along axis 0.

    Equivalent to `all_gather(..., tiled=True)` but issued as n_buckets
    independent collectives, whose TRANSPOSE is n_buckets independent
    reduce-scatters — the bucketed/chunked gradient reduction SURVEY §7 calls
    for: fine-grained collectives let the XLA scheduler interleave
    communication with the projection math (forward) and the backward
    compositing sweep, instead of one monolithic end-of-step transfer.
    Requires shard rows % n_buckets == 0 (callers pad via pad_scene_to).
    """
    s = x.shape[0]
    if n_buckets <= 1 or s % n_buckets != 0:
        return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    c = s // n_buckets
    parts = [jax.lax.all_gather(
        jax.lax.dynamic_slice_in_dim(x, i * c, c, axis=0),
        axis_name, axis=0, tiled=False) for i in range(n_buckets)]
    full = jnp.concatenate(parts, axis=1)       # (n_dev, s, *rest)
    return full.reshape((full.shape[0] * s,) + x.shape[1:])


def init_train_state(scene: GaussianScene, optimizer, mesh: Mesh,
                     tile_axis: str = "tile") -> TrainState:
    params = scene_params(scene)
    shard = param_sharding(mesh, tile_axis)
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), params)
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


def pad_scene_to(scene: GaussianScene, multiple: int) -> GaussianScene:
    """Pad the Gaussian axis so it divides the tile-axis mesh size."""
    n = scene.num_gaussians
    pad = (-n) % multiple
    if pad == 0:
        return scene
    return GaussianScene(
        means=jnp.pad(scene.means, ((0, pad), (0, 0)), constant_values=1e6),
        log_scales=jnp.pad(scene.log_scales, ((0, pad), (0, 0))),
        quats=jnp.pad(scene.quats, ((0, pad), (0, 0))).at[n:, 0].set(1.0),
        opacity_logits=jnp.pad(scene.opacity_logits, (0, pad),
                               constant_values=-20.0),
        sh=jnp.pad(scene.sh, ((0, pad), (0, 0), (0, 0))),
        semantic_ids=jnp.pad(scene.semantic_ids, (0, pad), constant_values=-1),
    )


def make_train_step(
    template: GaussianScene,
    camera: Camera,
    mesh: Mesh,
    optimizer=None,
    data_axis: str = "data",
    tile_axis: str = "tile",
    backend: str = "xla",
    grad_buckets: int = 4,
    force_shard_map: bool = False,
    **render_kw,
):
    """Build the jitted sharded train step.

    Args:
      template: scene providing non-trainable fields (semantic ids) and shapes;
        must already be padded so N % mesh.shape[tile_axis] == 0.
      camera: per-sample camera template (intrinsics/resolution); the batch
        passes per-camera position/rotation arrays.

    Returns (train_step, optimizer) where
      train_step(state, cam_batch: Camera[batch], targets[batch,H,W,3]) ->
      (state, loss).
    """
    if optimizer is None:
        optimizer = make_optimizer()
    n_tile = mesh.shape[tile_axis]
    padded_h = -(-camera.height // TILE_H) * TILE_H
    band_h = -(-(padded_h // TILE_H) // n_tile) * TILE_H  # rows per device

    params_spec = {k: P(tile_axis) for k in TRAINABLE}
    cam_spec = jax.tree_util.tree_map(lambda _: P(data_axis), camera)
    target_spec = P(data_axis)

    def _banded_loss_sum(params, cams, targets, band, gather):
        full = jax.tree_util.tree_map(gather, params)
        scene = with_params(template, full)
        y0 = (band * band_h).astype(jnp.float32)

        def one(cam: Camera, target):
            band_cam = cam._replace(cy=cam.cy - y0, height=band_h)
            out = render(scene, band_cam, backend=backend,
                         clamp_dims=(cam.width, cam.height), **render_kw)
            tgt = jax.lax.dynamic_slice_in_dim(
                target, band * band_h, band_h, axis=0)
            # rows past the true image height are band-grid padding: mask them
            rows = band * band_h + jnp.arange(band_h)
            mask = (rows < camera.height).astype(jnp.float32)[:, None, None]
            return jnp.sum(((out["rgb"] - tgt) ** 2) * mask)

        total = jnp.sum(jax.vmap(one)(cams, targets))
        return total[None, None]

    # force_shard_map keeps the wrapper on a trivial mesh — used to MEASURE
    # the wrapper's single-chip overhead (the audit's sharded-vs-direct row);
    # production single-chip training wants the direct path below.
    if mesh.size > 1 or force_shard_map:
        @partial(shard_map, mesh=mesh,
                 in_specs=(params_spec, cam_spec, target_spec),
                 out_specs=P(data_axis, tile_axis), check_vma=False)
        def local_loss_sum(params, cams, targets):
            # Gather the parameter shards in grad_buckets chunks (ICI
            # all-gathers; each transpose = an independent reduce-scatter, so
            # the gradient reduction is bucketed and schedulable against the
            # backward sweep rather than one end-of-step collective).
            return _banded_loss_sum(
                params, cams, targets, jax.lax.axis_index(tile_axis),
                lambda x: all_gather_bucketed(x, tile_axis, grad_buckets))
    else:
        # Trivial mesh: the shard_map wrapper is semantically a no-op but
        # measured ~10x slower per step on the tunneled single-chip backend —
        # call the same banded loss directly (band 0 covers the full frame).
        def local_loss_sum(params, cams, targets):
            return _banded_loss_sum(params, cams, targets, jnp.int32(0),
                                    lambda x: x)

    def loss_fn(params, cam_batch, targets):
        need_h = band_h * n_tile
        if targets.shape[1] < need_h:  # pad rows to the band grid
            targets = jnp.pad(targets,
                              ((0, 0), (0, need_h - targets.shape[1]),
                               (0, 0), (0, 0)))
        sums = local_loss_sum(params, cam_batch, targets)
        n_px = targets.shape[0] * camera.height * camera.width * 3
        return jnp.sum(sums) / n_px

    @jax.jit
    def train_step(state: TrainState, cam_batch: Camera, targets: jnp.ndarray
                   ) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, cam_batch,
                                                  targets)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    @jax.jit
    def train_step_adc(state: TrainState, cam_batch: Camera,
                       targets: jnp.ndarray):
        """Like train_step but also returns per-Gaussian positional-gradient
        norms (N,) — the densification score of parallel/densify.py."""
        loss, grads = jax.value_and_grad(loss_fn)(state.params, cam_batch,
                                                  targets)
        gnorm = jnp.linalg.norm(grads["means"], axis=-1)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss, gnorm

    train_step.adc = train_step_adc
    return train_step, optimizer


def make_chained_adc_steps(train_step, n_inner: int):
    """Chained variant of ``train_step.adc``: ``n_inner`` steps in ONE jitted
    scan, returning the SUMMED per-Gaussian positional-gradient norms so
    adaptive density control can run at its natural cadence (densify_every)
    with one device dispatch per round instead of one per step — on
    high-latency tunneled devices per-call dispatch dominates otherwise.

    Returns run(state, cams, targets) -> (state, gnorm_sum, last_loss).
    """
    @jax.jit
    def run(state: TrainState, cam_batch, targets):
        n = state.params["means"].shape[0]

        def body(carry, _):
            st, acc = carry
            st, loss, gnorm = train_step.adc(st, cam_batch, targets)
            return (st, acc + gnorm), loss

        (st, acc), losses = jax.lax.scan(
            body, (state, jnp.zeros((n,), jnp.float32)), None,
            length=n_inner)
        return st, acc, losses[-1]
    return run


def make_chained_steps(train_step, n_inner: int):
    """Run ``n_inner`` train steps inside ONE jitted lax.scan program.

    Production pattern for high-latency dispatch paths (remote/tunneled
    devices): per-call overhead amortizes over n_inner steps, and the device
    never waits on the host between steps. Returns run(state, cams, targets)
    -> (state, last_loss)."""
    @jax.jit
    def run(state: TrainState, cam_batch, targets):
        def body(st, _):
            st, loss = train_step(st, cam_batch, targets)
            return st, loss
        st, losses = jax.lax.scan(body, state, None, length=n_inner)
        return st, losses[-1]
    return run
