"""Tile-sharded rendering: one image composited cooperatively by many chips.

The SPMD design from SURVEY.md section 7 / BASELINE.json: pixels (tile rows)
partition across the mesh's "tile" axis; the Gaussian set shards over the same
axis for projection and is all-gathered (ICI) before binning; each device bins
and composites only its own band. Per-Gaussian parameter gradients flow back
through the all-gather transpose (reduce-scatter) automatically.

The band trick: a horizontal band of the image is exactly the same camera with
the principal point shifted by the band offset and a shorter image — so each
device runs the identical static-shape render program on a "sub-camera", and
band outputs concatenate along image rows. Static shapes everywhere; no ragged
work between devices beyond tile-list imbalance inside each band.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.binning import TILE_H
from ..renderer.camera import Camera
from ..renderer.render import render
from ..renderer.scene import GaussianScene


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def render_tile_sharded(
    scene: GaussianScene,
    camera: Camera,
    mesh: Mesh,
    tile_axis: str = "tile",
    backend: str = "xla",
    shard_gaussians: bool = True,
    **render_kw,
) -> Dict[str, jnp.ndarray]:
    """Render one camera with tiles (bands of rows) sharded over ``tile_axis``.

    Returns full-image outputs, row-sharded across the mesh (concatenate of
    per-device bands, cropped to the true height).
    """
    n_dev = mesh.shape[tile_axis]
    band_h = _pad_to(_pad_to(camera.height, TILE_H) // n_dev, TILE_H)
    padded_h = band_h * n_dev

    n = scene.num_gaussians
    pad_n = _pad_to(n, n_dev) - n
    if pad_n and shard_gaussians:
        # pad with invisible Gaussians so the N axis divides the mesh
        scene = GaussianScene(
            means=jnp.pad(scene.means, ((0, pad_n), (0, 0)),
                          constant_values=1e6),
            log_scales=jnp.pad(scene.log_scales, ((0, pad_n), (0, 0))),
            quats=jnp.pad(scene.quats, ((0, pad_n), (0, 0))).at[n:, 0].set(1.0),
            opacity_logits=jnp.pad(scene.opacity_logits, (0, pad_n),
                                   constant_values=-20.0),
            sh=jnp.pad(scene.sh, ((0, pad_n), (0, 0), (0, 0))),
            semantic_ids=jnp.pad(scene.semantic_ids, (0, pad_n),
                                 constant_values=-1),
        )

    scene_spec = GaussianScene(
        means=P(tile_axis), log_scales=P(tile_axis), quats=P(tile_axis),
        opacity_logits=P(tile_axis), sh=P(tile_axis), semantic_ids=P(tile_axis),
    ) if shard_gaussians else jax.tree_util.tree_map(lambda _: P(), scene)

    out_spec = {k: (P(tile_axis, None, None) if k in ("rgb", "rgb_acc")
                    else P(tile_axis) if k in ("overflow", "grad_chunks")
                    else P(tile_axis, None))
                for k in ("rgb", "depth", "alpha", "semantic", "trans",
                          "depth_acc", "rgb_acc", "overflow", "grad_chunks")}

    @partial(shard_map, mesh=mesh, in_specs=(scene_spec,),
             out_specs=out_spec, check_vma=False)
    def _render_band(scene_shard: GaussianScene):
        if shard_gaussians:
            # All-gather the Gaussian shard (ICI); gradient transpose is a
            # reduce-scatter back onto the parameter shards.
            full = jax.tree_util.tree_map(
                lambda x: jax.lax.all_gather(x, tile_axis, axis=0, tiled=True),
                scene_shard)
        else:
            full = scene_shard
        idx = jax.lax.axis_index(tile_axis)
        y0 = (idx * band_h).astype(jnp.float32)
        band_cam = camera._replace(cy=camera.cy - y0, height=band_h)
        out = render(full, band_cam, backend=backend,
                     clamp_dims=(camera.width, camera.height), **render_kw)
        return {k: (v[None] if k in ("overflow", "grad_chunks") else v)
                for k, v in out.items()}

    out = _render_band(scene)
    out["overflow"] = jnp.sum(out["overflow"])
    out["grad_chunks"] = jnp.sum(out["grad_chunks"])
    return {k: (v[:camera.height] if k not in ("overflow", "grad_chunks")
                else v)
            for k, v in out.items()}
