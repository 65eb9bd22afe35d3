"""Reference (oracle) compositor: exact per-pixel front-to-back alpha blending.

This is the correctness oracle demanded by BASELINE.json ("gradient allclose vs
reference rasterizer"): a direct, unoptimized realization of 3DGS compositing
semantics. Every pixel blends ALL Gaussians in global depth order — O(H*W*N) — so
it is only run on small scenes/resolutions in tests. The tiled XLA and Pallas
compositors must match it allclose in outputs and parameter gradients.

Differentiable end-to-end via jax autodiff (that is the point: `jax.grad` of this
function is the gradient oracle for the hand-derived backward kernels).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians, alpha_at


def composite_reference(
    proj: ProjectedGaussians,
    semantic_ids: jnp.ndarray,
    width: int,
    height: int,
    pixel_chunk: int = 4096,
) -> Dict[str, jnp.ndarray]:
    """Composite projected Gaussians over every pixel, exactly.

    Returns dict with:
      rgb:       (H, W, 3) accumulated color (premultiplied; add bg * T outside)
      depth_acc: (H, W) sum of w_i * depth_i
      alpha:     (H, W) sum of w_i (1 - final transmittance)
      trans:     (H, W) final transmittance T
      semantic:  (H, W) int32 argmax-weight semantic ID (-1 where nothing hit)
    """
    n = proj.depths.shape[0]
    # Global depth order; invisible Gaussians pushed to the back with +inf so
    # their (zeroed) alphas never affect ordering-sensitive ties.
    order = jnp.argsort(jnp.where(proj.visible, proj.depths, jnp.inf))
    proj_sorted = jax.tree_util.tree_map(lambda x: x[order], proj)
    sem_sorted = semantic_ids[order]

    ys, xs = jnp.mgrid[0:height, 0:width]
    # Pixel centers at integer coords + 0.5 (classic 3DGS convention).
    px = (xs.reshape(-1) + 0.5).astype(jnp.float32)
    py = (ys.reshape(-1) + 0.5).astype(jnp.float32)
    total = px.shape[0]
    pad = (-total) % pixel_chunk
    px = jnp.pad(px, (0, pad))
    py = jnp.pad(py, (0, pad))
    n_chunks = px.shape[0] // pixel_chunk
    px = px.reshape(n_chunks, pixel_chunk)
    py = py.reshape(n_chunks, pixel_chunk)

    def chunk_fn(px_c, py_c):
        alpha = alpha_at(proj_sorted, px_c, py_c)              # (P, N)
        # Exclusive cumulative transmittance in depth order (shift-based
        # exclusive cumprod — no divide, robust when alpha hits its 0.99 cap).
        one_minus = 1.0 - alpha
        trans_excl = jnp.concatenate(
            [jnp.ones_like(alpha[:, :1]), jnp.cumprod(one_minus, axis=-1)[:, :-1]],
            axis=-1)
        w = alpha * trans_excl                                  # (P, N)
        rgb = w @ proj_sorted.colors                            # (P, 3)
        depth_acc = w @ proj_sorted.depths
        acc = jnp.sum(w, axis=-1)
        trans = jnp.prod(one_minus, axis=-1)
        best = jnp.argmax(w, axis=-1)
        sem = jnp.where(jnp.max(w, axis=-1) > 0.0, sem_sorted[best], -1)
        return rgb, depth_acc, acc, trans, sem

    rgb, depth_acc, acc, trans, sem = jax.lax.map(
        lambda args: chunk_fn(*args), (px, py))

    def unflat(x, ch=None):
        x = x.reshape((-1,) + (() if ch is None else (ch,)))[:total]
        return x.reshape((height, width) + (() if ch is None else (ch,)))

    return {
        "rgb": unflat(rgb, 3),
        "depth_acc": unflat(depth_acc),
        "alpha": unflat(acc),
        "trans": unflat(trans),
        "semantic": unflat(sem).astype(jnp.int32),
    }
