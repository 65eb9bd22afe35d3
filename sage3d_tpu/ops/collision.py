"""Batched capsule-vs-Gaussian collision queries (physics-aware execution).

TPU-native replacement for the PhysX collision bodies the reference embeds into
its 3DGS scenes (template.usda:156-165 collision payload; simple_env.py:2823-2851
physics scene; the kinematic agent is a cylinder collider, :741-967). Instead of
a triangle-mesh physics engine, collision geometry IS the Gaussian set: the agent
capsule (vertical segment + radius, matching the reference's cylinder agent) is
tested against every Gaussian's ellipsoid support directly.

Formulated as dense linear algebra over Gaussian chunks so XLA keeps the MXU/VPU
busy: the segment-to-center projection is one matmul over the chunk, everything
else is elementwise. B queries x 1M Gaussians runs as a lax.scan over chunks
with O(chunk) memory. Differentiable w.r.t. query positions (clearance gradients
for planners).

The boolean "collides" decision uses the Mahalanobis distance at the closest
point of the capsule axis, thresholded at ``sigma_cut`` (default 2): a Gaussian
counts as solid out to 2 sigma if its opacity exceeds ``opacity_thresh`` —
mirroring how SAGE-3D's collision meshes are derived from the dense splats.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.projection import quat_to_rotmat
from ..renderer.scene import GaussianScene

DEFAULT_OPACITY_THRESH = 0.5
DEFAULT_SIGMA_CUT = 2.0


@partial(jax.jit, static_argnames=("chunk",))
def capsule_query(
    scene: GaussianScene,
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    radius,
    opacity_thresh: float = DEFAULT_OPACITY_THRESH,
    sigma_cut: float = DEFAULT_SIGMA_CUT,
    chunk: int = 65536,
) -> Dict[str, jnp.ndarray]:
    """Query B capsules against all Gaussians.

    Args:
      p0, p1: (B, 3) capsule segment endpoints (world frame).
      radius: scalar or (B,) capsule radius.

    Returns dict of (B,)-shaped arrays:
      clearance:  min over Gaussians of (euclidean axis distance
                  - capsule radius - Gaussian sigma_cut support); negative
                  inside contact.
      hit:        bool, any solid Gaussian within sigma_cut of the capsule.
      hit_count:  int32 number of contacting Gaussians.
      nearest_id: semantic id of the minimum-clearance Gaussian (-1 if none).
    """
    p0 = jnp.asarray(p0, jnp.float32)
    p1 = jnp.asarray(p1, jnp.float32)
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), p0.shape[:1])
    d = p1 - p0                                   # (B, 3)
    dd = jnp.sum(d * d, axis=-1)                  # (B,)
    dd_safe = jnp.where(dd > 1e-12, dd, 1.0)

    n = scene.num_gaussians
    pad = (-n) % chunk
    means = jnp.pad(scene.means, ((0, pad), (0, 0)))
    quats = jnp.pad(scene.quats, ((0, pad), (0, 0)),
                    constant_values=0.0).at[n:, 0].set(1.0) if pad else scene.quats
    log_scales = jnp.pad(scene.log_scales, ((0, pad), (0, 0)),
                         constant_values=-10.0) if pad else scene.log_scales
    opac = jnp.pad(scene.opacities, (0, pad)) if pad else scene.opacities
    sem = jnp.pad(scene.semantic_ids, (0, pad), constant_values=-1) \
        if pad else scene.semantic_ids
    n_chunks = means.shape[0] // chunk

    means_c = means.reshape(n_chunks, chunk, 3)
    quats_c = quats.reshape(n_chunks, chunk, 4)
    ls_c = log_scales.reshape(n_chunks, chunk, 3)
    op_c = opac.reshape(n_chunks, chunk)
    sem_c = sem.reshape(n_chunks, chunk)

    big = jnp.float32(1e9)

    def body(carry, inp):
        best_clear, best_id, hits = carry
        mu, q, ls, op, sm = inp
        # Closest point of each capsule axis to each Gaussian center:
        # t* = clamp((mu - p0) . d / |d|^2, 0, 1) — the (B, chunk) dot is MXU.
        rel0 = mu[None, :, :] - p0[:, None, :]                 # (B, C, 3)
        t = jnp.einsum("bck,bk->bc", rel0, d,
                       precision=jax.lax.Precision.HIGHEST) / dd_safe[:, None]
        t = jnp.clip(t, 0.0, 1.0)
        closest = p0[:, None, :] + t[..., None] * d[:, None, :]
        diff = mu[None, :, :] - closest                        # (B, C, 3)
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-20)

        # Mahalanobis distance of the closest point: |S^-1 R^T diff|.
        R = quat_to_rotmat(q)                                  # (C, 3, 3)
        local = jnp.einsum("cij,bci->bcj", R, diff,
                           precision=jax.lax.Precision.HIGHEST)
        inv_s = jnp.exp(-ls)                                   # (C, 3)
        maha = jnp.sqrt(jnp.sum((local * inv_s[None]) ** 2, axis=-1) + 1e-20)

        solid = op[None, :] >= opacity_thresh
        # Support radius along the contact direction: sigma_cut * dist / maha
        # (distance from center to the sigma_cut ellipsoid surface).
        support = sigma_cut * dist / jnp.maximum(maha, 1e-6)
        clear = jnp.where(solid, dist - support - radius[:, None], big)
        contact = solid & (maha <= sigma_cut + radius[:, None]
                           * maha / jnp.maximum(dist, 1e-6))

        c_min = jnp.min(clear, axis=1)
        c_arg = jnp.argmin(clear, axis=1)
        c_id = sm[c_arg]
        better = c_min < best_clear
        return ((jnp.where(better, c_min, best_clear),
                 jnp.where(better, c_id, best_id),
                 hits + jnp.sum(contact, axis=1).astype(jnp.int32)), None)

    b = p0.shape[0]
    init = (jnp.full((b,), big), jnp.full((b,), -1, jnp.int32),
            jnp.zeros((b,), jnp.int32))
    (clear, nid, hits), _ = jax.lax.scan(
        body, init, (means_c, quats_c, ls_c, op_c, sem_c))
    return {
        "clearance": clear,
        "hit": hits > 0,
        "hit_count": hits,
        "nearest_id": jnp.where(clear < big, nid, -1),
    }


def agent_capsule(pos_xy, z0: float = 0.1, z1: float = 0.7, radius: float = 0.1):
    """The agent's collision capsule (cylinder r=0.1 m, h=0.5-0.7 m — the
    reference's collider, simple_env.py:765,922), as (p0, p1, radius)."""
    pos_xy = jnp.asarray(pos_xy, jnp.float32)
    flat = pos_xy.reshape(-1, 2)
    p0 = jnp.concatenate([flat, jnp.full((flat.shape[0], 1), z0)], axis=-1)
    p1 = jnp.concatenate([flat, jnp.full((flat.shape[0], 1), z1)], axis=-1)
    return p0, p1, jnp.float32(radius)
