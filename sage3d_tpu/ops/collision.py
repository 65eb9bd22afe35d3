"""Batched capsule-vs-Gaussian collision queries (physics-aware execution).

TPU-native replacement for the PhysX collision bodies the reference embeds into
its 3DGS scenes (template.usda:156-165 collision payload; simple_env.py:2823-2851
physics scene; the kinematic agent is a cylinder collider, :741-967). Instead of
a triangle-mesh physics engine, collision geometry IS the Gaussian set: the agent
capsule (vertical segment + radius, matching the reference's cylinder agent) is
tested against every Gaussian's ellipsoid support directly.

Formulated as pure CHANNEL math over (B, chunk) planes — x/y/z handled as
separate arrays — because (B, C, 3) layouts pad their 3-wide minor dim to full
128 TPU lanes (~40x wasted bandwidth) and tiny-K einsums cannot use the MXU
anyway; this is the same lesson as the projection stage, where the batched
(N, 3, 3) matmul form measured 5x slower than fused scalar channels
(docs/PERF_NOTES.md cost model). XLA fuses the whole per-chunk chain into one
VPU pass over (B, C) tiles. B queries x 1M Gaussians runs as a lax.scan over
chunks with O(chunk) memory. Differentiable w.r.t. query positions (clearance
gradients for planners).

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

from ..ops.projection import _rotmat_channels
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
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]               # (B, 1)
    inv_dd = (1.0 / dd_safe)[:, None]

    def body(carry, inp):
        best_clear, best_id, hits = carry
        mu, q, ls, op, sm = inp
        mux, muy, muz = mu[:, 0][None], mu[:, 1][None], mu[:, 2][None]
        # Closest point of each capsule axis to each Gaussian center:
        # t* = clamp((mu - p0) . d / |d|^2, 0, 1); all planes are (B, C).
        rx = mux - p0[:, 0:1]
        ry = muy - p0[:, 1:2]
        rz = muz - p0[:, 2:3]
        t = jnp.clip((rx * dx + ry * dy + rz * dz) * inv_dd, 0.0, 1.0)
        fx = rx - t * dx                                       # mu - closest
        fy = ry - t * dy
        fz = rz - t * dz
        dist = jnp.sqrt(fx * fx + fy * fy + fz * fz + 1e-20)

        # Mahalanobis distance of the closest point: |S^-1 R^T diff|, with the
        # rotation as 9 scalar channels (R rows are (C,) coefficients).
        R = _rotmat_channels(q)
        inv_s = jnp.exp(-ls)                                   # (C, 3)
        m2 = None
        for j in range(3):
            loc_j = (R[0][j][None] * fx + R[1][j][None] * fy
                     + R[2][j][None] * fz) * inv_s[:, j][None]
            m2 = loc_j * loc_j if m2 is None else m2 + loc_j * loc_j
        maha = jnp.sqrt(m2 + 1e-20)

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
