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
from typing import Dict, NamedTuple

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


class CollisionAccel(NamedTuple):
    """Spatially-chunked collision acceleration structure.

    The dense ``capsule_query`` touches all N Gaussians per query — the one
    kernel left doing so (VERDICT r3 #3). This accel reorders the scene by a
    Morton code over (x, y) so each fixed-size chunk covers a compact region,
    and precomputes per-chunk AABBs + a conservative support bound; the pruned
    query then skips (lax.cond) every chunk whose AABB cannot contain a
    Gaussian within ``prune_margin`` of any query capsule. Indoor agents are
    local — typically 1-3 of ~64-128 chunks survive.
    """

    scene: GaussianScene          # Morton-reordered copy of the input scene
    aabb_min: jnp.ndarray         # (n_chunks, 3) chunk bounds over means
    aabb_max: jnp.ndarray         # (n_chunks, 3)
    max_scale: jnp.ndarray        # (n_chunks,) max linear scale in the chunk


def _morton16(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Interleave two 16-bit ints into one int32 Morton code."""
    def spread(v):
        v = v.astype(jnp.uint32)
        v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
        v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
        v = (v | (v << 2)) & jnp.uint32(0x33333333)
        v = (v | (v << 1)) & jnp.uint32(0x55555555)
        return v
    return (spread(a) | (spread(b) << 1)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("chunk",))
def build_collision_accel(scene: GaussianScene,
                          chunk: int = 8192) -> CollisionAccel:
    """One-time (per scene) spatial sort + chunk-bound precompute.

    Gaussians are ordered by the Morton code of their quantized (x, y)
    (indoor scenes extend in the ground plane; z stays within chunks), so a
    contiguous chunk is spatially compact and its AABB is tight."""
    m = scene.means
    pad = (-scene.num_gaussians) % chunk
    lo = jnp.min(m, axis=0)
    span = jnp.maximum(jnp.max(m, axis=0) - lo, 1e-6)
    qx = jnp.clip((m[:, 0] - lo[0]) / span[0] * 65535.0, 0, 65535).astype(jnp.int32)
    qy = jnp.clip((m[:, 1] - lo[1]) / span[1] * 65535.0, 0, 65535).astype(jnp.int32)
    order = jnp.argsort(_morton16(qx, qy))

    sorted_scene = GaussianScene(
        means=m[order], log_scales=scene.log_scales[order],
        quats=scene.quats[order],
        opacity_logits=scene.opacity_logits[order],
        sh=scene.sh[order], semantic_ids=scene.semantic_ids[order])
    if pad:
        # pad with far-away, transparent, tiny Gaussians (never contact)
        sorted_scene = GaussianScene(
            means=jnp.pad(sorted_scene.means, ((0, pad), (0, 0)),
                          constant_values=1e7),
            log_scales=jnp.pad(sorted_scene.log_scales, ((0, pad), (0, 0)),
                               constant_values=-10.0),
            quats=jnp.pad(sorted_scene.quats, ((0, pad), (0, 0))
                          ).at[scene.num_gaussians:, 0].set(1.0),
            opacity_logits=jnp.pad(sorted_scene.opacity_logits, (0, pad),
                                   constant_values=-20.0),
            sh=jnp.pad(sorted_scene.sh, ((0, pad), (0, 0), (0, 0))),
            semantic_ids=jnp.pad(sorted_scene.semantic_ids, (0, pad),
                                 constant_values=-1))
    n_padded = sorted_scene.means.shape[0]
    n_chunks = n_padded // chunk
    mc = sorted_scene.means.reshape(n_chunks, chunk, 3)
    scales = jnp.exp(sorted_scene.log_scales).reshape(n_chunks, chunk, 3)
    # Padding rows (means at 1e7) must not inflate chunk AABBs — an all-pad
    # tail chunk gets an empty (+inf/-inf) box whose gap is infinite, so it
    # is never visited.
    real = (jnp.arange(n_padded) < scene.num_gaussians).reshape(
        n_chunks, chunk, 1)
    inf = jnp.float32(jnp.inf)
    return CollisionAccel(
        scene=sorted_scene,
        aabb_min=jnp.min(jnp.where(real, mc, inf), axis=1),
        aabb_max=jnp.max(jnp.where(real, mc, -inf), axis=1),
        max_scale=jnp.max(jnp.where(real, scales, 0.0), axis=(1, 2)))


@partial(jax.jit, static_argnames=())
def _segment_aabb_gap(p0, p1, radius, amin, amax):
    """Conservative lower bound on distance(capsule axis, chunk AABB):
    per-axis gap between the SEGMENT's AABB (inflated by radius) and the
    chunk AABB. (B, n_chunks)-shaped channel math."""
    gaps = []
    for j in range(3):
        s_lo = jnp.minimum(p0[:, j], p1[:, j])[:, None] - radius[:, None]
        s_hi = jnp.maximum(p0[:, j], p1[:, j])[:, None] + radius[:, None]
        g = jnp.maximum(amin[None, :, j] - s_hi, s_lo - amax[None, :, j])
        gaps.append(jnp.maximum(g, 0.0))
    return jnp.sqrt(gaps[0] ** 2 + gaps[1] ** 2 + gaps[2] ** 2)


@partial(jax.jit, static_argnames=())
def capsule_query_pruned(
    accel: CollisionAccel,
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    radius,
    opacity_thresh: float = DEFAULT_OPACITY_THRESH,
    sigma_cut: float = DEFAULT_SIGMA_CUT,
    prune_margin: float = 2.0,
) -> Dict[str, jnp.ndarray]:
    """``capsule_query`` semantics with chunk-level spatial pruning.

    Identical to the dense query for every Gaussian whose clearance is below
    ``prune_margin``; the reported ``clearance`` is clipped at the margin
    (values == prune_margin mean "free by at least the margin"). ``hit``,
    ``hit_count`` and ``nearest_id``-below-margin are exact — a contact
    implies clearance < 0, and a chunk is only skipped when NO Gaussian in it
    can come within the margin (AABB gap > sigma_cut * chunk max scale +
    margin, a bound on the ellipsoid support).

    NOTE: the skip is a scalar ``lax.cond`` per chunk — real savings on
    un-vmapped queries (rollout single-env, physics micro-steps, standalone
    batches). Under vmap the cond degrades to both-branches select; batch the
    queries into ONE call (B, ...) instead of vmapping many."""
    scene = accel.scene
    p0 = jnp.asarray(p0, jnp.float32)
    p1 = jnp.asarray(p1, jnp.float32)
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), p0.shape[:1])
    d = p1 - p0
    dd = jnp.sum(d * d, axis=-1)
    dd_safe = jnp.where(dd > 1e-12, dd, 1.0)

    n_chunks = accel.aabb_min.shape[0]
    chunk = scene.means.shape[0] // n_chunks  # static: both are shape-derived
    means_c = scene.means.reshape(n_chunks, chunk, 3)
    quats_c = scene.quats.reshape(n_chunks, chunk, 4)
    ls_c = scene.log_scales.reshape(n_chunks, chunk, 3)
    op_c = scene.opacities.reshape(n_chunks, chunk)
    sem_c = scene.semantic_ids.reshape(n_chunks, chunk)

    # visit mask: any query capsule within (support bound + margin) of chunk
    gap = _segment_aabb_gap(p0, p1, radius, accel.aabb_min, accel.aabb_max)
    reach = sigma_cut * accel.max_scale + prune_margin     # (n_chunks,)
    visit = jnp.any(gap <= reach[None, :], axis=0)         # (n_chunks,)

    big = jnp.float32(1e9)
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    inv_dd = (1.0 / dd_safe)[:, None]

    def chunk_math(carry, inp):
        best_clear, best_id, hits = carry
        mu, q, ls, op, sm = inp
        mux, muy, muz = mu[:, 0][None], mu[:, 1][None], mu[:, 2][None]
        rx = mux - p0[:, 0:1]
        ry = muy - p0[:, 1:2]
        rz = muz - p0[:, 2:3]
        t = jnp.clip((rx * dx + ry * dy + rz * dz) * inv_dd, 0.0, 1.0)
        fx = rx - t * dx
        fy = ry - t * dy
        fz = rz - t * dz
        dist = jnp.sqrt(fx * fx + fy * fy + fz * fz + 1e-20)
        R = _rotmat_channels(q)
        inv_s = jnp.exp(-ls)
        m2 = None
        for j in range(3):
            loc_j = (R[0][j][None] * fx + R[1][j][None] * fy
                     + R[2][j][None] * fz) * inv_s[:, j][None]
            m2 = loc_j * loc_j if m2 is None else m2 + loc_j * loc_j
        maha = jnp.sqrt(m2 + 1e-20)
        solid = op[None, :] >= opacity_thresh
        support = sigma_cut * dist / jnp.maximum(maha, 1e-6)
        clear = jnp.where(solid, dist - support - radius[:, None], big)
        contact = solid & (maha <= sigma_cut + radius[:, None]
                           * maha / jnp.maximum(dist, 1e-6))
        c_min = jnp.min(clear, axis=1)
        c_arg = jnp.argmin(clear, axis=1)
        c_id = sm[c_arg]
        better = c_min < best_clear
        return (jnp.where(better, c_min, best_clear),
                jnp.where(better, c_id, best_id),
                hits + jnp.sum(contact, axis=1).astype(jnp.int32))

    def body(carry, inp):
        mu, q, ls, op, sm, vis = inp
        new = jax.lax.cond(vis, chunk_math, lambda c, _: c, carry,
                           (mu, q, ls, op, sm))
        return new, None

    b = p0.shape[0]
    init = (jnp.full((b,), big), jnp.full((b,), -1, jnp.int32),
            jnp.zeros((b,), jnp.int32))
    (clear, nid, hits), _ = jax.lax.scan(
        body, init, (means_c, quats_c, ls_c, op_c, sem_c, visit))
    clear = jnp.minimum(clear, prune_margin)
    return {
        "clearance": clear,
        "hit": hits > 0,
        "hit_count": hits,
        "nearest_id": jnp.where(clear < prune_margin, nid, -1),
        "chunks_visited": jnp.sum(visit.astype(jnp.int32)),
    }


def agent_capsule(pos_xy, z0: float = 0.1, z1: float = 0.7, radius: float = 0.1):
    """The agent's collision capsule (cylinder r=0.1 m, h=0.5-0.7 m — the
    reference's collider, simple_env.py:765,922), as (p0, p1, radius)."""
    pos_xy = jnp.asarray(pos_xy, jnp.float32)
    flat = pos_xy.reshape(-1, 2)
    p0 = jnp.concatenate([flat, jnp.full((flat.shape[0], 1), z0)], axis=-1)
    p1 = jnp.concatenate([flat, jnp.full((flat.shape[0], 1), z1)], axis=-1)
    return p0, p1, jnp.float32(radius)
