"""Gaussian scene representation: struct-of-arrays, PLY ingest, synthetic scenes.

Replaces the reference's external asset chain (splat-transform PLY decompression +
3DGRUT ply_to_usd + Isaac Sim USDZ composition — reference README.md:194-266,
sage3d_usda_builder.py). The TPU framework ingests 3DGS PLY directly into a flat
struct-of-arrays pytree; semantic IDs from InteriorGS labels.json are attached
per-Gaussian so the renderer can emit an object-ID channel (object-level semantic
grounding, the capability added by SAGE-3D's L1/L2 layers).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

SH_C0 = 0.28209479177387814


class GaussianScene(NamedTuple):
    """Struct-of-arrays 3DGS scene. Registered as a pytree (all leaves arrays).

    Parameterization matches standard 3DGS training space so scenes can be
    optimized directly:
      * ``log_scales``: per-axis log of the ellipsoid scales (meters).
      * ``quats``: unnormalized (w, x, y, z) rotations; normalized at use.
      * ``opacity_logits``: pre-sigmoid opacities.
      * ``sh``: (N, K, 3) spherical-harmonic coefficients, K = (deg+1)^2;
        sh[:, 0] is the DC term.
      * ``semantic_ids``: (N,) int32 object-instance IDs (-1 = unlabeled).
    """

    means: jnp.ndarray          # (N, 3) float32
    log_scales: jnp.ndarray     # (N, 3) float32
    quats: jnp.ndarray          # (N, 4) float32, (w, x, y, z)
    opacity_logits: jnp.ndarray  # (N,) float32
    sh: jnp.ndarray             # (N, K, 3) float32
    semantic_ids: jnp.ndarray   # (N,) int32

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        return int(round(self.sh.shape[1] ** 0.5)) - 1

    @property
    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.log_scales)

    @property
    def opacities(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity_logits)


def make_scene(means, scales, quats, opacities, colors=None, sh=None,
               semantic_ids=None, sh_degree: int = 0) -> GaussianScene:
    """Build a GaussianScene from physical-space parameters.

    ``colors`` are linear RGB in [0, 1] mapped to the SH DC term; alternatively
    pass a full ``sh`` array. ``opacities`` in (0, 1) are converted to logits.
    """
    means = jnp.asarray(means, jnp.float32)
    n = means.shape[0]
    if sh is None:
        k = (sh_degree + 1) ** 2
        sh_arr = np.zeros((n, k, 3), np.float32)
        if colors is not None:
            sh_arr[:, 0, :] = (np.asarray(colors, np.float32) - 0.5) / SH_C0
        sh = jnp.asarray(sh_arr)
    else:
        sh = jnp.asarray(sh, jnp.float32)
    op = np.clip(np.asarray(opacities, np.float32), 1e-5, 1.0 - 1e-5)
    return GaussianScene(
        means=means,
        log_scales=jnp.log(jnp.asarray(scales, jnp.float32)),
        quats=jnp.asarray(quats, jnp.float32),
        opacity_logits=jnp.asarray(np.log(op / (1.0 - op))),
        sh=sh,
        semantic_ids=(jnp.asarray(semantic_ids, jnp.int32) if semantic_ids is not None
                      else jnp.full((n,), -1, jnp.int32)),
    )


# ---------------------------------------------------------------------------
# PLY ingest (standard INRIA 3DGS .ply layout)
# ---------------------------------------------------------------------------

_PLY_DTYPES = {
    "float": np.float32, "float32": np.float32, "double": np.float64,
    "uchar": np.uint8, "uint8": np.uint8, "int": np.int32, "uint": np.uint32,
    "short": np.int16, "ushort": np.uint16, "char": np.int8,
}


@partial(jax.jit, static_argnames=("max_gaussians",))
def importance_subset(scene: GaussianScene,
                      max_gaussians: int) -> GaussianScene:
    """Top-``max_gaussians`` importance LOD of a scene.

    Importance = opacity x ellipsoid surface area (the screen coverage a
    splat can produce): the standard visual-impact ranking for 3DGS level-of-
    detail. Used by the rollout path to render small POLICY frames (160x128)
    without paying full-scene projection/binning per env-step — collision
    queries keep using the FULL scene (geometry must not thin out). One jit
    per (scene-size, K); run once per scene, reused across the episode.
    """
    n = scene.num_gaussians
    k = min(max_gaussians, n)
    s = jnp.exp(scene.log_scales)
    area = s[:, 0] * s[:, 1] + s[:, 0] * s[:, 2] + s[:, 1] * s[:, 2]
    score = jax.nn.sigmoid(scene.opacity_logits) * area
    idx = jnp.argsort(-score)[:k]
    # one row-gather per field (row gathers are cheap; 1-D gathers are not)
    return GaussianScene(
        means=scene.means[idx],
        log_scales=scene.log_scales[idx],
        quats=scene.quats[idx],
        opacity_logits=scene.opacity_logits[idx],
        sh=scene.sh[idx],
        semantic_ids=scene.semantic_ids[idx],
    )


def _parse_ply_header(f):
    line = f.readline().decode("ascii").strip()
    if line != "ply":
        raise ValueError("not a PLY file")
    fmt = None
    n_vertices = 0
    props = []
    while True:
        line = f.readline().decode("ascii").strip()
        if line.startswith("format"):
            fmt = line.split()[1]
        elif line.startswith("element vertex"):
            n_vertices = int(line.split()[2])
        elif line.startswith("element"):
            raise ValueError(f"unsupported PLY element: {line}")
        elif line.startswith("property"):
            _, dtype, name = line.split()
            props.append((name, _PLY_DTYPES[dtype]))
        elif line == "end_header":
            break
    return fmt, n_vertices, props


def load_ply(path, max_sh_degree: int = 3, semantic_ids=None) -> GaussianScene:
    """Load a standard 3DGS PLY (x/y/z, f_dc_*, f_rest_*, opacity, scale_*, rot_*).

    The reference required splat-transform + 3DGRUT to turn these into USDZ for
    Isaac Sim (README.md:194-266); here the PLY is the scene format. ``rot_*`` is
    stored (w, x, y, z) as in INRIA checkpoints; scales/opacities are in log/logit
    space already, so they pass straight into the SoA.
    """
    path = Path(path)
    # Auto-detect PlayCanvas compressed 3DGS ("3dgs_compressed.ply",
    # InteriorGS distribution format): route to the native bit-unpacking
    # decoder — no splat-transform step needed (README.md:194-243).
    # Sniff the WHOLE header (up to end_header), not a fixed 4 KB prefix: a
    # compressed file whose comments/extra properties push the token past 4 KB
    # must not silently fall through to the uncompressed parser.
    head = b""
    with open(path, "rb") as f:
        while b"end_header" not in head and len(head) < (1 << 20):
            chunk = f.read(8192)
            if not chunk:
                break
            head += chunk
    if b"packed_position" in head.split(b"end_header")[0]:
        from ..utils.plyio_native import load_compressed_ply
        scene = load_compressed_ply(path)
        if semantic_ids is not None:
            scene = scene._replace(
                semantic_ids=jnp.asarray(semantic_ids, jnp.int32))
        return scene
    with open(path, "rb") as f:
        fmt, n, props = _parse_ply_header(f)
        if fmt not in ("binary_little_endian",):
            raise ValueError(f"unsupported PLY format: {fmt}")
        rec = np.dtype([(name, dt) for name, dt in props])
        data = np.frombuffer(f.read(rec.itemsize * n), dtype=rec, count=n)

    names = {name for name, _ in props}
    means = np.stack([data["x"], data["y"], data["z"]], axis=1).astype(np.float32)
    f_dc = np.stack([data[f"f_dc_{i}"] for i in range(3)], axis=1).astype(np.float32)
    n_rest = len([p for p in names if p.startswith("f_rest_")])
    k = min((max_sh_degree + 1) ** 2, 1 + n_rest // 3)
    sh = np.zeros((n, k, 3), np.float32)
    sh[:, 0, :] = f_dc
    if k > 1:
        # INRIA layout: f_rest is (3, K-1) flattened channel-major.
        rest = np.stack([data[f"f_rest_{i}"] for i in range(n_rest)], axis=1)
        rest = rest.reshape(n, 3, n_rest // 3)
        sh[:, 1:, :] = np.transpose(rest[:, :, : k - 1], (0, 2, 1))
    log_scales = np.stack([data[f"scale_{i}"] for i in range(3)], axis=1).astype(np.float32)
    quats = np.stack([data[f"rot_{i}"] for i in range(4)], axis=1).astype(np.float32)
    opacity_logits = data["opacity"].astype(np.float32)

    if semantic_ids is None and "semantic_id" in names:
        semantic_ids = data["semantic_id"].astype(np.int32)

    return GaussianScene(
        means=jnp.asarray(means),
        log_scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats),
        opacity_logits=jnp.asarray(opacity_logits),
        sh=jnp.asarray(sh),
        semantic_ids=(jnp.asarray(semantic_ids, jnp.int32) if semantic_ids is not None
                      else jnp.full((n,), -1, jnp.int32)),
    )


def save_ply(scene: GaussianScene, path) -> None:
    """Write a GaussianScene back to the standard 3DGS PLY layout."""
    n = scene.num_gaussians
    k = scene.sh.shape[1]
    names = (["x", "y", "z"] + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(3 * (k - 1))]
             + ["opacity"] + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)] + ["semantic_id"])
    rec = np.dtype([(nm, np.int32 if nm == "semantic_id" else np.float32) for nm in names])
    out = np.empty(n, rec)
    means = np.asarray(scene.means)
    sh = np.asarray(scene.sh)
    for i, ax in enumerate("xyz"):
        out[ax] = means[:, i]
    for i in range(3):
        out[f"f_dc_{i}"] = sh[:, 0, i]
    rest = np.transpose(sh[:, 1:, :], (0, 2, 1)).reshape(n, -1)
    for i in range(3 * (k - 1)):
        out[f"f_rest_{i}"] = rest[:, i]
    out["opacity"] = np.asarray(scene.opacity_logits)
    ls = np.asarray(scene.log_scales)
    for i in range(3):
        out[f"scale_{i}"] = ls[:, i]
    q = np.asarray(scene.quats)
    for i in range(4):
        out[f"rot_{i}"] = q[:, i]
    out["semantic_id"] = np.asarray(scene.semantic_ids)

    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        for nm in names:
            dt = "int" if nm == "semantic_id" else "float"
            f.write(f"property {dt} {nm}\n".encode())
        f.write(b"end_header\n")
        f.write(out.tobytes())


def attach_semantic_ids_from_labels(scene: GaussianScene, labels_json) -> GaussianScene:
    """Assign each Gaussian the instance ID of the labels.json AABB containing it.

    InteriorGS labels.json maps label_N -> 3D bbox (reference
    physical_map_converter.py:26-95 parses the same records). Gaussians outside
    every bbox keep -1. Ties go to the smallest-volume box (most specific object).
    """
    if isinstance(labels_json, (str, Path)):
        with open(labels_json) as f:
            labels = json.load(f)
    else:
        labels = labels_json

    boxes = []   # (id, min_xyz, max_xyz, volume)
    for key, rec in labels.items():
        try:
            inst_id = int(str(key).split("_")[-1])
        except ValueError:
            continue
        bbox = rec.get("bbox") if isinstance(rec, dict) else rec
        lo = np.asarray(bbox[0], np.float32)
        hi = np.asarray(bbox[1], np.float32)
        boxes.append((inst_id, lo, hi, float(np.prod(np.maximum(hi - lo, 1e-6)))))
    if not boxes:
        return scene

    boxes.sort(key=lambda b: -b[3])  # large first so small boxes overwrite
    means = np.asarray(scene.means)
    ids = np.full(means.shape[0], -1, np.int32)
    for inst_id, lo, hi, _ in boxes:
        inside = np.all((means >= lo) & (means <= hi), axis=1)
        ids[inside] = inst_id
    return scene._replace(semantic_ids=jnp.asarray(ids))


# ---------------------------------------------------------------------------
# Synthetic scenes (test fixtures & benchmarks)
# ---------------------------------------------------------------------------

def synthetic_room(
    num_gaussians: int = 2000,
    seed: int = 0,
    extent: float = 5.0,
    sh_degree: int = 0,
    num_objects: int = 8,
) -> GaussianScene:
    """A random 'room': floor/wall slabs plus object blobs with semantic IDs.

    Deterministic given ``seed``; used as the fixture standing in for InteriorGS
    scenes in unit tests and benchmarks.
    """
    rng = np.random.default_rng(seed)
    n = num_gaussians

    n_struct = n // 4
    n_obj = n - n_struct

    # structural splats: floor + 4 walls (semantic id 0 = "wall"-like)
    sp = rng.uniform(-extent, extent, size=(n_struct, 3)).astype(np.float32)
    which = rng.integers(0, 5, size=n_struct)
    sp[which == 0, 2] = np.abs(rng.normal(0, 0.02, (which == 0).sum()))
    sp[which == 1, 0] = -extent
    sp[which == 2, 0] = extent
    sp[which == 3, 1] = -extent
    sp[which == 4, 1] = extent
    sp[which > 0, 2] = rng.uniform(0, 3.0, (which > 0).sum())
    struct_scales = rng.uniform(0.05, 0.25, size=(n_struct, 3)).astype(np.float32)

    # object blobs
    centers = rng.uniform(-extent * 0.7, extent * 0.7, size=(num_objects, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(0.2, 1.5, num_objects)
    obj_of = rng.integers(0, num_objects, size=n_obj)
    op_ = centers[obj_of] + rng.normal(0, 0.3, size=(n_obj, 3)).astype(np.float32)
    obj_scales = rng.uniform(0.02, 0.15, size=(n_obj, 3)).astype(np.float32)

    means = np.concatenate([sp, op_], axis=0)
    scales = np.concatenate([struct_scales, obj_scales], axis=0)
    sem = np.concatenate([np.zeros(n_struct, np.int32), (obj_of + 1).astype(np.int32)])

    u = rng.uniform(size=(n, 3))
    quats = np.stack([
        np.sqrt(1 - u[:, 0]) * np.sin(2 * np.pi * u[:, 1]),
        np.sqrt(1 - u[:, 0]) * np.cos(2 * np.pi * u[:, 1]),
        np.sqrt(u[:, 0]) * np.sin(2 * np.pi * u[:, 2]),
        np.sqrt(u[:, 0]) * np.cos(2 * np.pi * u[:, 2]),
    ], axis=1).astype(np.float32)  # uniform quaternions, (w,x,y,z) after roll
    quats = np.roll(quats, 1, axis=1)

    opacities = rng.uniform(0.3, 0.95, size=n).astype(np.float32)
    colors = rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32)

    scene = make_scene(means, scales, quats, opacities, colors=colors,
                       semantic_ids=sem, sh_degree=sh_degree)
    if sh_degree > 0:
        shn = np.array(scene.sh)  # copy: np.asarray of a jax array is read-only
        shn[:, 1:, :] = rng.normal(0, 0.02, shn[:, 1:, :].shape)
        scene = scene._replace(sh=jnp.asarray(shn))
    return scene
