"""Device-mesh construction for multi-chip / multi-host rendering.

The communication backbone of the framework (SURVEY.md section 5.8): where the
reference shards work by launching N independent processes keyed on
hash(scene_id) (generate_images.py:136-139) and lets torch/NCCL handle
intra-server model parallelism, the TPU framework is SPMD over an explicit
jax.sharding.Mesh:

  * axis "data":  episode/camera batch parallelism (DP) — scenes and cameras
                  split across this axis (replaces scene-hash process sharding).
  * axis "tile":  intra-image parallelism (the spatial analog of sequence
                  parallelism): each device composites a horizontal band of
                  tiles; Gaussian storage and projection shard over the same
                  axis (TP-like), with all-gather of projected Gaussians and
                  psum of parameter gradients riding ICI.

On a pod slice, "data" maps across hosts (DCN) and "tile" within a host (ICI),
so the heavy all-gather/psum traffic stays on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data", "tile"),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the "tile" axis (single-host band parallelism).
    Pass shape=(n_data, n_tile) for 2D data x tile meshes.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (1, len(devices))
    need = int(np.prod(shape))
    assert need <= len(devices), f"mesh shape {shape} > {len(devices)} devices"
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (jax.distributed). The TPU replacement for the
    reference's per-process --instance-id/--total-instances sharding."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def process_local_episodes(episodes: Sequence, process_index: Optional[int] = None,
                           process_count: Optional[int] = None) -> list:
    """Host-local slice of a global episode/scene list (round-robin).

    The multi-host replacement for the reference's
    ``hash(scene_id) % total_instances == instance_id`` process sharding
    (generate_images.py:136-139): each host loads only its own episodes;
    device arrays built from them enter the mesh via
    ``global_batch_from_local``. Round-robin (not hash) so the split is
    exhaustive and balanced regardless of id distribution.
    """
    i = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    return list(episodes[i::n])


def global_batch_from_local(mesh: Mesh, local: np.ndarray,
                            axis: str = "data"):
    """Assemble a globally-sharded batch from each host's LOCAL rows
    (jax.make_array_from_process_local_data — SURVEY section 5.8): hosts never
    materialize each other's data; the array's global shape concatenates all
    hosts' rows along the sharded axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))
