"""Multi-HOST (DCN-axis) execution of the sharded train step, exercised for
real in a 2-process CPU cluster — no TPU pod required.

The reference's only cross-host mechanism is scene-hash process sharding of
independent Isaac-Sim instances (generate_images.py:136-139); this framework's
replacement is a ("data" = hosts, "tile" = local chips) mesh where the "data"
axis rides DCN and each host feeds the mesh only its OWN episodes
(jax.make_array_from_process_local_data — SURVEY §5.8).

Until round 4 that path had only single-process tests. This module runs it for
real: ``dryrun_multihost()`` spawns N actual OS processes, each with its own
virtual CPU device set, joined through ``jax.distributed.initialize`` (Gloo
collectives across processes), and drives the FULL sharded training step —
host-local episode slicing, global batch assembly, bucketed all-gather
forward, reduce-scatter gradients — over the 2-host mesh. Every process must
agree on the loss (it is a fully-replicated output of one SPMD program, so
agreement means the cross-process collectives really executed).

Worker entry: ``python -m sage3d_tpu.parallel.multihost --process-id I ...``.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from typing import Dict, List


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _episode_table(n_episodes: int) -> List[Dict]:
    """A tiny deterministic global episode list every host derives identically
    (hosts never exchange episode data — only their slice enters the mesh)."""
    return [{"episode_id": f"ep-{i:03d}",
             "start_xy": (-3.0 + 0.5 * i, -4.0),
             "yaw": 1.5 + 0.05 * i}
            for i in range(n_episodes)]


def worker_main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--n-gauss", type=int, default=256)
    p.add_argument("--image", type=int, default=64)
    p.add_argument("--steps", type=int, default=2)
    args = p.parse_args(argv)

    import jax
    # This worker is explicitly a CPU-cluster process: force the platform
    # before any backend init (the axon sitecustomize overrides JAX_PLATFORMS,
    # see __graft_entry__._honor_cpu_env).
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    import jax.numpy as jnp
    import numpy as np

    from ..renderer.camera import agent_camera, stack_cameras
    from ..renderer.scene import synthetic_room
    from .audit import _count_stablehlo
    from .mesh import (global_batch_from_local, make_mesh,
                       process_local_episodes)
    from .train import (TrainState, make_optimizer, make_train_step,
                        pad_scene_to, param_sharding, scene_params)

    n_proc = jax.process_count()
    assert n_proc == args.num_processes, (n_proc, args.num_processes)
    local = jax.local_devices()
    assert len(local) == args.local_devices, (len(local), args.local_devices)

    # Mesh: "data" across HOSTS (the DCN axis), "tile" within a host (ICI).
    # jax.devices() orders by process index; assert that before reshaping.
    devs = jax.devices()
    for i, d in enumerate(devs):
        assert d.process_index == i // args.local_devices, (
            f"device order not process-major: {[x.process_index for x in devs]}")
    mesh = make_mesh((n_proc, args.local_devices), devices=devs)

    # --- host-local episode sharding (replaces scene-hash process sharding) --
    episodes = _episode_table(2 * n_proc)
    mine = process_local_episodes(episodes)
    assert len(mine) == 2, mine
    # Each host builds ONLY its own cameras/targets; the global batch is
    # assembled shard-wise, data axis = hosts.
    w = h = args.image
    local_cams = stack_cameras([
        agent_camera(ep["start_xy"], yaw=ep["yaw"], width=w, height=h)
        for ep in mine])
    cams = jax.tree_util.tree_map(
        lambda x: global_batch_from_local(mesh, np.asarray(x)), local_cams)
    rng = np.random.default_rng(args.process_id)
    padded_h = max(-(-h // 32) * 32, 32 * args.local_devices)
    local_targets = rng.uniform(size=(2, padded_h, w, 3)).astype(np.float32)
    targets = global_batch_from_local(mesh, local_targets)

    # --- the full sharded train step over the 2-host mesh ---
    scene = pad_scene_to(synthetic_room(num_gaussians=args.n_gauss, seed=3),
                         args.local_devices * 4)
    opt = make_optimizer(1e-3)
    train_step, _ = make_train_step(scene, cams, mesh, optimizer=opt,
                                    backend="xla", pair_capacity=1 << 14,
                                    tile_capacity=256, grad_buckets=4)
    params = scene_params(scene)
    placed = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, param_sharding(mesh)), params)
    state = TrainState(params=placed, opt_state=opt.init(placed),
                       step=jnp.zeros((), jnp.int32))

    with mesh:
        lowered = train_step.lower(state, cams, targets)
        written = _count_stablehlo(lowered.as_text())
        step_fn = lowered.compile()
        losses = []
        for _ in range(args.steps):
            state, loss = step_fn(state, cams, targets)
            losses.append(float(jax.device_get(loss)))

    for v in losses:
        assert np.isfinite(v), f"non-finite loss {losses}"
    print("MULTIHOST_RESULT " + json.dumps({
        "process_id": args.process_id,
        "process_count": n_proc,
        "global_devices": len(devs),
        "local_devices": len(local),
        "mesh": {"data": n_proc, "tile": args.local_devices},
        "episodes_local": [ep["episode_id"] for ep in mine],
        "losses": losses,
        "written_collectives": written,
    }), flush=True)


def dryrun_multihost(num_processes: int = 2, local_devices: int = 4,
                     n_gauss: int = 256, image: int = 64,
                     timeout_s: int = 900) -> Dict:
    """Spawn ``num_processes`` real OS processes, each a JAX "host" with its
    own ``local_devices`` virtual CPU devices, and run the sharded train step
    over the (hosts x local) mesh. Returns the merged report; raises on any
    worker failure or cross-host loss disagreement."""
    port = _free_port()
    env = dict(os.environ,
               XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
               JAX_PLATFORMS="cpu")
    # The repo root must be importable in workers regardless of caller cwd.
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "sage3d_tpu.parallel.multihost",
         "--coordinator", f"localhost:{port}",
         "--num-processes", str(num_processes),
         "--process-id", str(i),
         "--local-devices", str(local_devices),
         "--n-gauss", str(n_gauss), "--image", str(image)],
        env=env, cwd=root, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(num_processes)]

    reports, failures = [], []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            failures.append(f"proc {i}: timeout after {timeout_s}s\n{out[-2000:]}")
            continue
        if p.returncode != 0:
            failures.append(f"proc {i}: rc={p.returncode}\n{out[-2000:]}")
            continue
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_RESULT ")]
        if not line:
            failures.append(f"proc {i}: no result line\n{out[-2000:]}")
            continue
        reports.append(json.loads(line[-1][len("MULTIHOST_RESULT "):]))
    if failures:
        raise RuntimeError("multihost dryrun failed:\n" + "\n".join(failures))

    # Cross-host agreement: the loss is a replicated output of ONE SPMD
    # program — identical values prove the DCN-axis collectives executed.
    losses = [tuple(r["losses"]) for r in reports]
    assert len(set(losses)) == 1, f"hosts disagree on loss: {losses}"
    # Host-local episode slices must partition the global table.
    eps = [tuple(r["episodes_local"]) for r in sorted(
        reports, key=lambda r: r["process_id"])]
    flat = [e for host in eps for e in host]
    assert len(set(flat)) == len(flat) == 2 * num_processes, eps
    wc = reports[0]["written_collectives"]
    assert wc["all_gather"] >= 20 and wc["reduce_scatter"] >= 20, wc
    return {"num_processes": num_processes, "local_devices": local_devices,
            "losses": list(losses[0]), "episodes_by_host": eps,
            "written_collectives": wc, "ok": True}


if __name__ == "__main__":
    worker_main()
