"""Profiling and roofline accounting for the render pipeline.

The reference's only observability is wall-clock prints (SURVEY.md 5.1). Here:
  * ``trace()`` wraps jax.profiler for on-device traces (TensorBoard-viewable);
  * ``timed()`` measures honestly on asynchronous backends (host readback of a
    data-dependent scalar — see .claude/skills/verify/SKILL.md);
  * ``render_cost_model()`` gives per-stage FLOP/byte estimates so measured
    throughput can be compared against the memory/compute roofline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sage3d_trace"):
    """jax.profiler trace context (open with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 4) -> Dict[str, float]:
    """Truthful steady-state timing: chains ``iters`` calls in a fori_loop and
    walls-clocks a host readback. ``fn(*args)`` must return a pytree whose
    first leaf is float-summable."""
    def scalar_of(out):
        return jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1].astype(jnp.float32))

    @jax.jit
    def loop(c):
        def body(i, c):
            return c + scalar_of(fn(*args)) * 0.0
        return jax.lax.fori_loop(0, iters, body, c)

    t0 = time.time()
    float(jax.device_get(loop(jnp.float32(0.0))))
    first = time.time() - t0
    t0 = time.time()
    float(jax.device_get(loop(jnp.float32(0.0))))
    steady = (time.time() - t0) / iters
    return {"first_s": first, "steady_s": steady}


def render_cost_model(n_gaussians: int, width: int, height: int,
                      n_pairs: int, mean_live_depth: float = 64.0) -> Dict:
    """FLOP/byte estimates per render stage for roofline comparison.

    mean_live_depth: average pairs actually composited per pixel before
    early termination (scene-dependent; ~2x the opacity-weighted saturation
    depth).
    """
    proj_flops = n_gaussians * 250           # quat->rot, EWA, SH0
    proj_bytes = n_gaussians * (60 * 4 + 10 * 4)
    bin_bytes = n_pairs * 3 * 4 * 4          # emit + sort passes (approx)
    live_pairs = width * height / 1024 * mean_live_depth
    comp_flops = live_pairs * 1024 * 40      # alpha + scan + blend per pair-chunk px
    comp_bytes = n_pairs * 16 * 4            # one feats stream
    return {
        "projection": {"flops": proj_flops, "bytes": proj_bytes},
        "binning": {"bytes": bin_bytes},
        "compositing": {"flops": comp_flops, "bytes": comp_bytes},
        "total_flops": proj_flops + comp_flops,
        "total_bytes": proj_bytes + bin_bytes + comp_bytes,
    }
