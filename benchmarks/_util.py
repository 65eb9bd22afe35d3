"""Shared benchmark-script plumbing (single source for the tunnel-discipline
policy bits: persistent compile cache, flushed stage logging, chained-loop
timing with a data-dependent carry — see .claude/skills/verify/SKILL.md).
"""

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, args, iters: int = 6):
    """Truthful per-iteration wall time on the tunneled device: ``iters``
    calls of ``fn(carry, *args) -> scalar`` chained in ONE jitted fori_loop
    whose carry perturbs every iteration (constant-closure inputs get
    constant-folded and time nothing), synced by a host readback.

    Returns (seconds_per_iter, first_call_seconds): the first call includes
    compile (30 s - 18 min through the tunnel on a cold cache).
    """
    @jax.jit
    def loop(c, *a):
        def body(i, c):
            return c + fn(c, *a)
        return jax.lax.fori_loop(0, iters, body, c)

    t0 = time.time()
    float(jax.device_get(loop(jnp.float32(0.0), *args)))
    first = time.time() - t0
    t0 = time.time()
    float(jax.device_get(loop(jnp.float32(0.0), *args)))
    return (time.time() - t0) / iters, first
