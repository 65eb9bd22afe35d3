"""searchsorted cost at the binning size: 2041 queries over 18M sorted keys,
default vs method variants, plus a sort-free boundary alternative.

Run:  timeout 3600 python benchmarks/ss_probe.py > /tmp/ss_probe.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(name, fn, args, iters=6):
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
    dt = (time.time() - t0) / iters
    log(f"{name}: {dt * 1e3:.1f} ms/iter (first {first:.1f}s)")
    return dt


E = 18_100_000
T = 2040
MULT = 1 << 20
keys = jax.random.randint(jax.random.PRNGKey(0), (E,), 0, T, jnp.int32) * MULT
keys = jnp.sort(keys)
keys = jax.block_until_ready(keys)
tile_ids = jnp.arange(T + 1, dtype=jnp.int32)


def ss_default(c, keys):
    b = jnp.searchsorted(keys + c.astype(jnp.int32) * 0, tile_ids * MULT,
                         side="left")
    return jnp.sum(b.astype(jnp.float32)) * 1e-9


timed("searchsorted default (scan)", ss_default, (keys,))


def ss_sortm(c, keys):
    b = jnp.searchsorted(keys + c.astype(jnp.int32) * 0, tile_ids * MULT,
                         side="left", method="sort")
    return jnp.sum(b.astype(jnp.float32)) * 1e-9


timed("searchsorted method=sort", ss_sortm, (keys,))


def ss_compare(c, keys):
    b = jnp.searchsorted(keys + c.astype(jnp.int32) * 0, tile_ids * MULT,
                         side="left", method="compare_all")
    return jnp.sum(b.astype(jnp.float32)) * 1e-9


timed("searchsorted method=compare_all", ss_compare, (keys,))
