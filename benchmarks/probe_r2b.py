"""Device probes for the next round of kernel-path optimizations.

(a) binning sort at the 3-tier emission size (14.5M vs 18.1M entries)
(b) blocked two-level cumsum vs native cumsum on (5.3M, 10)
(c) int64-packed payload sort (6 operands) vs 11-operand f32 sort

Run:  timeout 7200 python benchmarks/probe_r2b.py > /tmp/probe_r2b.log 2>&1
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
jax.config.update("jax_enable_x64", True)  # probe-only: int64 packed payload sort


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


P = 5_300_000 // 128 * 128
NG = 10
key = jax.random.PRNGKey(0)

# (b) cumsum variants
x = jax.block_until_ready(jax.random.normal(key, (P, NG), jnp.float32))


def native_cumsum(c, x):
    return jnp.sum(jnp.cumsum(x + c * 0, axis=0)[-1]) * 1e-9


def blocked_cumsum(c, x):
    B = 8192
    nb = -(-P // B)
    xp = jnp.pad(x + c * 0, ((0, nb * B - P), (0, 0)))
    xb = xp.reshape(nb, B, NG)
    bs = jnp.sum(xb, axis=1)
    off = jnp.cumsum(bs, axis=0) - bs
    cs = jnp.cumsum(xb, axis=1) + off[:, None, :]
    return jnp.sum(cs[-1, -1]) * 1e-9




# (c) packed int64 sort vs 11-op f32 sort
ids = jax.block_until_ready(
    jax.random.randint(jax.random.PRNGKey(1), (P,), 0, 1_000_000, jnp.int32))
cols = jax.block_until_ready(
    jax.random.normal(jax.random.PRNGKey(2), (NG, P), jnp.float32))


def sort11(c, ids, cols):
    cols = cols + c * 0
    s = jax.lax.sort((ids,) + tuple(cols[j] for j in range(NG)),
                     dimension=0, is_stable=False, num_keys=1)
    acc = s[0][0].astype(jnp.float32) * 1e-9
    for o in s[1:]:
        acc = acc + o[0] * 1e-9
    return acc


def sort6_packed(c, ids, cols):
    cols = cols + c * 0
    packed = [jax.lax.bitcast_convert_type(
        jnp.stack([cols[2 * j], cols[2 * j + 1]], axis=-1), jnp.int64)
        for j in range(NG // 2)]
    s = jax.lax.sort((ids,) + tuple(packed), dimension=0,
                     is_stable=False, num_keys=1)
    acc = s[0][0].astype(jnp.float32) * 1e-9
    for o in s[1:]:
        u = jax.lax.bitcast_convert_type(o[:1], jnp.float32)
        acc = acc + jnp.sum(u) * 1e-9
    return acc


timed("11-op f32 sort (5.3M)", sort11, (ids, cols))
timed("6-op int64-packed sort (5.3M)", sort6_packed, (ids, cols))

# (a) binning-sized 2-op sorts
for n in (14_500_000, 18_100_000):
    k2 = jax.block_until_ready(
        jax.random.randint(jax.random.PRNGKey(3), (n,), 0, 2**30, jnp.int32))
    v2 = jax.block_until_ready(
        jax.random.randint(jax.random.PRNGKey(4), (n,), 0, 2**20, jnp.int32))

    def s2(c, k2, v2):
        ks, vs = jax.lax.sort((k2 + c.astype(jnp.int32) * 0, v2),
                              dimension=0, is_stable=False, num_keys=1)
        return (ks[0] + vs[0]).astype(jnp.float32) * 1e-9

    timed(f"2-op sort ({n/1e6:.1f}M)", s2, (k2, v2))
