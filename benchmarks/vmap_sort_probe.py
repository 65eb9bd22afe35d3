"""Pin the vmap-batch collapse: is XLA's BATCHED sort the pathology?

Round-4 phase 2 measured vmapped 8-camera rendering at ~half the lax.map
rate (7.9 vs 15.4 Mpix/s) and full-scene batch-8 rollouts at 0.4x a single
env. The render pipeline's biggest ops are big sorts; under vmap they become
batched (B, P) sorts. This probe times, on device, with chained iterations:

  1. lax.sort of (P,) int32 2-op           (the binning sort shape)
  2. lax.sort of (8, P) int32 2-op, batched along dim 1
  3. lax.map over 8 independent (P,) sorts in ONE program
  4. the same three for the 11-operand gradient sort shape

Run:  python benchmarks/vmap_sort_probe.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import log  # noqa: E402

P = 4_194_304   # ~the 1080p/1M pair count
B = 8


def chain(fn, x, iters=4):
    @jax.jit
    def loop(x, c):
        def body(_, c):
            out = fn(x + (c * 0).astype(x.dtype))
            return jnp.sum(out[..., :128].astype(jnp.float32)) * 1e-9 + c * 0
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(jax.device_get(loop(x, jnp.float32(0.0))))
    t0 = time.time()
    float(jax.device_get(loop(x, jnp.float32(0.0))))
    return (time.time() - t0) / iters


def main():
    k1 = jax.random.randint(jax.random.PRNGKey(0), (P,), 0, 1 << 30, jnp.int32)
    kb = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0, 1 << 30,
                            jnp.int32)
    v1 = jnp.arange(P, dtype=jnp.int32)
    vb = jnp.broadcast_to(v1[None], (B, P))

    def sort1(k):
        return jax.lax.sort((k, v1), dimension=0, is_stable=False,
                            num_keys=1)[1]

    def sortb(k):
        return jax.lax.sort(
            (k, jnp.broadcast_to(v1[None], k.shape)), dimension=1,
            is_stable=False, num_keys=1)[1]

    def sortmap(k):
        return jax.lax.map(sort1, k)

    r = {}
    r["single_2op_ms"] = round(chain(sort1, k1) * 1e3, 1)
    log(f"single (P,) 2-op sort: {r['single_2op_ms']} ms")
    r["batched8_2op_ms"] = round(chain(sortb, kb) * 1e3, 1)
    log(f"batched (8,P) 2-op sort: {r['batched8_2op_ms']} ms")
    r["map8_2op_ms"] = round(chain(sortmap, kb) * 1e3, 1)
    log(f"lax.map 8x (P,) 2-op sort: {r['map8_2op_ms']} ms")

    # 11-operand gradient-sort shape (payload cost dominant)
    pay1 = [jax.random.normal(jax.random.PRNGKey(2 + j), (P,), jnp.float32)
            for j in range(10)]

    def gsort1(k):
        return jax.lax.sort((k,) + tuple(pay1), dimension=0,
                            is_stable=False, num_keys=1)[1]

    def gsortb(k):
        pays = tuple(jnp.broadcast_to(p[None], k.shape) for p in pay1)
        return jax.lax.sort((k,) + pays, dimension=1, is_stable=False,
                            num_keys=1)[1]

    r["single_11op_ms"] = round(chain(gsort1, k1) * 1e3, 1)
    log(f"single (P,) 11-op sort: {r['single_11op_ms']} ms")
    r["batched8_11op_ms"] = round(chain(gsortb, kb) * 1e3, 1)
    log(f"batched (8,P) 11-op sort: {r['batched8_11op_ms']} ms")

    r["batched8_vs_8x_single_2op"] = round(
        r["batched8_2op_ms"] / (8 * r["single_2op_ms"]), 2)
    r["batched8_vs_8x_single_11op"] = round(
        r["batched8_11op_ms"] / (8 * r["single_11op_ms"]), 2)
    print(json.dumps({"metric": "vmap_sort_probe", **r,
                      "P": P, "B": B}))


if __name__ == "__main__":
    main()
