"""Pin the vmap-batch collapse: which BATCHED primitive is the pathology?

Round-4 phase 2 measured vmapped 8-camera rendering at ~half the lax.map
rate (7.9 vs 15.4 Mpix/s) and full-scene batch-8 rollouts at 0.4x a single
env. The render pipeline's dominant P-sized primitives are sorts and the
feature row-gather; under vmap they become batched (B, P) ops. This probe
times each, on device, with chained iterations and FULL consumers (the
repo's own cost-model rule: a sliced consumer lets XLA delete sort
payloads — the first version of this probe made that mistake and measured
every 11-op sort as a 2-op sort):

  1. lax.sort (P,) int32 2-op            (the binning sort shape)
  2. lax.sort (8, P) 2-op batched        (vmapped binning sort)
  3. lax.map over 8x independent (P,) sorts in ONE program
  4. 11-operand gradient-sort shape, single and batched
  5. row gather (P,) from a shared (N, 16) table, single / batched(8,P)
     indices / lax.map — the render_batch shape (scene shared, indices
     per camera)

Run:  timeout 7200 python benchmarks/vmap_sort_probe.py
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
N = 1_000_000
NFEAT = 16


def chain(fn, x, iters=4):
    @jax.jit
    def loop(x, c):
        def body(_, c):
            outs = fn(x + (c * 0).astype(x.dtype))
            if not isinstance(outs, (tuple, list)):
                outs = (outs,)
            # full consumer: touch EVERY output operand across its length
            # (strided reads defeat XLA's sliced-sort simplification while
            # costing ~nothing themselves)
            acc = c * 0
            for o in outs:
                acc = acc + jnp.sum(
                    o[..., ::4096].astype(jnp.float32)) * 1e-9
            return c + acc
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(jax.device_get(loop(x, jnp.float32(0.0))))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(jax.device_get(loop(x, jnp.float32(0.0))))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    k1 = jax.random.randint(jax.random.PRNGKey(0), (P,), 0, 1 << 30, jnp.int32)
    kb = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0, 1 << 30,
                            jnp.int32)
    v1 = jnp.arange(P, dtype=jnp.int32)

    def sort1(k):
        return jax.lax.sort((k, v1), dimension=0, is_stable=False,
                            num_keys=1)

    def sortb(k):
        return jax.lax.sort(
            (k, jnp.broadcast_to(v1[None], k.shape)), dimension=1,
            is_stable=False, num_keys=1)

    def sortmap(k):
        return jax.lax.map(lambda kk: sort1(kk)[1], k)

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
                            is_stable=False, num_keys=1)

    def gsortb(k):
        pays = tuple(jnp.broadcast_to(p[None], k.shape) for p in pay1)
        return jax.lax.sort((k,) + pays, dimension=1, is_stable=False,
                            num_keys=1)

    r["single_11op_ms"] = round(chain(gsort1, k1) * 1e3, 1)
    log(f"single (P,) 11-op sort: {r['single_11op_ms']} ms")
    r["batched8_11op_ms"] = round(chain(gsortb, kb) * 1e3, 1)
    log(f"batched (8,P) 11-op sort: {r['batched8_11op_ms']} ms")

    # row gather from a SHARED table (render_batch: one scene, B cameras)
    table = jax.random.normal(jax.random.PRNGKey(20), (N, NFEAT), jnp.float32)
    gidx1 = jax.random.randint(jax.random.PRNGKey(21), (P,), 0, N, jnp.int32)
    gidxb = jax.random.randint(jax.random.PRNGKey(22), (B, P), 0, N,
                               jnp.int32)

    def gather1(idx):
        return table[idx]

    def gatherb(idx):
        return jax.vmap(lambda i: table[i])(idx)

    def gathermap(idx):
        return jax.lax.map(lambda i: table[i], idx)

    r["single_gather_ms"] = round(chain(gather1, gidx1) * 1e3, 1)
    log(f"single (P,16) row gather: {r['single_gather_ms']} ms")
    r["batched8_gather_ms"] = round(chain(gatherb, gidxb) * 1e3, 1)
    log(f"vmapped (8,P,16) row gather: {r['batched8_gather_ms']} ms")
    r["map8_gather_ms"] = round(chain(gathermap, gidxb) * 1e3, 1)
    log(f"lax.map 8x (P,16) row gather: {r['map8_gather_ms']} ms")

    for key, single in (("batched8_2op_ms", "single_2op_ms"),
                        ("batched8_11op_ms", "single_11op_ms"),
                        ("batched8_gather_ms", "single_gather_ms")):
        r[key.replace("_ms", "_vs_8x_single")] = round(
            r[key] / (8 * r[single]), 2)
    print(json.dumps({"metric": "vmap_primitive_probe", **r,
                      "P": P, "B": B, "N": N}))


if __name__ == "__main__":
    main()
