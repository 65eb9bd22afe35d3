"""Does index locality change XLA row-gather cost on this TPU?

The forward feature gather (attrs[pair_gauss]: 5.3M rows of 16 f32) is the
single least HBM-efficient stage of the headline step (~25 ms ~= 14 GB/s
effective vs ~800 GB/s peak) and the cost model calls it latency-bound. If
DRAM row-buffer locality matters, gathering with locally-coherent indices
(what a Morton-ordered scene would produce: pairs in one tile hit nearby
rows) should beat uniform-random indices. This probe measures the same
(P,16) gather under three index distributions:

  random    — uniform over N (today's un-ordered scene, worst case)
  clustered — random cluster centers + small jitter (Morton-ordered scene:
              a tile's pairs land within a few hundred rows of each other)
  sorted    — monotone indices (best case / upper bound)

Run:  timeout 7200 python benchmarks/gather_probe.py > /tmp/gather_probe.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import log  # noqa: E402 (jax cache + repo path config)

import jax
import jax.numpy as jnp

N = 1_000_000
P = 5_300_224          # headline-scale pair count, multiple of 256
NFEAT = 16


def timed(name, idx, attrs, iters=8):
    @jax.jit
    def loop(attrs, idx, c):
        def body(i, c):
            rows = attrs[(idx + i) % N]          # new indices each iter
            return c + rows[0, 0] + rows[-1, -1]
        return jax.lax.fori_loop(0, iters, body, c)

    t0 = time.time()
    float(jax.device_get(loop(attrs, idx, jnp.float32(0.0))))
    first = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(jax.device_get(loop(attrs, idx, jnp.float32(0.0))))
        best = min(best, (time.time() - t0) / iters)
    log(f"{name}: {best * 1e3:.2f} ms/gather "
        f"({P * NFEAT * 4 / best / 1e9:.1f} GB/s effective, first {first:.1f}s)")
    return best


def main():
    key = jax.random.PRNGKey(0)
    attrs = jax.random.normal(key, (N, NFEAT), jnp.float32)
    k1, k2, k3 = jax.random.split(key, 3)

    idx_rand = jax.random.randint(k1, (P,), 0, N, jnp.int32)
    # clustered: 16k cluster centers, 128-neighborhood jitter (a 16x16 tile's
    # pairs in a Morton-ordered 1M-Gaussian room span O(100) consecutive rows)
    centers = jax.random.randint(k2, (P // 256,), 0, N, jnp.int32)
    jitter = jax.random.randint(k3, (P,), 0, 256, jnp.int32)
    idx_clus = (jnp.repeat(centers, 256)[:P] + jitter) % N
    idx_sort = jnp.sort(idx_rand)

    attrs, idx_rand, idx_clus, idx_sort = jax.block_until_ready(
        (attrs, idx_rand, idx_clus, idx_sort))

    t_r = timed("random   ", idx_rand, attrs)
    t_c = timed("clustered", idx_clus, attrs)
    t_s = timed("sorted   ", idx_sort, attrs)
    log(f"locality speedup: clustered {t_r / t_c:.2f}x  sorted {t_r / t_s:.2f}x")


if __name__ == "__main__":
    main()
