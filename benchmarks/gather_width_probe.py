"""Is the XLA row-gather row-bound or byte-bound on this TPU?

gather_probe.py established index locality is worthless (random/clustered/
sorted all ~35.9 ms for (5.3M, 16) f32 -> ~7 ns/row). The remaining question
for the headline's 34.5 ms feature gather: does narrowing the ROW change the
cost? If byte-bound, absmax-scaled f16 features would halve the stage; if
row-bound (per-row latency), only emitting FEWER pairs helps and payload
engineering is dead.

Grid: rows in {0.49M (the packed-kend count), 2.2M, 4.43M (pair capacity)}
x widths {16xf32 (today), 8xf32, 16xf16, 16xbf16}.

Run:  timeout 7200 python benchmarks/gather_width_probe.py > /tmp/gwp.log 2>&1
"""

import json
import time

import jax
import jax.numpy as jnp

from _util import log  # noqa: F401  (jax cache + repo path config)

N = 1_000_000


def timed(idx, attrs, iters=8):
    @jax.jit
    def loop(attrs, idx, c):
        def body(i, c):
            rows = attrs[(idx + i) % N]
            return c + rows[0, 0].astype(jnp.float32) \
                + rows[-1, -1].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, c)

    float(jax.device_get(loop(attrs, idx, jnp.float32(0.0))))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(jax.device_get(loop(attrs, idx, jnp.float32(0.0))))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    key = jax.random.PRNGKey(0)
    results = {}
    for p in (495_616, 2_215_936, 4_428_544):
        idx = jax.random.randint(key, (p,), 0, N, jnp.int32)
        for nfeat, dtype in ((16, jnp.float32), (8, jnp.float32),
                             (16, jnp.float16), (16, jnp.bfloat16)):
            attrs = jnp.ones((N, nfeat), dtype)
            s = timed(idx, attrs)
            row_ns = s / p * 1e9
            gbps = p * nfeat * attrs.dtype.itemsize / s / 1e9
            name = f"p{p//1024}k_{nfeat}x{attrs.dtype.name}"
            results[name] = {"ms": round(s * 1e3, 2),
                             "ns_per_row": round(row_ns, 2),
                             "eff_gbps": round(gbps, 1)}
            log(f"{name}: {s*1e3:.2f} ms  {row_ns:.2f} ns/row  {gbps:.1f} GB/s")
    print(json.dumps({"metric": "gather_width_probe", "results": results,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
