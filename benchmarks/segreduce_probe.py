"""On-device validation + timing of the Pallas segment reduction (round 3 #1).

Stages (one long-running script — fresh compiles through the tunnel take
minutes each; flushed prints per stage):
  (a) standalone segment_reduce_sorted at the 1080p/1M workload size
      (P=5.3M sorted ids over N=1M, 10 payload channels): correctness vs the
      round-2 cumsum+boundary glue computed on device, timing for both.
  (b) full 1080p/1M fwd+bwd step through the integrated VJP (bench.py
      methodology) — the headline number with the new backward glue.

Run:  timeout 7200 python benchmarks/segreduce_probe.py > /tmp/segreduce_probe.log 2>&1
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import log, timed  # noqa: E402 (jax cache + repo path config)


def old_glue(gid_s, cols_sorted, n_gauss):
    """Round-2 cumsum + boundary-scatter segment sum (for comparison)."""
    p_grad = gid_s.shape[0]
    ct = jnp.stack(cols_sorted, axis=1)
    csum = jnp.cumsum(ct, axis=0)
    change = gid_s[1:] != gid_s[:-1]
    is_last = jnp.concatenate([change, jnp.array([True])])
    ar = jnp.arange(p_grad, dtype=jnp.int32)
    idx = jnp.where(is_last, gid_s, n_gauss + ar)
    hi = jnp.zeros((n_gauss + p_grad,), jnp.int32).at[idx].set(
        ar + 1, unique_indices=True)[:n_gauss]
    hi = jax.lax.cummax(hi)
    zero_row = jnp.zeros((1, len(cols_sorted)), jnp.float32)
    csum_ext = jnp.concatenate([zero_row, csum], axis=0)
    ghi = csum_ext[hi]
    dg = ghi - jnp.concatenate([zero_row, ghi[:-1]], axis=0)
    return dg


def main():
    import numpy as np
    from sage3d_tpu.ops.segreduce import segment_reduce_sorted

    N = 1_000_000
    P = 5_308_416  # ~1080p/1M c_cap * 128

    # --- (a) standalone, generated on device -------------------------------
    kid, kval = jax.random.split(jax.random.PRNGKey(0))

    @jax.jit
    def make_inputs():
        ids = jnp.sort(jax.random.randint(kid, (P,), 0, N, jnp.int32))
        cols = jax.random.normal(kval, (10, P), jnp.float32)
        # integer-valued payloads: every segment sum is EXACT in f32 whatever
        # the accumulation order, so new-vs-old must match bit-for-bit — this
        # isolates routing correctness from the old path's cumsum noise (a
        # 5.3M-row f32 cumsum carries ~1e-2 absolute error; per-segment
        # matmul accumulation does not).
        icols = jnp.round(cols * 4.0)
        return ids, cols, icols

    ids, cols, icols = jax.block_until_ready(make_inputs())
    log("inputs ready")

    @jax.jit
    def diff_check(ids, cols):
        a = segment_reduce_sorted(ids, tuple(cols[j] for j in range(10)), N)
        b = old_glue(ids, tuple(cols[j] for j in range(10)), N)
        return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(a)), jnp.sum(jnp.abs(a))

    d, m, s = jax.device_get(diff_check(ids, icols))
    log(f"(a) EXACT-payload routing check: max|new-old|={float(d):.3e} "
        f"max|new|={float(m):.3e} sum|new|={float(s):.3e}")
    assert float(d) == 0.0, "segment reduce routing mismatch"
    d2, m2, _ = jax.device_get(diff_check(ids, cols))
    log(f"(a) normal-payload noise vs old glue: max|new-old|={float(d2):.3e} "
        f"max|new|={float(m2):.3e} (old-path cumsum noise, informational)")

    def run_new(c, ids, cols):
        out = segment_reduce_sorted(
            ids, tuple(cols[j] + c * 0 for j in range(10)), N)
        return jnp.sum(out[::4097]) * 1e-9

    def run_old(c, ids, cols):
        out = old_glue(ids, tuple(cols[j] + c * 0 for j in range(10)), N)
        return jnp.sum(out[::4097]) * 1e-9

    dt, first = timed(run_new, (ids, cols))
    log(f"(a) NEW pallas segreduce (P=5.3M): {dt*1e3:.1f} ms "
        f"(first call {first:.0f}s)")
    dt, first = timed(run_old, (ids, cols))
    log(f"(a) OLD cumsum+boundary (P=5.3M): {dt*1e3:.1f} ms "
        f"(first call {first:.0f}s)")

    # --- (b) full 1080p/1M fwd+bwd through the integrated VJP --------------
    from bench import bench_backend, make_bench_scene_device
    from sage3d_tpu.renderer.camera import make_camera
    from sage3d_tpu.renderer.render import autotune_all

    scene = make_bench_scene_device()
    camera = make_camera(position=[0.0, -6.0, 1.5], forward=[0.0, 1.0, -0.05],
                         width=1920, height=1080, focal_mm=14.0)
    budgets = autotune_all(scene, camera, pair_margin=1.05)
    log(f"(b) budgets: {budgets}")
    mpix, dt, compile_s = bench_backend(scene, camera, "pallas", budgets)
    log(f"(b) fwd+bwd 1080p/1M pallas: {dt*1e3:.1f} ms ({mpix:.2f} Mpix/s, "
        f"compile {compile_s:.0f}s)")

    # --- (c) bf16 payload sort (opt-in fast mode): timing + gradient drift --
    mpix16, dt16, compile16 = bench_backend(scene, camera, "pallas", budgets,
                                            grad_sort_bf16=True)
    log(f"(c) fwd+bwd bf16-sort: {dt16*1e3:.1f} ms ({mpix16:.2f} Mpix/s, "
        f"compile {compile16:.0f}s)")

    from sage3d_tpu.renderer.render import render as _render

    @jax.jit
    def grad_drift(s):
        def loss(op, bf16):
            out = _render(s._replace(opacity_logits=op), camera,
                          backend="pallas",
                          pair_capacity=budgets["pair_capacity"],
                          tile_capacity=budgets["tile_capacity"],
                          k_small=budgets["k_small"], m_big=budgets["m_big"],
                          k_big=budgets["k_big"],
                          m_mid=budgets.get("m_mid", 0),
                          k_mid=budgets.get("k_mid", 0),
                          grad_sort_bf16=bf16)
            return jnp.sum(out["rgb"] ** 2) * 1e-9
        g32 = jax.grad(lambda op: loss(op, False))(s.opacity_logits)
        g16 = jax.grad(lambda op: loss(op, True))(s.opacity_logits)
        scale = jnp.max(jnp.abs(g32)) + 1e-20
        return jnp.max(jnp.abs(g32 - g16)) / scale

    drift = float(jax.device_get(grad_drift(scene)))
    log(f"(c) bf16-sort max grad drift (rel to max|g32|): {drift:.3e}")


if __name__ == "__main__":
    main()
