"""HBM footprint audit of the render pipeline (production-deployment sizing).

Compiles the fwd and fwd+bwd programs at the headline config (1080p, 1M
Gaussians, autotuned budgets) and reports XLA's own memory analysis —
argument/output/temp/peak bytes — plus an analytic model of the P-sized
buffers so the two can be cross-checked. On the TPU this is the real HBM
budget; on CPU the buffer shapes (and therefore bytes) are identical.

Run:  timeout 7200 python benchmarks/memory_audit.py [--small]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import log  # noqa: E402 (jax cache + repo path config)


def _mem(compiled):
    m = compiled.memory_analysis()
    if m is None:
        return {"unavailable": True}
    fields = ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes",
              "peak_memory_in_bytes")
    out = {}
    for f in fields:
        v = getattr(m, f, None)
        if v is not None:
            out[f.replace("_in_bytes", "_mb")] = round(v / 1e6, 1)
    return out


def main(n_gauss=1_000_000, width=1920, height=1080):
    from bench import make_bench_scene_device
    from sage3d_tpu.renderer.camera import make_camera
    from sage3d_tpu.renderer.render import autotune_all, render

    scene = make_bench_scene_device(n_gauss)
    camera = make_camera(position=[0.0, -6.0, 1.5],
                         forward=[0.0, 1.0, -0.05],
                         width=width, height=height, focal_mm=14.0)
    budgets = autotune_all(scene, camera, pair_margin=1.05)
    log(f"budgets: {budgets}")
    kw = dict(pair_capacity=budgets["pair_capacity"],
              tile_capacity=budgets["tile_capacity"],
              k_small=budgets["k_small"], m_big=budgets["m_big"],
              k_big=budgets["k_big"],
              m_mid=budgets.get("m_mid", 0), k_mid=budgets.get("k_mid", 0))

    def fwd(s):
        out = render(s, camera, backend="pallas", **kw)
        return out["rgb"], out["depth_acc"], out["overflow"]

    def fwdbwd(s):
        def loss(op):
            out = render(s._replace(opacity_logits=op), camera,
                         backend="pallas", **kw)
            return jnp.sum(out["rgb"] ** 2) * 1e-9
        return jax.grad(loss)(s.opacity_logits)

    fwd_c = jax.jit(fwd).lower(scene).compile()
    bwd_c = jax.jit(fwdbwd).lower(scene).compile()

    # Analytic model of the dominant static buffers (all P = pair_capacity):
    p = budgets["pair_capacity"]
    n = n_gauss
    model = {
        "pair_keys_sort_mb": round(p * 2 * 4 / 1e6, 1),       # key + gid
        "feature_blocks_mb": round(p * 16 * 4 / 1e6, 1),      # (CB,16,128) fwd
        "grad_slots_mb": round(p * 16 * 4 / 1e6, 1),          # bwd dump buffer
        "grad_sort_f32_mb": round(p * 11 * 4 / 1e6, 1),       # id + 10 payload
        # scaled-f16 DEFAULT and bf16 opt-in sort the same byte count
        "grad_sort_f16_default_mb": round(p * (4 + 10 * 2) / 1e6, 1),
        "grad_sort_bf16_mb": round(p * (4 + 10 * 2) / 1e6, 1),
        "attrs_table_mb": round(n * 16 * 4 / 1e6, 1),
        "scene_mb": round(n * (3 + 3 + 4 + 1 + 3) * 4 / 1e6, 1),
    }

    print(json.dumps({
        "metric": "memory_audit",
        "config": {"n_gauss": n_gauss, "width": width, "height": height,
                   "pair_capacity": p},
        "xla_fwd": _mem(fwd_c),
        "xla_fwd_bwd": _mem(bwd_c),
        "analytic_model_mb": model,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    if "--small" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        main(n_gauss=20_000, width=256, height=192)
    else:
        main()
