"""End-to-end drive of the public render API on the real TPU (verify recipe).

Renders the synthetic room through BOTH backends at 640x480, checks
overflow == 0 and cross-backend agreement of outputs AND gradients (the
gradient exercises the full custom-VJP backward: bwd Pallas kernel +
segment-sum fusion). Exits nonzero on any check failure.

Run:  timeout 7200 python benchmarks/verify_drive.py
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

from sage3d_tpu.renderer.camera import agent_camera
from sage3d_tpu.renderer.render import render
from sage3d_tpu.renderer.scene import synthetic_room


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import numpy as np

    from sage3d_tpu.renderer.render import autotune_all

    scene = synthetic_room(20000, seed=7)
    cam = agent_camera((0.0, -3.5), yaw=1.57, width=640, height=480)
    b = autotune_all(scene, cam)
    log(f"autotuned budgets: {b}")
    from sage3d_tpu.renderer.render import budget_kwargs
    kw = budget_kwargs(b)

    outs = {}
    for backend in ("pallas", "xla"):
        o = jax.jit(lambda s, b=backend: render(s, cam, backend=b, **kw))(
            scene)
        outs[backend] = jax.device_get(o)
        log(f"{backend} fwd: overflow={int(outs[backend]['overflow'])}")
    ok = True
    for backend in ("pallas", "xla"):
        if int(outs[backend]["overflow"]) != 0:
            log(f"FAIL: {backend} overflow != 0")
            ok = False
    for k in ("rgb", "depth_acc", "alpha"):
        d = float(np.abs(np.asarray(outs["pallas"][k])
                         - np.asarray(outs["xla"][k])).max())
        log(f"fwd {k} max|pallas-xla| = {d:.2e}")
        ok = ok and d < 1e-3

    def loss(p, s, backend):
        s = s._replace(**p)
        o = render(s, cam, backend=backend, **kw)
        return jnp.sum(o["rgb"] ** 2) + 0.1 * jnp.sum(o["depth_acc"])

    params = {"opacity_logits": scene.opacity_logits, "means": scene.means}
    grads = {}
    for backend in ("pallas", "xla"):
        g = jax.device_get(jax.jit(jax.grad(loss),
                                   static_argnames=("backend",))(
            params, scene, backend=backend))
        grads[backend] = g
        log(f"{backend} grad done")
    for k in params:
        a = np.asarray(grads["pallas"][k])
        b = np.asarray(grads["xla"][k])
        denom = max(float(np.abs(b).max()), 1e-12)
        rel = float(np.abs(a - b).max()) / denom
        log(f"grad {k} max rel diff = {rel:.2e}")
        ok = ok and rel < 5e-3
    log("VERIFY OK" if ok else "VERIFY FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
