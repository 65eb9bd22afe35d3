"""Headline benchmark: fwd+bwd rendering throughput at 1080p, 1M Gaussians.

BASELINE.json config #2-style measurement on real TPU hardware: a full
InteriorGS-scale scene (1M Gaussians), one 1920x1080 camera, forward render
(RGB+depth+semantic) plus analytic backward to all Gaussian parameters via the
Pallas compositor. Prints ONE JSON line:

  {"metric": "mpix_per_s_fwd_bwd_1080p_1m_gauss", "value": N,
   "unit": "Mpix/s", "vs_baseline": R}

The reference publishes no machine-performance numbers (BASELINE.md), so
vs_baseline reports the speedup of the Pallas kernel path over this repo's own
naive tiled-XLA path on the identical workload — the honest internal baseline.

Measurement notes (tunneled-TPU discipline): the scene is generated ON DEVICE
(host->device uploads through the tunnel are slow and would pollute timing);
iterations are chained inside one jitted lax.fori_loop whose scalar result is
fetched to host, so asynchronous dispatch cannot fake completion.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

os.makedirs(os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"),
            exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 1_000_000
PAIR_CAPACITY = 1 << 23
TILE_CAPACITY = 4096
K_SMALL = 32          # per-Gaussian candidate-tile budget (overflow-free here)


def make_bench_scene_device(n: int = N_GAUSS, seed: int = 0):
    """InteriorGS-scale synthetic room, generated on device."""
    from sage3d_tpu.renderer.scene import GaussianScene
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    means = jax.random.uniform(ks[0], (n, 3), jnp.float32,
                               jnp.array([-5.0, -4.0, 0.0], jnp.float32),
                               jnp.array([5.0, 4.0, 3.0], jnp.float32))
    scales = jax.random.uniform(ks[1], (n, 3), jnp.float32, 0.01, 0.05)
    q = jax.random.normal(ks[2], (n, 4), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    op = jax.random.uniform(ks[3], (n,), jnp.float32, 0.2, 0.9)
    col = jax.random.uniform(ks[4], (n, 3), jnp.float32)
    sh = jnp.zeros((n, 1, 3), jnp.float32).at[:, 0, :].set(
        (col - 0.5) / 0.28209479177387814)
    sem = jax.random.randint(ks[5], (n,), 0, 200, jnp.int32)
    return GaussianScene(means=means, log_scales=jnp.log(scales), quats=q,
                         opacity_logits=jnp.log(op / (1 - op)), sh=sh,
                         semantic_ids=sem)


def bench_backend(scene, camera, backend: str, iters: int = 6):
    from sage3d_tpu.renderer.render import render

    # NOTE: the scene must be an ARGUMENT of the jitted program — closing over
    # it would bake 250MB of constants into the HLO (enormous compiles, and
    # the tunneled compile service rejects oversized modules).
    def loss(opacity_logits, s, c):
        s = s._replace(opacity_logits=opacity_logits + c * 0)
        out = render(s, camera, backend=backend, pair_capacity=PAIR_CAPACITY,
                     tile_capacity=TILE_CAPACITY, k_small=K_SMALL)
        return (jnp.sum(out["rgb"] ** 2) * 1e-9
                + jnp.sum(out["depth_acc"]) * 1e-12
                + jnp.sum(out["alpha"]) * 1e-12)

    grad = jax.grad(loss, argnums=0)

    @jax.jit
    def loop(s, c):
        def body(i, c):
            return c + grad(s.opacity_logits, s, c)[0]
        return jax.lax.fori_loop(0, iters, body, c)

    t0 = time.time()
    float(jax.device_get(loop(scene, jnp.float32(0.0))))   # compile + run
    compile_s = time.time() - t0
    t0 = time.time()
    float(jax.device_get(loop(scene, jnp.float32(0.0))))
    per_iter = (time.time() - t0) / iters
    return WIDTH * HEIGHT / per_iter / 1e6, per_iter, compile_s


def main():
    from sage3d_tpu.renderer.camera import make_camera
    from sage3d_tpu.renderer.render import render

    scene = make_bench_scene_device()
    camera = make_camera(position=[0.0, -6.0, 1.5], forward=[0.0, 1.0, -0.05],
                         width=WIDTH, height=HEIGHT, focal_mm=14.0)

    pallas_mpix, pallas_dt, _ = bench_backend(scene, camera, "pallas")
    xla_mpix, xla_dt, _ = bench_backend(scene, camera, "xla")

    overflow = int(jax.device_get(render(
        scene, camera, backend="pallas", pair_capacity=PAIR_CAPACITY,
        tile_capacity=TILE_CAPACITY, k_small=K_SMALL)["overflow"]))

    result = {
        "metric": "mpix_per_s_fwd_bwd_1080p_1m_gauss",
        "value": round(pallas_mpix, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(pallas_mpix / max(xla_mpix, 1e-9), 3),
        "detail": {
            "pallas_step_s": round(pallas_dt, 4),
            "xla_step_s": round(xla_dt, 4),
            "xla_mpix_per_s": round(xla_mpix, 2),
            "overflow_pairs": overflow,
            "n_gaussians": N_GAUSS,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
