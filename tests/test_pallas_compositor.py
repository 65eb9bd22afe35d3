"""Pallas compositor correctness: forward + analytic backward vs the oracle.

Runs the kernels in interpreter mode on CPU (same code path, same block
structure); real-TPU execution is exercised by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage3d_tpu.renderer.camera import make_camera
from sage3d_tpu.renderer.render import render
from sage3d_tpu.renderer.scene import synthetic_room

W, H = 64, 48


@pytest.fixture(scope="module")
def scene():
    return synthetic_room(num_gaussians=400, seed=5)


@pytest.fixture(scope="module")
def cam():
    return make_camera(position=[0.0, -4.0, 1.2], forward=[0.0, 1.0, -0.1],
                       width=W, height=H)


def test_pallas_forward_matches_oracle(scene, cam):
    ref = render(scene, cam, backend="oracle")
    out = render(scene, cam, backend="pallas", pair_capacity=1 << 14)
    assert int(out["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]), np.asarray(ref["alpha"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth_acc"]),
                               np.asarray(ref["depth_acc"]), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["trans"]), np.asarray(ref["trans"]),
                               rtol=1e-4, atol=1e-4)
    sem_match = (np.asarray(out["semantic"]) == np.asarray(ref["semantic"])).mean()
    assert sem_match > 0.995


def test_pallas_backward_matches_oracle(scene, cam):
    target = jnp.asarray(np.random.default_rng(1).uniform(size=(H, W, 3)),
                         jnp.float32)
    params = {"means": scene.means, "log_scales": scene.log_scales,
              "quats": scene.quats, "opacity_logits": scene.opacity_logits,
              "sh": scene.sh}

    def loss(p, backend):
        s = scene._replace(**p)
        # f32 grad sort (the round-5 default): this test isolates the KERNEL
        # math against the oracle at fp32 accumulation-noise tolerance; the
        # optional scaled-f16 mode's payload quantization is bounded
        # separately below (GRAD_SORT_DEFAULT, composite_pallas.py).
        out = render(s, cam, backend=backend, pair_capacity=1 << 14,
                     grad_sort="f32")
        # exercise rgb + depth + alpha + trans cotangents
        return (jnp.mean((out["rgb"] - target) ** 2)
                + 0.05 * jnp.mean(out["depth_acc"])
                + 0.02 * jnp.mean(out["alpha"])
                + 0.01 * jnp.mean(out["trans"]))

    g_ref = jax.grad(lambda p: loss(p, "oracle"))(params)
    g_pal = jax.grad(lambda p: loss(p, "pallas"))(params)

    for name in ("means", "log_scales", "quats", "opacity_logits", "sh"):
        a = np.asarray(g_ref[name])
        b = np.asarray(g_pal[name])
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=3e-4,
                                   err_msg=f"grad mismatch: {name}")


def test_default_grad_sort_is_exact_f32(scene, cam):
    """The DEFAULT gradient path is the EXACT f32 payload sort, restored in
    round 5: packing the gradient buffer by the forward's measured k_end cut
    the sorted rows ~9.7x, making the exact sort as fast as the scaled-f16
    mode (on-device 18.53 vs 18.38 Mpix/s) — so the default pays nothing for
    exactness. f16 (trainer-certified in round 4) and bf16 (FAILED the
    round-4 convergence gates) remain opt-in.
    Guard the default: default grads == explicit grad_sort='f32' grads
    bitwise, and differ from both f16 and bf16 (the mode is live)."""
    def gr(**kw):
        def loss(op):
            s = scene._replace(opacity_logits=op)
            out = render(s, cam, backend="pallas", pair_capacity=1 << 14,
                         **kw)
            return jnp.mean(out["rgb"] ** 2)
        return np.asarray(jax.grad(loss)(scene.opacity_logits))

    g_default = gr()
    g_f16 = gr(grad_sort="f16")
    g_f32 = gr(grad_sort="f32")
    g_bf16 = gr(grad_sort="bf16")
    np.testing.assert_array_equal(g_default, g_f32)
    assert np.abs(g_default - g_f16).max() > 0.0
    assert np.abs(g_default - g_bf16).max() > 0.0


def test_pallas_backward_f16_sort_close(scene, cam):
    """grad_sort='f16': per-channel absmax-scaled float16 payloads — the
    same sort-byte saving as bf16 with 8x finer rounding (2^-11 of the
    channel max). Gradients must track the f32 path ~an order of magnitude
    tighter than bf16 does, and the scaling must make the path invariant
    to the user's loss scale (raw f16 overflows at 65504)."""
    target = jnp.asarray(np.random.default_rng(4).uniform(size=(H, W, 3)),
                         jnp.float32)
    params = {"means": scene.means, "opacity_logits": scene.opacity_logits}

    def loss(p, mode, loss_scale):
        s = scene._replace(**p)
        out = render(s, cam, backend="pallas", pair_capacity=1 << 14,
                     grad_sort=mode)
        return jnp.mean((out["rgb"] - target) ** 2) * loss_scale

    g32 = jax.grad(lambda p: loss(p, "f32", 1.0))(params)
    g16 = jax.grad(lambda p: loss(p, "f16", 1.0))(params)
    for name in params:
        a, b = np.asarray(g32[name]), np.asarray(g16[name])
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3,
                                   err_msg=f"f16-sort grad drift: {name}")

    # loss-scale invariance: 1e8x cotangents would overflow raw f16 rows;
    # the absmax scaling must absorb it (gradients finite, = 1e8 * base)
    ghuge = jax.grad(lambda p: loss(p, "f16", 1e8))(params)
    for name in params:
        b = np.asarray(ghuge[name])
        assert np.isfinite(b).all(), f"f16 overflow leaked: {name}"
        a = np.asarray(g16[name]) * 1e8
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3,
                                   err_msg=f"f16 scale invariance: {name}")


def test_grad_capacity_compaction_exact_and_overflow(scene, cam):
    """The backward's gradient slot buffer is packed by the forward's
    per-tile early-termination chunk counts (k_end). A grad_capacity that
    covers the measured chunk total must reproduce the uncompacted gradients
    BIT-EXACTLY (the bwd kernel replays the identical transmittance
    recurrence, so its stop chunk equals k_end); an undersized capacity must
    report overflow instead of failing silently."""
    def run(grad_capacity):
        def loss(op):
            s = scene._replace(opacity_logits=op)
            out = render(s, cam, backend="pallas", pair_capacity=1 << 14,
                         grad_sort="f32", grad_capacity=grad_capacity)
            return jnp.mean(out["rgb"] ** 2), out
        (l, out), g = jax.value_and_grad(loss, has_aux=True)(
            scene.opacity_logits)
        return np.asarray(g), int(out["overflow"]), int(out["grad_chunks"])

    g_full, ovf_full, chunks = run(0)          # safe upper bound
    assert ovf_full == 0 and chunks > 0
    # tight capacity = measured chunks exactly -> identical gradients
    g_tight, ovf_tight, _ = run(chunks)
    assert ovf_tight == 0
    np.testing.assert_array_equal(g_tight, g_full)
    # undersized capacity -> loud overflow (dropped chunks counted in pairs)
    g_small, ovf_small, _ = run(max(chunks // 2, 1))
    assert ovf_small > 0


def test_autotune_grad_margin_budgets(scene, cam):
    """autotune_all(grad_margin=...) measures the forward's chunk total and
    sizes grad_capacity above it; the budgets render overflow-free."""
    from sage3d_tpu.renderer.render import autotune_all, budget_kwargs

    budgets = autotune_all(scene, cam, grad_margin=1.25)
    assert budgets["grad_capacity"] >= budgets["grad_chunks_measured"]

    def loss(op):
        s = scene._replace(opacity_logits=op)
        out = render(s, cam, backend="pallas", **budget_kwargs(budgets))
        return jnp.mean(out["rgb"] ** 2), out["overflow"]

    (_, ovf), g = jax.value_and_grad(loss, has_aux=True)(scene.opacity_logits)
    assert int(ovf) == 0
    assert np.isfinite(np.asarray(g)).all()


def test_pallas_backward_bf16_sort_close(scene, cam):
    """grad_sort_bf16 halves the dominant backward sort payload; gradients
    must stay close to the f32-path values (segment accumulation is f32
    either way, only per-row gradient payloads quantize to bf16)."""
    target = jnp.asarray(np.random.default_rng(2).uniform(size=(H, W, 3)),
                         jnp.float32)
    params = {"means": scene.means, "log_scales": scene.log_scales,
              "quats": scene.quats, "opacity_logits": scene.opacity_logits,
              "sh": scene.sh}

    def loss(p, mode):
        s = scene._replace(**p)
        out = render(s, cam, backend="pallas", pair_capacity=1 << 14,
                     grad_sort=mode)
        return jnp.mean((out["rgb"] - target) ** 2)

    g32 = jax.grad(lambda p: loss(p, "f32"))(params)
    g16 = jax.grad(lambda p: loss(p, "bf16"))(params)

    # the legacy bool alias must still select bf16
    def loss_alias(p):
        s = scene._replace(**p)
        out = render(s, cam, backend="pallas", pair_capacity=1 << 14,
                     grad_sort_bf16=True)
        return jnp.mean((out["rgb"] - target) ** 2)

    g_alias = jax.grad(loss_alias)(params)
    np.testing.assert_array_equal(np.asarray(g_alias["means"]),
                                  np.asarray(g16["means"]))
    for name in ("means", "log_scales", "quats", "opacity_logits", "sh"):
        a = np.asarray(g32[name])
        b = np.asarray(g16[name])
        scale = np.abs(a).max() + 1e-8
        # bf16 carries ~8 mantissa bits -> per-row relative error ~4e-3;
        # per-Gaussian sums keep errors the same order (independent signs).
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-2,
                                   err_msg=f"bf16-sort grad drift: {name}")
