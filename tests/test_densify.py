"""Adaptive density control (parallel/densify.py): invariants + e2e fit.

The reference has no training loop; these tests pin the classic-3DGS control
semantics under the fixed-capacity TPU design: prune parks low-opacity slots,
clone copies small high-gradient Gaussians, split shrinks large ones by 1.6x
on both halves, capacity and shapes never change, and an undersized scene
grows into its capacity while fitting targets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage3d_tpu.parallel.densify import (DEAD_LOGIT, SPLIT_SHRINK,
                                         DensifyConfig, accumulate,
                                         alive_mask, densify_prune,
                                         init_densify_state, reset_opacity)


def make_params(n=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "means": jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        "log_scales": jnp.full((n, 3), np.log(0.02), jnp.float32),
        "quats": jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        "opacity_logits": jnp.full((n,), 1.0, jnp.float32),
        "sh": jnp.asarray(rng.uniform(-1, 1, (n, 1, 3)), jnp.float32),
    }


def test_prune_parks_low_opacity():
    p = make_params(8)
    p["opacity_logits"] = p["opacity_logits"].at[3].set(-12.0)  # alpha ~ 6e-6
    st = accumulate(init_densify_state(8), jnp.zeros((8, 3)))
    out, _, _, _, info = densify_prune(p, st, jax.random.PRNGKey(0))
    assert int(info["n_pruned"]) == 1
    assert float(out["opacity_logits"][3]) == DEAD_LOGIT
    assert float(out["means"][3, 0]) > 1e5
    assert int(info["n_alive"]) == 7


def test_clone_into_free_slots():
    n = 8
    p = make_params(n)
    # slots 5..7 dead; slot 0 has a huge positional gradient -> cloned
    p["opacity_logits"] = p["opacity_logits"].at[5:].set(DEAD_LOGIT)
    st = init_densify_state(n)
    g = jnp.zeros((n, 3)).at[0, 0].set(1.0)
    st = accumulate(st, g)
    out, st2, _, _, info = densify_prune(p, st, jax.random.PRNGKey(0))
    assert int(info["n_new"]) == 1 and int(info["n_clone"]) == 1
    assert int(info["n_alive"]) == 6
    # the clone landed in the first free slot (5) with identical params
    np.testing.assert_allclose(out["means"][5], p["means"][0], rtol=1e-6)
    np.testing.assert_allclose(out["log_scales"][5], p["log_scales"][0])
    assert float(out["opacity_logits"][5]) == float(p["opacity_logits"][0])
    # accumulator reset
    assert float(jnp.sum(st2.grad_accum)) == 0.0


def test_split_shrinks_both_halves():
    n = 8
    p = make_params(n)
    p["log_scales"] = p["log_scales"].at[2].set(jnp.log(0.2))  # large
    p["opacity_logits"] = p["opacity_logits"].at[6:].set(DEAD_LOGIT)
    st = accumulate(init_densify_state(n),
                    jnp.zeros((n, 3)).at[2, 1].set(1.0))
    out, _, _, _, info = densify_prune(p, st, jax.random.PRNGKey(1))
    assert int(info["n_split"]) == 1
    want = np.log(0.2) - np.log(SPLIT_SHRINK)
    np.testing.assert_allclose(out["log_scales"][2], want, rtol=1e-6)
    np.testing.assert_allclose(out["log_scales"][6], want, rtol=1e-6)
    # offspring moved off the parent (sampled from its ellipsoid)
    assert float(jnp.linalg.norm(out["means"][6] - p["means"][2])) > 1e-4


def test_capacity_and_budget_caps():
    n = 16
    p = make_params(n)
    p["opacity_logits"] = p["opacity_logits"].at[8:].set(DEAD_LOGIT)
    st = accumulate(init_densify_state(n), jnp.ones((n, 3)))  # all want growth
    cfg = DensifyConfig(max_new_fraction=2 / n)
    out, _, _, _, info = densify_prune(p, st, jax.random.PRNGKey(0),
                                       cfg)
    assert int(info["n_new"]) == 2          # capped by max_new_fraction
    for k, v in out.items():
        assert v.shape == p[k].shape        # static shapes always


def test_opt_state_rows_zeroed_and_semantic_copied():
    import optax
    n = 8
    p = make_params(n)
    p["opacity_logits"] = p["opacity_logits"].at[5:].set(DEAD_LOGIT)
    opt = optax.adam(1e-3)
    opt_state = opt.init(p)
    opt_state = jax.tree_util.tree_map(
        lambda x: x + 1.0 if hasattr(x, "dtype") and
        jnp.issubdtype(x.dtype, jnp.floating) else x, opt_state)
    sem = jnp.arange(n, dtype=jnp.int32)
    st = accumulate(init_densify_state(n),
                    jnp.zeros((n, 3)).at[1, 0].set(1.0))
    out, _, opt2, sem2, info = densify_prune(
        p, st, jax.random.PRNGKey(0), opt_state=opt_state,
        semantic_ids=sem)
    assert int(info["n_new"]) == 1
    mu = opt2[0].mu["means"]
    assert float(jnp.abs(mu[5]).max()) == 0.0      # overwritten slot zeroed
    assert float(jnp.abs(mu[1]).max()) == 1.0      # clone source untouched
    assert int(sem2[5]) == 1                       # semantic id follows clone


def test_reset_opacity_caps_live_only():
    p = make_params(6)
    p["opacity_logits"] = p["opacity_logits"].at[4:].set(DEAD_LOGIT)
    out = reset_opacity(p, max_opacity=0.01)
    live = np.asarray(jax.nn.sigmoid(out["opacity_logits"][:4]))
    assert (live <= 0.0101).all()
    assert float(out["opacity_logits"][4]) == DEAD_LOGIT


def test_fit_scene_adaptive_grows_and_improves():
    from sage3d_tpu.parallel.trainer import (AdaptiveConfig, TrainerConfig,
                                             fit_scene_adaptive,
                                             make_orbit_targets)
    from sage3d_tpu.renderer.scene import synthetic_room

    gt = synthetic_room(600, seed=3)
    cameras, targets = make_orbit_targets(gt, n_views=2, radius=4.0,
                                          width=64, height=64)
    # undersized init: far fewer live Gaussians than the target scene
    init = synthetic_room(200, seed=9)
    fitted, history = fit_scene_adaptive(
        init, cameras, targets,
        TrainerConfig(steps=60, lr=5e-3, log_every=20,
                      pair_capacity=1 << 16, tile_capacity=512),
        AdaptiveConfig(densify_every=20, grad_threshold=1e-7,
                       max_new_fraction=0.25),
        capacity=400, verbose=False)
    assert fitted.num_gaussians >= 400     # capacity (may be mesh-padded)
    rounds = [h for h in history if "n_alive" in h]
    assert rounds and rounds[-1]["n_alive"] > 200   # grew into capacity
    assert history[-1]["mse"] < history[0]["mse"]   # and still fits better


def test_fit_scene_adaptive_on_tile_mesh():
    """Density control composes with the sharded train step: params stay on
    the (1,2) mesh across densify rounds and the run still improves."""
    from sage3d_tpu.parallel.trainer import (AdaptiveConfig, TrainerConfig,
                                             fit_scene_adaptive,
                                             make_orbit_targets)
    from sage3d_tpu.renderer.scene import synthetic_room

    gt = synthetic_room(300, seed=5)
    cameras, targets = make_orbit_targets(gt, n_views=2, radius=4.0,
                                          width=64, height=64)
    init = synthetic_room(100, seed=6)
    fitted, history = fit_scene_adaptive(
        init, cameras, targets,
        TrainerConfig(steps=30, lr=5e-3, log_every=10, mesh_shape=(1, 2),
                      pair_capacity=1 << 15, tile_capacity=512),
        AdaptiveConfig(densify_every=10, grad_threshold=1e-7,
                       max_new_fraction=0.3),
        capacity=200, verbose=False)
    rounds = [h for h in history if "n_alive" in h]
    assert rounds and rounds[-1]["n_alive"] > 100
    assert history[-1]["mse"] < history[0]["mse"]


def test_zero_opacity_moments_group_optimizer():
    """zero_opacity_moments must work on BOTH optimizer shapes: plain adam
    and make_group_optimizer's multi_transform (whose inner_states dict is
    keyed by group label and whose masked trees carry MaskedNode
    placeholders) — the opacity-reset path crashes otherwise."""
    import jax.numpy as jnp
    import optax

    from sage3d_tpu.parallel.densify import zero_opacity_moments
    from sage3d_tpu.parallel.train import make_group_optimizer, scene_params
    from sage3d_tpu.renderer.scene import synthetic_room

    params = scene_params(synthetic_room(64, seed=0))

    for opt in (optax.adam(1e-3), make_group_optimizer(extent=2.0)):
        state = opt.init(params)
        # push one step so the moments are non-zero
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        _, state = opt.update(grads, state, params)
        zeroed = zero_opacity_moments(state)

        def collect(s):
            out = {"op": [], "other": []}
            for path, leaf in jax.tree_util.tree_leaves_with_path(s):
                if not (hasattr(leaf, "ndim") and leaf.ndim >= 1
                        and jnp.issubdtype(leaf.dtype, jnp.floating)):
                    continue
                key = "op" if any(
                    getattr(k, "key", None) == "opacity_logits"
                    for k in path) else "other"
                out[key].append(leaf)
            return out

        before, after = collect(state), collect(zeroed)
        assert before["op"] and before["other"]
        assert any(float(jnp.abs(x).max()) > 0 for x in before["op"])
        assert all(float(jnp.abs(x).max()) == 0 for x in after["op"])
        # untouched: every non-opacity float leaf identical
        for a, b in zip(before["other"], after["other"]):
            assert float(jnp.abs(a - b).max()) == 0


def test_fit_scene_adaptive_opacity_reset_group_lrs():
    """End-to-end: the opacity-reset branch runs without crashing under
    group learning rates (the configuration it exists for)."""
    from sage3d_tpu.parallel.trainer import (AdaptiveConfig, TrainerConfig,
                                             fit_scene_adaptive,
                                             make_orbit_targets)
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = synthetic_room(128, seed=1)
    cams, targets = make_orbit_targets(scene, n_views=2, radius=4.0,
                                       width=32, height=32, backend="xla")
    state, curve = fit_scene_adaptive(
        scene, cams, targets,
        config=TrainerConfig(steps=4, log_every=2, group_lrs=True,
                             pair_capacity=1 << 12, tile_capacity=256),
        adaptive=AdaptiveConfig(densify_every=0, opacity_reset_every=2),
        capacity=256, verbose=False)
    assert state is not None
