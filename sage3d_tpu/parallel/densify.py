"""Adaptive density control for 3DGS scene optimization (split/clone/prune).

Classic 3DGS training interleaves gradient steps with density control:
Gaussians whose positional gradients stay large are under-reconstructing and
get CLONED (small ones) or SPLIT (large ones); Gaussians whose opacity decays
below a floor are PRUNED. CUDA implementations realloc the parameter tensors
every round; that is impossible (and unnecessary) under XLA's static-shape
model. TPU-native redesign:

  * FIXED CAPACITY: the parameter arrays are allocated once at capacity N.
    Dead slots are "parked" (opacity logit -> DEAD_LOGIT, means -> +1e6) so
    projection frustum-culls them for free; aliveness is derivable from the
    opacity logit alone — no separate mask array to keep in sync.
  * Each control round is ONE jitted program of N-sized elementwise math,
    two argsorts and drop-mode scatters (the measured-fast op set — see
    ops/binning.py's cost model): rank split/clone candidates by accumulated
    gradient score, rank free slots, and write candidate k into free slot k
    with fixed-shape validity masking. No reallocation, no host sync.
  * Optimizer moments of overwritten slots are zeroed through the same
    scatter (tree_map over any optax state whose leaves are N-major).

The reference has no training loop at all (SURVEY §5.4); this module is part
of what makes the TPU framework's renderer trainable end-to-end.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.projection import quat_to_rotmat

DEAD_LOGIT = -20.0     # parked slots: sigmoid(-20) ~ 2e-9 -> culled
PARK_POS = 1.0e6       # parked means: far outside every frustum
SPLIT_SHRINK = 1.6     # classic 3DGS: split halves shrink scales by 1.6x


class DensifyConfig(NamedTuple):
    grad_threshold: float = 2e-4   # mean positional-grad norm that triggers
    split_scale: float = 0.05      # world-space scale above which split > clone
    prune_opacity: float = 0.005   # alpha floor; below -> prune
    max_new_fraction: float = 0.1  # cap on new Gaussians per round (of N)


class DensifyState(NamedTuple):
    grad_accum: jnp.ndarray   # (N,) summed positional-gradient norms
    n_steps: jnp.ndarray      # () int32 steps accumulated


def init_densify_state(n: int) -> DensifyState:
    return DensifyState(grad_accum=jnp.zeros((n,), jnp.float32),
                        n_steps=jnp.zeros((), jnp.int32))


def accumulate(state: DensifyState, mean_grads: jnp.ndarray) -> DensifyState:
    """Fold one step's means-gradient (N, 3) into the running score."""
    norm = jnp.linalg.norm(mean_grads, axis=-1)
    return DensifyState(grad_accum=state.grad_accum + norm,
                        n_steps=state.n_steps + 1)


def alive_mask(opacity_logits: jnp.ndarray) -> jnp.ndarray:
    return opacity_logits > (DEAD_LOGIT + 1.0)


def _zero_rows_like(x, dst, n):
    """Zero rows ``dst`` (invalid entries == n are dropped) of an N-major leaf."""
    if not hasattr(x, "shape") or x.ndim == 0 or x.shape[0] != n:
        return x
    return x.at[dst].set(jnp.zeros((), x.dtype), mode="drop")


@partial(jax.jit, static_argnames=("config",))
def densify_prune(
    params: Dict[str, jnp.ndarray],
    state: DensifyState,
    key: jax.Array,
    config: DensifyConfig = DensifyConfig(),
    opt_state=None,
    semantic_ids: Optional[jnp.ndarray] = None,
):
    """One density-control round. Returns (params, state, opt_state,
    semantic_ids, info) — all static-shaped; ``info`` carries live counters.

    params must hold the TRAINABLE keys of parallel.train (means, log_scales,
    quats, opacity_logits, sh). opt_state may be any optax state; leaves whose
    leading dim == N get their overwritten rows zeroed.
    """
    n = params["opacity_logits"].shape[0]
    opac_logit = params["opacity_logits"]
    opac = jax.nn.sigmoid(opac_logit)
    alive = alive_mask(opac_logit)

    prune = alive & (opac < config.prune_opacity)
    alive2 = alive & ~prune

    avg = state.grad_accum / jnp.maximum(state.n_steps, 1).astype(jnp.float32)
    cand = alive2 & (avg > config.grad_threshold)

    # Rank candidates by score (desc) and free slots (index order); the k-th
    # valid candidate is written into the k-th free slot.
    cand_order = jnp.argsort(jnp.where(cand, -avg, jnp.inf))
    free = ~alive2
    free_order = jnp.argsort(jnp.where(free, 0, 1), stable=True)
    n_cand = jnp.sum(cand.astype(jnp.int32))
    n_free = jnp.sum(free.astype(jnp.int32))
    m_max = max(int(config.max_new_fraction * n), 1)
    k = jnp.arange(n, dtype=jnp.int32)
    valid = (k < n_cand) & (k < n_free) & (k < m_max)

    src = cand_order
    dst = jnp.where(valid, free_order, n)          # n => dropped by scatters

    scales = jnp.exp(params["log_scales"])
    is_split = jnp.max(scales, axis=-1) > config.split_scale

    # New-row payloads, gathered per k from src (row gathers, measured-fast).
    sc_src = scales[src]
    split_src = is_split[src]
    # Split offspring sample from the source Gaussian N(mu, Sigma): rotate an
    # axis-aligned draw by the source orientation. Clones stay in place (the
    # optimizer separates them), matching the CUDA reference behavior.
    R = quat_to_rotmat(params["quats"][src])        # (N, 3, 3)
    eps = jax.random.normal(key, (n, 3), jnp.float32)
    offset = jnp.einsum("nij,nj->ni", R, eps * sc_src)
    new_means = params["means"][src] + jnp.where(split_src[:, None],
                                                 offset, 0.0)
    shrink = jnp.where(split_src[:, None], jnp.log(SPLIT_SHRINK), 0.0)
    new_logsc = params["log_scales"][src] - shrink

    # NOTE: no unique_indices hint on these scatters — the invalid entries
    # all carry the (duplicated) OOB sentinel ``n``, and the hint's contract
    # covers the whole index array, duplicates-before-drop included; XLA may
    # exploit a false promise. Density control runs once per densify_every
    # steps, so the hint's saving is irrelevant here.
    out = dict(params)
    out["means"] = out["means"].at[dst].set(new_means, mode="drop")
    out["log_scales"] = out["log_scales"].at[dst].set(new_logsc, mode="drop")
    out["quats"] = out["quats"].at[dst].set(params["quats"][src],
                                            mode="drop")
    out["opacity_logits"] = out["opacity_logits"].at[dst].set(
        opac_logit[src], mode="drop")
    out["sh"] = out["sh"].at[dst].set(params["sh"][src], mode="drop")

    # Split sources shrink too (the two halves replace the parent).
    src_write = jnp.where(valid & split_src, src, n)
    out["log_scales"] = out["log_scales"].at[src_write].set(
        new_logsc, mode="drop")

    # Park pruned slots (unless immediately overwritten above — scatter order
    # guarantees overwrite wins because parking is applied FIRST on the
    # already-updated array only where still prune&not-rewritten).
    parked = prune & ~jnp.zeros_like(prune).at[dst].set(True, mode="drop")
    out["opacity_logits"] = jnp.where(parked, DEAD_LOGIT,
                                      out["opacity_logits"])
    out["means"] = jnp.where(parked[:, None], PARK_POS, out["means"])

    if opt_state is not None:
        opt_state = jax.tree_util.tree_map(
            lambda x: _zero_rows_like(_zero_rows_like(x, dst, n),
                                      src_write, n), opt_state)
    if semantic_ids is not None:
        semantic_ids = semantic_ids.at[dst].set(semantic_ids[src],
                                                mode="drop")
        semantic_ids = jnp.where(parked, -1, semantic_ids)

    n_new = jnp.sum(valid.astype(jnp.int32))
    info = {
        "n_alive": jnp.sum(alive_mask(out["opacity_logits"]).astype(jnp.int32)),
        "n_pruned": jnp.sum(prune.astype(jnp.int32)),
        "n_new": n_new,
        "n_split": jnp.sum((valid & split_src).astype(jnp.int32)),
        "n_clone": n_new - jnp.sum((valid & split_src).astype(jnp.int32)),
    }
    return out, init_densify_state(n), opt_state, semantic_ids, info


def zero_opacity_moments(opt_state):
    """Zero the opacity_logits rows of every optimizer-moment tree.

    Companion to `reset_opacity`: clamping the logits while Adam's first/
    second moments for them survive lets accumulated momentum push opacities
    straight back up after the reset — classic 3DGS zeroes the state too.

    Path-aware so it works on BOTH optimizer shapes in use: plain adam
    (moments are params-mirroring dicts) and make_group_optimizer's
    optax.multi_transform (whose inner_states dict is keyed by group label —
    also 'opacity_logits' — and whose masked moment trees hold MaskedNode
    placeholders at the other keys). Only float ARRAY leaves under an
    'opacity_logits' path key are zeroed: placeholders and integer step
    counters pass through untouched (torch-3DGS resets exp_avg/exp_avg_sq
    and keeps the step).
    """
    from jax.tree_util import DictKey, tree_map_with_path

    def _fix(path, leaf):
        on_opacity = any(isinstance(k, DictKey) and k.key == "opacity_logits"
                         for k in path)
        if (on_opacity and hasattr(leaf, "dtype") and hasattr(leaf, "ndim")
                and leaf.ndim >= 1
                and jnp.issubdtype(leaf.dtype, jnp.floating)):
            return jnp.zeros_like(leaf)
        return leaf

    return tree_map_with_path(_fix, opt_state)


def reset_opacity(params: Dict[str, jnp.ndarray],
                  max_opacity: float = 0.01) -> Dict[str, jnp.ndarray]:
    """Classic periodic opacity clamp: cap every LIVE Gaussian's opacity so
    pruning can reclaim floaters that stopped contributing."""
    cap = jnp.log(max_opacity / (1.0 - max_opacity)).astype(jnp.float32)
    ol = params["opacity_logits"]
    out = dict(params)
    out["opacity_logits"] = jnp.where(alive_mask(ol), jnp.minimum(ol, cap), ol)
    return out
