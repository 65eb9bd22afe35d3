"""Jittable kinematic agent: vectorized replacement for the 1 cm micro-step loop.

The reference executes motion as a Python loop of 1 cm physics micro-steps with
collision pre-checks and a 4-direction lateral-exploration fallback
(simple_env.py:1987-2234). Those semantics shape the benchmark's CR/ICP/PS
metrics, so they are reproduced exactly — but as ONE fused XLA program: all
candidate micro-step positions are tested in a single vectorized occupancy
gather, and the stop/slide outcome is recovered with prefix scans. No per-step
Python, no physics engine in the loop; an entire env step is a single device
dispatch (and batches across parallel episodes with vmap).

Semantics mirrored (file:line):
  * robot->world velocity rotation by yaw      simple_env.py:1996-2003
  * per-command travel cap 0.20 m              :2096 (max_distance)
  * direct motion: 1 cm steps, stop at first
    colliding step                             :2116-2159
  * direct progress <= 0.01 m => try 4 lateral
    directions (perp, -perp, +-45deg blends),
    5 mm steps, 0.05 m cap, keep best if
    > 0.005 m                                  :2161-2234
  * efficiency bookkeeping: consecutive
    collision counter +1 if actual/intended
    < 0.3 with intended > 0.05; reset if > 0.6 :2033-2047
  * yaw integrate + wrap to (-pi, pi]          :2051-2053
  * collision event counting for CR            :1854-1864
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .occupancy import OccupancyGrid, check_collision_world

MAX_STEP_DISTANCE = 0.20     # meters per command (simple_env.py:2096)
DIRECT_STEP = 0.01           # 1 cm micro-step
N_DIRECT_STEPS = 20          # 0.20 / 0.01
EXPLORE_STEP = 0.005         # 5 mm micro-step
EXPLORE_MAX = 0.05
N_EXPLORE_STEPS = 10         # 0.05 / 0.005
MIN_MOVE = 0.001


class AgentState(NamedTuple):
    """Device-resident agent state (pytree)."""

    pos: jnp.ndarray                    # (3,) world position
    yaw: jnp.ndarray                    # () heading
    consecutive_collisions: jnp.ndarray  # () int32
    total_collisions: jnp.ndarray       # () int32 (CR metric source)
    collision_detected: jnp.ndarray     # () bool (this-step flag, for ICP)
    time_s: jnp.ndarray                 # () episode sim time


def init_agent(pos, yaw) -> AgentState:
    return AgentState(
        pos=jnp.asarray(pos, jnp.float32),
        yaw=jnp.asarray(yaw, jnp.float32),
        consecutive_collisions=jnp.int32(0),
        total_collisions=jnp.int32(0),
        collision_detected=jnp.asarray(False),
        time_s=jnp.float32(0.0),
    )


def _march(grid: OccupancyGrid, start_xy, direction_xy, step: float,
           n_steps: int, max_distance) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """March along ``direction`` in fixed micro-steps, stopping at the first
    colliding (or beyond-max) step. Returns (distance_moved, hit_obstacle).

    Vectorized: all candidate positions are tested at once; the serial
    early-stop of the reference loop is a prefix-AND over the safety mask.
    """
    ks = jnp.arange(1, n_steps + 1, dtype=jnp.float32)
    dists = jnp.minimum(ks * step, max_distance)
    pts = start_xy[None, :] + direction_xy[None, :] * dists[:, None]
    unsafe = check_collision_world(grid, pts)
    in_range = dists <= max_distance + 1e-9
    blocked = unsafe & in_range
    # first blocked step index (n_steps if none)
    any_block = jnp.any(blocked)
    first_block = jnp.argmax(blocked)
    # distance achieved: full distance of last safe step before the block
    moved = jnp.where(
        any_block,
        jnp.where(first_block > 0, dists[jnp.maximum(first_block - 1, 0)], 0.0),
        jnp.minimum(max_distance, dists[-1]))
    return moved, any_block


def apply_cmd(state: AgentState, grid: OccupancyGrid, vx, vy, yaw_rate,
              duration_s) -> AgentState:
    """Execute one velocity command with collision-safe motion. Jittable.

    Mirrors SimpleVLNEnv.apply_cmd_for + _safe_gradual_movement semantics.
    """
    vx = jnp.asarray(vx, jnp.float32)
    vy = jnp.asarray(vy, jnp.float32)
    yaw_rate = jnp.asarray(yaw_rate, jnp.float32)
    duration_s = jnp.asarray(duration_s, jnp.float32)

    cos_y = jnp.cos(state.yaw)
    sin_y = jnp.sin(state.yaw)
    world_vx = vx * cos_y - vy * sin_y
    world_vy = vx * sin_y + vy * cos_y
    total_dx = world_vx * duration_s
    total_dy = world_vy * duration_s
    intended = jnp.sqrt(total_dx ** 2 + total_dy ** 2)

    start_xy = state.pos[:2]
    safe_intended = jnp.where(intended > MIN_MOVE, intended, 1.0)
    direction = jnp.stack([total_dx, total_dy]) / safe_intended
    max_dist = jnp.minimum(MAX_STEP_DISTANCE, intended)

    direct_moved, direct_hit = _march(
        grid, start_xy, direction, DIRECT_STEP, N_DIRECT_STEPS, max_dist)

    # Lateral exploration when direct motion is (near-)fully blocked.
    perp = jnp.stack([-direction[1], direction[0]])
    dirs = jnp.stack([
        perp,
        -perp,
        perp * 0.707 + direction * 0.707,
        -perp * 0.707 + direction * 0.707,
    ])
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    ex_moved, _ = jax.vmap(
        lambda d: _march(grid, start_xy, d, EXPLORE_STEP, N_EXPLORE_STEPS,
                         jnp.float32(EXPLORE_MAX)))(dirs)
    best_i = jnp.argmax(ex_moved)
    best_ex = ex_moved[best_i]

    use_direct = direct_moved > 0.01
    use_explore = (~use_direct) & (best_ex > 0.005)
    moved = jnp.where(use_direct, direct_moved,
                      jnp.where(use_explore, best_ex, 0.0))
    move_dir = jnp.where(use_direct, direction, dirs[best_i])
    new_xy = jnp.where(intended > MIN_MOVE,
                       start_xy + move_dir * moved, start_xy)

    # Collision accounting: a blocked direct march is the collision event that
    # the reference records via check_collision_3d inside _is_position_safe
    # (simple_env.py:1854-1864 increments the CR counter on a positive check).
    collision_event = (intended > MIN_MOVE) & direct_hit
    efficiency = jnp.where(intended > 0, moved / safe_intended, 1.0)
    stuck = (efficiency < 0.3) & (intended > 0.05)
    cc = jnp.where(
        intended > MIN_MOVE,
        jnp.where(stuck, state.consecutive_collisions + 1,
                  jnp.where(efficiency > 0.6, 0, state.consecutive_collisions)),
        state.consecutive_collisions)

    new_yaw = state.yaw + yaw_rate * duration_s
    new_yaw = jnp.mod(new_yaw + jnp.pi, 2.0 * jnp.pi) - jnp.pi

    return AgentState(
        pos=jnp.concatenate([new_xy, state.pos[2:3]]),
        yaw=new_yaw,
        consecutive_collisions=cc.astype(jnp.int32),
        total_collisions=state.total_collisions
        + collision_event.astype(jnp.int32),
        collision_detected=collision_event,
        time_s=state.time_s + duration_s,
    )
