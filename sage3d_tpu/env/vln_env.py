"""GaussianVLNEnv: the TPU-native VLN environment.

Replaces the reference's Isaac-Sim-backed SimpleVLNEnv (simple_env.py, 3060
lines around an external C++/CUDA engine) with a thin stateful wrapper over
three jittable cores:

  * rendering    -> renderer/render.py (RGB + depth + semantic in ONE pass; no
                    collision-mesh visibility toggling, no 5-strategy depth
                    fallback chain — simple_env.py:1356-1842 collapses to one
                    device call)
  * collision    -> physics/occupancy.py (EDT grid, the reference's primary
                    collision path) + ops/collision.py capsule queries
  * motion       -> physics/agent.py (vectorized micro-step semantics)

The environment keeps the reference's public surface (get_rgb/get_depth/
get_rgbd/apply_cmd_for/set_start_pose/get_agent_pos/get_yaw/
update_time_and_reset_collision/get_collision_count/load_scene/update_map) so
the benchmark runner, measures and policy clients port over unchanged. Sim time
advances by commanded duration (deterministic), not wall clock.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.agent import AgentState, apply_cmd, init_agent
from ..physics.occupancy import OccupancyGrid, check_collision_world, grid_from_semantic_map
from ..renderer.camera import agent_camera_jnp
from ..renderer.render import render, rgb_to_uint8
from ..renderer.scene import GaussianScene, load_ply
from ..utils.transforms import yaw_from_world_quat


class GaussianVLNEnv:
    """Stateful env facade over the jittable cores.

    Args:
      scene: a GaussianScene (or path to a 3DGS PLY).
      map_json: 2D semantic map (path or instance list) for collision; None
        disables collision (reference --disable-collision debug mode).
      width/height: agent camera resolution (reference default 640x480).
      backend: renderer backend ("pallas" on TPU, "xla" elsewhere).
    """

    def __init__(
        self,
        scene,
        map_json=None,
        width: int = 640,
        height: int = 480,
        focal_mm: float = 8.0,
        hz: float = 30.0,
        backend: Optional[str] = None,
        robot_radius_m: float = 0.08,
        camera_height: float = 1.2,
    ):
        if backend is None:
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.backend = backend
        self.width = width
        self.height = height
        self.focal_mm = focal_mm
        self.hz = hz
        self.camera_height = camera_height
        self.robot_radius_m = robot_radius_m
        self.semantic_map_path: Optional[str] = None
        self.scene: GaussianScene = None
        self.grid: Optional[OccupancyGrid] = None
        self._video_frames = []
        self._record_video = False

        self.load_scene(scene)
        self.update_map(map_json)
        self.state: AgentState = init_agent([0.0, 0.0, 0.5], 0.0)

        # jit once; AgentState/OccupancyGrid/GaussianScene are pytrees.
        self._apply_cmd = jax.jit(apply_cmd)
        self._check_collision = jax.jit(check_collision_world)

        # One compiled program per (scene-shape, resolution) for the capture
        # path: camera built in-trace from the agent pose (agent_camera_jnp),
        # so every get_rgb/get_rgbd is ONE device dispatch instead of the
        # eager per-op chain (interactive episodes were dispatch-bound:
        # ~50 s/episode through the tunnel before this).
        def _frame(scene, pos, yaw):
            cam = agent_camera_jnp(
                pos[:2], yaw, width=self.width, height=self.height,
                focal_mm=self.focal_mm, camera_height=self.camera_height)
            return render(scene, cam, backend=self.backend)

        self._render_jit = jax.jit(_frame)

    # -- scene / map management (reference load_scene simple_env.py:1085,
    #    update_map :1116) ---------------------------------------------------
    def load_scene(self, scene) -> None:
        if isinstance(scene, GaussianScene):
            self.scene = scene
        elif str(scene).endswith("manifest.json"):
            # scene-bundle directory (data/scene_build.py): PLY + labels
            from ..data.scene_build import load_scene_bundle
            self.scene, _ = load_scene_bundle(scene)
        else:
            self.scene = load_ply(scene)

    def update_map(self, map_json) -> None:
        self.semantic_map_path = map_json if isinstance(map_json, str) else None
        if map_json is None:
            self.grid = None
        elif isinstance(map_json, OccupancyGrid):
            self.grid = map_json
        else:
            self.grid = grid_from_semantic_map(
                map_json, robot_radius_m=self.robot_radius_m)

    # -- pose ---------------------------------------------------------------
    def set_start_pose(self, position, rotation_xyzw) -> None:
        """Set agent pose from a trajectory point (position + remapped quat).

        Mirrors simple_env.py:1149-1195: the stored quaternion is decoded with
        the z->-x remap and the -pi generation offset (see utils/transforms).
        """
        qx, qy, qz, qw = [float(v) for v in rotation_xyzw]
        yaw = yaw_from_world_quat(qx, qy, qz, qw)
        pos = [float(position[0]), float(position[1]),
               float(position[2]) if len(position) > 2 else 0.5]
        self.state = init_agent(pos, yaw)
        self._video_frames = []

    def get_agent_pos(self) -> np.ndarray:
        return np.asarray(self.state.pos)

    def get_yaw(self) -> float:
        return float(self.state.yaw)

    # -- capture ------------------------------------------------------------
    def render_frame(self) -> Dict[str, jnp.ndarray]:
        """One render pass: rgb + depth + semantic + alpha (one jitted
        dispatch; geometry identical to agent_camera — tested)."""
        return self._render_jit(self.scene, self.state.pos, self.state.yaw)

    def get_rgb(self) -> np.ndarray:
        out = self.render_frame()
        frame = np.asarray(rgb_to_uint8(out["rgb"]))
        if self._record_video:
            self._video_frames.append(frame)
        return frame

    def get_depth(self) -> np.ndarray:
        return np.asarray(self.render_frame()["depth"], dtype=np.float32)

    def get_rgbd(self):
        out = self.render_frame()
        rgb = np.asarray(rgb_to_uint8(out["rgb"]))
        if self._record_video:
            self._video_frames.append(rgb)
        return rgb, np.asarray(out["depth"], dtype=np.float32)

    def get_semantic(self) -> np.ndarray:
        return np.asarray(self.render_frame()["semantic"])

    # -- stepping -----------------------------------------------------------
    def apply_cmd_for(self, vx: float, vy: float, yaw_rate: float,
                      duration_s: float) -> None:
        if self.grid is None:
            # collision disabled: integrate freely (reference
            # --disable-collision, simple_env.py:2682-2686)
            yaw = float(self.state.yaw)
            wvx = vx * math.cos(yaw) - vy * math.sin(yaw)
            wvy = vx * math.sin(yaw) + vy * math.cos(yaw)
            dist = math.hypot(wvx, wvy) * duration_s
            dist = min(dist, 0.20)
            norm = math.hypot(wvx, wvy) or 1.0
            new_pos = self.state.pos + jnp.asarray(
                [wvx / norm * dist, wvy / norm * dist, 0.0])
            new_yaw = (yaw + yaw_rate * duration_s + math.pi) % (2 * math.pi) - math.pi
            self.state = self.state._replace(
                pos=new_pos, yaw=jnp.float32(new_yaw),
                time_s=self.state.time_s + duration_s,
                collision_detected=jnp.asarray(False))
            return
        self.state = self._apply_cmd(self.state, self.grid, vx, vy, yaw_rate,
                                     duration_s)

    # -- bookkeeping surface used by measures/runner ------------------------
    def update_time_and_reset_collision(self) -> None:
        self.state = self.state._replace(collision_detected=jnp.asarray(False))

    def reset_episode_time(self) -> None:
        self.state = self.state._replace(time_s=jnp.float32(0.0))

    def get_collision_count(self) -> int:
        return int(self.state.total_collisions)

    @property
    def consecutive_collisions(self) -> int:
        return int(self.state.consecutive_collisions)

    @property
    def collision_detected(self) -> bool:
        """Collision flag of the current step window (VLNEnvProtocol)."""
        return bool(self.state.collision_detected)

    @property
    def episode_time_s(self) -> float:
        """Sim-time seconds since episode start (VLNEnvProtocol)."""
        return float(self.state.time_s)

    # legacy aliases (reference SimpleVLNEnv private names); the measures and
    # runner read only the public VLNEnvProtocol members above
    @property
    def _collision_detected(self) -> bool:
        return self.collision_detected

    @property
    def _episode_start_time(self) -> float:
        return 0.0

    @property
    def _current_time(self) -> float:
        return self.episode_time_s

    # -- video --------------------------------------------------------------
    def start_video_recording(self) -> None:
        self._record_video = True
        self._video_frames = []

    def write_video(self, path: str, fps: int = 10) -> bool:
        """Write recorded frames (reference simple_env.py:2715-2759)."""
        if not self._video_frames:
            return False
        try:
            import imageio
            imageio.mimwrite(path, self._video_frames, fps=fps)
            return True
        except Exception:
            from PIL import Image
            base = path.rsplit(".", 1)[0]
            for i, f in enumerate(self._video_frames):
                Image.fromarray(f).save(f"{base}_{i:04d}.png")
            return True
