"""Pinhole camera model for the TPU 3DGS renderer.

Replaces the Isaac Sim camera API used by the reference environment
(simple_env.py:741-967 creates a 640x480 camera with focal_length=8.0 at z=1.2m;
generate_images.py:43-51 a 1024x768 one; vlm_client_modular.py:558-584 reports
pinhole intrinsics fx=fy=525, cx=320, cy=240 to policy servers).

Conventions
-----------
* World frame: z-up (Isaac convention kept so trajectories/benchmarks transfer).
* Camera frame: OpenCV style — +x right, +y down, +z forward (view direction).
* ``cam_to_world`` is a 3x3 rotation whose columns are the camera axes in world
  coordinates; ``position`` is the optical center in world coordinates.

Cameras are registered as JAX pytrees so they can be traced/jitted/vmapped —
batched rendering vmaps over a stacked Camera.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Isaac/USD camera defaults mirrored by the reference scene pipeline
# (vln_trajectory_generator.py:733-737): focal length in mm, aperture in mm.
DEFAULT_HORIZONTAL_APERTURE_MM = 20.954999923706055
AGENT_CAMERA_HEIGHT_M = 1.2  # simple_env.py:1204
AGENT_CAMERA_PITCH_RAD = 0.0  # forward-facing; see simple_env.py:1214-1256


class Camera(NamedTuple):
    """Pinhole camera. All fields are arrays so Camera is vmap/jit friendly."""

    position: jnp.ndarray      # (3,) optical center, world frame
    cam_to_world: jnp.ndarray  # (3, 3) rotation, columns = camera axes in world
    fx: jnp.ndarray            # () focal in pixels
    fy: jnp.ndarray
    cx: jnp.ndarray            # () principal point in pixels
    cy: jnp.ndarray
    width: int                 # static
    height: int                # static
    near: float = 0.1          # simple_env.py clip range (0.1, 50)
    far: float = 50.0

    @property
    def world_to_cam(self) -> jnp.ndarray:
        return jnp.swapaxes(self.cam_to_world, -1, -2)

    def tree_flatten(self):  # pragma: no cover - helper for manual flatten
        return (self.position, self.cam_to_world, self.fx, self.fy, self.cx, self.cy), (
            self.width, self.height, self.near, self.far)


# Register Camera as a pytree with static (width, height, near, far).
def _cam_flatten(c: Camera):
    children = (c.position, c.cam_to_world, c.fx, c.fy, c.cx, c.cy)
    aux = (c.width, c.height, c.near, c.far)
    return children, aux


def _cam_unflatten(aux, children):
    return Camera(*children, *aux)


jax.tree_util.register_pytree_node(Camera, _cam_flatten, _cam_unflatten)


def intrinsics_from_focal_mm(
    focal_mm: float,
    width: int,
    height: int,
    horizontal_aperture_mm: float = DEFAULT_HORIZONTAL_APERTURE_MM,
) -> Tuple[float, float, float, float]:
    """USD-style (focal length, aperture) -> pixel intrinsics (fx, fy, cx, cy).

    fx = width * focal / horizontal_aperture; square pixels (fy = fx), principal
    point at the image center — matching how Isaac Sim derives intrinsics for the
    reference cameras.
    """
    fx = width * focal_mm / horizontal_aperture_mm
    fy = fx
    return fx, fy, width / 2.0, height / 2.0


def look_rotation(forward: np.ndarray, world_up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """cam_to_world rotation with camera +z along ``forward`` (z-up world)."""
    f = np.asarray(forward, dtype=np.float64)
    f = f / (np.linalg.norm(f) + 1e-12)
    up = np.asarray(world_up, dtype=np.float64)
    right = np.cross(f, up)
    n = np.linalg.norm(right)
    if n < 1e-8:  # looking straight up/down: pick arbitrary right axis
        right = np.array([1.0, 0.0, 0.0])
    else:
        right = right / n
    down = np.cross(f, right)  # camera +y is image-down
    down = down / (np.linalg.norm(down) + 1e-12)
    return np.stack([right, down, f], axis=1)  # columns: x=right, y=down, z=fwd


def make_camera(
    position,
    forward,
    width: int,
    height: int,
    focal_mm: float = 8.0,
    horizontal_aperture_mm: float = DEFAULT_HORIZONTAL_APERTURE_MM,
    near: float = 0.1,
    far: float = 50.0,
    intrinsics: Tuple[float, float, float, float] | None = None,
) -> Camera:
    """Build a Camera from a world position and a forward (view) direction."""
    if intrinsics is None:
        fx, fy, cx, cy = intrinsics_from_focal_mm(
            focal_mm, width, height, horizontal_aperture_mm)
    else:
        fx, fy, cx, cy = intrinsics
    R = look_rotation(np.asarray(forward, dtype=np.float64))
    return Camera(
        position=jnp.asarray(position, dtype=jnp.float32),
        cam_to_world=jnp.asarray(R, dtype=jnp.float32),
        fx=jnp.float32(fx), fy=jnp.float32(fy),
        cx=jnp.float32(cx), cy=jnp.float32(cy),
        width=int(width), height=int(height), near=float(near), far=float(far),
    )


def agent_camera(
    agent_xy,
    yaw: float,
    width: int = 640,
    height: int = 480,
    focal_mm: float = 8.0,
    camera_height: float = AGENT_CAMERA_HEIGHT_M,
    pitch: float = AGENT_CAMERA_PITCH_RAD,
    **kw,
) -> Camera:
    """The agent's first-person camera (reference simple_env.py:1196-1320).

    Positioned ``camera_height`` above the agent's (x, y); forward along the
    agent yaw with an optional downward pitch (positive pitch looks down).
    """
    cy, sy = math.cos(yaw), math.sin(yaw)
    cp, sp = math.cos(pitch), math.sin(pitch)
    forward = np.array([cy * cp, sy * cp, -sp])
    pos = np.array([float(agent_xy[0]), float(agent_xy[1]), camera_height])
    return make_camera(pos, forward, width, height, focal_mm=focal_mm, **kw)


def agent_camera_jnp(
    agent_xy,
    yaw,
    width: int = 640,
    height: int = 480,
    focal_mm: float = 8.0,
    camera_height: float = AGENT_CAMERA_HEIGHT_M,
    pitch: float = AGENT_CAMERA_PITCH_RAD,
    horizontal_aperture_mm: float = DEFAULT_HORIZONTAL_APERTURE_MM,
    near: float = 0.1,
    far: float = 50.0,
) -> Camera:
    """Traced-argument agent camera: position/yaw may be jnp scalars, so the
    camera can be built INSIDE jit (fully on-device rollouts, batched sweeps).

    Matches agent_camera()'s geometry (z-up world, camera +y = image down).
    """
    agent_xy = jnp.asarray(agent_xy, jnp.float32)
    yaw = jnp.asarray(yaw, jnp.float32)
    cy_, sy_ = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(jnp.float32(pitch)), jnp.sin(jnp.float32(pitch))
    forward = jnp.stack([cy_ * cp, sy_ * cp, -sp])
    # right = normalize(forward x up); z-up world => right = (sin, -cos, 0)
    right = jnp.stack([sy_, -cy_, jnp.float32(0.0)])
    down = jnp.cross(forward, right)
    R = jnp.stack([right, down, forward], axis=1)
    fx = width * focal_mm / horizontal_aperture_mm
    return Camera(
        position=jnp.stack([agent_xy[0], agent_xy[1],
                            jnp.float32(camera_height)]),
        cam_to_world=R,
        fx=jnp.float32(fx), fy=jnp.float32(fx),
        cx=jnp.float32(width / 2.0), cy=jnp.float32(height / 2.0),
        width=int(width), height=int(height), near=near, far=far,
    )


def camera_rays_yaw(camera: Camera) -> jnp.ndarray:
    """Yaw of the camera's forward axis in the world xy-plane (for policies)."""
    f = camera.cam_to_world[..., :, 2]
    return jnp.arctan2(f[..., 1], f[..., 0])


def stack_cameras(cams) -> Camera:
    """Stack a list of same-resolution cameras into a batched Camera pytree."""
    assert len({(c.width, c.height) for c in cams}) == 1, "mixed resolutions"
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
