"""3D -> 2D Gaussian projection (EWA splatting), pure jnp and fully differentiable.

TPU-native replacement for the projection stage of the CUDA rasterizer behind
Isaac Sim's USDZ 3DGS rendering (reference renders via `world.step(render=True)`,
simple_env.py:1356-1393 — the actual math lives in closed-source CUDA). Here it is
an elementwise-per-Gaussian jnp program: XLA vectorizes it onto the VPU and fuses
it with SH evaluation; autodiff provides the exact backward, so no hand-written
kernel is needed for this stage (it is bandwidth-bound, not compute-bound).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sh import eval_sh
from ..renderer.camera import Camera
from ..renderer.scene import GaussianScene

# Low-pass dilation added to the 2D covariance diagonal (classic 3DGS value):
# guarantees splats cover at least ~1 pixel so they cannot alias away.
COV2D_DILATION = 0.3
ALPHA_MAX = 0.99    # compositing clamp, matches classic 3DGS
ALPHA_MIN = 1.0 / 255.0


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen-space quantities consumed by the compositors."""

    means2d: jnp.ndarray    # (N, 2) pixel coords
    conics: jnp.ndarray     # (N, 3) inverse 2D covariance (a, b, c): [[a,b],[b,c]]
    depths: jnp.ndarray     # (N,) camera-space z
    radii: jnp.ndarray      # (N,) conservative pixel radius (0 => culled)
    colors: jnp.ndarray     # (N, 3) view-dependent RGB
    opacities: jnp.ndarray  # (N,)
    visible: jnp.ndarray    # (N,) bool
    extents: jnp.ndarray    # (N, 2) tight AABB half-extents in pixels (x, y)


def _rotmat_channels(quats: jnp.ndarray):
    """Normalized-quaternion rotation matrix as 9 separate (...,) channels.

    Channel-of-arrays form: on TPU an (N, 3, 3) array pads its 3-wide minor
    dims to full vector lanes, so batched tiny matmuls move ~40x the useful
    bytes. Scalar channels fuse into one elementwise pass instead.
    """
    q = quats / (jnp.linalg.norm(quats, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return ((1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
            (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
            (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)))


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) (w, x, y, z) quaternions -> (..., 3, 3) rotation matrices."""
    R = _rotmat_channels(quats)
    return jnp.stack([jnp.stack(row, -1) for row in R], axis=-2)


def covariance_3d(log_scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T for per-Gaussian scales/rotations.

    REFERENCE form: project_gaussians computes the same quantity as fused
    scalar channels (the (N,3,3) batched-matmul path pads to vector lanes and
    was 5x slower); tests pin the channel math against this implementation
    (test_renderer_core.test_channel_cov2d_matches_matrix_form)."""
    R = quat_to_rotmat(quats)                      # (N, 3, 3)
    S = jnp.exp(log_scales)                        # (N, 3)
    M = R * S[..., None, :]                        # R @ diag(S)
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians(scene: GaussianScene, camera: Camera,
                      sh_degree: int | None = None,
                      clamp_dims: tuple | None = None) -> ProjectedGaussians:
    """Project all Gaussians into one camera (vmap over cameras for batches).

    ``clamp_dims`` (width, height) overrides the frustum-cone clamp used in the
    EWA Jacobian: band-sharded rendering passes the FULL frame dims so each
    band computes bit-identical covariances to a single-device render.
    """
    if sh_degree is None:
        sh_degree = scene.sh_degree
    clamp_w, clamp_h = clamp_dims if clamp_dims is not None else (
        camera.width, camera.height)

    R_wc = camera.world_to_cam                     # (3, 3) world -> camera
    # camera-space centers, channel-wise (see the channel-math note below)
    d0 = scene.means[:, 0] - camera.position[0]
    d1 = scene.means[:, 1] - camera.position[1]
    d2 = scene.means[:, 2] - camera.position[2]
    t = jnp.stack(
        [R_wc[i, 0] * d0 + R_wc[i, 1] * d1 + R_wc[i, 2] * d2
         for i in range(3)], axis=-1)              # (N, 3)
    tz = t[:, 2]
    depths = tz

    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    inv_z = 1.0 / tz_safe
    u = camera.fx * t[:, 0] * inv_z + camera.cx
    v = camera.fy * t[:, 1] * inv_z + camera.cy
    means2d = jnp.stack([u, v], axis=-1)

    # EWA: Sigma2D = J W Sigma W^T J^T with W = R_wc, J the perspective
    # Jacobian. Everything below is CHANNEL math over (N,) arrays: Sigma2D =
    # (JW M)(JW M)^T with M = R diag(S), so only the six entries of
    # U = JW @ M are ever materialized. The naive (N,3,3)/(N,2,3) batched
    # matmul forms pad their tiny minor dims to full TPU vector lanes and
    # made this stage ~25 ms at 1M Gaussians; channels fuse to ~one pass.
    # Clamp the Jacobian evaluation point to the frustum cone (classic 3DGS):
    # limits the linearization error for Gaussians far outside the view.
    lim_x = 1.3 * (0.5 * clamp_w / camera.fx)
    lim_y = 1.3 * (0.5 * clamp_h / camera.fy)
    txz = jnp.clip(t[:, 0] * inv_z, -lim_x, lim_x) * tz_safe
    tyz = jnp.clip(t[:, 1] * inv_z, -lim_y, lim_y) * tz_safe
    fx_z = camera.fx * inv_z
    fy_z = camera.fy * inv_z
    jx2 = -camera.fx * txz * inv_z * inv_z   # J[0,2]
    jy2 = -camera.fy * tyz * inv_z * inv_z   # J[1,2]
    # JW rows: JW[0,j] = fx_z*W[0,j] + jx2*W[2,j]; JW[1,j] = fy_z*W[1,j] +
    # jy2*W[2,j] (W = R_wc is a (3,3) host constant -> scalar coefficients).
    W = R_wc
    jw0 = [fx_z * W[0, j] + jx2 * W[2, j] for j in range(3)]
    jw1 = [fy_z * W[1, j] + jy2 * W[2, j] for j in range(3)]
    Rq = _rotmat_channels(scene.quats)       # 9 (N,) channels
    S = jnp.exp(scene.log_scales)            # (N, 3)
    # U[i,k] = S_k * sum_j JW[i,j] * R[j,k]
    u0 = [S[:, k] * (jw0[0] * Rq[0][k] + jw0[1] * Rq[1][k] + jw0[2] * Rq[2][k])
          for k in range(3)]
    u1 = [S[:, k] * (jw1[0] * Rq[0][k] + jw1[1] * Rq[1][k] + jw1[2] * Rq[2][k])
          for k in range(3)]
    a = u0[0] * u0[0] + u0[1] * u0[1] + u0[2] * u0[2] + COV2D_DILATION
    b = u0[0] * u1[0] + u0[1] * u1[1] + u0[2] * u1[2]
    c = u1[0] * u1[0] + u1[1] * u1[1] + u1[2] * u1[2] + COV2D_DILATION
    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # Exact opacity-aware extent: the compositors zero alpha below ALPHA_MIN
    # (classic 3DGS cutoff, composite_ref/alpha_at), so the LAST contributing
    # pixel satisfies op * exp(-0.5 m2) >= ALPHA_MIN, i.e. Mahalanobis
    # m <= s = sqrt(2 ln(op / ALPHA_MIN)). Using s instead of the classic
    # hardcoded 3 keeps binning both TIGHT for transparent Gaussians and
    # CONSERVATIVE for opaque ones (s > 3 when op > e^4.5/255 ~ 0.35, where
    # a fixed 3-sigma rect would drop pixels the oracle still shades).
    op = jax.lax.stop_gradient(scene.opacities)
    cut2 = 2.0 * jnp.log(jnp.maximum(op, ALPHA_MIN) / ALPHA_MIN)
    s_cut = jnp.sqrt(jnp.maximum(cut2, 1e-6))
    mid = 0.5 * (a + c)
    eig_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    radii_f = jnp.ceil(s_cut * jnp.sqrt(eig_max)) + 1.0
    # Tight per-axis AABB of the cutoff ellipse: half-extents s*sqrt(diag cov).
    ext_x = jnp.ceil(s_cut * jnp.sqrt(jnp.maximum(a, 0.0))) + 1.0
    ext_y = jnp.ceil(s_cut * jnp.sqrt(jnp.maximum(c, 0.0))) + 1.0

    # View-dependent color.
    view_dirs = scene.means - camera.position
    view_dirs = view_dirs / (jnp.linalg.norm(view_dirs, axis=-1, keepdims=True) + 1e-12)
    colors = eval_sh(scene.sh, view_dirs, sh_degree)

    # Frustum/validity culling (kept as a mask: shapes stay static under jit).
    inside = ((u + ext_x > 0) & (u - ext_x < camera.width)
              & (v + ext_y > 0) & (v - ext_y < camera.height))
    visible = ((tz > camera.near) & (tz < camera.far) & (det > 0) & inside
               & (op > ALPHA_MIN))
    radii = jnp.where(visible, radii_f, 0.0).astype(jnp.int32)
    extents = jnp.where(visible[:, None], jnp.stack([ext_x, ext_y], -1), 0.0)

    return ProjectedGaussians(
        means2d=means2d,
        conics=conics,
        depths=depths,
        radii=radii,
        colors=colors,
        opacities=scene.opacities,
        visible=visible,
        extents=extents,
    )


def alpha_at(proj: ProjectedGaussians, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Opacity of every Gaussian at pixel (px, py): the EWA footprint.

    Used by the oracle compositor and by tests; (px, py) broadcast against N.
    """
    dx = px[..., None] - proj.means2d[:, 0]
    dy = py[..., None] - proj.means2d[:, 1]
    a, b, c = proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = proj.opacities * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.where(power > 0.0, 0.0, alpha)         # outside-center guard
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)   # classic 3DGS cutoff
    return jnp.where(proj.visible, alpha, 0.0)
