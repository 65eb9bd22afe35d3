"""Spherical-harmonics coverage for degrees 1-3 (VERDICT r2 weak #2).

Two independent angles:
  * MATH: the 16 basis functions extracted from eval_sh must be orthonormal
    on the sphere (Monte-Carlo inner products) — catches sign/constant typos
    without re-typing the same formulas as the implementation.
  * SYSTEM: degree-1/2/3 scenes render identically across oracle/xla/pallas
    backends, and SH-coefficient GRADIENTS agree between xla and pallas —
    exercising the view-dependent color path end to end (InteriorGS ships
    SH3: 48 floats/Gaussian, a materially different attribute bandwidth).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage3d_tpu.ops.sh import eval_sh
from sage3d_tpu.renderer.camera import make_camera
from sage3d_tpu.renderer.render import render
from sage3d_tpu.renderer.scene import synthetic_room


def _basis_values(dirs, degree):
    """Extract basis function values from eval_sh by symmetric differencing
    (cancels the +0.5 offset and stays inside the >= 0 clip)."""
    k = (degree + 1) ** 2
    eps = 0.01
    cols = []
    for j in range(k):
        sh_p = jnp.zeros((dirs.shape[0], k, 3)).at[:, j, 0].set(eps)
        plus = eval_sh(sh_p, dirs, degree)[:, 0]
        minus = eval_sh(-sh_p, dirs, degree)[:, 0]
        cols.append((plus - minus) / (2 * eps))
    return jnp.stack(cols, axis=1)                     # (M, K)


def test_sh_basis_orthonormal_degree3():
    rng = np.random.default_rng(0)
    m = 400_000
    v = rng.normal(size=(m, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    b = np.asarray(_basis_values(jnp.asarray(v), 3))   # (M, 16)
    # MC estimate of <b_i, b_j> over the sphere: mean * 4pi
    gram = (b.T @ b) / m * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(16), atol=0.06)


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_render_backend_parity_sh(degree):
    scene = synthetic_room(1500, seed=21, sh_degree=degree)
    # give the rest bands real energy (synthetic_room may leave them small)
    key = jax.random.PRNGKey(5)
    rest = 0.3 * jax.random.normal(key, scene.sh[:, 1:, :].shape)
    scene = scene._replace(sh=scene.sh.at[:, 1:, :].set(rest))
    cam = make_camera(position=[0, -6, 1.5], forward=[0, 1, -0.1],
                      width=64, height=64)
    kw = dict(pair_capacity=1 << 16, tile_capacity=2048)
    outs = {b: render(scene, cam, backend=b, **kw)
            for b in ("oracle", "xla", "pallas")}
    for b in ("xla", "pallas"):
        assert int(outs[b]["overflow"]) == 0
        np.testing.assert_allclose(np.asarray(outs[b]["rgb"]),
                                   np.asarray(outs["oracle"]["rgb"]),
                                   rtol=0, atol=2e-3)

    def loss(sh, backend):
        # f32 grad sort: SH-band parity at fp32 accumulation tolerance
        out = render(scene._replace(sh=sh), cam, backend=backend,
                     grad_sort="f32", **kw)
        return jnp.sum(out["rgb"] ** 2)

    g_x = jax.grad(loss)(scene.sh, "xla")
    g_p = jax.grad(loss)(scene.sh, "pallas")
    gx = np.asarray(g_x)
    gp = np.asarray(g_p)
    denom = max(np.abs(gx).max(), 1e-8)
    assert np.abs(gp - gx).max() / denom < 5e-3
    # the rest bands must actually receive gradient (not silently zero)
    if degree >= 1:
        assert np.abs(gx[:, 1:, :]).max() > 0
