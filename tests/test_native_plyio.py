"""Native compressed-PLY decoder vs the pure-Python oracle, + file roundtrip."""

import numpy as np
import pytest

from sage3d_tpu.utils import plyio_native as pn


def make_compressed_arrays(n=1024, seed=0, with_color_range=True):
    """Synthesize valid (chunk_data, packed) pairs."""
    rng = np.random.default_rng(seed)
    n_chunks = -(-n // 256)
    cf = 18 if with_color_range else 12
    chunk = np.zeros((n_chunks, cf), np.float32)
    chunk[:, 0:3] = rng.uniform(-5, 0, (n_chunks, 3))       # pos min
    chunk[:, 3:6] = chunk[:, 0:3] + rng.uniform(1, 5, (n_chunks, 3))
    chunk[:, 6:9] = rng.uniform(-6, -3, (n_chunks, 3))      # log-scale min
    chunk[:, 9:12] = chunk[:, 6:9] + rng.uniform(0.5, 2, (n_chunks, 3))
    if with_color_range:
        chunk[:, 12:15] = 0.0
        chunk[:, 15:18] = 1.0

    def pack(bits, vals):
        out = np.zeros(n, np.uint32)
        shift = 32
        for b, v in zip(bits, vals):
            shift -= b
            q = np.round(v * ((1 << b) - 1)).astype(np.uint32)
            out |= q << shift
        return out

    u = rng.uniform(size=(n, 3))
    packed_pos = pack([11, 10, 11], [u[:, 0], u[:, 1], u[:, 2]])
    us = rng.uniform(size=(n, 3))
    packed_scale = pack([11, 10, 11], [us[:, 0], us[:, 1], us[:, 2]])
    largest = rng.integers(0, 4, n).astype(np.uint32)
    qc = rng.uniform(0.2, 0.8, (n, 3))
    q10 = np.round(qc * 1023).astype(np.uint32)
    packed_rot = (largest << 30) | (q10[:, 0] << 20) | (q10[:, 1] << 10) \
        | q10[:, 2]
    uc = rng.uniform(size=(n, 4))
    packed_col = pack([8, 8, 8, 8], [uc[:, 0], uc[:, 1], uc[:, 2], uc[:, 3]])
    packed = np.stack([packed_pos, packed_rot, packed_scale, packed_col],
                      axis=1).astype(np.uint32)
    return chunk, packed


@pytest.mark.skipif(not pn.native_available(), reason="native lib not built")
@pytest.mark.parametrize("with_color", [True, False])
def test_native_matches_python(with_color):
    chunk, packed = make_compressed_arrays(n=2048, with_color_range=with_color)
    d_native = pn.decode_compressed(chunk, packed, use_native=True)
    d_python = pn.decode_compressed(chunk, packed, use_native=False)
    for key in d_native:
        np.testing.assert_allclose(d_native[key], d_python[key], atol=1e-5,
                                   err_msg=key)
    # quaternions are (approximately) unit
    norms = np.linalg.norm(d_native["quats"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)


def write_compressed_ply(path, chunk, packed, sh_rest=None):
    n_chunks, cf = chunk.shape
    n = packed.shape[0]
    chunk_names = ["min_x", "min_y", "min_z", "max_x", "max_y", "max_z",
                   "min_scale_x", "min_scale_y", "min_scale_z",
                   "max_scale_x", "max_scale_y", "max_scale_z",
                   "min_r", "min_g", "min_b", "max_r", "max_g", "max_b"][:cf]
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element chunk {n_chunks}\n".encode())
        for nm in chunk_names:
            f.write(f"property float {nm}\n".encode())
        f.write(f"element vertex {n}\n".encode())
        for nm in ("packed_position", "packed_rotation", "packed_scale",
                   "packed_color"):
            f.write(f"property uint {nm}\n".encode())
        if sh_rest is not None:
            f.write(f"element sh {n}\n".encode())
            for j in range(sh_rest.shape[1]):
                f.write(f"property uchar f_rest_{j}\n".encode())
        f.write(b"end_header\n")
        f.write(np.ascontiguousarray(chunk, np.float32).tobytes())
        f.write(np.ascontiguousarray(packed, np.uint32).tobytes())
        if sh_rest is not None:
            f.write(np.ascontiguousarray(sh_rest, np.uint8).tobytes())


def test_load_compressed_ply_file(tmp_path):
    chunk, packed = make_compressed_arrays(n=512)
    p = tmp_path / "scene_compressed.ply"
    write_compressed_ply(p, chunk, packed)
    scene = pn.load_compressed_ply(p)
    assert scene.num_gaussians == 512
    means = np.asarray(scene.means)
    # decoded positions live inside the chunk ranges
    assert means[:, 0].min() >= chunk[:, 0].min() - 1e-4
    assert means[:, 0].max() <= chunk[:, 3].max() + 1e-4
    # and the scene renders
    from sage3d_tpu.renderer.camera import make_camera
    from sage3d_tpu.renderer.render import render
    cam = make_camera(position=[0, -8, 1], forward=[0, 1, 0], width=32,
                      height=32)
    out = render(scene, cam, backend="xla")
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_extract_columns_native():
    if not pn.native_available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(0)
    n, stride = 1000, 28
    blob = rng.integers(0, 255, n * stride, dtype=np.uint8)
    ref = np.frombuffer(blob.tobytes(), dtype=np.uint8).reshape(n, stride)
    out = pn.extract_columns_native(np.ascontiguousarray(blob), n, stride,
                                    [0, 8, 20])
    assert out is not None
    for i, off in enumerate([0, 8, 20]):
        expected = ref[:, off:off + 4].copy().view(np.float32).ravel()
        np.testing.assert_array_equal(out[i], expected)


def test_decode_sh_bands_native_matches_python():
    rng = np.random.default_rng(4)
    rest = rng.integers(0, 256, (777, 45), dtype=np.uint8)
    a = pn.decode_sh_bands(rest, use_native=True)
    b = pn.decode_sh_bands(rest, use_native=False)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    # dequantization range and endpoints: 0 -> -4, 255 -> +4
    assert a.min() >= -4.0 - 1e-5 and a.max() <= 4.0 + 1e-5
    np.testing.assert_allclose(
        pn.decode_sh_bands(np.array([[0, 255]], np.uint8))[0], [-4.0, 4.0],
        atol=1e-6)


def test_load_compressed_ply_with_sh_element(tmp_path):
    """SH3 compressed file: 45 uint8 f_rest columns -> (n, 16, 3) sh."""
    chunk, packed = make_compressed_arrays(n=512)
    rng = np.random.default_rng(7)
    rest = rng.integers(0, 256, (512, 45), dtype=np.uint8)
    p = tmp_path / "scene_sh3_compressed.ply"
    write_compressed_ply(p, chunk, packed, sh_rest=rest)
    scene = pn.load_compressed_ply(p)
    assert scene.sh.shape == (512, 16, 3)
    assert scene.sh_degree == 3
    # channel-major layout: f_rest_0..14 are the RED band coefficients
    want_red_band0 = rest[:, 0].astype(np.float32) * (8.0 / 255.0) - 4.0
    np.testing.assert_allclose(np.asarray(scene.sh[:, 1, 0]), want_red_band0,
                               atol=1e-6)
    want_green_band0 = rest[:, 15].astype(np.float32) * (8.0 / 255.0) - 4.0
    np.testing.assert_allclose(np.asarray(scene.sh[:, 1, 1]),
                               want_green_band0, atol=1e-6)
    # and it renders with view-dependent color
    from sage3d_tpu.renderer.camera import make_camera
    from sage3d_tpu.renderer.render import render
    cam = make_camera(position=[0, -8, 1], forward=[0, 1, 0], width=32,
                      height=32)
    out = render(scene, cam, backend="xla")
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_validate_compressed_ply(tmp_path):
    """The validate-ply audit tool passes on a well-formed file and pinpoints
    a corrupted one (swapped chunk bounds)."""
    from sage3d_tpu.utils.ply_validate import validate_compressed_ply

    chunk, packed = make_compressed_arrays(n=700)
    rest = (np.arange(700 * 9, dtype=np.int64) % 256).astype(np.uint8)
    rest = rest.reshape(700, 9)
    p = tmp_path / "3dgs_compressed.ply"
    write_compressed_ply(p, chunk, packed, sh_rest=rest)
    report = validate_compressed_ply(p)
    assert report["ok"], [c for c in report["checks"] if not c["ok"]]
    assert report["n_vertices"] == 700 and report["n_chunks"] == 3

    bad = chunk.copy()
    bad[:, 0:3], bad[:, 3:6] = chunk[:, 3:6], chunk[:, 0:3]  # min/max swapped
    p2 = tmp_path / "bad.ply"
    write_compressed_ply(p2, bad, packed)
    report2 = validate_compressed_ply(p2)
    assert not report2["ok"]
    failed = {c["check"] for c in report2["checks"] if not c["ok"]}
    assert "chunk.bounds_ordered" in failed


# ---------------------------------------------------------------------------
# Third-party-writer authentication (VERDICT r4 #6): the decoder is validated
# against a port of the PlayCanvas splat-transform COMPRESSION algorithm
# (tests/splat_transform_port.py) operating on raw attributes — NOT against
# this file's write_compressed_ply, which only proves a self round-trip.
# ---------------------------------------------------------------------------

def _canon_quat_wxyz(q):
    """Both sides of q/-q represent one rotation; canonicalize like the
    writer does (largest |component| in xyzw order made positive)."""
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    xyzw = q[:, [1, 2, 3, 0]]
    largest = np.argmax(np.abs(xyzw), axis=1)
    sign = np.where(xyzw[np.arange(len(q)), largest] < 0, -1.0, 1.0)
    return q * sign[:, None]


def test_decoder_against_splat_transform_port(tmp_path):
    from splat_transform_port import write_compressed_ply_splat_transform
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = synthetic_room(3000, seed=11, sh_degree=3)
    n = scene.num_gaussians
    rng = np.random.default_rng(5)
    means = np.asarray(scene.means)
    log_scales = np.asarray(scene.log_scales)
    quats = np.asarray(scene.quats)
    # random sign flips: the writer must canonicalize, the decoder must
    # reproduce the same rotation regardless
    quats = quats * np.where(rng.random(n) < 0.5, -1.0, 1.0)[:, None]
    opac = np.clip(np.asarray(scene.opacity_logits), -5.0, 5.0)
    sh = np.clip(np.asarray(scene.sh), -3.9, 3.9)

    p = tmp_path / "3dgs_compressed.ply"
    order = write_compressed_ply_splat_transform(p, means, log_scales, quats,
                                                 opac, sh)
    dec = pn.load_compressed_ply(p)
    assert dec.num_gaussians == n

    got_means = np.asarray(dec.means)
    # per-splat position tolerance: the chunk range / 2^bits (y has 10 bits)
    chunk_lo = got_means.reshape(-1)  # placeholder; recompute from chunks
    ci = np.arange(n) // 256
    exp_means = means[order]
    ranges = np.stack([
        np.ptp(exp_means[ci == c], axis=0) for c in range(ci.max() + 1)])[ci]
    tol = ranges / np.array([2047.0, 1023.0, 2047.0]) + 1e-5
    assert np.all(np.abs(got_means - exp_means) <= tol), (
        f"worst pos err {np.abs(got_means - exp_means).max():.2e}")

    exp_ls = log_scales[order]
    ls_rng = np.stack([
        np.ptp(exp_ls[ci == c], axis=0) for c in range(ci.max() + 1)])[ci]
    ls_tol = ls_rng / np.array([2047.0, 1023.0, 2047.0]) + 1e-5
    assert np.all(np.abs(np.asarray(dec.log_scales) - exp_ls) <= ls_tol)

    got_q = _canon_quat_wxyz(np.asarray(dec.quats))
    exp_q = _canon_quat_wxyz(quats[order])
    # q and -q are one rotation; near-tied largest components may flip the
    # canonical sign across the 10-bit lattice, so compare both signs
    err = np.minimum(np.abs(got_q - exp_q).max(axis=1),
                     np.abs(got_q + exp_q).max(axis=1))
    assert np.max(err) < 2.5e-3   # 10-bit quat lattice

    got_alpha = 1 / (1 + np.exp(-np.asarray(dec.opacity_logits)))
    exp_alpha = 1 / (1 + np.exp(-opac[order]))
    assert np.max(np.abs(got_alpha - exp_alpha)) <= 0.5 / 255 + 1e-6

    # SH: band 0 through the per-chunk color bounds (8-bit), bands 1+
    # through the global [-4, 4] 8-bit lattice
    got_sh = np.asarray(dec.sh)
    exp_sh = sh[order]
    assert got_sh.shape == exp_sh.shape
    col_rng = np.stack([
        np.ptp(0.5 + exp_sh[ci == c, 0, :] * 0.2820948, axis=0)
        for c in range(ci.max() + 1)])[ci]
    dc_tol = (col_rng / 255.0 + 2e-5) / 0.2820948
    assert np.all(np.abs(got_sh[:, 0, :] - exp_sh[:, 0, :]) <= dc_tol)
    assert np.max(np.abs(got_sh[:, 1:, :] - exp_sh[:, 1:, :])) \
        <= 0.5 * 8 / 255 + 1e-6

    # the full assumption ledger passes on the third-party-format file
    from sage3d_tpu.utils.ply_validate import validate_compressed_ply
    report = validate_compressed_ply(p)
    failed = [c for c in report["checks"]
              if not c["ok"] and c["check"] != "native_vs_python"]
    assert report["n_vertices"] == n and not failed, failed

    # and it renders
    from sage3d_tpu.renderer.camera import make_camera
    from sage3d_tpu.renderer.render import render
    cam = make_camera(position=[0, -8, 1], forward=[0, 1, 0], width=64,
                      height=48)
    out = render(dec, cam, backend="xla")
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_splat_transform_port_morton_locality():
    """The Morton reorder groups spatial neighbours: chunk AABBs must be far
    smaller than the scene AABB (this is what makes 11-bit positions usable
    on real scenes — and what the repo's own writer never exercised)."""
    from splat_transform_port import morton_order
    from sage3d_tpu.renderer.scene import synthetic_room

    scene = synthetic_room(20000, seed=3)
    means = np.asarray(scene.means)
    order = morton_order(means)
    m = means[order]
    ci = np.arange(len(m)) // 256
    diag = []
    for c in range(ci.max() + 1):
        pts = m[ci == c]
        diag.append(np.linalg.norm(pts.max(0) - pts.min(0)))
    scene_diag = np.linalg.norm(means.max(0) - means.min(0))
    assert np.median(diag) < 0.35 * scene_diag
