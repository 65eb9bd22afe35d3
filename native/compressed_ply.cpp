// Native decoder for PlayCanvas compressed 3DGS PLY ("3dgs_compressed.ply").
//
// TPU-native replacement for the reference's splat-transform dependency
// (SAGE-3D README.md:194-243 requires the Node.js tool to decompress
// InteriorGS scenes before 3DGRUT conversion). This is the framework's
// host-side native IO path: bit-unpacking 1M+ Gaussians is pure integer work
// that belongs in C++, not in the JAX graph.
//
// Format (PlayCanvas SuperSplat / splat-transform "compressed-ply"):
//   element chunk  N/256 rows of float32 min/max ranges:
//     min_x,min_y,min_z, max_x,max_y,max_z,
//     min_scale_x..z, max_scale_x..z,
//     [min_r,min_g,min_b, max_r,max_g,max_b]   (optional color ranges)
//   element vertex N rows of uint32:
//     packed_position: 11/10/11 bits (x, y, z) within the chunk range
//     packed_rotation: 2 bits largest-component index + 3x10 bits of the
//                      remaining components scaled to [-1/sqrt(2), 1/sqrt(2)]
//     packed_scale:    11/10/11 bits log-scale within chunk range
//     packed_color:    8/8/8/8 RGBA; rgb in chunk range (or [0,1]) mapped to
//                      SH DC via (c - 0.5)/SH_C0; alpha -> opacity logit
//
// Exposed as a C ABI for ctypes; the Python wrapper (utils/plyio_native.py)
// owns file IO and header parsing, this code only transforms buffers.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr float kSHC0 = 0.28209479177387814f;
constexpr float kSqrt2Inv = 0.70710678118654752f;

inline float unpack_unorm(uint32_t value, int bits) {
  const uint32_t t = (1u << bits) - 1u;
  return static_cast<float>(value & t) / static_cast<float>(t);
}

inline float lerp(float a, float b, float t) { return a + (b - a) * t; }

inline float inv_sigmoid(float y) {
  const float e = 1e-6f;
  y = y < e ? e : (y > 1.f - e ? 1.f - e : y);
  return std::log(y / (1.f - y));
}

}  // namespace

extern "C" {

// Decode packed vertices into struct-of-arrays outputs.
//   chunk_data: [n_chunks, chunk_floats] float32 (chunk_floats = 12 or 18)
//   packed:     [n, 4] uint32 (position, rotation, scale, color)
// Outputs (caller-allocated):
//   means[n,3], log_scales[n,3], quats[n,4] (w,x,y,z),
//   opacity_logits[n], sh_dc[n,3]
// Returns 0 on success.
int sage3d_decode_compressed_ply(
    const float* chunk_data, int64_t n_chunks, int chunk_floats,
    const uint32_t* packed, int64_t n,
    float* means, float* log_scales, float* quats, float* opacity_logits,
    float* sh_dc) {
  if (chunk_floats != 12 && chunk_floats != 18) return 1;
  const bool has_color_range = chunk_floats == 18;

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t ci = i / 256;
    if (ci >= n_chunks) continue;
    const float* c = chunk_data + ci * chunk_floats;

    const uint32_t p = packed[i * 4 + 0];
    const uint32_t r = packed[i * 4 + 1];
    const uint32_t s = packed[i * 4 + 2];
    const uint32_t col = packed[i * 4 + 3];

    // position: 11/10/11
    means[i * 3 + 0] = lerp(c[0], c[3], unpack_unorm(p >> 21, 11));
    means[i * 3 + 1] = lerp(c[1], c[4], unpack_unorm(p >> 11, 10));
    means[i * 3 + 2] = lerp(c[2], c[5], unpack_unorm(p, 11));

    // scale: 11/10/11 (already log-space in the chunk ranges)
    log_scales[i * 3 + 0] = lerp(c[6], c[9], unpack_unorm(s >> 21, 11));
    log_scales[i * 3 + 1] = lerp(c[7], c[10], unpack_unorm(s >> 11, 10));
    log_scales[i * 3 + 2] = lerp(c[8], c[11], unpack_unorm(s, 11));

    // rotation: 2-bit largest index + 3x10-bit components
    const uint32_t largest = r >> 30;
    float a = (unpack_unorm(r >> 20, 10) - 0.5f) * 2.f * kSqrt2Inv;
    float b = (unpack_unorm(r >> 10, 10) - 0.5f) * 2.f * kSqrt2Inv;
    float d = (unpack_unorm(r, 10) - 0.5f) * 2.f * kSqrt2Inv;
    float m = std::sqrt(std::fmax(0.f, 1.f - (a * a + b * b + d * d)));
    float q[4];  // (x, y, z, w) slots filled around the largest component
    switch (largest) {
      case 0: q[0] = m; q[1] = a; q[2] = b; q[3] = d; break;
      case 1: q[0] = a; q[1] = m; q[2] = b; q[3] = d; break;
      case 2: q[0] = a; q[1] = b; q[2] = m; q[3] = d; break;
      default: q[0] = a; q[1] = b; q[2] = d; q[3] = m; break;
    }
    // stored order is (x, y, z, w); emit (w, x, y, z)
    quats[i * 4 + 0] = q[3];
    quats[i * 4 + 1] = q[0];
    quats[i * 4 + 2] = q[1];
    quats[i * 4 + 3] = q[2];

    // color: 8888 RGBA
    float cr = unpack_unorm(col >> 24, 8);
    float cg = unpack_unorm(col >> 16, 8);
    float cb = unpack_unorm(col >> 8, 8);
    const float ca = unpack_unorm(col, 8);
    if (has_color_range) {
      cr = lerp(c[12], c[15], cr);
      cg = lerp(c[13], c[16], cg);
      cb = lerp(c[14], c[17], cb);
    }
    sh_dc[i * 3 + 0] = (cr - 0.5f) / kSHC0;
    sh_dc[i * 3 + 1] = (cg - 0.5f) / kSHC0;
    sh_dc[i * 3 + 2] = (cb - 0.5f) / kSHC0;
    opacity_logits[i] = inv_sigmoid(ca);
  }
  return 0;
}

// Decode the optional compressed SH element: N rows of `n_rest` uint8
// properties f_rest_0..f_rest_{n_rest-1} (channel-major like uncompressed
// PLY: the first n_rest/3 belong to R, then G, then B). Dequantization is
// the PlayCanvas/SuperSplat convention: byte -> (b / 255) * 8 - 4, the
// uniform [-4, 4) range splat-transform writes. NOTE: this follows the
// public compressed-ply spec; verify against a real InteriorGS
// 3dgs_compressed.ply carrying SH when one is available (SURVEY §2.2).
int sage3d_decode_sh_bands(
    const uint8_t* rest, int64_t n, int n_rest, float* out) {
  const float scale = 8.f / 255.f;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* row = rest + i * n_rest;
    float* orow = out + i * n_rest;
    for (int j = 0; j < n_rest; ++j) {
      orow[j] = static_cast<float>(row[j]) * scale - 4.f;
    }
  }
  return 0;
}

// Fast strided extraction of named float32 properties from an uncompressed
// binary-little-endian PLY vertex blob (the hot part of loading 1M-Gaussian
// scenes): gathers `n_props` interleaved columns into contiguous outputs.
int sage3d_extract_columns(
    const uint8_t* blob, int64_t n, int64_t stride,
    const int64_t* offsets, int n_props, float* out /* [n_props][n] */) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* row = blob + i * stride;
    for (int p = 0; p < n_props; ++p) {
      float v;
      std::memcpy(&v, row + offsets[p], sizeof(float));
      out[static_cast<int64_t>(p) * n + i] = v;
    }
  }
  return 0;
}

}  // extern "C"
