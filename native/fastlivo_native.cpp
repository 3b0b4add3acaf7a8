// Native host-side kernels for the TPU LIVO engine.
//
// The reference implements its host hot loops in C++ (per-point decode in
// src/preprocess.cpp, PCL voxel-grid + PCD I/O). The TPU engine keeps the
// per-frame *filter* math on-device; these are the host-side equivalents
// for ingestion and offline tooling, exposed as a C ABI for ctypes:
//
//   flv_decode_strided   — strided field extraction + blind/decimation
//                          filtering from raw PointCloud2-style buffers
//                          (generic core of the per-vendor handlers,
//                          reference preprocess.cpp:95-744)
//   flv_voxel_downsample — centroid voxel-grid downsample (replaces
//                          pcl::VoxelGrid for host-side tooling like the
//                          PCD exporter's filter_size_pcd path)
//   flv_undistort_check  — reference CPU implementation of the per-point
//                          backward undistortion (used by tests to
//                          cross-check the device kernel)
//
// Build: `make -C native` -> native/libfastlivo_native.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

extern "C" {

// Extract x/y/z (float32 at byte offsets) and an optional per-point time
// field from a raw strided point buffer; apply blind-radius rejection and
// 1-in-N decimation. time_mode: 0 = none, 1 = float32 seconds,
// 2 = float64 seconds, 3 = uint32 nanoseconds. Returns number of points
// written to out_xyz (3*n_out floats) / out_t (n_out floats).
int flv_decode_strided(const uint8_t* data, int64_t n, int32_t stride,
                       int32_t off_x, int32_t off_y, int32_t off_z,
                       int32_t off_t, int32_t time_mode, float blind,
                       int32_t filter_num, float time_scale,
                       float* out_xyz, float* out_t) {
  const float blind2 = blind * blind;
  int64_t kept = 0, seen = 0;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = data + i * stride;
    float x, y, z;
    std::memcpy(&x, p + off_x, 4);
    std::memcpy(&y, p + off_y, 4);
    std::memcpy(&z, p + off_z, 4);
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    if (x * x + y * y + z * z <= blind2) continue;
    if (filter_num > 1 && (seen++ % filter_num) != 0) continue;
    double t = 0.0;
    switch (time_mode) {
      case 1: { float v; std::memcpy(&v, p + off_t, 4); t = v; break; }
      case 2: { double v; std::memcpy(&v, p + off_t, 8); t = v; break; }
      case 3: { uint32_t v; std::memcpy(&v, p + off_t, 4); t = v * 1e-9; break; }
      default: break;
    }
    out_xyz[kept * 3 + 0] = x;
    out_xyz[kept * 3 + 1] = y;
    out_xyz[kept * 3 + 2] = z;
    out_t[kept] = static_cast<float>(t * time_scale);
    ++kept;
  }
  return static_cast<int>(kept);
}

struct KeyHash {
  size_t operator()(int64_t k) const {
    return static_cast<size_t>(k * 0x9E3779B97F4A7C15ULL);
  }
};

// Centroid voxel-grid downsample. Returns number of output points.
int flv_voxel_downsample(const float* xyz, int64_t n, float leaf,
                         float* out_xyz, int64_t max_out) {
  std::unordered_map<int64_t, std::pair<int32_t, int64_t>, KeyHash> cells;
  cells.reserve(static_cast<size_t>(n));
  std::vector<double> sums;
  sums.reserve(static_cast<size_t>(n) * 3);
  const double inv = 1.0 / leaf;
  int32_t n_cells = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t kx = static_cast<int64_t>(std::floor(xyz[i * 3 + 0] * inv));
    const int64_t ky = static_cast<int64_t>(std::floor(xyz[i * 3 + 1] * inv));
    const int64_t kz = static_cast<int64_t>(std::floor(xyz[i * 3 + 2] * inv));
    const int64_t key = (kx * 73856093LL) ^ (ky * 19349669LL) ^ (kz * 83492791LL)
                        ^ ((kx + 341) << 40) ^ ((ky + 569) << 20) ^ (kz + 769);
    auto it = cells.find(key);
    if (it == cells.end()) {
      if (n_cells >= max_out) continue;
      cells.emplace(key, std::make_pair(n_cells, 1));
      sums.push_back(xyz[i * 3 + 0]);
      sums.push_back(xyz[i * 3 + 1]);
      sums.push_back(xyz[i * 3 + 2]);
      ++n_cells;
    } else {
      it->second.second += 1;
      const int32_t c = it->second.first;
      sums[c * 3 + 0] += xyz[i * 3 + 0];
      sums[c * 3 + 1] += xyz[i * 3 + 1];
      sums[c * 3 + 2] += xyz[i * 3 + 2];
    }
  }
  std::vector<int64_t> counts(n_cells, 0);
  for (auto& kv : cells) counts[kv.second.first] = kv.second.second;
  for (int32_t c = 0; c < n_cells; ++c) {
    out_xyz[c * 3 + 0] = static_cast<float>(sums[c * 3 + 0] / counts[c]);
    out_xyz[c * 3 + 1] = static_cast<float>(sums[c * 3 + 1] / counts[c]);
    out_xyz[c * 3 + 2] = static_cast<float>(sums[c * 3 + 2] / counts[c]);
  }
  return n_cells;
}

static void exp_so3(const double w[3], double R[9]) {
  const double th = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
  double K[9] = {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
  double a = 1.0, b = 0.5;
  if (th > 1e-12) {
    a = std::sin(th) / th;
    b = (1.0 - std::cos(th)) / (th * th);
  }
  double K2[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += K[i * 3 + k] * K[k * 3 + j];
      K2[i * 3 + j] = s;
    }
  for (int i = 0; i < 9; ++i)
    R[i] = (i % 4 == 0 ? 1.0 : 0.0) + a * K[i] + b * K2[i];
}

// Float64 oracle of the per-point backward undistortion
// (IMU_Processing.cpp:494-539 semantics with interval-own rates, matching
// fast_livo2_tpu.core.imu.undistort). Segments: K intervals with start
// offsets seg_t0, end offsets seg_t1, pose (R row-major, p, v), rates
// (acc world, gyr).
void flv_undistort_check(const float* pts, const float* t_offs, int64_t n,
                         const double* seg_t0, const double* seg_t1,
                         const double* seg_R, const double* seg_p,
                         const double* seg_v, const double* seg_a,
                         const double* seg_w, int32_t n_seg,
                         const double* R_end, const double* p_end,
                         const double* ext_R, const double* ext_T,
                         float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const double t = t_offs[i];
    int s = 0;
    while (s < n_seg - 1 && t > seg_t1[s]) ++s;
    const double dt = t - seg_t0[s] > 0 ? t - seg_t0[s] : 0.0;
    double w[3] = {seg_w[s * 3] * dt, seg_w[s * 3 + 1] * dt, seg_w[s * 3 + 2] * dt};
    double dR[9];
    exp_so3(w, dR);
    double Ri[9];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double acc = 0;
        for (int k = 0; k < 3; ++k) acc += seg_R[s * 9 + r * 3 + k] * dR[k * 3 + c];
        Ri[r * 3 + c] = acc;
      }
    double Tei[3];
    for (int r = 0; r < 3; ++r)
      Tei[r] = seg_p[s * 3 + r] + seg_v[s * 3 + r] * dt +
               0.5 * seg_a[s * 3 + r] * dt * dt - p_end[r];
    // p_imu = extR p + extT
    double pi[3];
    for (int r = 0; r < 3; ++r) {
      pi[r] = ext_T[r];
      for (int k = 0; k < 3; ++k) pi[r] += ext_R[r * 3 + k] * pts[i * 3 + k];
    }
    double pw[3];
    for (int r = 0; r < 3; ++r) {
      pw[r] = Tei[r];
      for (int k = 0; k < 3; ++k) pw[r] += Ri[r * 3 + k] * pi[k];
    }
    // R_end^T pw
    double pe[3];
    for (int r = 0; r < 3; ++r) {
      pe[r] = 0;
      for (int k = 0; k < 3; ++k) pe[r] += R_end[k * 3 + r] * pw[k];
    }
    // extR^T (pe - extT)
    for (int r = 0; r < 3; ++r) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += ext_R[k * 3 + r] * (pe[k] - ext_T[k]);
      out[i * 3 + r] = static_cast<float>(acc);
    }
  }
}

}  // extern "C"
