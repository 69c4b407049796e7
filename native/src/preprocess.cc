// Native host-side point-cloud runtime: per-vendor decode, culling,
// time synthesis, and binary PCD I/O.
//
// TPU-native re-design of the reference's C++ preprocessing layer
// (reference: src/preprocess.cpp — the [NATIVE-CORE] ingest path of
// SURVEY.md §2.1).  The device (JAX/XLA) owns all numerical SLAM work;
// this library owns the byte-level host work that feeds it: decoding
// vendor formats into packed arrays, blind-range culling, stride
// subsampling, per-point time synthesis, and session-directory PCD I/O.
// Exposed as a C ABI for ctypes (no pybind11 in the toolchain).
//
// All functions are allocation-free: callers pass pre-sized output
// buffers and receive the written count.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Velodyne/Ouster-style decode: xyz(+intensity) float32 rows.
//   in:   xyzi  (n, stride_floats) raw rows, first 3 floats = x,y,z
//   out:  pts (m,3) f32, t_off (m) f64, inten (m) f32; returns m.
// Per-point time: if t_in != nullptr, scaled by time_scale and shifted to
// start at 0; otherwise synthesised from azimuth assuming clockwise
// rotation over scan_period (velodyne_handler, preprocess.cpp:329-391).
// blind-range cull on ||p|| (preprocess.cpp:195-199) and stride
// subsampling by point_filter_num (:188).
// ---------------------------------------------------------------------------
int64_t decode_xyzi(
    const float* xyzi, int64_t n, int stride_floats,
    const double* t_in, double time_scale, double scan_period,
    double blind, int point_filter_num,
    float* pts_out, double* t_out, float* inten_out) {
  const double blind2 = blind * blind;
  double yaw0 = 0.0;
  bool have_yaw0 = false;
  double t_min = 0.0;
  bool have_tmin = false;
  if (t_in) {
    for (int64_t i = 0; i < n; ++i) {
      if (!have_tmin || t_in[i] < t_min) {
        t_min = t_in[i];
        have_tmin = true;
      }
    }
  }
  int64_t m = 0;
  for (int64_t i = 0; i < n; i += point_filter_num) {
    const float* r = xyzi + i * stride_floats;
    const float x = r[0], y = r[1], z = r[2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    const double d2 = (double)x * x + (double)y * y + (double)z * z;
    if (d2 <= blind2) continue;
    double toff;
    if (t_in) {
      toff = (t_in[i] - t_min) * time_scale;
    } else {
      const double yaw = std::atan2((double)y, (double)x) * 57.29577951308232;
      if (!have_yaw0) {
        yaw0 = yaw;
        have_yaw0 = true;
      }
      double rel = yaw0 - yaw;  // clockwise sweep
      rel -= std::floor(rel / 360.0) * 360.0;
      toff = rel / 360.0 * scan_period;
    }
    pts_out[m * 3 + 0] = x;
    pts_out[m * 3 + 1] = y;
    pts_out[m * 3 + 2] = z;
    t_out[m] = toff;
    inten_out[m] = stride_floats > 3 ? r[3] : 0.0f;
    ++m;
  }
  return m;
}

// ---------------------------------------------------------------------------
// Livox decode: tag-filtered returns ((tag & 0x30) in {0x00, 0x10},
// preprocess.cpp:191), offset_time in ns.
// ---------------------------------------------------------------------------
int64_t decode_livox(
    const float* xyz, const float* inten, const uint8_t* tag,
    const int64_t* offset_ns, int64_t n, double blind, int point_filter_num,
    float* pts_out, double* t_out, float* inten_out) {
  const double blind2 = blind * blind;
  int64_t m = 0;
  for (int64_t i = 0; i < n; i += point_filter_num) {
    const int ret = tag[i] & 0x30;
    if (ret != 0x00 && ret != 0x10) continue;
    const float x = xyz[i * 3], y = xyz[i * 3 + 1], z = xyz[i * 3 + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    const double d2 = (double)x * x + (double)y * y + (double)z * z;
    if (d2 <= blind2) continue;
    pts_out[m * 3 + 0] = x;
    pts_out[m * 3 + 1] = y;
    pts_out[m * 3 + 2] = z;
    t_out[m] = offset_ns[i] * 1e-9;
    inten_out[m] = inten ? inten[i] : 0.0f;
    ++m;
  }
  return m;
}

// ---------------------------------------------------------------------------
// NCLT velodyne_sync record decode: 8-byte packed points —
// x,y,z uint16 (v*0.005 - 100 m), intensity u8, ring u8.
// ---------------------------------------------------------------------------
int64_t decode_nclt(const uint8_t* raw, int64_t nbytes, float* pts_out,
                    float* inten_out) {
  const int64_t n = nbytes / 8;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* r = raw + i * 8;
    uint16_t ux, uy, uz;
    std::memcpy(&ux, r + 0, 2);
    std::memcpy(&uy, r + 2, 2);
    std::memcpy(&uz, r + 4, 2);
    pts_out[i * 3 + 0] = ux * 0.005f - 100.0f;
    pts_out[i * 3 + 1] = uy * 0.005f - 100.0f;
    pts_out[i * 3 + 2] = uz * 0.005f - 100.0f;
    inten_out[i] = (float)r[6];
  }
  return n;
}

// ---------------------------------------------------------------------------
// Binary PCD v0.7 writer (x y z intensity, F32) — the session-directory
// format (laserMapping.cpp:2494-2554).  Returns 0 on success.
// ---------------------------------------------------------------------------
int write_pcd_xyzi(const char* path, const float* xyz, const float* inten,
                   int64_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f,
               "# .PCD v0.7 - Point Cloud Data file format\n"
               "VERSION 0.7\n"
               "FIELDS x y z intensity\n"
               "SIZE 4 4 4 4\n"
               "TYPE F F F F\n"
               "COUNT 1 1 1 1\n"
               "WIDTH %lld\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
               "POINTS %lld\nDATA binary\n",
               (long long)n, (long long)n);
  for (int64_t i = 0; i < n; ++i) {
    float row[4] = {xyz[i * 3], xyz[i * 3 + 1], xyz[i * 3 + 2],
                    inten ? inten[i] : 0.0f};
    if (std::fwrite(row, sizeof(float), 4, f) != 4) {
      std::fclose(f);
      return -2;
    }
  }
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Voxel-grid downsample (centroid per voxel) — host fallback of the
// device op (pcl::VoxelGrid analog) for preprocessing outside jit.
// Uses open addressing over a caller-sized hash table.
//   table_keys: (cap) int64 scratch (filled with -1 by callee)
//   table_vals: (cap*4) double scratch (sums + count)
// Returns number of output points written to out (<= cap).
// ---------------------------------------------------------------------------
int64_t voxel_downsample(const float* pts, int64_t n, double voxel,
                         int64_t* table_keys, double* table_acc, int64_t cap,
                         float* out) {
  for (int64_t i = 0; i < cap; ++i) table_keys[i] = -1;
  std::memset(table_acc, 0, sizeof(double) * cap * 4);
  const int64_t mask = cap - 1;
  for (int64_t i = 0; i < n; ++i) {
    const float x = pts[i * 3], y = pts[i * 3 + 1], z = pts[i * 3 + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    const int64_t ix = (int64_t)std::floor(x / voxel);
    const int64_t iy = (int64_t)std::floor(y / voxel);
    const int64_t iz = (int64_t)std::floor(z / voxel);
    const int64_t key =
        ((ix & 0x1FFFFF) << 42) | ((iy & 0x1FFFFF) << 21) | (iz & 0x1FFFFF);
    int64_t h = (ix * 73856093 ^ iy * 19349669 ^ iz * 83492791) & mask;
    for (int64_t probe = 0; probe < cap; ++probe) {
      const int64_t s = (h + probe) & mask;
      if (table_keys[s] == key) {
        table_acc[s * 4 + 0] += x;
        table_acc[s * 4 + 1] += y;
        table_acc[s * 4 + 2] += z;
        table_acc[s * 4 + 3] += 1.0;
        break;
      }
      if (table_keys[s] == -1) {
        table_keys[s] = key;
        table_acc[s * 4 + 0] = x;
        table_acc[s * 4 + 1] = y;
        table_acc[s * 4 + 2] = z;
        table_acc[s * 4 + 3] = 1.0;
        break;
      }
    }
  }
  int64_t m = 0;
  for (int64_t s = 0; s < cap; ++s) {
    if (table_keys[s] == -1) continue;
    const double c = table_acc[s * 4 + 3];
    out[m * 3 + 0] = (float)(table_acc[s * 4 + 0] / c);
    out[m * 3 + 1] = (float)(table_acc[s * 4 + 1] / c);
    out[m * 3 + 2] = (float)(table_acc[s * 4 + 2] / c);
    ++m;
  }
  return m;
}

// ---------------------------------------------------------------------------
// Quantized wire-format packer (QuantWindowInputs bulk row): points as
// int16 steps of pos_scale, per-point times as uint16 fractions of the
// scan duration.  The per-scan host hot path of the windowed pipeline.
//   pts: (n_raw, 3) f32 (zero-padded), t: (n_raw) f32
//   bulk: (4 * n_raw) uint16 out — [0, 3n): point bits, [3n, 4n): time
// ---------------------------------------------------------------------------
void pack_quant(const float* pts, const float* t, int64_t n_raw,
                double pos_scale, double dur, uint16_t* bulk) {
  const double inv_ps = 1.0 / pos_scale;
  const double inv_dur = 65535.0 / (dur > 1e-9 ? dur : 1e-9);
  int16_t* pb = reinterpret_cast<int16_t*>(bulk);
  for (int64_t i = 0; i < n_raw * 3; ++i) {
    double q = std::nearbyint((double)pts[i] * inv_ps);
    if (q > 32767.0) q = 32767.0;
    if (q < -32767.0) q = -32767.0;
    pb[i] = (int16_t)q;
  }
  uint16_t* tb = bulk + 3 * n_raw;
  for (int64_t i = 0; i < n_raw; ++i) {
    double q = std::nearbyint((double)t[i] * inv_dur);
    if (q > 65535.0) q = 65535.0;
    if (q < 0.0) q = 0.0;
    tb[i] = (uint16_t)q;
  }
}

// v2 wire format: per-point times as uint8 scan-duration fractions,
// packed in pairs (lo | hi << 8) — bulk is (3.5 * n_raw) uint16.
// 0.39 ms steps at 10 Hz, below the position quantization's effect on
// the undistortion; 12.5% fewer wire bytes (the remote link is within
// ~20% of the compute rate).  n_raw must be even (shape pads are powers
// of two).
void pack_quant2(const float* pts, const float* t, int64_t n_raw,
                 double pos_scale, double dur, uint16_t* bulk) {
  const double inv_ps = 1.0 / pos_scale;
  const double inv_dur = 255.0 / (dur > 1e-9 ? dur : 1e-9);
  int16_t* pb = reinterpret_cast<int16_t*>(bulk);
  for (int64_t i = 0; i < n_raw * 3; ++i) {
    double q = std::nearbyint((double)pts[i] * inv_ps);
    if (q > 32767.0) q = 32767.0;
    if (q < -32767.0) q = -32767.0;
    pb[i] = (int16_t)q;
  }
  uint16_t* tb = bulk + 3 * n_raw;
  for (int64_t i = 0; i < n_raw / 2; ++i) {
    double qa = std::nearbyint((double)t[2 * i] * inv_dur);
    double qb = std::nearbyint((double)t[2 * i + 1] * inv_dur);
    if (qa > 255.0) qa = 255.0;
    if (qa < 0.0) qa = 0.0;
    if (qb > 255.0) qb = 255.0;
    if (qb < 0.0) qb = 0.0;
    tb[i] = (uint16_t)((uint16_t)qa | ((uint16_t)qb << 8));
  }
}

}  // extern "C"
