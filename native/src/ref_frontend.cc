// Faithful CPU reference-equivalent of the FAST-LIO2-class front end —
// the measured baseline for bench.py's vs_baseline ratio.
//
// This is an independent C++ re-implementation of the reference front
// end's MATH (not its code): per-IMU-sample ESIKF forward propagation
// with full 23x23 covariance transport (reference:
// include/IKFoM_toolkit/esekfom/esekfom.hpp:280-402,
// src/IMU_Processing.hpp:239-333), backward point undistortion
// (IMU_Processing.hpp:334-386), voxel-grid scan downsample (the
// PCL VoxelGrid centroid of laserMapping.cpp:2322), an incremental map
// with downsample-on-insert keeping one point per voxel nearest the
// voxel center (the ikd-Tree Add_Points semantics, ikd_Tree.cpp:414),
// 5-NN + esti_plane + robust gating + the iterated dyn-share update
// (laserMapping.cpp:1876-2004, esekfom.hpp:1620-1938), and the moving
// FoV cube crop (laserMapping.cpp:1136-1200).
//
// Double precision throughout (the reference is f64), OpenMP
// parallel-for over scan points in h_share_model exactly where the
// reference parallelises (laserMapping.cpp:1883-1886).  The map is a
// flat voxel hash with 27-neighborhood search instead of a pointer
// k-d tree — the direction the reference's own README recommends as
// FASTER on CPU (README.md:266-267, Faster-LIO), so the scans/s this
// program measures is an upper bound on the reference's: using it as
// the baseline denominator is conservative.
//
// Input: a binary dump written by tools/bench_cpu_ref.py (the same
// synthetic sequence bench.py runs).  Output: one JSON line with
// steady-state scans/s and per-stage ms.
//
// Build: g++ -O3 -march=native -std=c++17 -fopenmp -o ref_frontend
//        ref_frontend.cc

#include <algorithm>
#include <array>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

using std::size_t;

// ---------------------------------------------------------------- vec/mat
struct V3 {
  double x = 0, y = 0, z = 0;
  double& operator[](int i) { return (&x)[i]; }
  double operator[](int i) const { return (&x)[i]; }
};
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
static inline V3 operator*(double s, V3 a) { return a * s; }
static inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline double norm(V3 a) { return std::sqrt(dot(a, a)); }

struct M3 {
  double m[3][3] = {{0}};
  static M3 eye() { M3 r; r.m[0][0] = r.m[1][1] = r.m[2][2] = 1; return r; }
};
static inline M3 operator*(const M3& a, const M3& b) {
  M3 r;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a.m[i][k] * b.m[k][j];
      r.m[i][j] = s;
    }
  return r;
}
static inline V3 operator*(const M3& a, V3 v) {
  return {a.m[0][0] * v.x + a.m[0][1] * v.y + a.m[0][2] * v.z,
          a.m[1][0] * v.x + a.m[1][1] * v.y + a.m[1][2] * v.z,
          a.m[2][0] * v.x + a.m[2][1] * v.y + a.m[2][2] * v.z};
}
static inline M3 transpose(const M3& a) {
  M3 r;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r.m[i][j] = a.m[j][i];
  return r;
}
static inline M3 hat(V3 v) {
  M3 r;
  r.m[0][1] = -v.z; r.m[0][2] = v.y;
  r.m[1][0] = v.z;  r.m[1][2] = -v.x;
  r.m[2][0] = -v.y; r.m[2][1] = v.x;
  return r;
}
static inline M3 scale(const M3& a, double s) {
  M3 r = a;
  for (int i = 0; i < 3; ++i) for (int j = 0; j < 3; ++j) r.m[i][j] *= s;
  return r;
}
static inline M3 add(const M3& a, const M3& b) {
  M3 r;
  for (int i = 0; i < 3; ++i) for (int j = 0; j < 3; ++j) r.m[i][j] = a.m[i][j] + b.m[i][j];
  return r;
}

// ------------------------------------------------------------------- SO3
struct Quat {  // [w, x, y, z]
  double w = 1, x = 0, y = 0, z = 0;
};
static inline Quat qmul(Quat a, Quat b) {
  return {a.w * b.w - a.x * b.x - a.y * b.y - a.z * b.z,
          a.w * b.x + a.x * b.w + a.y * b.z - a.z * b.y,
          a.w * b.y - a.x * b.z + a.y * b.w + a.z * b.x,
          a.w * b.z + a.x * b.y - a.y * b.x + a.z * b.w};
}
static inline Quat qconj(Quat q) { return {q.w, -q.x, -q.y, -q.z}; }
static inline Quat qnorm(Quat q) {
  double n = std::sqrt(q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z);
  return {q.w / n, q.x / n, q.y / n, q.z / n};
}
static inline Quat qexp(V3 v, double s = 1.0) {
  V3 u = v * s;
  double th = norm(u);
  if (th < 1e-12) return qnorm({1, 0.5 * u.x, 0.5 * u.y, 0.5 * u.z});
  double c = std::cos(0.5 * th), k = std::sin(0.5 * th) / th;
  return {c, k * u.x, k * u.y, k * u.z};
}
static inline V3 qlog(Quat q) {
  double vn = std::sqrt(q.x * q.x + q.y * q.y + q.z * q.z);
  if (vn < 1e-12) return {2 * q.x, 2 * q.y, 2 * q.z};
  double th = 2.0 * std::atan2(vn, q.w);
  return {q.x / vn * th, q.y / vn * th, q.z / vn * th};
}
static inline V3 qrot(Quat q, V3 v) {
  V3 u = {q.x, q.y, q.z};
  V3 t = cross(u, v) * 2.0;
  return v + t * q.w + cross(u, t);
}
static inline V3 qirot(Quat q, V3 v) { return qrot(qconj(q), v); }
static inline M3 qmat(Quat q) {
  M3 r;
  double w = q.w, x = q.x, y = q.y, z = q.z;
  r.m[0][0] = 1 - 2 * (y * y + z * z); r.m[0][1] = 2 * (x * y - w * z); r.m[0][2] = 2 * (x * z + w * y);
  r.m[1][0] = 2 * (x * y + w * z); r.m[1][1] = 1 - 2 * (x * x + z * z); r.m[1][2] = 2 * (y * z - w * x);
  r.m[2][0] = 2 * (x * z - w * y); r.m[2][1] = 2 * (y * z + w * x); r.m[2][2] = 1 - 2 * (x * x + y * y);
  return r;
}
static inline M3 so3_exp(V3 v) { return qmat(qexp(v)); }
// A(v): right-Jacobian-transpose map used by the MTK transport blocks.
static inline M3 Amat(V3 v) {
  double th = norm(v);
  M3 h = hat(v);
  if (th < 1e-8) return add(M3::eye(), scale(h, 0.5));
  double a = (1 - std::cos(th)) / (th * th);
  double b = (th - std::sin(th)) / (th * th * th);
  return add(M3::eye(), add(scale(h, a), scale(h * h, b)));
}

// -------------------------------------------------------------------- S2
static const double GRAV = 9.809;  // use-ikfom.hpp:8 (98090/10000)

// x-axis chart basis Bx (3x2), S2.hpp:216-233 semantics.
static inline void s2_bx(V3 g, double B[3][2]) {
  double den = g.x + GRAV;
  if (std::fabs(den) < 1e-7) {
    B[0][0] = 0; B[0][1] = 0;
    B[1][0] = 0; B[1][1] = -1;
    B[2][0] = 1; B[2][1] = 0;
    return;
  }
  B[0][0] = -g.y / GRAV;                      B[0][1] = -g.z / GRAV;
  B[1][0] = (GRAV - g.y * g.y / den) / GRAV;  B[1][1] = (-g.z * g.y / den) / GRAV;
  B[2][0] = (-g.z * g.y / den) / GRAV;        B[2][1] = (GRAV - g.z * g.z / den) / GRAV;
}
static inline V3 s2_boxplus(V3 g, double d0, double d1) {
  double B[3][2];
  s2_bx(g, B);
  V3 u = {B[0][0] * d0 + B[0][1] * d1, B[1][0] * d0 + B[1][1] * d1,
          B[2][0] * d0 + B[2][1] * d1};
  return qrot(qexp(u), g);
}
static inline void s2_boxminus(V3 a, V3 b, double out[2]) {
  double vs = norm(cross(a, b)), vc = dot(a, b);
  double th = std::atan2(vs, vc);
  double B[3][2];
  s2_bx(b, B);
  V3 hv = cross(b, a);
  double coeff = (vs < 1e-7) ? 1.0 / std::max(vc, 1e-7) : th / vs;
  out[0] = coeff * (B[0][0] * hv.x + B[1][0] * hv.y + B[2][0] * hv.z);
  out[1] = coeff * (B[0][1] * hv.x + B[1][1] * hv.y + B[2][1] * hv.z);
}
// Nx(g): 2x3 = (1/G^2) Bx^T hat(g)   (S2.hpp:252-257)
static inline void s2_nx(V3 g, double N[2][3]) {
  double B[3][2];
  s2_bx(g, B);
  M3 hg = hat(g);
  for (int j = 0; j < 2; ++j)
    for (int k = 0; k < 3; ++k) {
      double s = 0;
      for (int i = 0; i < 3; ++i) s += B[i][j] * hg.m[i][k];
      N[j][k] = s / (GRAV * GRAV);
    }
}
// Mx(g, delta): 3x2  (S2.hpp:259-279)
static inline void s2_mx(V3 g, double d0, double d1, double Mo[3][2]) {
  double B[3][2];
  s2_bx(g, B);
  double dd = d0 * d0 + d1 * d1;
  M3 hg = hat(g);
  if (dd < 1e-14) {
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 2; ++j) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += hg.m[i][k] * B[k][j];
        Mo[i][j] = -s;
      }
    return;
  }
  V3 Bu = {B[0][0] * d0 + B[0][1] * d1, B[1][0] * d0 + B[1][1] * d1,
           B[2][0] * d0 + B[2][1] * d1};
  M3 R = so3_exp(Bu);
  M3 At = transpose(Amat(Bu));
  M3 full = R * hg * At;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 2; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += full.m[i][k] * B[k][j];
      Mo[i][j] = -s;
    }
}

// ------------------------------------------------------------------ state
static const int ED = 23;  // error-state dim (use-ikfom.hpp layout)

struct State {
  V3 pos;
  Quat rot, off_r;
  V3 off_t, vel, bg, ba, grav;
};

using MatE = std::array<std::array<double, ED>, ED>;

static inline void mat_zero(MatE& A) { for (auto& r : A) r.fill(0); }
static inline void mat_eye(MatE& A) {
  mat_zero(A);
  for (int i = 0; i < ED; ++i) A[i][i] = 1;
}
static inline MatE mat_mul(const MatE& A, const MatE& B) {
  MatE R;
  for (int i = 0; i < ED; ++i)
    for (int j = 0; j < ED; ++j) {
      double s = 0;
      for (int k = 0; k < ED; ++k) s += A[i][k] * B[k][j];
      R[i][j] = s;
    }
  return R;
}
static inline MatE mat_mul_t(const MatE& A, const MatE& B) {  // A * B^T
  MatE R;
  for (int i = 0; i < ED; ++i)
    for (int j = 0; j < ED; ++j) {
      double s = 0;
      for (int k = 0; k < ED; ++k) s += A[i][k] * B[j][k];
      R[i][j] = s;
    }
  return R;
}

static State boxplus(const State& x, const double dx[ED]) {
  State r = x;
  r.pos = x.pos + V3{dx[0], dx[1], dx[2]};
  r.rot = qnorm(qmul(x.rot, qexp({dx[3], dx[4], dx[5]})));
  r.off_r = qnorm(qmul(x.off_r, qexp({dx[6], dx[7], dx[8]})));
  r.off_t = x.off_t + V3{dx[9], dx[10], dx[11]};
  r.vel = x.vel + V3{dx[12], dx[13], dx[14]};
  r.bg = x.bg + V3{dx[15], dx[16], dx[17]};
  r.ba = x.ba + V3{dx[18], dx[19], dx[20]};
  r.grav = s2_boxplus(x.grav, dx[21], dx[22]);
  return r;
}
static void boxminus(const State& a, const State& b, double out[ED]) {
  V3 dp = a.pos - b.pos;
  V3 dr = qlog(qmul(qconj(b.rot), a.rot));
  V3 de = qlog(qmul(qconj(b.off_r), a.off_r));
  V3 dt = a.off_t - b.off_t, dv = a.vel - b.vel, dg = a.bg - b.bg,
     da = a.ba - b.ba;
  double g2[2];
  s2_boxminus(a.grav, b.grav, g2);
  double tmp[ED] = {dp.x, dp.y, dp.z, dr.x, dr.y, dr.z, de.x, de.y, de.z,
                    dt.x, dt.y, dt.z, dv.x, dv.y, dv.z, dg.x, dg.y, dg.z,
                    da.x, da.y, da.z, g2[0], g2[1]};
  std::memcpy(out, tmp, sizeof(tmp));
}

// one ESIKF forward step: mean + 23x23 covariance (esekfom.hpp:280-402)
static void predict(State& x, MatE& P, V3 acc, V3 gyr, double dt,
                    const double Qd[12]) {
  V3 omega = gyr - x.bg;
  V3 a_in = qrot(x.rot, acc - x.ba) + x.grav;
  State xn = x;
  xn.pos = x.pos + x.vel * dt;
  xn.rot = qnorm(qmul(x.rot, qexp(omega, dt)));
  xn.vel = x.vel + a_in * dt;

  // F_x = F_x1 (manifold transport) + dt * (manifold-projected df/dx)
  MatE F;
  mat_eye(F);
  V3 seg_rot = omega * (-dt);
  M3 Er = so3_exp(seg_rot);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) F[3 + i][3 + j] = Er.m[i][j];
  // S2 block: Nx(g_new) Exp(0) Mx(g, 0) = Nx * Mx (gravity derivative 0)
  double Nx[2][3], Mx[3][2];
  s2_nx(xn.grav, Nx);
  s2_mx(x.grav, 0, 0, Mx);
  for (int i = 0; i < 2; ++i)
    for (int j = 0; j < 2; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += Nx[i][k] * Mx[k][j];
      F[21 + i][21 + j] = s;
    }
  // flat df/dx rows projected: pos row += dt*I on vel cols; rot rows
  // (premultiplied by A(seg_rot)) += -dt*A on bg cols; vel rows:
  // -dt R hat(acc-ba) on rot cols, -dt R on ba cols, dt Mx on grav cols.
  M3 A_r = Amat(seg_rot);
  M3 R = qmat(x.rot);
  M3 Rha = R * hat(acc - x.ba);
  for (int i = 0; i < 3; ++i) {
    F[i][12 + i] += dt;
    for (int j = 0; j < 3; ++j) {
      F[3 + i][15 + j] += -dt * A_r.m[i][j];
      F[12 + i][3 + j] += -dt * Rha.m[i][j];
      F[12 + i][18 + j] += -dt * R.m[i][j];
    }
    for (int j = 0; j < 2; ++j) F[12 + i][21 + j] += dt * Mx[i][j];
  }

  // P <- F P F^T + Fw Q Fw^T with Fw rows: rot<-ng (-dt A_r), vel<-na
  // (-dt R), bg<-nbg (dt I), ba<-nba (dt I).
  P = mat_mul_t(mat_mul(F, P), F);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double sng = 0, sna = 0;
      for (int k = 0; k < 3; ++k) {
        sng += A_r.m[i][k] * Qd[k] * A_r.m[j][k];
        sna += R.m[i][k] * Qd[3 + k] * R.m[j][k];
      }
      P[3 + i][3 + j] += dt * dt * sng;
      P[12 + i][12 + j] += dt * dt * sna;
    }
  for (int i = 0; i < 3; ++i) {
    P[15 + i][15 + i] += dt * dt * Qd[6 + i];
    P[18 + i][18 + i] += dt * dt * Qd[9 + i];
  }
  x = xn;
}

// Cholesky solve of A X = B for symmetric positive definite A (n x n).
static bool chol_solve(MatE A, double* B, int ncols) {
  // in-place LL^T
  for (int i = 0; i < ED; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = A[i][j];
      for (int k = 0; k < j; ++k) s -= A[i][k] * A[j][k];
      if (i == j) {
        if (s <= 0) return false;
        A[i][i] = std::sqrt(s);
      } else {
        A[i][j] = s / A[j][j];
      }
    }
  }
  for (int c = 0; c < ncols; ++c) {
    double* b = B + c * ED;
    for (int i = 0; i < ED; ++i) {
      double s = b[i];
      for (int k = 0; k < i; ++k) s -= A[i][k] * b[k];
      b[i] = s / A[i][i];
    }
    for (int i = ED - 1; i >= 0; --i) {
      double s = b[i];
      for (int k = i + 1; k < ED; ++k) s -= A[k][i] * b[k];
      b[i] = s / A[i][i];
    }
  }
  return true;
}

// ------------------------------------------------------------------- map
struct VoxelKey {
  int32_t i, j, k;
  bool operator==(const VoxelKey& o) const {
    return i == o.i && j == o.j && k == o.k;
  }
};
struct VoxelKeyHash {
  size_t operator()(const VoxelKey& v) const {
    return ((size_t)(uint32_t)(v.i * 73856093) ^
            (size_t)(uint32_t)(v.j * 19349669) ^
            (size_t)(uint32_t)(v.k * 83492791));
  }
};
struct MapPoint {
  V3 p;
  double d2c;  // squared distance to voxel center (downsample-on-insert)
};
using VoxMap = std::unordered_map<VoxelKey, MapPoint, VoxelKeyHash>;

static inline VoxelKey vox_of(V3 p, double vs) {
  return {(int32_t)std::floor(p.x / vs), (int32_t)std::floor(p.y / vs),
          (int32_t)std::floor(p.z / vs)};
}

// 5-NN over the 27-cell neighborhood (Nearest_Search analog).
static int knn5(const VoxMap& map, double vs, V3 q, V3 out[5],
                double d2[5]) {
  int cnt = 0;
  VoxelKey c = vox_of(q, vs);
  for (int di = -1; di <= 1; ++di)
    for (int dj = -1; dj <= 1; ++dj)
      for (int dk = -1; dk <= 1; ++dk) {
        auto it = map.find({c.i + di, c.j + dj, c.k + dk});
        if (it == map.end()) continue;
        V3 p = it->second.p;
        V3 d = p - q;
        double dd = dot(d, d);
        if (cnt < 5) {
          int pos = cnt++;
          while (pos > 0 && d2[pos - 1] > dd) {
            d2[pos] = d2[pos - 1]; out[pos] = out[pos - 1]; --pos;
          }
          d2[pos] = dd; out[pos] = p;
        } else if (dd < d2[4]) {
          int pos = 4;
          while (pos > 0 && d2[pos - 1] > dd) {
            d2[pos] = d2[pos - 1]; out[pos] = out[pos - 1]; --pos;
          }
          d2[pos] = dd; out[pos] = p;
        }
      }
  return cnt;
}

// esti_plane (common_lib.h:507-536): solve 5x3 A n = -1, normalize,
// check inlier residuals <= 0.1.
static bool esti_plane(const V3 nb[5], V3& n_out, double& d_out) {
  double AtA[3][3] = {{0}}, Atb[3] = {0};
  for (int r = 0; r < 5; ++r) {
    double row[3] = {nb[r].x, nb[r].y, nb[r].z};
    for (int i = 0; i < 3; ++i) {
      for (int j = 0; j < 3; ++j) AtA[i][j] += row[i] * row[j];
      Atb[i] += row[i] * (-1.0);
    }
  }
  // 3x3 solve (Cramer)
  double det = AtA[0][0] * (AtA[1][1] * AtA[2][2] - AtA[1][2] * AtA[2][1]) -
               AtA[0][1] * (AtA[1][0] * AtA[2][2] - AtA[1][2] * AtA[2][0]) +
               AtA[0][2] * (AtA[1][0] * AtA[2][1] - AtA[1][1] * AtA[2][0]);
  if (std::fabs(det) < 1e-12) return false;
  auto solve_col = [&](int c) {
    double M[3][3];
    std::memcpy(M, AtA, sizeof(M));
    for (int i = 0; i < 3; ++i) M[i][c] = Atb[i];
    return (M[0][0] * (M[1][1] * M[2][2] - M[1][2] * M[2][1]) -
            M[0][1] * (M[1][0] * M[2][2] - M[1][2] * M[2][0]) +
            M[0][2] * (M[1][0] * M[2][1] - M[1][1] * M[2][0])) /
           det;
  };
  V3 nv = {solve_col(0), solve_col(1), solve_col(2)};
  double nn = norm(nv);
  if (nn < 1e-12) return false;
  V3 n = nv * (1.0 / nn);
  double d = 1.0 / nn;
  for (int r = 0; r < 5; ++r)
    if (std::fabs(dot(n, nb[r]) + d) > 0.1) return false;
  n_out = n;
  d_out = d;
  return true;
}

// --------------------------------------------------------------- pipeline
struct Scan {
  std::vector<V3> pts;
  std::vector<double> pt_t;
  std::vector<V3> acc, gyr;
  std::vector<double> imu_t;
  double scan_end_t;
};

struct Pose6D {
  double t;
  V3 pos, vel, acc_w, gyr_b;
  Quat rot;
};

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: ref_frontend dump.bin [n_threads]\n");
    return 1;
  }
  int nthreads = 0;
#ifdef _OPENMP
  if (argc > 2) {
    nthreads = std::atoi(argv[2]);
    if (nthreads > 0) omp_set_num_threads(nthreads);
  }
  nthreads = nthreads > 0 ? nthreads : omp_get_max_threads();
#else
  nthreads = 1;
#endif

  FILE* f = std::fopen(argv[1], "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }
  int32_t n_scans = 0;
  if (std::fread(&n_scans, 4, 1, f) != 1) return 1;
  std::vector<Scan> scans((size_t)n_scans);
  for (auto& s : scans) {
    int32_t np, nm;
    if (std::fread(&np, 4, 1, f) != 1) return 1;
    std::vector<float> buf((size_t)np * 4);
    if (std::fread(buf.data(), 4, buf.size(), f) != buf.size()) return 1;
    s.pts.resize(np);
    s.pt_t.resize(np);
    for (int i = 0; i < np; ++i) {
      s.pts[i] = {buf[3 * i], buf[3 * i + 1], buf[3 * i + 2]};
      s.pt_t[i] = buf[3 * (size_t)np + i];
    }
    if (std::fread(&nm, 4, 1, f) != 1) return 1;
    std::vector<float> ib((size_t)nm * 7);
    if (std::fread(ib.data(), 4, ib.size(), f) != ib.size()) return 1;
    s.acc.resize(nm); s.gyr.resize(nm); s.imu_t.resize(nm);
    for (int i = 0; i < nm; ++i) {
      s.acc[i] = {ib[3 * i], ib[3 * i + 1], ib[3 * i + 2]};
      s.gyr[i] = {ib[3 * (size_t)nm + 3 * i], ib[3 * (size_t)nm + 3 * i + 1],
                  ib[3 * (size_t)nm + 3 * i + 2]};
      s.imu_t[i] = ib[6 * (size_t)nm + i];
    }
    float dur;
    if (std::fread(&dur, 4, 1, f) != 1) return 1;
    s.scan_end_t = dur;
  }
  std::fclose(f);

  // ---- config (mirrors bench.py) ----------------------------------------
  const double surf_leaf = 0.5, map_voxel = 0.5;
  const double det_range = 60.0, cube_len = 400.0, MOV_THR = 1.5;
  const int max_iter = 4;
  const double R_meas = 0.001, limit = 0.001;
  // process noise diag [ng, na, nbg, nba] from the MappingConfig defaults
  // (gyr_cov=acc_cov=0.1, b_*_cov=1e-4), matching the pipeline's build_Q
  const double Qd[12] = {0.1, 0.1, 0.1, 0.1, 0.1, 0.1,
                         1e-4, 1e-4, 1e-4, 1e-4, 1e-4, 1e-4};

  // ---- IMU static init (IMU_Processing.hpp:174-233) ----------------------
  State x;
  MatE P;
  mat_eye(P);
  for (int i = 6; i < 12; ++i) P[i][i] = 1e-5;
  for (int i = 15; i < 18; ++i) P[i][i] = 1e-4;
  for (int i = 18; i < 21; ++i) P[i][i] = 1e-3;
  P[21][21] = P[22][22] = 1e-5;

  size_t init_scan = 0, n_init = 0;
  V3 mean_acc{}, mean_gyr{};
  while (init_scan < scans.size() && n_init <= 10) {
    for (size_t i = 0; i < scans[init_scan].acc.size(); ++i) {
      mean_acc = mean_acc + scans[init_scan].acc[i];
      mean_gyr = mean_gyr + scans[init_scan].gyr[i];
      ++n_init;
    }
    ++init_scan;
  }
  mean_acc = mean_acc * (1.0 / (double)n_init);
  mean_gyr = mean_gyr * (1.0 / (double)n_init);
  double acc_norm = norm(mean_acc);
  x.grav = mean_acc * (-GRAV / acc_norm);
  x.bg = mean_gyr;
  double g_scale = GRAV / acc_norm;

  VoxMap map;
  map.reserve(1 << 20);
  V3 cube_lo{}, cube_hi{};
  bool cube_init = false, ekf_inited = false;
  double last_scan_end_rel = 0.0;
  V3 last_acc_w{}, last_gyr_b{};

  double t_imu = 0, t_ds = 0, t_upd = 0, t_ins = 0, t_crop = 0;
  std::vector<double> scan_times;
  V3 final_pos{};

  using clk = std::chrono::steady_clock;
  for (size_t si = init_scan; si < scans.size(); ++si) {
    const Scan& s = scans[si];
    auto T0 = clk::now();

    // ---- forward propagation + Pose6D record -----------------------------
    std::vector<Pose6D> poses;
    poses.push_back({0.0, x.pos, x.vel, last_acc_w, last_gyr_b, x.rot});
    for (size_t i = 0; i + 1 < s.imu_t.size(); ++i) {
      V3 acc_avr = (s.acc[i] + s.acc[i + 1]) * (0.5 * g_scale);
      V3 gyr_avr = (s.gyr[i] + s.gyr[i + 1]) * 0.5;
      double t0 = std::max(s.imu_t[i], last_scan_end_rel);
      double dt = std::max(s.imu_t[i + 1] - t0, 0.0);
      predict(x, P, acc_avr, gyr_avr, dt, Qd);
      V3 gyr_b = gyr_avr - x.bg;
      V3 acc_w = qrot(x.rot, acc_avr - x.ba) + x.grav;
      poses.push_back({s.imu_t[i + 1], x.pos, x.vel, acc_w, gyr_b, x.rot});
      last_acc_w = acc_w;
      last_gyr_b = gyr_b;
    }
    {  // final hop to scan end
      size_t n = s.imu_t.size();
      V3 acc_avr = (s.acc[n - 2] + s.acc[n - 1]) * (0.5 * g_scale);
      V3 gyr_avr = (s.gyr[n - 2] + s.gyr[n - 1]) * 0.5;
      double dt = std::max(s.scan_end_t - s.imu_t.back(), 0.0);
      predict(x, P, acc_avr, gyr_avr, dt, Qd);
    }
    State x_prop = x;
    MatE P_prop = P;

    // ---- backward undistortion (IMU_Processing.hpp:334-386) ---------------
    size_t npts = s.pts.size();
    std::vector<V3> pts_body(npts);
#pragma omp parallel for schedule(static)
    for (long i = 0; i < (long)npts; ++i) {
      double pt = s.pt_t[i];
      size_t k = poses.size() - 1;
      while (k > 0 && poses[k].t > pt) --k;
      if (k + 1 >= poses.size()) k = poses.size() - 2;
      const Pose6D& h = poses[k];
      const Pose6D& tl = poses[k + 1];
      double dt = std::max(pt - h.t, 0.0);
      Quat q_i = qmul(h.rot, qexp(tl.gyr_b, dt));
      V3 p_imu = qrot(x_prop.off_r, s.pts[i]) + x_prop.off_t;
      V3 p_w = qrot(q_i, p_imu) + h.pos + h.vel * dt + tl.acc_w * (0.5 * dt * dt);
      V3 p_imu_e = qirot(x_prop.rot, p_w - x_prop.pos);
      pts_body[i] = qirot(x_prop.off_r, p_imu_e - x_prop.off_t);
    }
    auto T1 = clk::now();

    // ---- moving FoV cube (laserMapping.cpp:1136-1200) ---------------------
    V3 pos_lid = x_prop.pos + qrot(x_prop.rot, x_prop.off_t);
    if (!cube_init) {
      cube_lo = pos_lid - V3{cube_len / 2, cube_len / 2, cube_len / 2};
      cube_hi = pos_lid + V3{cube_len / 2, cube_len / 2, cube_len / 2};
      cube_init = true;
    } else {
      bool moved = false;
      V3 shift{};
      for (int a = 0; a < 3; ++a) {
        double dlo = std::fabs(pos_lid[a] - cube_lo[a]);
        double dhi = std::fabs(cube_hi[a] - pos_lid[a]);
        double mov = std::max((cube_len - 2 * MOV_THR * det_range) * 0.45,
                              det_range * (MOV_THR - 1.0));
        if (dlo <= MOV_THR * det_range) { shift[a] = -mov; moved = true; }
        else if (dhi <= MOV_THR * det_range) { shift[a] = mov; moved = true; }
      }
      if (moved) {
        cube_lo = cube_lo + shift;
        cube_hi = cube_hi + shift;
        for (auto it = map.begin(); it != map.end();) {
          V3 c = {(it->first.i + 0.5) * map_voxel, (it->first.j + 0.5) * map_voxel,
                  (it->first.k + 0.5) * map_voxel};
          bool out = false;
          for (int a = 0; a < 3; ++a)
            if (c[a] < cube_lo[a] || c[a] >= cube_hi[a]) out = true;
          it = out ? map.erase(it) : ++it;
        }
      }
    }
    auto T2 = clk::now();

    // ---- scan voxel downsample (VoxelGrid centroid) ------------------------
    std::unordered_map<VoxelKey, std::pair<V3, int>, VoxelKeyHash> cells;
    cells.reserve(npts);
    for (size_t i = 0; i < npts; ++i) {
      VoxelKey k = vox_of(pts_body[i], surf_leaf);
      auto& e = cells[k];
      e.first = e.first + pts_body[i];
      e.second += 1;
    }
    std::vector<V3> ds;
    ds.reserve(cells.size());
    for (auto& kv : cells) ds.push_back(kv.second.first * (1.0 / kv.second.second));
    auto T3 = clk::now();

    // ---- iterated ESIKF point-to-plane update ------------------------------
    // Per the reference h_share_model: the 5-NN search runs only when
    // dyn_share.converge, but the plane is REFIT from the cached
    // neighbors and the robust gate re-evaluated on EVERY call
    // (laserMapping.cpp:1903-1938).
    size_t nds = ds.size();
    std::vector<std::array<V3, 5>> nbrs(nds);
    std::vector<uint8_t> nn_ok(nds, 0), sel(nds, 0);
    std::vector<V3> nrm(nds);
    std::vector<double> resid(nds);
    if (ekf_inited && nds >= 5) {
      int t_conv = 0;
      bool converge = true;
      for (int it = 0; it <= max_iter; ++it) {
#pragma omp parallel for schedule(static)
        for (long i = 0; i < (long)nds; ++i) {
          V3 p_imu = qrot(x.off_r, ds[i]) + x.off_t;
          V3 p_w = qrot(x.rot, p_imu) + x.pos;
          if (converge) {  // re-associate (reference: dyn_share.converge)
            double d2[5];
            int cnt = knn5(map, map_voxel, p_w, nbrs[i].data(), d2);
            nn_ok[i] = (cnt == 5 && d2[4] <= 5.0) ? 1 : 0;
          }
          sel[i] = 0;
          if (!nn_ok[i]) continue;
          V3 n;
          double dpl;
          if (!esti_plane(nbrs[i].data(), n, dpl)) continue;
          double pd2 = dot(n, p_w) + dpl;
          double srob = 1.0 - 0.9 * std::fabs(pd2) /
                                  std::sqrt(std::max(norm(ds[i]), 1e-8));
          if (srob > 0.9) {
            sel[i] = 1;
            nrm[i] = n;
            resid[i] = pd2;
          }
        }
        // build HTH (12x12), HTh with omp reduction
        double HTH[144] = {0}, HTh[12] = {0};
        long n_eff = 0;
#pragma omp parallel
        {
          double lH[144] = {0}, lb[12] = {0};
          long ln = 0;
#pragma omp for schedule(static) nowait
          for (long i = 0; i < (long)nds; ++i) {
            if (!sel[i]) continue;
            V3 n = nrm[i];
            V3 p_imu = qrot(x.off_r, ds[i]) + x.off_t;
            V3 C = qirot(x.rot, n);
            V3 A = cross(p_imu, C);
            double row[12] = {n.x, n.y, n.z, A.x, A.y, A.z, 0, 0, 0, 0, 0, 0};
            double h = -resid[i];
            for (int a = 0; a < 12; ++a) {
              for (int b = 0; b < 12; ++b) lH[a * 12 + b] += row[a] * row[b];
              lb[a] += row[a] * h;
            }
            ++ln;
          }
#pragma omp critical
          {
            for (int a = 0; a < 144; ++a) HTH[a] += lH[a];
            for (int a = 0; a < 12; ++a) HTh[a] += lb[a];
            n_eff += ln;
          }
        }
        if (n_eff < 1) break;

        // gain: dx_ = K_h + (K_x - I) dx  (esekfom.hpp:1788-1823)
        double dx[ED];
        boxminus(x, x_prop, dx);
        // transport P through the tangent map of dx (esekfom.hpp:1662-1703)
        MatE T;
        mat_eye(T);
        M3 Ar = transpose(Amat({dx[3], dx[4], dx[5]}));
        M3 Ae = transpose(Amat({dx[6], dx[7], dx[8]}));
        for (int i = 0; i < 3; ++i)
          for (int j = 0; j < 3; ++j) {
            T[3 + i][3 + j] = Ar.m[i][j];
            T[6 + i][6 + j] = Ae.m[i][j];
          }
        double Nx[2][3], Mx[3][2];
        s2_nx(x.grav, Nx);
        s2_mx(x_prop.grav, dx[21], dx[22], Mx);
        for (int i = 0; i < 2; ++i)
          for (int j = 0; j < 2; ++j) {
            double ssum = 0;
            for (int k = 0; k < 3; ++k) ssum += Nx[i][k] * Mx[k][j];
            T[21 + i][21 + j] = ssum;
          }
        MatE Pt = mat_mul_t(mat_mul(T, P_prop), T);
        double dxn[ED];
        for (int i = 0; i < ED; ++i) {
          double ssum = 0;
          for (int j = 0; j < ED; ++j) ssum += T[i][j] * dx[j];
          dxn[i] = ssum;
        }
        // A = HTH_ext + R * Pt^{-1}; solve via: Pinv = chol_solve(Pt, I)
        MatE Pinv;
        mat_eye(Pinv);
        {
          MatE Pc = Pt;
          // symmetrize
          for (int i = 0; i < ED; ++i)
            for (int j = 0; j < i; ++j) {
              double m = 0.5 * (Pc[i][j] + Pc[j][i]);
              Pc[i][j] = Pc[j][i] = m;
            }
          static thread_local std::vector<double> Ibuf(ED * ED);
          for (int c = 0; c < ED; ++c)
            for (int r = 0; r < ED; ++r) Ibuf[c * ED + r] = (r == c) ? 1.0 : 0.0;
          if (!chol_solve(Pc, Ibuf.data(), ED)) break;
          for (int c = 0; c < ED; ++c)
            for (int r = 0; r < ED; ++r) Pinv[r][c] = Ibuf[c * ED + r];
        }
        MatE Amat23;
        for (int i = 0; i < ED; ++i)
          for (int j = 0; j < ED; ++j) Amat23[i][j] = R_meas * Pinv[i][j];
        for (int i = 0; i < 12; ++i)
          for (int j = 0; j < 12; ++j) Amat23[i][j] += HTH[i * 12 + j];
        // solve A [K_h | K_xcols] : rhs1 = HTh (padded), rhs2 = HTH columns
        std::vector<double> rhs(ED * 13, 0.0);
        for (int i = 0; i < 12; ++i) rhs[i] = HTh[i];
        for (int c = 0; c < 12; ++c)
          for (int r = 0; r < 12; ++r) rhs[(1 + c) * ED + r] = HTH[r * 12 + c];
        {
          MatE Ac = Amat23;
          for (int i = 0; i < ED; ++i)
            for (int j = 0; j < i; ++j) {
              double m = 0.5 * (Ac[i][j] + Ac[j][i]);
              Ac[i][j] = Ac[j][i] = m;
            }
          if (!chol_solve(Ac, rhs.data(), 13)) break;
        }
        double dx_[ED];
        for (int i = 0; i < ED; ++i) {
          double kx_dx = 0;
          for (int c = 0; c < 12; ++c) {
            // K_x(:,c) = A^{-1}(:,0:12) HTH(:,c) — precomputed in rhs cols
            kx_dx += rhs[(1 + c) * ED + i] * dxn[c];
          }
          dx_[i] = rhs[i] + kx_dx - dxn[i];
        }
        x = boxplus(x, dx_);
        bool conv = true;
        for (int i = 0; i < ED; ++i)
          if (std::fabs(dx_[i]) >= limit) { conv = false; break; }
        converge = conv;
        if (conv) ++t_conv;
        if (t_conv == 0 && it == max_iter - 1) converge = true;  // forced pass
        if (t_conv > 1 || it == max_iter) {
          // final covariance P = L - K_x P (esekfom.hpp:1841-1931): here
          // K_x = A^{-1} HTH_ext; compute P <- (I - K_x) Pt row-block.
          MatE KX;
          mat_zero(KX);
          for (int i = 0; i < ED; ++i)
            for (int c = 0; c < 12; ++c) KX[i][c] = rhs[(1 + c) * ED + i];
          MatE IK;
          mat_eye(IK);
          for (int i = 0; i < ED; ++i)
            for (int j = 0; j < ED; ++j) IK[i][j] -= KX[i][j];
          P = mat_mul(IK, Pt);
          break;
        }
      }
    }
    ekf_inited = true;
    auto T4 = clk::now();

    // ---- map incremental insert (ikd-Tree Add_Points semantics) -----------
    for (size_t i = 0; i < nds; ++i) {
      V3 p_imu = qrot(x.off_r, ds[i]) + x.off_t;
      V3 p_w = qrot(x.rot, p_imu) + x.pos;
      VoxelKey k = vox_of(p_w, map_voxel);
      V3 c = {(k.i + 0.5) * map_voxel, (k.j + 0.5) * map_voxel,
              (k.k + 0.5) * map_voxel};
      V3 dc = p_w - c;
      double d2c = dot(dc, dc);
      auto it = map.find(k);
      if (it == map.end()) {
        map.emplace(k, MapPoint{p_w, d2c});
      } else if (d2c < it->second.d2c) {
        it->second = MapPoint{p_w, d2c};  // keep nearest-to-center
      }
    }
    auto T5 = clk::now();

    last_scan_end_rel = 0.0;  // times are per-scan relative
    final_pos = x.pos;
    double ms = [](auto a, auto b) {
      return std::chrono::duration<double, std::milli>(b - a).count();
    }(T0, T5);
    scan_times.push_back(ms);
    t_imu += std::chrono::duration<double, std::milli>(T1 - T0).count();
    t_crop += std::chrono::duration<double, std::milli>(T2 - T1).count();
    t_ds += std::chrono::duration<double, std::milli>(T3 - T2).count();
    t_upd += std::chrono::duration<double, std::milli>(T4 - T3).count();
    t_ins += std::chrono::duration<double, std::milli>(T5 - T4).count();
  }

  // steady-state: drop the first 20 scans (map growth burst)
  size_t skip = std::min<size_t>(20, scan_times.size() / 2);
  std::vector<double> steady(scan_times.begin() + skip, scan_times.end());
  std::sort(steady.begin(), steady.end());
  double med = steady.empty() ? 0 : steady[steady.size() / 2];
  double n = (double)scan_times.size();
  std::printf(
      "{\"metric\": \"cpu_ref_scans_per_sec\", \"value\": %.2f, "
      "\"unit\": \"scans/s\", \"threads\": %d, \"median_ms\": %.2f, "
      "\"imu_ms\": %.2f, \"crop_ms\": %.2f, \"downsample_ms\": %.2f, "
      "\"update_ms\": %.2f, \"insert_ms\": %.2f, "
      "\"map_voxels\": %zu, \"end_pos\": [%.3f, %.3f, %.3f]}\n",
      med > 0 ? 1000.0 / med : 0.0, nthreads, med, t_imu / n, t_crop / n,
      t_ds / n, t_upd / n, t_ins / n, map.size(), final_pos.x, final_pos.y,
      final_pos.z);
  return 0;
}
