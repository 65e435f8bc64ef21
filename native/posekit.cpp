// posekit — self-contained C++ robust two-view geometry library.
//
// TPU-native framework's replacement for the reference's native dependencies:
//   * poselib.estimate_relative_pose (reference modules/eval/megadepth1500.py:98-113,
//     scannet1500.py:52-66): 5-point Nistér essential matrix inside LO-RANSAC
//     (MSAC scoring, local optimization by non-minimal linear refit on
//     inliers + projection to the essential manifold), then cheirality-based
//     pose recovery.
//   * cv2.findHomography(USAC_MAGSAC) (reference realtime_demo.py:225):
//     4-point DLT homography inside LO-RANSAC.
//
// No external dependencies: small dense linear algebra (Jacobi eigen for
// symmetric matrices, Gauss-Jordan, Hessenberg + shifted QR for the 10x10
// action-matrix eigenvalues) is implemented here. The 5-point solver builds
// the ten cubic constraints numerically with an explicit monomial algebra
// (no hard-coded Maple output) and extracts solutions from the action matrix
// of multiplication-by-x on the quotient-ring basis.
//
// C ABI at the bottom; Python binds via ctypes (accelerated_features_tpu/geometry).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace pk {

// ----------------------------------------------------------------- basics

struct V3 { double x, y, z; };
struct M3 { double m[9]; };  // row-major

static inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline double dot(const V3& a, const V3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline V3 matv(const M3& A, const V3& v) {
  return {A.m[0] * v.x + A.m[1] * v.y + A.m[2] * v.z,
          A.m[3] * v.x + A.m[4] * v.y + A.m[5] * v.z,
          A.m[6] * v.x + A.m[7] * v.y + A.m[8] * v.z};
}
static inline V3 matTv(const M3& A, const V3& v) {
  return {A.m[0] * v.x + A.m[3] * v.y + A.m[6] * v.z,
          A.m[1] * v.x + A.m[4] * v.y + A.m[7] * v.z,
          A.m[2] * v.x + A.m[5] * v.y + A.m[8] * v.z};
}
static inline M3 matmul(const M3& A, const M3& B) {
  M3 C{};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += A.m[i * 3 + k] * B.m[k * 3 + j];
      C.m[i * 3 + j] = s;
    }
  return C;
}
static inline M3 transpose(const M3& A) {
  M3 T{};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) T.m[i * 3 + j] = A.m[j * 3 + i];
  return T;
}

// Jacobi eigendecomposition of a symmetric n x n matrix (row-major).
// On return: A's eigenvalues in w (ascending), eigenvectors in columns of V.
static void jacobi_eigen(int n, double* A, double* w, double* V) {
  for (int i = 0; i < n * n; i++) V[i] = 0;
  for (int i = 0; i < n; i++) V[i * n + i] = 1;
  for (int sweep = 0; sweep < 100; sweep++) {
    double off = 0;
    for (int p = 0; p < n; p++)
      for (int q = p + 1; q < n; q++) off += A[p * n + q] * A[p * n + q];
    if (off < 1e-24) break;
    for (int p = 0; p < n; p++)
      for (int q = p + 1; q < n; q++) {
        double apq = A[p * n + q];
        if (std::fabs(apq) < 1e-300) continue;
        double app = A[p * n + p], aqq = A[q * n + q];
        double tau = (aqq - app) / (2 * apq);
        double t = (tau >= 0 ? 1.0 : -1.0) /
                   (std::fabs(tau) + std::sqrt(1 + tau * tau));
        double c = 1 / std::sqrt(1 + t * t), s = t * c;
        for (int k = 0; k < n; k++) {
          double akp = A[k * n + p], akq = A[k * n + q];
          A[k * n + p] = c * akp - s * akq;
          A[k * n + q] = s * akp + c * akq;
        }
        for (int k = 0; k < n; k++) {
          double apk = A[p * n + k], aqk = A[q * n + k];
          A[p * n + k] = c * apk - s * aqk;
          A[q * n + k] = s * apk + c * aqk;
        }
        for (int k = 0; k < n; k++) {
          double vkp = V[k * n + p], vkq = V[k * n + q];
          V[k * n + p] = c * vkp - s * vkq;
          V[k * n + q] = s * vkp + c * vkq;
        }
      }
  }
  // sort ascending
  std::vector<int> idx(n);
  for (int i = 0; i < n; i++) idx[i] = i;
  std::sort(idx.begin(), idx.end(),
            [&](int a, int b) { return A[a * n + a] < A[b * n + b]; });
  std::vector<double> V2(n * n), w2(n);
  for (int j = 0; j < n; j++) {
    w2[j] = A[idx[j] * n + idx[j]];
    for (int i = 0; i < n; i++) V2[i * n + j] = V[i * n + idx[j]];
  }
  std::memcpy(w, w2.data(), n * sizeof(double));
  std::memcpy(V, V2.data(), n * n * sizeof(double));
}

// SVD of a 3x3 matrix via eigen of A^T A (enough for our projection uses).
// A = U diag(s) V^T with s descending; handles rank deficiency adequately.
static void svd3(const M3& A, M3& U, double s[3], M3& Vt) {
  double ATA[9];
  M3 At = transpose(A);
  M3 ata = matmul(At, A);
  std::memcpy(ATA, ata.m, sizeof(ATA));
  double w[3], V[9];
  jacobi_eigen(3, ATA, w, V);
  // descending
  int ord[3] = {2, 1, 0};
  M3 Vm{};
  for (int j = 0; j < 3; j++)
    for (int i = 0; i < 3; i++) Vm.m[i * 3 + j] = V[i * 3 + ord[j]];
  for (int j = 0; j < 3; j++) s[j] = std::sqrt(std::max(0.0, w[ord[j]]));
  // U = A V / s (orthonormalize for small s)
  M3 AV = matmul(A, Vm);
  for (int j = 0; j < 3; j++) {
    double nrm = std::sqrt(AV.m[j] * AV.m[j] + AV.m[3 + j] * AV.m[3 + j] +
                           AV.m[6 + j] * AV.m[6 + j]);
    if (nrm < 1e-12) {
      // complete U by cross product of the other columns
      int a = (j + 1) % 3, b = (j + 2) % 3;
      V3 u1{AV.m[a] , AV.m[3 + a], AV.m[6 + a]};
      V3 u2{AV.m[b], AV.m[3 + b], AV.m[6 + b]};
      double n1 = std::sqrt(dot(u1, u1)), n2 = std::sqrt(dot(u2, u2));
      if (n1 > 1e-12) { u1.x /= n1; u1.y /= n1; u1.z /= n1; }
      if (n2 > 1e-12) { u2.x /= n2; u2.y /= n2; u2.z /= n2; }
      V3 u = cross(u1, u2);
      double nu = std::sqrt(dot(u, u));
      if (nu < 1e-12) { u = {1, 0, 0}; nu = 1; }
      U.m[j] = u.x / nu; U.m[3 + j] = u.y / nu; U.m[6 + j] = u.z / nu;
    } else {
      U.m[j] = AV.m[j] / nrm;
      U.m[3 + j] = AV.m[3 + j] / nrm;
      U.m[6 + j] = AV.m[6 + j] / nrm;
    }
  }
  Vt = transpose(Vm);
}

// Gauss-Jordan: reduce an n x m row-major matrix in place to RREF on the
// first n pivot columns (partial pivoting). Returns false if singular.
static bool gauss_jordan(int n, int m, double* A) {
  for (int col = 0; col < n; col++) {
    int piv = col;
    for (int r = col + 1; r < n; r++)
      if (std::fabs(A[r * m + col]) > std::fabs(A[piv * m + col])) piv = r;
    if (std::fabs(A[piv * m + col]) < 1e-13) return false;
    if (piv != col)
      for (int c = 0; c < m; c++) std::swap(A[piv * m + c], A[col * m + c]);
    double d = A[col * m + col];
    for (int c = 0; c < m; c++) A[col * m + c] /= d;
    for (int r = 0; r < n; r++) {
      if (r == col) continue;
      double f = A[r * m + col];
      if (f == 0) continue;
      for (int c = 0; c < m; c++) A[r * m + c] -= f * A[col * m + c];
    }
  }
  return true;
}

// Real eigenvalues + eigenvectors of a general n x n matrix via Hessenberg
// reduction + shifted QR (implicit single shift on the working matrix; we
// only need real eigenvalues). Eigenvectors recovered by inverse iteration.
static void hessenberg(int n, double* A) {
  for (int k = 1; k < n - 1; k++) {
    int piv = k;
    for (int i = k; i < n; i++)
      if (std::fabs(A[i * n + k - 1]) > std::fabs(A[piv * n + k - 1])) piv = i;
    if (std::fabs(A[piv * n + k - 1]) < 1e-300) continue;
    if (piv != k) {
      for (int j = 0; j < n; j++) std::swap(A[piv * n + j], A[k * n + j]);
      for (int i = 0; i < n; i++) std::swap(A[i * n + piv], A[i * n + k]);
    }
    for (int i = k + 1; i < n; i++) {
      double f = A[i * n + k - 1] / A[k * n + k - 1];
      if (f == 0) continue;
      for (int j = k - 1; j < n; j++) A[i * n + j] -= f * A[k * n + j];
      for (int j = 0; j < n; j++) A[j * n + k] += f * A[j * n + i];
    }
  }
}

// Francis-free simple QR with Wilkinson shift on the Hessenberg matrix;
// deflates 1x1 (real) and 2x2 (maybe complex) blocks. Real eigenvalues out.
static void qr_eigenvalues(int n, double* H, std::vector<double>& real_out) {
  int hi = n - 1;
  int iter_total = 0;
  while (hi >= 0 && iter_total < 100 * n) {
    // deflate
    int lo = hi;
    while (lo > 0) {
      double s = std::fabs(H[(lo - 1) * n + lo - 1]) + std::fabs(H[lo * n + lo]);
      if (s == 0) s = 1;
      if (std::fabs(H[lo * n + lo - 1]) < 1e-14 * s) break;
      lo--;
    }
    if (lo == hi) {  // 1x1 block
      real_out.push_back(H[hi * n + hi]);
      hi--;
      continue;
    }
    if (lo == hi - 1) {  // 2x2 block
      double a = H[lo * n + lo], b = H[lo * n + hi];
      double c = H[hi * n + lo], d = H[hi * n + hi];
      double tr = a + d, det = a * d - b * c;
      double disc = tr * tr / 4 - det;
      if (disc >= 0) {
        double sq = std::sqrt(disc);
        real_out.push_back(tr / 2 + sq);
        real_out.push_back(tr / 2 - sq);
      }
      hi -= 2;
      continue;
    }
    // one shifted QR sweep on H[lo..hi, lo..hi] (Givens based, Wilkinson)
    double a = H[(hi - 1) * n + hi - 1], b = H[(hi - 1) * n + hi];
    double c = H[hi * n + hi - 1], d = H[hi * n + hi];
    double tr = a + d, det = a * d - b * c;
    double disc = tr * tr / 4 - det;
    double mu = d;
    if (disc >= 0) {
      double sq = std::sqrt(disc);
      double l1 = tr / 2 + sq, l2 = tr / 2 - sq;
      mu = (std::fabs(l1 - d) < std::fabs(l2 - d)) ? l1 : l2;
    }
    for (int i = lo; i <= hi; i++) H[i * n + i] -= mu;
    // QR via Givens on the Hessenberg band, then RQ
    std::vector<double> cs(hi - lo), sn(hi - lo);
    for (int k = lo; k < hi; k++) {
      double x = H[k * n + k], y = H[(k + 1) * n + k];
      double r = std::hypot(x, y);
      double cc = (r == 0) ? 1 : x / r, ss = (r == 0) ? 0 : y / r;
      cs[k - lo] = cc; sn[k - lo] = ss;
      for (int j = k; j <= hi; j++) {
        double t1 = H[k * n + j], t2 = H[(k + 1) * n + j];
        H[k * n + j] = cc * t1 + ss * t2;
        H[(k + 1) * n + j] = -ss * t1 + cc * t2;
      }
    }
    for (int k = lo; k < hi; k++) {
      double cc = cs[k - lo], ss = sn[k - lo];
      for (int i = lo; i <= std::min(k + 2, hi); i++) {
        double t1 = H[i * n + k], t2 = H[i * n + k + 1];
        H[i * n + k] = cc * t1 + ss * t2;
        H[i * n + k + 1] = -ss * t1 + cc * t2;
      }
    }
    for (int i = lo; i <= hi; i++) H[i * n + i] += mu;
    iter_total++;
  }
}

// ------------------------------------------------- monomial algebra (5-pt)

// deg-1 poly over [x, y, z, 1]
struct P1 { double c[4]; };
// deg-2 poly over [x2, xy, xz, y2, yz, z2, x, y, z, 1]
struct P2 { double c[10]; };
// deg-3 poly over 20 monomials:
// [x3, x2y, x2z, xy2, xyz, xz2, y3, y2z, yz2, z3,
//  x2, xy, xz, y2, yz, z2, x, y, z, 1]
struct P3 { double c[20]; };

static P2 mul11(const P1& a, const P1& b) {
  P2 r{};
  r.c[0] = a.c[0] * b.c[0];                    // x*x
  r.c[1] = a.c[0] * b.c[1] + a.c[1] * b.c[0];  // xy
  r.c[2] = a.c[0] * b.c[2] + a.c[2] * b.c[0];  // xz
  r.c[3] = a.c[1] * b.c[1];                    // y2
  r.c[4] = a.c[1] * b.c[2] + a.c[2] * b.c[1];  // yz
  r.c[5] = a.c[2] * b.c[2];                    // z2
  r.c[6] = a.c[0] * b.c[3] + a.c[3] * b.c[0];  // x
  r.c[7] = a.c[1] * b.c[3] + a.c[3] * b.c[1];  // y
  r.c[8] = a.c[2] * b.c[3] + a.c[3] * b.c[2];  // z
  r.c[9] = a.c[3] * b.c[3];                    // 1
  return r;
}

static P3 mul21(const P2& a, const P1& b) {
  P3 r{};
  // index maps: for each deg2 monomial times each of {x,y,z,1} -> deg3 index
  // deg2 order: x2, xy, xz, y2, yz, z2, x, y, z, 1
  static const int mx[10] = {0, 1, 2, 3, 4, 5, 10, 11, 12, 16};   // *x
  static const int my[10] = {1, 3, 4, 6, 7, 8, 11, 13, 14, 17};   // *y
  static const int mz[10] = {2, 4, 5, 7, 8, 9, 12, 14, 15, 18};   // *z
  static const int m1[10] = {10, 11, 12, 13, 14, 15, 16, 17, 18, 19};  // *1
  for (int i = 0; i < 10; i++) {
    r.c[mx[i]] += a.c[i] * b.c[0];
    r.c[my[i]] += a.c[i] * b.c[1];
    r.c[mz[i]] += a.c[i] * b.c[2];
    r.c[m1[i]] += a.c[i] * b.c[3];
  }
  return r;
}

static inline void p3_axpy(P3& acc, const P3& a, double f) {
  for (int i = 0; i < 20; i++) acc.c[i] += f * a.c[i];
}

// Five-point solver: inputs 5 normalized correspondences; outputs up to 10
// essential matrices.
static int five_point(const double x0[5][2], const double x1[5][2],
                      M3 Es[10]) {
  // 1. nullspace of the 5x9 epipolar constraint matrix via eigen of Q^T Q
  double QtQ[81] = {0};
  for (int i = 0; i < 5; i++) {
    double q[9] = {x1[i][0] * x0[i][0], x1[i][0] * x0[i][1], x1[i][0],
                   x1[i][1] * x0[i][0], x1[i][1] * x0[i][1], x1[i][1],
                   x0[i][0], x0[i][1], 1.0};
    for (int a = 0; a < 9; a++)
      for (int b = 0; b < 9; b++) QtQ[a * 9 + b] += q[a] * q[b];
  }
  double w[9], V[81];
  jacobi_eigen(9, QtQ, w, V);
  // 4 smallest eigenvectors = columns 0..3
  double B[4][9];
  for (int k = 0; k < 4; k++)
    for (int i = 0; i < 9; i++) B[k][i] = V[i * 9 + k];

  // E(x,y,z) = x*B0 + y*B1 + z*B2 + B3, entries are P1 polynomials
  P1 E[3][3];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      int idx = i * 3 + j;
      E[i][j] = {{B[0][idx], B[1][idx], B[2][idx], B[3][idx]}};
    }

  // 2. ten cubic constraints
  P3 C[10];
  // det(E) = e00(e11 e22 - e12 e21) - e01(e10 e22 - e12 e20) + e02(...)
  {
    P3 det{};
    P2 m0 = mul11(E[1][1], E[2][2]), m1 = mul11(E[1][2], E[2][1]);
    P2 d0{};
    for (int i = 0; i < 10; i++) d0.c[i] = m0.c[i] - m1.c[i];
    p3_axpy(det, mul21(d0, E[0][0]), 1.0);
    P2 m2 = mul11(E[1][0], E[2][2]), m3 = mul11(E[1][2], E[2][0]);
    P2 d1{};
    for (int i = 0; i < 10; i++) d1.c[i] = m2.c[i] - m3.c[i];
    p3_axpy(det, mul21(d1, E[0][1]), -1.0);
    P2 m4 = mul11(E[1][0], E[2][1]), m5 = mul11(E[1][1], E[2][0]);
    P2 d2{};
    for (int i = 0; i < 10; i++) d2.c[i] = m4.c[i] - m5.c[i];
    p3_axpy(det, mul21(d2, E[0][2]), 1.0);
    C[0] = det;
  }
  // EE^T E - 0.5 trace(EE^T) E = 0  (9 equations)
  {
    // S = E E^T (3x3 of P2)
    P2 S[3][3];
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) {
        P2 s{};
        for (int k = 0; k < 3; k++) {
          P2 m = mul11(E[i][k], E[j][k]);
          for (int t = 0; t < 10; t++) s.c[t] += m.c[t];
        }
        S[i][j] = s;
      }
    P2 tr{};
    for (int t = 0; t < 10; t++)
      tr.c[t] = S[0][0].c[t] + S[1][1].c[t] + S[2][2].c[t];
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) {
        P3 acc{};
        for (int k = 0; k < 3; k++) p3_axpy(acc, mul21(S[i][k], E[k][j]), 1.0);
        p3_axpy(acc, mul21(tr, E[i][j]), -0.5);
        C[1 + i * 3 + j] = acc;
      }
  }

  // 3. Gauss-Jordan on the 10x20 system; first 10 columns are the degree-3
  // monomials -> express them over the basis
  // Bq = [x2, xy, xz, y2, yz, z2, x, y, z, 1]
  double Amat[10 * 20];
  for (int r = 0; r < 10; r++)
    for (int c = 0; c < 20; c++) Amat[r * 20 + c] = C[r].c[c];
  if (!gauss_jordan(10, 20, Amat)) return 0;
  // reduction: deg3 monomial r == -sum_c Amat[r][10+c] * Bq[c]

  // 4. action matrix of multiplication by x on Bq
  // x*x2 = x3 (deg3 idx 0), x*xy = x2y (1), x*xz = x2z (2), x*y2 = xy2 (3),
  // x*yz = xyz (4), x*z2 = xz2 (5), x*x = x2 (Bq 0), x*y = xy (Bq 1),
  // x*z = xz (Bq 2), x*1 = x (Bq 6)
  double T[10 * 10] = {0};
  for (int r = 0; r < 6; r++)  // rows mapping to deg-3 monomials 0..5
    for (int c = 0; c < 10; c++) T[r * 10 + c] = -Amat[r * 20 + 10 + c];
  T[6 * 10 + 0] = 1.0;  // x * x -> x2
  T[7 * 10 + 1] = 1.0;  // x * y -> xy
  T[8 * 10 + 2] = 1.0;  // x * z -> xz
  T[9 * 10 + 6] = 1.0;  // x * 1 -> x
  // Row i of T expands x*Bq[i] over Bq, so for the evaluation vector v
  // (v_j = Bq_j at a solution): T v = x v — v is a RIGHT eigenvector of T.
  double Hm[100];
  std::memcpy(Hm, T, sizeof(Hm));
  hessenberg(10, Hm);
  std::vector<double> eigs;
  qr_eigenvalues(10, Hm, eigs);

  int count = 0;
  for (double lam : eigs) {
    if (count >= 10) break;
    // right eigenvector of T for lam -> nullspace of (T - lam I)
    double Mt[100];
    std::memcpy(Mt, T, sizeof(Mt));
    for (int i = 0; i < 10; i++) Mt[i * 10 + i] -= lam;
    // nullspace via eigen of M^T M (smallest eigenvector)
    double MtM[100] = {0};
    for (int a = 0; a < 10; a++)
      for (int b = 0; b < 10; b++) {
        double s = 0;
        for (int k = 0; k < 10; k++) s += Mt[k * 10 + a] * Mt[k * 10 + b];
        MtM[a * 10 + b] = s;
      }
    double ww[10], VV[100];
    jacobi_eigen(10, MtM, ww, VV);
    double v[10];
    for (int i = 0; i < 10; i++) v[i] = VV[i * 10 + 0];
    // v over basis [x2,xy,xz,y2,yz,z2,x,y,z,1]
    if (std::fabs(v[9]) < 1e-12) continue;
    double xs = v[6] / v[9], ys = v[7] / v[9], zs = v[8] / v[9];
    // basic consistency check vs quadratic entries
    if (std::fabs(xs * xs - v[0] / v[9]) > 1e-4 * (1 + xs * xs)) continue;
    M3 Ecand{};
    for (int i = 0; i < 9; i++)
      Ecand.m[i] = xs * B[0][i] + ys * B[1][i] + zs * B[2][i] + B[3][i];
    // normalize
    double nrm = 0;
    for (int i = 0; i < 9; i++) nrm += Ecand.m[i] * Ecand.m[i];
    nrm = std::sqrt(nrm);
    if (nrm < 1e-12) continue;
    for (int i = 0; i < 9; i++) Ecand.m[i] /= nrm;
    Es[count++] = Ecand;
  }
  return count;
}

// ------------------------------------------------------------ scoring

static inline double sampson_sq(const M3& E, const double* p0,
                                const double* p1) {
  V3 x0{p0[0], p0[1], 1.0}, x1{p1[0], p1[1], 1.0};
  V3 Ex0 = matv(E, x0);
  V3 Etx1 = matTv(E, x1);
  double num = dot(x1, Ex0);
  double den = Ex0.x * Ex0.x + Ex0.y * Ex0.y + Etx1.x * Etx1.x +
               Etx1.y * Etx1.y;
  if (den < 1e-18) return 1e18;
  return num * num / den;
}

// non-minimal linear E fit on a subset (8pt-style) + essential projection
static bool fit_E_linear(const double* pts0, const double* pts1,
                         const std::vector<int>& idx, M3& E) {
  if (idx.size() < 8) return false;
  double QtQ[81] = {0};
  for (int t : idx) {
    const double* p0 = pts0 + 2 * t;
    const double* p1 = pts1 + 2 * t;
    double q[9] = {p1[0] * p0[0], p1[0] * p0[1], p1[0],
                   p1[1] * p0[0], p1[1] * p0[1], p1[1], p0[0], p0[1], 1.0};
    for (int a = 0; a < 9; a++)
      for (int b = 0; b < 9; b++) QtQ[a * 9 + b] += q[a] * q[b];
  }
  double w[9], V[81];
  jacobi_eigen(9, QtQ, w, V);
  for (int i = 0; i < 9; i++) E.m[i] = V[i * 9 + 0];
  // project to essential manifold: singular values (s, s, 0)
  M3 U, Vt;
  double s[3];
  svd3(E, U, s, Vt);
  double sm = (s[0] + s[1]) / 2;
  M3 S{{sm, 0, 0, 0, sm, 0, 0, 0, 0}};
  E = matmul(matmul(U, S), Vt);
  return true;
}

// cheirality count + (R, t) recovery from E using inlier correspondences
static int recover_pose(const M3& E, const double* pts0, const double* pts1,
                        const std::vector<int>& inl, M3& R_best, V3& t_best) {
  M3 U, Vt;
  double s[3];
  svd3(E, U, s, Vt);
  // ensure rotations
  auto det3 = [](const M3& A) {
    return A.m[0] * (A.m[4] * A.m[8] - A.m[5] * A.m[7]) -
           A.m[1] * (A.m[3] * A.m[8] - A.m[5] * A.m[6]) +
           A.m[2] * (A.m[3] * A.m[7] - A.m[4] * A.m[6]);
  };
  if (det3(U) < 0)
    for (int i = 0; i < 3; i++) U.m[i * 3 + 2] = -U.m[i * 3 + 2];
  if (det3(Vt) < 0)
    for (int j = 0; j < 3; j++) Vt.m[6 + j] = -Vt.m[6 + j];
  M3 W{{0, -1, 0, 1, 0, 0, 0, 0, 1}};
  M3 Ra = matmul(matmul(U, W), Vt);
  M3 Rb = matmul(matmul(U, transpose(W)), Vt);
  V3 t{U.m[2], U.m[5], U.m[8]};

  int best_cnt = -1;
  for (int c = 0; c < 4; c++) {
    const M3& R = (c < 2) ? Ra : Rb;
    V3 tc = (c % 2 == 0) ? t : V3{-t.x, -t.y, -t.z};
    int cnt = 0;
    for (int i : inl) {
      V3 x0{pts0[2 * i], pts0[2 * i + 1], 1.0};
      V3 x1{pts1[2 * i], pts1[2 * i + 1], 1.0};
      // triangulate via midpoint: depths from cross products
      V3 Rx0 = matv(R, x0);
      // solve [ -Rx0  x1 ] [d0; d1] ~= t  in least squares (2 unknowns)
      double a11 = dot(Rx0, Rx0), a12 = -dot(Rx0, x1), a22 = dot(x1, x1);
      double b1 = -dot(Rx0, tc), b2 = dot(x1, tc);
      double det = a11 * a22 - a12 * a12;
      if (std::fabs(det) < 1e-18) continue;
      double d0 = (b1 * a22 - b2 * a12) / det;
      double d1 = (a11 * b2 - a12 * b1) / det;
      if (d0 > 0 && d1 > 0) cnt++;
    }
    if (cnt > best_cnt) {
      best_cnt = cnt;
      R_best = R;
      t_best = tc;
    }
  }
  return best_cnt;
}

// ------------------------------------------------------------ RANSAC

struct RansacResult {
  M3 E;
  std::vector<char> inliers;
  int num_inliers = 0;
  double score = 1e30;
};

static void score_model(const M3& E, const double* p0, const double* p1,
                        int n, double thr_sq, RansacResult& out) {
  // pass 1: MSAC score only (no allocation; most candidates lose).
  double score = 0;
  for (int i = 0; i < n; i++) {
    double e = sampson_sq(E, p0 + 2 * i, p1 + 2 * i);
    score += (e < thr_sq) ? e : thr_sq;
  }
  if (score >= out.score) return;
  // pass 2 (winner only): collect the inlier mask, reusing capacity.
  out.inliers.assign(n, 0);
  int cnt = 0;
  for (int i = 0; i < n; i++) {
    double e = sampson_sq(E, p0 + 2 * i, p1 + 2 * i);
    if (e < thr_sq) {
      out.inliers[i] = 1;
      cnt++;
    }
  }
  out.score = score;
  out.E = E;
  out.num_inliers = cnt;
}

static RansacResult ransac_E(const double* p0, const double* p1, int n,
                             double thr, double success_prob, int max_iters,
                             uint32_t seed) {
  RansacResult best;
  if (n < 5) return best;
  std::mt19937 rng(seed);
  double thr_sq = thr * thr;
  int iters = max_iters;
  int it = 0;
  for (; it < iters; it++) {
    int sample[5];
    for (int k = 0; k < 5; k++) {
      bool dup;
      do {
        sample[k] = (int)(rng() % n);
        dup = false;
        for (int j = 0; j < k; j++)
          if (sample[j] == sample[k]) dup = true;
      } while (dup);
    }
    double x0[5][2], x1[5][2];
    for (int k = 0; k < 5; k++) {
      x0[k][0] = p0[2 * sample[k]];
      x0[k][1] = p0[2 * sample[k] + 1];
      x1[k][0] = p1[2 * sample[k]];
      x1[k][1] = p1[2 * sample[k] + 1];
    }
    M3 Es[10];
    int ne = five_point(x0, x1, Es);
    double prev_score = best.score;
    for (int e = 0; e < ne; e++) score_model(Es[e], p0, p1, n, thr_sq, best);

    // local optimization whenever the best model improved by SCORE (the
    // inlier count saturates quickly; score-only improvements still
    // deserve the non-minimal refit), stopping when a refit round no
    // longer improves
    if (best.score < prev_score && best.num_inliers >= 8) {
      for (int lo_iter = 0; lo_iter < 2; lo_iter++) {
        double s_before = best.score;
        std::vector<int> inl_idx;
        for (int i = 0; i < n; i++)
          if (best.inliers[i]) inl_idx.push_back(i);
        M3 El;
        if (fit_E_linear(p0, p1, inl_idx, El))
          score_model(El, p0, p1, n, thr_sq, best);
        if (best.score >= s_before) break;
      }
    }
    // adaptive termination (compare in double: the iteration estimate can
    // exceed INT_MAX when the inlier ratio is tiny — casting first would
    // overflow and collapse the loop)
    if (best.num_inliers > 5) {
      double w = (double)best.num_inliers / n;
      double p_outlier = 1.0 - std::pow(w, 5);
      p_outlier = std::min(std::max(p_outlier, 1e-12), 1.0 - 1e-12);
      double need = std::ceil(std::log(1.0 - success_prob) /
                              std::log(p_outlier));
      if (need < (double)iters) iters = std::max((int)need, it + 1);
      if (iters > max_iters) iters = max_iters;
    }
  }
  return best;
}

}  // namespace pk

// --------------------------------------------------------------- C ABI

extern "C" {

// Estimate relative pose from pixel correspondences + intrinsics.
// Returns number of inliers (0 on failure). R row-major 3x3, t 3.
int pk_estimate_relative_pose(const double* pts0, const double* pts1, int n,
                              const double* K0, const double* K1,
                              double max_epipolar_error, double success_prob,
                              int max_iters, unsigned seed, double* R_out,
                              double* t_out, unsigned char* inlier_mask) {
  if (n < 5) return 0;
  // normalize by intrinsics
  std::vector<double> n0(2 * n), n1(2 * n);
  double fx0 = K0[0], fy0 = K0[4], cx0 = K0[2], cy0 = K0[5];
  double fx1 = K1[0], fy1 = K1[4], cx1 = K1[2], cy1 = K1[5];
  for (int i = 0; i < n; i++) {
    n0[2 * i] = (pts0[2 * i] - cx0) / fx0;
    n0[2 * i + 1] = (pts0[2 * i + 1] - cy0) / fy0;
    n1[2 * i] = (pts1[2 * i] - cx1) / fx1;
    n1[2 * i + 1] = (pts1[2 * i + 1] - cy1) / fy1;
  }
  double favg = (fx0 + fy0 + fx1 + fy1) / 4.0;
  double thr = max_epipolar_error / favg;

  pk::RansacResult res =
      pk::ransac_E(n0.data(), n1.data(), n, thr, success_prob, max_iters,
                   seed);
  if (res.num_inliers < 5) return 0;

  std::vector<int> inl_idx;
  for (int i = 0; i < n; i++)
    if (res.inliers[i]) inl_idx.push_back(i);
  pk::M3 R{};
  pk::V3 t{0, 0, 0};
  // cheirality: if NO candidate places a single inlier in front of both
  // cameras, the pose is meaningless — report failure rather than an
  // arbitrary (R, t)
  if (pk::recover_pose(res.E, n0.data(), n1.data(), inl_idx, R, t) <= 0)
    return 0;
  double tn = std::sqrt(pk::dot(t, t));
  if (tn > 1e-12) {
    t.x /= tn;
    t.y /= tn;
    t.z /= tn;
  }
  std::memcpy(R_out, R.m, 9 * sizeof(double));
  t_out[0] = t.x;
  t_out[1] = t.y;
  t_out[2] = t.z;
  if (inlier_mask)
    for (int i = 0; i < n; i++) inlier_mask[i] = res.inliers[i];
  return res.num_inliers;
}

// 4-point DLT homography + LO-RANSAC (MSAC). Returns inlier count.
int pk_estimate_homography(const double* pts0, const double* pts1, int n,
                           double thresh, int max_iters, unsigned seed,
                           double* H_out, unsigned char* inlier_mask,
                           double success_prob) {
  if (n < 4) return 0;
  std::mt19937 rng(seed);
  double thr_sq = thresh * thresh;

  auto fit_H = [&](const std::vector<int>& idx, pk::M3& H) -> bool {
    int m = (int)idx.size();
    if (m < 4) return false;
    // normalize points (Hartley)
    double mx0 = 0, my0 = 0, mx1 = 0, my1 = 0;
    for (int i : idx) {
      mx0 += pts0[2 * i];
      my0 += pts0[2 * i + 1];
      mx1 += pts1[2 * i];
      my1 += pts1[2 * i + 1];
    }
    mx0 /= m; my0 /= m; mx1 /= m; my1 /= m;
    double s0 = 0, s1 = 0;
    for (int i : idx) {
      s0 += std::hypot(pts0[2 * i] - mx0, pts0[2 * i + 1] - my0);
      s1 += std::hypot(pts1[2 * i] - mx1, pts1[2 * i + 1] - my1);
    }
    s0 = (s0 / m) / std::sqrt(2.0);
    s1 = (s1 / m) / std::sqrt(2.0);
    if (s0 < 1e-12 || s1 < 1e-12) return false;
    double AtA[81] = {0};
    for (int i : idx) {
      double x = (pts0[2 * i] - mx0) / s0, y = (pts0[2 * i + 1] - my0) / s0;
      double u = (pts1[2 * i] - mx1) / s1, v = (pts1[2 * i + 1] - my1) / s1;
      double r1[9] = {-x, -y, -1, 0, 0, 0, u * x, u * y, u};
      double r2[9] = {0, 0, 0, -x, -y, -1, v * x, v * y, v};
      for (int a = 0; a < 9; a++)
        for (int b = 0; b < 9; b++)
          AtA[a * 9 + b] += r1[a] * r1[b] + r2[a] * r2[b];
    }
    double w[9], V[81];
    pk::jacobi_eigen(9, AtA, w, V);
    pk::M3 Hn{};
    for (int i = 0; i < 9; i++) Hn.m[i] = V[i * 9 + 0];
    // denormalize: H = T1^-1 * Hn * T0
    pk::M3 T0{{1 / s0, 0, -mx0 / s0, 0, 1 / s0, -my0 / s0, 0, 0, 1}};
    pk::M3 T1inv{{s1, 0, mx1, 0, s1, my1, 0, 0, 1}};
    H = pk::matmul(pk::matmul(T1inv, Hn), T0);
    if (std::fabs(H.m[8]) > 1e-12)
      for (int i = 0; i < 9; i++) H.m[i] /= H.m[8];
    return true;
  };

  auto score_H = [&](const pk::M3& H, std::vector<char>& inl,
                     double& score) -> int {
    int cnt = 0;
    score = 0;
    for (int i = 0; i < n; i++) {
      pk::V3 p{pts0[2 * i], pts0[2 * i + 1], 1.0};
      pk::V3 q = pk::matv(H, p);
      if (std::fabs(q.z) < 1e-12) {
        score += thr_sq;
        continue;
      }
      double du = q.x / q.z - pts1[2 * i];
      double dv = q.y / q.z - pts1[2 * i + 1];
      double e = du * du + dv * dv;
      if (e < thr_sq) {
        inl[i] = 1;
        cnt++;
        score += e;
      } else {
        score += thr_sq;
      }
    }
    return cnt;
  };

  pk::M3 bestH{};
  std::vector<char> best_inl(n, 0);
  int best_cnt = 0;
  double best_score = 1e30;
  int iters = max_iters;
  for (int it = 0; it < iters; it++) {
    std::vector<int> sample;
    while ((int)sample.size() < 4) {
      int s = (int)(rng() % n);
      bool dup = false;
      for (int j : sample)
        if (j == s) dup = true;
      if (!dup) sample.push_back(s);
    }
    pk::M3 H;
    if (!fit_H(sample, H)) continue;
    std::vector<char> inl(n, 0);
    double score;
    int cnt = score_H(H, inl, score);
    if (score < best_score) {
      best_score = score;
      bestH = H;
      best_inl = inl;
      best_cnt = cnt;
      // local optimization: refit on inliers
      for (int lo = 0; lo < 2 && best_cnt >= 4; lo++) {
        std::vector<int> idx;
        for (int i = 0; i < n; i++)
          if (best_inl[i]) idx.push_back(i);
        pk::M3 H2;
        if (fit_H(idx, H2)) {
          std::vector<char> inl2(n, 0);
          double sc2;
          int c2 = score_H(H2, inl2, sc2);
          if (sc2 < best_score) {
            best_score = sc2;
            bestH = H2;
            best_inl = inl2;
            best_cnt = c2;
          }
        }
      }
      if (best_cnt > 4) {
        double w = (double)best_cnt / n;
        double po = std::min(std::max(1.0 - std::pow(w, 4), 1e-12),
                             1.0 - 1e-12);
        // double comparison: the estimate overflows int for tiny ratios
        double need = std::ceil(std::log(1.0 - success_prob) /
                                std::log(po));
        if (need < (double)iters) iters = std::max((int)need, it + 1);
      }
    }
  }
  if (best_cnt < 4) return 0;
  std::memcpy(H_out, bestH.m, 9 * sizeof(double));
  if (inlier_mask)
    for (int i = 0; i < n; i++) inlier_mask[i] = best_inl[i];
  return best_cnt;
}

// direct access to the 5-point solver (for tests): returns count, writes
// up to 10 row-major E matrices.
int pk_five_point(const double* x0, const double* x1, double* Es_out) {
  double a[5][2], b[5][2];
  for (int i = 0; i < 5; i++) {
    a[i][0] = x0[2 * i];
    a[i][1] = x0[2 * i + 1];
    b[i][0] = x1[2 * i];
    b[i][1] = x1[2 * i + 1];
  }
  pk::M3 Es[10];
  int cnt = pk::five_point(a, b, Es);
  for (int e = 0; e < cnt; e++)
    std::memcpy(Es_out + 9 * e, Es[e].m, 9 * sizeof(double));
  return cnt;
}

double pk_sampson_sq(const double* E, const double* p0, const double* p1) {
  pk::M3 Em;
  std::memcpy(Em.m, E, 9 * sizeof(double));
  return pk::sampson_sq(Em, p0, p1);
}

}  // extern "C"
