// C++ parity oracle: closed-form minimum-derivative polynomial QP.
//
// Role: the "C++ reference" side of BASELINE.json's coefficient-parity gate.
// This is an INDEPENDENT implementation of the Richter/Bry/Roy closed form
// (the same math as /root/reference's PolynomialOptimization<N>, see
// SURVEY.md section 3.1) written from the equations -- dense row-major
// double buffers, own Gaussian elimination, no Eigen, no code taken from the
// reference.  Tests solve random problems here and in the JAX solver and
// require agreement to double-precision tolerance.
//
// Build: g++ -O2 -shared -fPIC -o libparity_oracle.so parity_oracle.cpp
// (native/__init__.py compiles on demand and loads via ctypes).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

using Mat = std::vector<double>;  // row-major

// bc[d][j] = j!/(j-d)! (falling factorial derivative table).
void base_coefficients(int n, Mat* bc) {
  bc->assign(n * n, 0.0);
  for (int j = 0; j < n; ++j) (*bc)[j] = 1.0;
  for (int d = 1; d < n; ++d)
    for (int j = d; j < n; ++j)
      (*bc)[d * n + j] = (j - d + 1) * (*bc)[(d - 1) * n + j];
}

// General Gaussian elimination with partial pivoting: solves a * x = b for
// nrhs right-hand sides (a is destroyed).  Returns false on singularity.
bool gauss_solve(Mat& a, Mat& b, int n, int nrhs) {
  for (int col = 0; col < n; ++col) {
    int piv = col;
    double best = std::fabs(a[col * n + col]);
    for (int r = col + 1; r < n; ++r) {
      double v = std::fabs(a[r * n + col]);
      if (v > best) { best = v; piv = r; }
    }
    if (best == 0.0) return false;
    if (piv != col) {
      for (int c = 0; c < n; ++c) std::swap(a[col * n + c], a[piv * n + c]);
      for (int c = 0; c < nrhs; ++c)
        std::swap(b[col * nrhs + c], b[piv * nrhs + c]);
    }
    const double inv = 1.0 / a[col * n + col];
    for (int r = col + 1; r < n; ++r) {
      const double f = a[r * n + col] * inv;
      if (f == 0.0) continue;
      for (int c = col; c < n; ++c) a[r * n + c] -= f * a[col * n + c];
      for (int c = 0; c < nrhs; ++c)
        b[r * nrhs + c] -= f * b[col * nrhs + c];
    }
  }
  for (int col = n - 1; col >= 0; --col) {
    const double inv = 1.0 / a[col * n + col];
    for (int c = 0; c < nrhs; ++c) {
      double acc = b[col * nrhs + c];
      for (int k = col + 1; k < n; ++k)
        acc -= a[col * n + k] * b[k * nrhs + c];
      b[col * nrhs + c] = acc * inv;
    }
  }
  return true;
}

// Row of the derivative-sampling matrix: d-th derivative monomial row at t.
void sample_row(const Mat& bc, int n, int d, double t, double* row) {
  for (int j = 0; j < n; ++j) row[j] = 0.0;
  double tp = 1.0;
  for (int j = d; j < n; ++j) {
    row[j] = bc[d * n + j] * tp;
    tp *= t;
  }
}

}  // namespace

extern "C" {

// Solve the minimum-derivative QP.
//   n            polynomial coefficient count (even)
//   dim          spatial dimension
//   n_vertices   V (segments K = V - 1)
//   derivative   cost derivative order (e.g. 4 = snap)
//   fixed_mask   V * (n/2) bytes; nonzero = that (vertex, deriv) is fixed
//   values       V * (n/2) * dim doubles (free entries ignored)
//   times        K doubles
//   coeffs_out   K * n * dim doubles (increasing powers)
// Returns 0 on success.
int mtg_solve_linear(int n, int dim, int n_vertices, int derivative,
                     const unsigned char* fixed_mask, const double* values,
                     const double* times, double* coeffs_out) {
  if (n % 2 != 0 || n_vertices < 2) return 1;
  const int h = n / 2;
  const int K = n_vertices - 1;
  Mat bc;
  base_coefficients(n, &bc);

  // Compact column order: fixed (vertex, deriv) lexicographic, then free.
  std::vector<int> col(n_vertices * h, -1);
  int nf = 0;
  for (int v = 0; v < n_vertices; ++v)
    for (int j = 0; j < h; ++j)
      if (fixed_mask[v * h + j]) col[v * h + j] = nf++;
  int np = 0;
  for (int v = 0; v < n_vertices; ++v)
    for (int j = 0; j < h; ++j)
      if (!fixed_mask[v * h + j]) col[v * h + j] = nf + np++;
  const int nt = nf + np;

  // Per-segment H_i = A^{-T} Q A^{-1}, scattered into R via the gather map.
  Mat R(nt * nt, 0.0);
  std::vector<Mat> a_inv_all(K);
  std::vector<std::vector<int>> gidx(K, std::vector<int>(n));
  for (int s = 0; s < K; ++s) {
    const double T = times[s];
    // A: derivatives 0..h-1 at 0 and at T.
    Mat A(n * n, 0.0);
    for (int i = 0; i < h; ++i) {
      sample_row(bc, n, i, 0.0, &A[i * n]);
      sample_row(bc, n, i, T, &A[(i + h) * n]);
    }
    // A^{-1} by solving A X = I.
    Mat Acopy = A, Ainv(n * n, 0.0);
    for (int i = 0; i < n; ++i) Ainv[i * n + i] = 1.0;
    if (!gauss_solve(Acopy, Ainv, n, n)) return 2;
    a_inv_all[s] = Ainv;

    // Q[r][c] = bc[d][r] bc[d][c] T^(r+c+1-2d) * 2/(r+c+1-2d).
    Mat Q(n * n, 0.0);
    for (int r = derivative; r < n; ++r)
      for (int c = derivative; c < n; ++c) {
        const int e = r + c + 1 - 2 * derivative;
        Q[r * n + c] = bc[derivative * n + r] * bc[derivative * n + c] *
                       std::pow(T, e) * 2.0 / e;
      }
    // H = Ainv^T Q Ainv.
    Mat QA(n * n, 0.0);
    for (int r = 0; r < n; ++r)
      for (int c = 0; c < n; ++c) {
        double acc = 0.0;
        for (int k = 0; k < n; ++k) acc += Q[r * n + k] * Ainv[k * n + c];
        QA[r * n + c] = acc;
      }
    Mat H(n * n, 0.0);
    for (int r = 0; r < n; ++r)
      for (int c = 0; c < n; ++c) {
        double acc = 0.0;
        for (int k = 0; k < n; ++k) acc += Ainv[k * n + r] * QA[k * n + c];
        H[r * n + c] = acc;
      }
    // Gather map: rows 0..h-1 -> vertex s, rows h..n-1 -> vertex s+1.
    for (int j = 0; j < h; ++j) {
      gidx[s][j] = col[s * h + j];
      gidx[s][h + j] = col[(s + 1) * h + j];
    }
    for (int r = 0; r < n; ++r)
      for (int c = 0; c < n; ++c)
        R[gidx[s][r] * nt + gidx[s][c]] += H[r * n + c];
  }

  // d_f values.
  Mat df(nf * dim, 0.0);
  for (int v = 0; v < n_vertices; ++v)
    for (int j = 0; j < h; ++j)
      if (fixed_mask[v * h + j])
        for (int d = 0; d < dim; ++d)
          df[col[v * h + j] * dim + d] = values[(v * h + j) * dim + d];

  // dp = -Rpp^{-1} Rpf df.
  Mat dp(np * dim, 0.0);
  if (np > 0) {
    Mat rpp(np * np);
    for (int r = 0; r < np; ++r)
      for (int c = 0; c < np; ++c)
        rpp[r * np + c] = R[(nf + r) * nt + (nf + c)];
    Mat rhs(np * dim, 0.0);
    for (int r = 0; r < np; ++r)
      for (int d = 0; d < dim; ++d) {
        double acc = 0.0;
        for (int c = 0; c < nf; ++c)
          acc += R[(nf + r) * nt + c] * df[c * dim + d];
        rhs[r * dim + d] = -acc;
      }
    if (!gauss_solve(rpp, rhs, np, dim)) return 3;
    dp = rhs;
  }

  // Coefficient recovery: p = A^{-1} d per segment.
  for (int s = 0; s < K; ++s) {
    for (int d = 0; d < dim; ++d) {
      double dseg[64];
      for (int r = 0; r < n; ++r) {
        const int g = gidx[s][r];
        dseg[r] = (g < nf) ? df[g * dim + d] : dp[(g - nf) * dim + d];
      }
      for (int r = 0; r < n; ++r) {
        double acc = 0.0;
        for (int k = 0; k < n; ++k)
          acc += a_inv_all[s][r * n + k] * dseg[k];
        coeffs_out[(s * n + r) * dim + d] = acc;
      }
    }
  }
  return 0;
}

}  // extern "C"
