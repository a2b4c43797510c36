// Native CPU oracle for the counter-based DRM RNG.
//
// Independent C++ implementation of the hash pipeline described in
// tt_sketch_tpu/rng/hash_rng.py (the TPU-native rebuild of the reference's
// single native component, /root/reference/tt_sketch/drm/fast_lazy_gaussian.pyx):
//
//   flat(multi-index) -> salt_j = hash(j) + seed -> h = hash(flat + salt_j)
//   uniform = (h & (2^52-1)) / 2^52,  exponent-parity sign, ndtri for normals.
//
// Used (a) as the bit-parity oracle in tests (cross-checking the numpy and
// JAX implementations against a third, independently written pipeline) and
// (b) as a fast multithreaded host-side generator for CPU-resident work
// (data loading, host-side verification of device sketches).
//
// Build: g++ -O3 -fopenmp -shared -fPIC hash_rng.cpp -o libhashrng.so
// Exposed via ctypes in tt_sketch_tpu/native/__init__.py.

#include <cstdint>
#include <cmath>
#include <cstddef>

namespace {

constexpr uint64_t MULT1 = 0xBF58476D1CE4E5B9ULL;
constexpr uint64_t MULT2 = 0x94D049BB133111EBULL;
constexpr uint64_t ADD1 = 0x4BE98134A5976FD3ULL;
constexpr uint64_t MASK52 = (1ULL << 52) - 1ULL;
constexpr double INV_2_52 = 1.0 / 4503599627370496.0;  // 2^-52

inline uint64_t hash_u64(uint64_t x) {
  uint64_t r = x + ADD1;
  r ^= r >> 30;
  r *= MULT1;
  r ^= r >> 27;
  r *= MULT2;
  r ^= r >> 31;
  return r;
}

// ---------------------------------------------------------------------------
// Cephes-style inverse normal CDF (double precision).
// Public-domain algorithm (Moshier, Cephes `ndtri.c`), the same one scipy
// delegates to; rational approximations on the central region and two tail
// regions, |relative error| < ~1e-15.
// ---------------------------------------------------------------------------

constexpr double S2PI = 2.50662827463100050242E0;  // sqrt(2*pi)
constexpr double EXP_M2 = 0.13533528323661269189;  // exp(-2)

const double P0[5] = {
    -5.99633501014107895267E1, 9.80010754185999661536E1,
    -5.66762857469070293439E1, 1.39312609387279679503E1,
    -1.23916583867381258016E0,
};
const double Q0[8] = {
    1.95448858338141759834E0,  4.67627912898881538453E0,
    8.63602421390890590575E1,  -2.25462687854119370527E2,
    2.00260212380060660359E2,  -8.20372256168538034578E1,
    1.59056225126211695515E1,  -1.18331621121330003142E0,
};
const double P1[9] = {
    4.05544892305962419923E0,   3.15251094599893866154E1,
    5.71628192246421288162E1,   4.40805073893200834700E1,
    1.46849561928858024014E1,   2.18663306850790267539E0,
    -1.40256079171354495875E-1, -3.50424626827848203418E-2,
    -8.57456785154685413611E-4,
};
const double Q1[8] = {
    1.57799883256466749731E1,   4.53907635128879210584E1,
    4.13172038254672030440E1,   1.50425385692907503408E1,
    2.50464946208309415979E0,   -1.42182922854787788574E-1,
    -3.80806407691578277194E-2, -9.33259480895457427372E-4,
};
const double P2[9] = {
    3.23774891776946035970E0,  6.91522889068984211695E0,
    3.93881025292474443415E0,  1.33303460815807542389E0,
    2.01485389549179081538E-1, 1.23716634817820021358E-2,
    3.01581553508235416007E-4, 2.65806974686737550832E-6,
    6.23974539184983651783E-9,
};
const double Q2[8] = {
    6.02427039364742014255E0,  3.67983563856160859403E0,
    1.37702099489081330271E0,  2.16236993594496635890E-1,
    1.34204006088543189037E-2, 3.28014464682127739104E-4,
    2.89247864745380683936E-6, 6.79019408009981274425E-9,
};

inline double polevl(double x, const double *coef, int n) {
  double ans = coef[0];
  for (int i = 1; i <= n; ++i) ans = ans * x + coef[i];
  return ans;
}

inline double p1evl(double x, const double *coef, int n) {
  double ans = x + coef[0];
  for (int i = 1; i < n; ++i) ans = ans * x + coef[i];
  return ans;
}

double ndtri(double y0) {
  if (y0 <= 0.0) return -HUGE_VAL;
  if (y0 >= 1.0) return HUGE_VAL;
  int code = 1;
  double y = y0;
  if (y > 1.0 - EXP_M2) {
    y = 1.0 - y;
    code = 0;
  }
  if (y > EXP_M2) {
    y = y - 0.5;
    const double y2 = y * y;
    double x = y + y * (y2 * polevl(y2, P0, 4) / p1evl(y2, Q0, 8));
    return x * S2PI;
  }
  double x = std::sqrt(-2.0 * std::log(y));
  const double x0 = x - std::log(x) / x;
  const double z = 1.0 / x;
  double x1;
  if (x < 8.0)
    x1 = z * polevl(z, P1, 8) / p1evl(z, Q1, 8);
  else
    x1 = z * polevl(z, P2, 8) / p1evl(z, Q2, 8);
  x = x0 - x1;
  if (code != 0) x = -x;
  return x;
}

}  // namespace

extern "C" {

void ts_hash_u64(const uint64_t *in, uint64_t *out, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) out[i] = hash_u64(in[i]);
}

void ts_ndtri(const double *in, double *out, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) out[i] = ndtri(in[i]);
}

// indices: (d, N) row-major (index array for mode k at indices + k*N).
// Column-major flatten: flat = sum_k idx_k * prod_{j<k} shape_j.
void ts_flat_index(const uint64_t *indices, const int64_t *shape, int64_t d,
                   int64_t N, uint64_t *out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < N; ++i) {
    uint64_t flat = indices[i];
    uint64_t prod = static_cast<uint64_t>(shape[0]);
    for (int64_t k = 1; k < d; ++k) {
      flat += indices[k * N + i] * prod;
      prod *= static_cast<uint64_t>(shape[k]);
    }
    out[i] = flat;
  }
}

// out: (N, rank_max - rank_min) row-major uniforms in [0, 1).
void ts_flat_to_uniform(const uint64_t *flat, int64_t N, int64_t rank_min,
                        int64_t rank_max, uint64_t seed, double *out) {
  const int64_t R = rank_max - rank_min;
  seed %= (1ULL << 63);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < N; ++i) {
    for (int64_t j = 0; j < R; ++j) {
      const uint64_t salt = hash_u64(static_cast<uint64_t>(rank_min + j)) + seed;
      const uint64_t h = hash_u64(flat[i] + salt);
      out[i * R + j] = static_cast<double>(h & MASK52) * INV_2_52;
    }
  }
}

// out: (N, rank_max - rank_min) row-major standard normals.
void ts_flat_to_normal(const uint64_t *flat, int64_t N, int64_t rank_min,
                       int64_t rank_max, uint64_t seed, double *out) {
  const int64_t R = rank_max - rank_min;
  seed %= (1ULL << 63);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < N; ++i) {
    for (int64_t j = 0; j < R; ++j) {
      const uint64_t salt = hash_u64(static_cast<uint64_t>(rank_min + j)) + seed;
      const uint64_t h = hash_u64(flat[i] + salt);
      out[i * R + j] = ndtri(static_cast<double>(h & MASK52) * INV_2_52);
    }
  }
}

// Sparse-sign rows: nnz hashed values with column salts [0, nnz); the sign at
// slot j is ((h >> 52) & 0x7FF) parity mapped to ±1; an in-row Fisher-Yates
// pass then swaps slot j with slot floor(u_j * (rank - j)) + j.  Writes the
// column slice [rank_min, rank_max) of the (N, rank) matrix as int16.
void ts_flat_to_sparse_sign(const uint64_t *flat, int64_t N, int64_t rank,
                            int64_t rank_min, int64_t rank_max, int64_t nnz,
                            uint64_t seed, int16_t *out) {
  const int64_t R = rank_max - rank_min;
  seed %= (1ULL << 63);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < N; ++i) {
    // Build the full row on the stack-ish heap buffer (rank is small).
    int16_t row[4096];
    for (int64_t j = 0; j < rank; ++j) row[j] = 0;
    double u[4096];
    for (int64_t j = 0; j < nnz; ++j) {
      const uint64_t salt = hash_u64(static_cast<uint64_t>(j)) + seed;
      const uint64_t h = hash_u64(flat[i] + salt);
      u[j] = static_cast<double>(h & MASK52) * INV_2_52;
      const uint64_t expo = (h >> 52) & 0x7FFULL;
      row[j] = static_cast<int16_t>((expo & 1ULL) * 2) - 1;
    }
    for (int64_t j = 0; j < nnz; ++j) {
      const int64_t pos =
          static_cast<int64_t>(u[j] * static_cast<double>(rank - j)) + j;
      const int16_t tmp = row[j];
      row[j] = row[pos];
      row[pos] = tmp;
    }
    for (int64_t j = 0; j < R; ++j) out[i * R + j] = row[rank_min + j];
  }
}

}  // extern "C"
