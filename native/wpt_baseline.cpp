// Serial CPU wavelet-packet-transform baseline.
//
// The reference package (WaveletsExt.jl, pure Julia) publishes no benchmark
// numbers and Julia is not available in this image, so this program provides
// the measured stand-in for the "serial CPU reference" required by
// BASELINE.md: the same O(B * n * L * filtlen) algorithm structure as the
// reference's inner loops (serial scalar loops over batch x level x node x
// position, periodic indexing), written independently in C++ and compiled
// -O3.  Compiled Julia and C++ are comparable for loops of this shape, so
// this is a fair (if anything, favorable-to-the-baseline) reference point.
//
// Usage: wpt_baseline [B n L iters]   -> prints JSON with Msamples/s.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

static const double DB4[8] = {
    0.2303778133088965,  0.7148465705529157,  0.6308807679298589,
    -0.02798376941685985, -0.1870348117190931, 0.03084138183556076,
    0.03288301166688519, -0.01059740178506903};

int main(int argc, char** argv) {
  int B = argc > 1 ? atoi(argv[1]) : 64;
  int n = argc > 2 ? atoi(argv[2]) : 4096;
  int L = argc > 3 ? atoi(argv[3]) : 8;
  int iters = argc > 4 ? atoi(argv[4]) : 5;
  const int F = 8;
  double lo[F], hi[F];
  for (int t = 0; t < F; ++t) lo[t] = DB4[t];
  for (int s = 0; s < F; ++s)
    hi[s] = ((s + 1) % 2 == 0 ? -1.0 : 1.0) * DB4[F - 1 - s];

  std::vector<double> x((size_t)B * n), cur(n), w1(n / 2), w2(n / 2);
  srand(7);
  for (auto& v : x) v = (double)rand() / RAND_MAX - 0.5;

  auto t0 = std::chrono::steady_clock::now();
  double sink = 0;
  for (int it = 0; it < iters; ++it) {
    for (int b = 0; b < B; ++b) {
      for (int i = 0; i < n; ++i) cur[i] = x[(size_t)b * n + i];
      for (int d = 0; d < L; ++d) {
        int nodes = 1 << d, m = n >> d, h = m / 2;
        for (int node = 0; node < nodes; ++node) {
          double* v = &cur[node * m];
          for (int i = 0; i < h; ++i) {
            double a = 0, dtl = 0;
            for (int t = 0; t < F; ++t) a += lo[t] * v[(2 * i + t) % m];
            for (int s = 0; s < F; ++s)
              dtl += hi[s] * v[(((2 * i + 2 - F + s) % m) + m) % m];
            w1[i] = a;
            w2[i] = dtl;
          }
          for (int i = 0; i < h; ++i) v[i] = w1[i];
          for (int i = 0; i < h; ++i) v[h + i] = w2[i];
        }
      }
      sink += cur[0];
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  double msps = (double)B * n * iters / secs / 1e6;
  printf("{\"baseline\": \"cpu-serial-c++\", \"B\": %d, \"n\": %d, \"L\": %d, "
         "\"msamples_per_s\": %.3f, \"sink\": %.3e}\n", B, n, L, msps, sink);
  return 0;
}
