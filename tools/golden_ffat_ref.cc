// golden_ffat_ref — golden FFAT transfer lookups from the REFERENCE's own
// cubemap code (ffat_solver.h included read-only from /root/reference; see
// tools/golden_ref.cc for the policy). Minimal igl stubs satisfy the
// compile-time-only serialization interface.
//
// Build:
//   g++ -O2 -std=c++17 -I$EIGEN_INC -I$IGL_STUB -I/root/reference \
//       -o golden_ffat_ref tools/golden_ffat_ref.cc
//
// Usage:
//   golden_ffat_ref <map.bin> <listeners.f64> <n_listeners> <out.f64>
//
// map.bin layout (all little-endian f64 unless noted):
//   k, center[3], cell_size, bbox_low[3], bbox_top[3],
//   low_corners[6*3], n_elements[6*2] (f64-encoded ints),
//   strides[6] (f64-encoded ints), n_psi (f64-encoded int), psi[n_psi]
// listeners.f64: n_listeners * 3 doubles.
// Output: n_listeners doubles of |GetMapVal(p)|.

#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <vector>

#include "Eigen/Dense"
#include "ffat_solver.h"

namespace Gpu_Wavesolver {
// The reference forward-declares this struct and befriends it
// (ffat_solver.h:29, 183, 294); defining it here gives the golden tool
// sanctioned access to populate the map's fields directly.
struct FFAT_Map_Serialize_Double {
  static FFAT_Map<double, 3> Build(const std::vector<double>& blob) {
    size_t i = 0;
    auto next = [&]() { return blob.at(i++); };
    FFAT_Map<double, 3> m3;
    FFAT_Map<double, 1> m1;
    m3._k = next();
    for (int d = 0; d < 3; ++d) m3._center(d) = next();
    m1._cellSize = next();
    for (int d = 0; d < 3; ++d) m1._bboxLow(d) = next();
    for (int d = 0; d < 3; ++d) m1._bboxTop(d) = next();
    m1._lowCorners.resize(6);
    for (int f = 0; f < 6; ++f)
      for (int d = 0; d < 3; ++d) m1._lowCorners[f](d) = next();
    m1._N_elements.resize(6);
    for (int f = 0; f < 6; ++f) {
      const int nu = static_cast<int>(next());
      const int nv = static_cast<int>(next());
      m1._N_elements[f] = {nu, nv};
    }
    m1._strides.resize(6);
    for (int f = 0; f < 6; ++f) m1._strides[f] = static_cast<int>(next());
    m1._center = m3._center;
    const int n_psi = static_cast<int>(next());
    m3._Psi.resize(n_psi, 1);
    for (int p = 0; p < n_psi; ++p) m3._Psi(p, 0) = next();
    m3._shells.resize(3);
    m3._shells[2] = m1;
    m3._is_compressed = false;
    return m3;
  }
};
}  // namespace Gpu_Wavesolver

int main(int argc, char** argv) {
  if (argc != 5) {
    std::fprintf(stderr,
                 "usage: %s map.bin listeners.f64 n out.f64\n", argv[0]);
    return 1;
  }
  std::ifstream mf(argv[1], std::ios::binary);
  mf.seekg(0, std::ios::end);
  const size_t n_doubles = static_cast<size_t>(mf.tellg()) / sizeof(double);
  mf.seekg(0);
  std::vector<double> blob(n_doubles);
  mf.read(reinterpret_cast<char*>(blob.data()),
          n_doubles * sizeof(double));

  auto map = Gpu_Wavesolver::FFAT_Map_Serialize_Double::Build(blob);

  const int n = std::atoi(argv[3]);
  std::vector<double> listeners(3 * n);
  std::ifstream lf(argv[2], std::ios::binary);
  lf.read(reinterpret_cast<char*>(listeners.data()),
          3 * n * sizeof(double));

  std::ofstream out(argv[4], std::ios::binary);
  for (int j = 0; j < n; ++j) {
    Eigen::Matrix<double, 3, 1> p(listeners[3 * j], listeners[3 * j + 1],
                                  listeners[3 * j + 2]);
    const double v = std::abs(map.GetMapVal(p, false));
    out.write(reinterpret_cast<const char*>(&v), sizeof(double));
  }
  return 0;
}
