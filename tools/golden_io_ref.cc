// Golden generator for complex-vector IO parity: writes binary + ASCII
// complex vectors through the REFERENCE's own templated helpers
// (/root/reference/io.h:24-90) so the Python reimplementation
// (openpbso_tpu/io/vectors.py) can be byte-compared against them.
// Usage: golden_io_ref <outdir>
#include <complex>
#include <cstdio>
#include <string>
#include <Eigen/Dense>
#include "io.h"

int main(int argc, char** argv) {
  if (argc < 2) return 1;
  const std::string dir = argv[1];
  Eigen::Matrix<std::complex<double>, Eigen::Dynamic, 1> v(5);
  v << std::complex<double>(0.125, -3.5),
       std::complex<double>(1e-7, 42.0),
       std::complex<double>(-0.0078125, 123456.75),
       std::complex<double>(3.14159265358979312, -2.71828182845904509),
       std::complex<double>(0.0, -1.0);
  Gpu_Wavesolver::WriteComplexVector<double>((dir + "/complex_ref.bin").c_str(), v, true);
  Gpu_Wavesolver::WriteComplexVector<double>((dir + "/complex_ref.txt").c_str(), v, false);
  // round-trip through the reference reader to prove self-consistency
  Eigen::Matrix<std::complex<double>, Eigen::Dynamic, 1> r;
  Gpu_Wavesolver::ReadComplexVector<double, double>((dir + "/complex_ref.bin").c_str(), r,
                                    true);
  if (r.rows() != v.rows() || (r - v).norm() != 0.0) return 2;
  Gpu_Wavesolver::ReadComplexVector<double, double>((dir + "/complex_ref.txt").c_str(), r,
                                    false);
  if (r.rows() != v.rows() || (r - v).norm() > 1e-12) return 3;
  std::puts("golden_io_ref OK");
  return 0;
}
