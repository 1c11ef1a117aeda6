// golden_ref — generates golden waveforms by running the REFERENCE
// implementation itself (headers included read-only from /root/reference;
// no reference code is copied into this repo — this tool exists so the
// framework's output can be diffed against the literal C++ reference per
// the BASELINE "<= -60 dB vs the C++ reference" contract).
//
// Build (Eigen via tensorflow's bundled headers):
//   g++ -O2 -std=c++17 -I$EIGEN_INC -I/root/reference \
//       -o golden_ref tools/golden_ref.cc
//
// Usage:
//   golden_ref <modes.f64> <n_modes> <density> <alpha> <beta> \
//              <space.f64> <force:point|gaussian> <width_us> \
//              <n_blocks> <out.f64>
//
// modes.f64: n_modes float64 omegaSquared values (undivided eigenvalues).
// space.f64: n_modes float64 modal force amplitudes.
// Output: n_blocks * 513 float64 samples of sum_m q_m * 1e7 (the unit
// transfer), matching ModalSolver::step's hot loop with one force message.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

#include "Eigen/Dense"
#include "config.h"
#include "forces.h"
#include "modal_integrator.h"

static std::vector<double> read_f64(const char* path, size_t count) {
  std::vector<double> out(count);
  std::ifstream f(path, std::ios::binary);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
  f.read(reinterpret_cast<char*>(out.data()), count * sizeof(double));
  if (!f) { std::fprintf(stderr, "short read %s\n", path); std::exit(2); }
  return out;
}

int main(int argc, char** argv) {
  if (argc != 11) {
    std::fprintf(stderr, "usage: %s modes.f64 n density alpha beta "
                         "space.f64 point|gaussian width_us n_blocks "
                         "out.f64\n", argv[0]);
    return 1;
  }
  const int n = std::atoi(argv[2]);
  const double density = std::atof(argv[3]);
  const double alpha = std::atof(argv[4]);
  const double beta = std::atof(argv[5]);
  const std::string force_kind = argv[7];
  const double width_us = std::atof(argv[8]);
  const int n_blocks = std::atoi(argv[9]);

  const std::vector<double> omega2 = read_f64(argv[1], n);
  const std::vector<double> space_v = read_f64(argv[6], n);
  Eigen::Matrix<double, -1, 1> space(n);
  for (int i = 0; i < n; ++i) space(i) = space_v[i];

  std::unique_ptr<ModalIntegrator<double>> integrator(
      ModalIntegrator<double>::Build(density, omega2, alpha, beta,
                                     1.0 / SAMPLE_RATE, n));

  std::unique_ptr<Force<double, FRAMES_PER_BUFFER>> force;
  if (force_kind == "point") {
    force.reset(new PointForce<double, FRAMES_PER_BUFFER>());
  } else {
    force.reset(new GaussianForce<double, FRAMES_PER_BUFFER>(width_us));
  }

  const double unit_transfer = 1e7;  // TransMessage::setToUnit
  std::ofstream out(argv[10], std::ios::binary);
  bool alive = true;
  for (int blk = 0; blk < n_blocks; ++blk) {
    Eigen::Matrix<double, FRAMES_PER_BUFFER, 1> time_buf;
    time_buf.setZero();
    if (alive) alive = force->Add(time_buf);  // erased once exhausted
    Eigen::Matrix<double, -1, 1> space_buf =
        alive ? space : Eigen::Matrix<double, -1, 1>::Zero(n);
    for (int i = 0; i < FRAMES_PER_BUFFER; ++i) {
      const auto& q = integrator->Step(space_buf * time_buf(i));
      const double s = q.sum() * unit_transfer;
      out.write(reinterpret_cast<const char*>(&s), sizeof(double));
    }
  }
  return 0;
}
