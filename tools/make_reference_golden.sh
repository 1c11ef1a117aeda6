#!/usr/bin/env bash
# Regenerate tests/golden/cpp_reference_*.npy by compiling and running the
# reference implementation (read-only at /root/reference). Eigen headers
# come from tensorflow's bundled copy.
set -euo pipefail
cd "$(dirname "$0")/.."

EIGEN=${EIGEN:-/opt/venv/lib/python3.12/site-packages/tensorflow/include}
REF=${REF:-/root/reference}

g++ -O2 -std=c++17 -I"$EIGEN" -I"$REF" -o /tmp/golden_ref tools/golden_ref.cc

python - <<'EOF'
import numpy as np, subprocess
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data
md = synth_mode_data(24, 8, seed=0)
rng = np.random.default_rng(3)
space = rng.standard_normal(24)
md.omega_squared.astype("<f8").tofile("/tmp/g_modes.f64")
space.astype("<f8").tofile("/tmp/g_space.f64")
for kind, width, name in (("point", 0.0, "cpp_reference_point_1s"),
                          ("gaussian", 250.0, "cpp_reference_gaussian_1s")):
    subprocess.run(["/tmp/golden_ref", "/tmp/g_modes.f64", "24",
                    str(CERAMIC.density), str(CERAMIC.alpha),
                    str(CERAMIC.beta), "/tmp/g_space.f64", kind, str(width),
                    "86", "/tmp/g_out.f64"], check=True)
    ref = np.fromfile("/tmp/g_out.f64", "<f8")
    np.save(f"tests/golden/{name}.npy", ref.astype(np.float32))
    print("wrote", name, ref.shape)
EOF
