#!/usr/bin/env bash
# Regenerate tests/golden/cpp_reference_*.npy by compiling and running the
# reference implementation (read-only at /root/reference). Eigen headers
# come from tensorflow's bundled copy.
set -euo pipefail
cd "$(dirname "$0")/.."

EIGEN=${EIGEN:-/opt/venv/lib/python3.12/site-packages/tensorflow/include}
REF=${REF:-/root/reference}

g++ -O2 -std=c++17 -I"$EIGEN" -I"$REF" -o /tmp/golden_ref tools/golden_ref.cc

# FFAT lookups need minimal igl stubs (compile-time-only serialization API)
STUB=$(mktemp -d)/igl
mkdir -p "$STUB/opengl/glfw"
cat > "$STUB/serialize.h" <<'STUBEOF'
#pragma once
#include <string>
namespace igl {
class Serializable {
 public:
  virtual ~Serializable() = default;
  virtual void InitSerialization() {}
  template <typename T> void Add(T&, const std::string&) {}
};
template <typename T>
void serialize(const T&, const std::string&, const std::string&, bool) {}
template <typename T>
void deserialize(T&, const std::string&, const std::string&) {}
}
STUBEOF
echo '#pragma once' > "$STUB/opengl/glfw/Viewer.h"
printf '#pragma once\n#include <string>\nnamespace igl { template <typename V, typename F> bool write_triangle_mesh(const std::string&, const V&, const F&) { return false; } }\n' > "$STUB/write_triangle_mesh.h"
g++ -O2 -std=c++17 -I"$EIGEN" -I"$(dirname "$STUB")" -I"$REF" \
    -o /tmp/golden_ffat_ref tools/golden_ffat_ref.cc

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

# FFAT lookup golden
from openpbso_tpu.utils.synth import synth_fatcube
m = synth_fatcube(0, 700.0, n=14, seed=11)
s = m.shell
blob = [m.k, *m.center, s.cell_size, *s.bbox_low, *s.bbox_top]
blob += list(s.low_corners.ravel())
blob += [float(x) for x in s.n_elements.ravel()]
blob += [float(x) for x in s.strides]
blob += [float(m.psi.shape[0])] + list(m.psi)
np.asarray(blob, "<f8").tofile("/tmp/ffat_map.bin")
rng = np.random.default_rng(4)
listeners = rng.uniform(0.5, 2.0, (40, 3)) * rng.choice([-1.0, 1.0], (40, 3))
listeners.astype("<f8").tofile("/tmp/ffat_listeners.f64")
subprocess.run(["/tmp/golden_ffat_ref", "/tmp/ffat_map.bin",
                "/tmp/ffat_listeners.f64", "40", "/tmp/ffat_out.f64"],
               check=True)
np.savez("tests/golden/cpp_reference_ffat.npz", listeners=listeners,
         values=np.fromfile("/tmp/ffat_out.f64", "<f8"))
print("wrote cpp_reference_ffat.npz")
EOF
