"""IO format tests: .modes binary, material txt, .fatcube protobuf, meta."""
import struct

import numpy as np
import pytest

from openpbso_tpu.io import (FatcubeMap, ModalMaterial, ModeData,
                             load_all_fatcubes, load_fatcube, maps_match_bits,
                             read_material, read_meta, read_modes,
                             resolve_model_dir, save_fatcube, write_material,
                             write_meta, write_modes)
from openpbso_tpu.io.fatcube import decode_fatcube, encode_fatcube
from openpbso_tpu.io.meta import ModelPaths, read_freq_threshold
from openpbso_tpu.io.objmesh import icosphere, per_vertex_normals, read_obj, write_obj
from openpbso_tpu.utils.synth import synth_fatcube, synth_mode_data, CERAMIC


def test_modes_roundtrip(tmp_path):
    data = synth_mode_data(num_modes=8, num_vertices=10, seed=1)
    path = str(tmp_path / "t.modes")
    write_modes(path, data)
    back = read_modes(path)
    np.testing.assert_array_equal(back.omega_squared, data.omega_squared)
    np.testing.assert_array_equal(back.modes, data.modes)
    assert back.num_modes == 8 and back.num_dof == 30


def test_modes_binary_layout(tmp_path):
    """Byte layout must match the reference (ModeData.h:62-107):
    int32 nDOF, int32 nModes, f64 eigenvalues, f64 eigenvectors."""
    data = ModeData(omega_squared=np.array([4.0, 9.0]),
                    modes=np.arange(12, dtype=np.float64).reshape(2, 6))
    path = str(tmp_path / "t.modes")
    write_modes(path, data)
    raw = open(path, "rb").read()
    n_dof, n_modes = struct.unpack("<ii", raw[:8])
    assert (n_dof, n_modes) == (6, 2)
    vals = np.frombuffer(raw[8:], dtype="<f8")
    np.testing.assert_array_equal(vals[:2], [4.0, 9.0])
    np.testing.assert_array_equal(vals[2:], np.arange(12.0))


def test_modes_audible_culling():
    data = synth_mode_data(num_modes=16, num_vertices=5,
                           f_low=100.0, f_high=30000.0)
    freqs = data.frequencies_hz(CERAMIC.density)
    n = data.num_modes_audible(CERAMIC.density, 20000.0)
    assert n == int(np.sum(freqs <= 20000.0))
    assert data.num_modes_audible(CERAMIC.density, 1.0) == 0
    assert data.num_modes_audible(CERAMIC.density, 1e9) == 16


def test_material_roundtrip(tmp_path):
    path = str(tmp_path / "mat.txt")
    write_material(path, CERAMIC)
    m = read_material(path)
    assert m.density == CERAMIC.density
    assert m.youngs_modulus == CERAMIC.youngs_modulus
    assert m.poisson_ratio == CERAMIC.poisson_ratio
    assert m.alpha == CERAMIC.alpha and m.beta == CERAMIC.beta


def test_material_comment_skipping(tmp_path):
    path = str(tmp_path / "mat.txt")
    with open(path, "w") as f:
        f.write("# a comment\n# another\n2700 7.2e10 0.19 6 1e-7\n")
    m = read_material(path)
    assert m.density == 2700 and m.beta == 1e-7


def test_material_damping_formulas():
    omega = 2 * np.pi * 440.0
    xi = CERAMIC.xi(omega)
    assert xi == pytest.approx(0.5 * (CERAMIC.alpha / omega
                                      + CERAMIC.beta * omega))
    assert CERAMIC.omega_d(omega) == pytest.approx(
        omega * np.sqrt(1 - xi ** 2))


def test_fatcube_roundtrip(tmp_path):
    m = synth_fatcube(3, 440.0, n=6, seed=2)
    path = str(tmp_path / "m.fatcube")
    save_fatcube(path, m)
    back = load_fatcube(path)
    assert maps_match_bits(m, back)
    assert back.mode_id == 3 and back.k == m.k


def test_fatcube_wire_stability():
    """encode(decode(x)) must be byte-identical (idempotent codec)."""
    m = synth_fatcube(0, 1000.0, n=4)
    b1 = encode_fatcube(m)
    b2 = encode_fatcube(decode_fatcube(b1))
    assert b1 == b2


def test_fatcube_load_all(tmp_path):
    for i in (0, 2, 5):
        save_fatcube(str(tmp_path / f"{i}.fatcube"),
                     synth_fatcube(i, 100.0 * (i + 1), n=4))
    (tmp_path / "ignore.txt").write_text("x")
    maps = load_all_fatcubes(str(tmp_path))
    assert sorted(maps) == [0, 2, 5]
    assert maps[5].k == pytest.approx(2 * np.pi * 600.0 / 343.0)


def test_meta_roundtrip(tmp_path):
    paths = ModelPaths("a.obj", "b.modes", "c.txt", "d_ffat")
    p = str(tmp_path / "m.meta")
    write_meta(p, paths)
    back = read_meta(p)
    assert back == paths


def test_resolve_model_dir(tmp_path):
    (tmp_path / "wine.tet.obj").write_text("")
    got = resolve_model_dir(str(tmp_path))
    assert got.obj_file.endswith("wine.tet.obj")
    assert got.modes_file.endswith("wine_surf.modes")
    assert got.material_file.endswith("wine_material.txt")
    assert got.ffat_dir.endswith("wine_ffat_maps")


def test_freq_threshold(tmp_path):
    assert read_freq_threshold(str(tmp_path)) == 20000.0
    (tmp_path / "freq_threshold.txt").write_text("12345.0\n")
    assert read_freq_threshold(str(tmp_path)) == 12345.0


def test_obj_roundtrip(tmp_path):
    v, f = icosphere(subdivisions=1, radius=2.0)
    path = str(tmp_path / "s.obj")
    write_obj(path, v, f)
    v2, f2 = read_obj(path)
    np.testing.assert_allclose(v2, v, atol=1e-12)
    np.testing.assert_array_equal(f2, f)
    assert np.allclose(np.linalg.norm(v2, axis=1), 2.0)


def test_vertex_normals_sphere():
    v, f = icosphere(subdivisions=2)
    vn = per_vertex_normals(v, f)
    # on a sphere, normals point radially outward
    cos = np.sum(vn * v / np.linalg.norm(v, axis=1, keepdims=True), axis=1)
    assert np.all(cos > 0.99)


def test_vector_io_roundtrips(tmp_path):
    from openpbso_tpu.io.vectors import (read_complex_vector,
                                         read_vector_ascii,
                                         read_vector_binary,
                                         write_complex_vector,
                                         write_vector_ascii,
                                         write_vector_binary)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(17)
    pa = str(tmp_path / "v.txt")
    write_vector_ascii(pa, v)
    np.testing.assert_allclose(read_vector_ascii(pa), v, rtol=1e-15)
    pb = str(tmp_path / "v.bin")
    write_vector_binary(pb, v)
    np.testing.assert_array_equal(read_vector_binary(pb), v)
    c = rng.standard_normal(9) + 1j * rng.standard_normal(9)
    pc = str(tmp_path / "v.cplx")
    write_complex_vector(pc, c)
    np.testing.assert_array_equal(read_complex_vector(pc), c)


def test_fatcube_decoder_fuzz():
    """Random and mutated buffers must raise cleanly, never crash/hang."""
    from openpbso_tpu.io.fatcube import decode_fatcube, encode_fatcube
    from openpbso_tpu.utils.synth import synth_fatcube
    rng = np.random.default_rng(0)
    good = encode_fatcube(synth_fatcube(1, 500.0, n=5))
    for i in range(120):
        if i < 60:  # pure noise
            buf = rng.integers(0, 256, rng.integers(0, 200),
                               dtype=np.uint8).tobytes()
        else:  # mutate valid bytes (truncation + bit flips)
            b = bytearray(good[: rng.integers(1, len(good))])
            for _ in range(rng.integers(1, 8)):
                b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
            buf = bytes(b)
        try:
            decode_fatcube(buf)
        except (ValueError, IndexError, OverflowError):
            pass


def test_native_fatcube_decoder_fuzz():
    pytest.importorskip("openpbso_tpu.native.bindings")
    from openpbso_tpu.native.bindings import load_native, native_decode_fatcube
    if load_native() is None:
        pytest.skip("native lib unavailable")
    from openpbso_tpu.io.fatcube import encode_fatcube
    from openpbso_tpu.utils.synth import synth_fatcube
    rng = np.random.default_rng(1)
    good = encode_fatcube(synth_fatcube(1, 500.0, n=5))
    for i in range(120):
        if i < 60:
            buf = rng.integers(0, 256, rng.integers(0, 200),
                               dtype=np.uint8).tobytes()
        else:
            b = bytearray(good[: rng.integers(1, len(good))])
            for _ in range(rng.integers(1, 8)):
                b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
            buf = bytes(b)
        native_decode_fatcube(buf)  # None or a map; never a crash


def test_prepare_meta_dir(tmp_path):
    from openpbso_tpu.io.meta import prepare_meta_dir, read_meta
    from openpbso_tpu.utils.synth import synth_model_dir
    synth_model_dir(str(tmp_path), "a", num_modes=4, subdivisions=0,
                    ffat_n=4)
    synth_model_dir(str(tmp_path), "b", num_modes=4, subdivisions=0,
                    ffat_n=4)
    written = prepare_meta_dir(str(tmp_path))
    assert len(written) == 2
    meta = read_meta(written[0])
    assert meta.obj_file.endswith("a.tet.obj")


def test_complex_vector_matches_cpp_reference_bytes(tmp_path):
    """Byte parity with the reference's Read/WriteComplexVector
    (io.h:24-90): goldens written by the reference's own templated
    helpers (tools/golden_io_ref.cc)."""
    import os
    from openpbso_tpu.io.vectors import (read_complex_vector,
                                         write_complex_vector)
    golden = os.path.join(os.path.dirname(__file__), "golden")
    v = np.array([0.125 - 3.5j, 1e-7 + 42.0j, -0.0078125 + 123456.75j,
                  3.14159265358979312 - 2.71828182845904509j,
                  complex(0.0, -1.0)])  # NOT -1.0j: that has real -0.0
    got_bin = read_complex_vector(os.path.join(golden, "complex_ref.bin"))
    np.testing.assert_array_equal(got_bin, v)
    got_txt = read_complex_vector(os.path.join(golden, "complex_ref.txt"),
                                  binary=False)
    np.testing.assert_allclose(got_txt, v, rtol=0, atol=1e-15)
    # our writers reproduce the reference files byte-for-byte
    pb = tmp_path / "ours.bin"
    write_complex_vector(str(pb), v)
    assert pb.read_bytes() == open(
        os.path.join(golden, "complex_ref.bin"), "rb").read()
    pt = tmp_path / "ours.txt"
    write_complex_vector(str(pt), v, binary=False)
    assert pt.read_text() == open(
        os.path.join(golden, "complex_ref.txt")).read()


def test_read_modes_rejects_huge_header(tmp_path):
    """A corrupt header claiming exabytes of payload must raise, not
    pre-allocate (round-2 review finding)."""
    import struct

    import pytest as _pytest

    from openpbso_tpu.io.mode_data import read_modes
    p = tmp_path / "corrupt.modes"
    p.write_bytes(struct.pack("<ii", 1 << 30, 1 << 30) + b"\x00" * 64)
    with _pytest.raises(ValueError, match="claims"):
        read_modes(str(p))


def test_committed_demo_assets_load():
    """assets/demo is a COMMITTED dataset (SURVEY section 2 row 21 —
    the reference ships example assets; ours are generated once and
    checked in): it must resolve, load, and synthesize out of the box."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.ops.ffat import build_ffat
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "demo")
    assert os.path.isdir(root), "committed demo assets missing"
    model = load_model(resolve_model_dir(root, "demo"))
    assert model.num_modes_audible > 0 and len(model.ffat_maps) > 0
    n = model.num_modes_audible
    bank = bank_from_material(
        model.material.density, model.modes.omega_squared[:n],
        model.material.alpha, model.material.beta, block_size=128,
        dtype=jnp.float32)
    sess = ModalSession(bank, ffat=build_ffat(model.ffat_maps,
                                              bank.num_modes),
                        config=SolverConfig(block_size=128))
    sess.set_listener(np.asarray([0.8, 0.4, 0.3]))
    sess.hit(0, model.modal_force_vertex(3), kind="gaussian",
             width_us=300.0)
    out = sess.render(6)
    assert np.isfinite(out).all() and np.abs(out).max() > 0
