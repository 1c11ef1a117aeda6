"""Device FFAT lookup vs the float64 oracle cubemap math."""
import jax.numpy as jnp
import numpy as np
import pytest

from openpbso_tpu.ops.ffat import build_ffat, compute_transfer
from openpbso_tpu.utils.oracle import ffat_map_val
from openpbso_tpu.utils.synth import synth_fatcube


@pytest.fixture(scope="module")
def maps():
    return {i: synth_fatcube(i, 200.0 * (i + 1), n=10, seed=11)
            for i in range(6)}


def test_transfer_matches_oracle(maps):
    ffat = build_ffat(maps, num_modes=6, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    # listeners well outside the shell bbox (half extent 0.2)
    for _ in range(20):
        p = rng.uniform(-1.5, 1.5, 3)
        if np.max(np.abs(p)) < 0.4:
            p[np.argmax(np.abs(p))] = 0.8
        got = np.asarray(compute_transfer(ffat, jnp.asarray(p))[0])
        ref = np.array([ffat_map_val(maps[i], p) for i in range(6)])
        np.testing.assert_allclose(got[:6], ref, rtol=1e-9, atol=1e-12)


def test_transfer_f32_accuracy(maps, dberr):
    ffat = build_ffat(maps, num_modes=6, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    errs = []
    for _ in range(20):
        p = rng.uniform(0.5, 1.5, 3) * rng.choice([-1.0, 1.0], 3)
        got = np.asarray(compute_transfer(
            ffat, jnp.asarray(p, jnp.float32))[0])
        ref = np.array([ffat_map_val(maps[i], p) for i in range(6)])
        errs.append(dberr(got[:6], ref))
    assert max(errs) < -60.0


def test_transfer_face_coverage(maps):
    """Listeners straight down each axis hit all six faces consistently."""
    ffat = build_ffat(maps, num_modes=6, dtype=jnp.float64)
    for axis in range(3):
        for sign in (1.0, -1.0):
            p = np.zeros(3)
            p[axis] = sign * 1.0
            got = np.asarray(compute_transfer(ffat, jnp.asarray(p))[0])
            ref = np.array([ffat_map_val(maps[i], p) for i in range(6)])
            np.testing.assert_allclose(got[:6], ref, rtol=1e-9)


def test_transfer_edge_clamping(maps):
    """Rays hitting near face corners exercise the clamp path
    (ffat_solver.h:763-791)."""
    ffat = build_ffat(maps, num_modes=6, dtype=jnp.float64)
    corners = [np.array([c0, c1, c2])
               for c0 in (-0.999, 0.999) for c1 in (-0.999, 0.999)
               for c2 in (-0.999, 0.999)]
    for p in corners:
        got = np.asarray(compute_transfer(ffat, jnp.asarray(p))[0])
        ref = np.array([ffat_map_val(maps[i], p) for i in range(6)])
        np.testing.assert_allclose(got[:6], ref, rtol=1e-9)


def test_per_object_listeners(maps):
    """[O, 3] listener batch gives per-object rows."""
    ffat = build_ffat(maps, num_modes=6, dtype=jnp.float64)
    ps = np.array([[1.0, 0.2, -0.3], [-0.7, 0.9, 0.1], [0.0, 0.0, 2.0]])
    got = np.asarray(compute_transfer(ffat, jnp.asarray(ps)))
    assert got.shape[0] == 3
    for o in range(3):
        ref = np.array([ffat_map_val(maps[i], ps[o]) for i in range(6)])
        np.testing.assert_allclose(got[o, :6], ref, rtol=1e-9)


def test_missing_modes_masked(maps):
    """Modes without maps produce zero transfer (they are excluded from the
    reference's head(N) dot, modal_solver.h:267-269)."""
    ffat = build_ffat(maps, num_modes=8, dtype=jnp.float64)
    got = np.asarray(compute_transfer(
        ffat, jnp.asarray([1.0, 1.0, 1.0]))[0])
    assert np.all(got[6:] == 0.0)
    assert np.all(got[:6] > 0.0)


def test_compressed_toggle_oracle(maps):
    """Both resident Psi textures answer queries: compressed=True samples
    the compressed set (oracle-exact on it), False the raw one — the
    reference's GetMapVal(pos, useCompressed) (ffat_solver.h:1180-1214)."""
    from openpbso_tpu.ops.ffat_fit import compress_map
    cmaps = {i: compress_map(m) for i, m in maps.items()}
    ffat = build_ffat(maps, num_modes=6, dtype=jnp.float64,
                      compressed_maps=cmaps)
    assert ffat.geom.psi_c is not None
    rng = np.random.default_rng(6)
    for _ in range(8):
        p = rng.uniform(-1.5, 1.5, 3)
        if np.max(np.abs(p)) < 0.4:
            p[np.argmax(np.abs(p))] = 0.8
        raw = np.asarray(compute_transfer(ffat, jnp.asarray(p))[0])
        comp = np.asarray(compute_transfer(ffat, jnp.asarray(p),
                                           compressed=True)[0])
        ref_raw = np.array([ffat_map_val(maps[i], p) for i in range(6)])
        ref_comp = np.array([ffat_map_val(cmaps[i], p) for i in range(6)])
        np.testing.assert_allclose(raw[:6], ref_raw, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(comp[:6], ref_comp, rtol=1e-9,
                                   atol=1e-12)
    # the textures genuinely differ (uint8 quantization floor)
    assert float(np.abs(np.asarray(ffat.geom.psi)
                        - np.asarray(ffat.geom.psi_c)).max()) > 0


def test_compressed_toggle_without_second_texture_raises(maps):
    ffat = build_ffat(maps, num_modes=6)
    with pytest.raises(ValueError, match="compressed"):
        compute_transfer(ffat, jnp.zeros(3) + 0.8, compressed=True)


def test_session_compressed_toggle(maps):
    """set_use_compressed re-queries the remembered listener against the
    other texture immediately (live toggle semantics,
    real_time_modal_sound.cpp:835-853)."""
    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.ops.ffat_fit import compress_map
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig
    from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

    md = synth_mode_data(6, 8, seed=3)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=1, block_size=64)
    cmaps = {i: compress_map(m) for i, m in maps.items()}
    ffat = build_ffat(maps, bank.num_modes, compressed_maps=cmaps)
    sess = ModalSession(bank, ffat=ffat,
                        config=SolverConfig(block_size=64))
    sess.set_listener(np.asarray([0.9, 0.2, 0.1]))
    raw_row = np.asarray(sess.state.transfer).copy()
    sess.set_use_compressed(True)
    comp_row = np.asarray(sess.state.transfer).copy()
    assert np.abs(raw_row - comp_row).max() > 0
    sess.set_use_compressed(False)
    np.testing.assert_array_equal(np.asarray(sess.state.transfer), raw_row)
    # without a second texture the toggle refuses
    sess2 = ModalSession(bank, ffat=build_ffat(maps, bank.num_modes),
                         config=SolverConfig(block_size=64))
    with pytest.raises(ValueError, match="compressed"):
        sess2.set_use_compressed(True)


def test_compute_transfer_hetero_listener_broadcast():
    """The documented [3]-listener broadcast must widen to the GEOMETRY's
    per-object count for hetero maps (round-5 review: o = p.shape[0]
    crashed this form with 'incompatible shapes for broadcasting')."""
    from openpbso_tpu.ops.ffat import build_ffat_hetero
    per_obj = [{i: synth_fatcube(i, 180.0 * (i + 1) + 37.0 * o, n=8,
                                 seed=10 * o + i) for i in range(3)}
               for o in range(2)]
    maps = build_ffat_hetero(per_obj, 3)
    p = np.asarray([2.0, 0.3, 0.1])
    rows_b = np.asarray(compute_transfer(maps, jnp.asarray(p)))
    rows_t = np.asarray(compute_transfer(
        maps, jnp.asarray(np.tile(p, (2, 1)))))
    assert rows_b.shape == (2, 3)
    np.testing.assert_array_equal(rows_b, rows_t)
    # the two objects' maps differ, so the rows must too
    assert np.abs(rows_b[0] - rows_b[1]).max() > 0
