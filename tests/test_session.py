"""End-to-end session tests: hits -> blocks -> audio vs the oracle solver."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from openpbso_tpu.config import OUTPUT_SCALE, UNIT_TRANSFER
from openpbso_tpu.io.meta import resolve_model_dir
from openpbso_tpu.models.modal_model import load_model
from openpbso_tpu.ops.coeffs import bank_from_material
from openpbso_tpu.ops.ffat import build_ffat
from openpbso_tpu.runtime.session import ModalSession
from openpbso_tpu.runtime.solver import SolverConfig
from openpbso_tpu.utils.oracle import (OracleGaussianForce, OraclePointForce,
                                       OracleSolver, iir_coefficients)
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data


def _session(md, o=1, s=256, backend="blocked", dtype=jnp.float64,
             ffat=None, num_slots=8):
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta, num_objects=o,
                              block_size=s, dtype=dtype)
    return ModalSession(bank, ffat=ffat,
                        config=SolverConfig(block_size=s, backend=backend),
                        num_slots=num_slots, dtype=dtype)


def _oracle(md, s):
    c1, c2, c3 = iir_coefficients(CERAMIC.density, md.omega_squared,
                                  CERAMIC.alpha, CERAMIC.beta, 1.0 / 44100)
    return OracleSolver(c1, c2, c3, s)


def test_point_hit_render_matches_oracle(dberr):
    md = synth_mode_data(12, 6, seed=4)
    s = 256
    sess = _session(md, s=s)
    oracle = _oracle(md, s)
    rng = np.random.default_rng(0)
    space = rng.standard_normal(md.num_modes)
    sess.hit(0, space, kind="point")
    oracle.hit(space, OraclePointForce())
    got = sess.render_raw(10)[0]
    ref = oracle.render(10)
    assert dberr(got, ref) < -100


def test_gaussian_hit_and_overlap(dberr):
    """Two overlapping hits (point at block 0, gaussian at block 2)."""
    md = synth_mode_data(12, 6, seed=4)
    s = 256
    sess = _session(md, s=s)
    oracle = _oracle(md, s)
    rng = np.random.default_rng(1)
    sp1 = rng.standard_normal(md.num_modes)
    sp2 = rng.standard_normal(md.num_modes)
    sess.hit(0, sp1, kind="point")
    oracle.hit(sp1, OraclePointForce())
    got = [np.asarray(sess.step()[0][0]) for _ in range(2)]
    ref = [oracle.step()[0] for _ in range(2)]
    sess.hit(0, sp2, kind="gaussian", width_us=300.0)
    oracle.hit(sp2, OracleGaussianForce(300.0))
    got += [np.asarray(sess.step()[0][0]) for _ in range(8)]
    ref += [oracle.step()[0] for _ in range(8)]
    assert dberr(np.concatenate(got), np.concatenate(ref)) < -100


def test_mix_output_scaling():
    """Stereo mix = sum_o gains * sound / 1E10
    (real_time_modal_sound.cpp:207-210)."""
    md = synth_mode_data(6, 4)
    s = 128
    sess = _session(md, o=3, s=s)
    rng = np.random.default_rng(2)
    for o in range(3):
        sess.hit(o, rng.standard_normal(md.num_modes))
    sound, mix, _ = sess.step()
    expect = np.asarray(sound).sum(axis=0) / OUTPUT_SCALE
    np.testing.assert_allclose(np.asarray(mix)[:, 0], expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mix)[:, 1], expect, rtol=1e-5)


def test_clear_forces_silences_future_input():
    md = synth_mode_data(6, 4)
    sess = _session(md, s=128)
    sess.hit(0, np.ones(md.num_modes), kind="gaussian", width_us=2000.0)
    sess.step()
    sess.clear_forces()
    # all slots cleared -> no new excitation; |z| decays by |lam| each sample
    e = []
    for _ in range(3):
        sess.step()
        e.append(float(jnp.sum(sess.state.z_re ** 2 + sess.state.z_im ** 2)))
    assert e[0] > e[1] > e[2]


def test_transfer_pipeline(synth_model_root, dberr):
    """Full model load -> FFAT transfer -> render; transfer updates audio."""
    paths = resolve_model_dir(synth_model_root, "synth")
    model = load_model(paths)
    assert model.num_modes_audible > 0
    bank = bank_from_material(
        model.material.density, model.modes.omega_squared,
        model.material.alpha, model.material.beta,
        block_size=128, dtype=jnp.float64)
    ffat = build_ffat(model.ffat_maps, bank.num_modes, dtype=jnp.float64)
    sess = ModalSession(bank, ffat=ffat,
                        config=SolverConfig(block_size=128,
                                            backend="blocked"),
                        dtype=jnp.float64)
    # default transfer is unit 1E7
    assert float(sess.state.transfer[0, 0]) == UNIT_TRANSFER
    sess.set_listener(np.array([1.0, 0.5, 0.25]))
    t = np.asarray(sess.state.transfer[0])
    from openpbso_tpu.utils.oracle import ffat_map_val
    ref = np.array([ffat_map_val(model.ffat_maps[i],
                                 np.array([1.0, 0.5, 0.25]))
                    for i in range(len(model.ffat_maps))])
    np.testing.assert_allclose(t[: len(ref)], ref, rtol=1e-9)
    # hit with modal projection from a mesh vertex
    space = model.modal_force_vertex(0)
    sess.hit(0, space)
    audio = sess.render(5)
    assert audio.shape == (5 * 128, 2)
    assert np.abs(audio).max() > 0


def test_sustained_session_lifecycle():
    md = synth_mode_data(6, 4)
    sess = _session(md, s=128)
    sess.sustained_start(0, np.ones(md.num_modes))
    _, _, _ = sess.step()
    e_active = float(jnp.sum(jnp.abs(sess.state.z_im)))
    assert e_active > 0
    sess.set_ar_params(0, a=(0.5, 0.1), sigma=0.01, mu=0.5)
    sess.step()
    sess.sustained_end(0)
    assert not bool(sess.state.sustained.active[0])


def test_slot_recycling():
    """More hits than slots must not crash; oldest slots are reused."""
    md = synth_mode_data(4, 4)
    sess = _session(md, s=64, num_slots=2)
    for i in range(6):
        sess.hit(0, np.ones(md.num_modes), kind="gaussian", width_us=5000.0)
    sess.step()
    assert True  # no exception; 2 slots cycled through 6 hits


def test_ffat_render_matches_oracle_with_transfer(synth_model_root, dberr):
    """Config-2 class: full FFAT transfer in the loop, waveform vs oracle."""
    paths = resolve_model_dir(synth_model_root, "synth")
    model = load_model(paths)
    n = model.num_modes_audible
    s = 256
    bank = bank_from_material(
        model.material.density, model.modes.omega_squared[:n],
        model.material.alpha, model.material.beta,
        block_size=s, dtype=jnp.float64)
    ffat = build_ffat(model.ffat_maps, bank.num_modes, dtype=jnp.float64)
    sess = ModalSession(bank, ffat=ffat,
                        config=SolverConfig(block_size=s, backend="blocked"),
                        dtype=jnp.float64)
    listener = np.asarray([0.9, 0.4, 0.3])
    sess.set_listener(listener)
    space = model.modal_force_vertex(7)
    sess.hit(0, space, kind="gaussian", width_us=250.0)
    got = sess.render_raw(8)[0]

    from openpbso_tpu.utils.oracle import (OracleGaussianForce, OracleSolver,
                                           ffat_map_val, iir_coefficients)
    c1, c2, c3 = iir_coefficients(
        model.material.density, model.modes.omega_squared[:n],
        model.material.alpha, model.material.beta, 1.0 / 44100)
    transfer = np.array([ffat_map_val(model.ffat_maps[i], listener)
                         for i in range(n)])
    oracle = OracleSolver(c1, c2, c3, s, transfer=transfer)
    oracle.hit(space, OracleGaussianForce(250.0))
    ref = oracle.render(8)
    assert dberr(got, ref) < -100
