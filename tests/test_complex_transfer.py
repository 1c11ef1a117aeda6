"""Complex transfer rows: per-mode PHASE at zero extra matmul cost.

sound_s = Im(t z_s) with t = t_re + i*t_im — the imaginary part rotates
each mode's phase, which for a narrowband mode is a time shift at that
mode's frequency: exact interaural time differences and phase-accurate
complex FFAT on the blocked/scan/chunked-span paths
(ops/integrator._complex_weights). Beyond-reference: the reference's
runtime map reconstructs magnitude only (ffat_solver.h:899-906).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from openpbso_tpu.config import SAMPLE_RATE
from openpbso_tpu.ops.coeffs import bank_from_material, lambda_from_modes
from openpbso_tpu.runtime.session import ModalSession
from openpbso_tpu.runtime.solver import SolverConfig
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

S = 64


def _db(err, ref):
    denom = float(np.abs(ref).max())
    if denom == 0:
        return -np.inf
    return 20 * np.log10(max(float(np.abs(err).max()), 1e-300) / denom)


def _session(backend="blocked", num_listeners=1, with_lam64=False,
             num_modes=10, num_objects=2, seed=3):
    md = synth_mode_data(num_modes, 8, seed=seed)
    lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                    CERAMIC.alpha, CERAMIC.beta)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=num_objects, block_size=S,
                              dtype=jnp.float32)
    sess = ModalSession(
        bank, config=SolverConfig(block_size=S, backend=backend),
        num_listeners=num_listeners,
        lam64=(np.broadcast_to(lam64, (num_objects, lam64.shape[-1]))
               if with_lam64 else None))
    return sess, md, lam64


@pytest.mark.parametrize("backend", ["scan", "blocked"])
def test_complex_backends_agree(backend):
    """scan (trivially correct from the formula) vs blocked with the same
    complex rows."""
    rng = np.random.default_rng(1)
    sess0, md, _ = _session()
    m = sess0.bank.num_modes
    t = (rng.uniform(0.5, 2.0, (2, m))
         * np.exp(1j * rng.uniform(-np.pi, np.pi, (2, m))))
    space = rng.standard_normal(md.num_modes)
    outs = {}
    for be in ("scan", backend):
        sess, _, _ = _session(backend=be)
        sess.set_complex_transfer(t)
        sess.hit(0, space, kind="gaussian", width_us=600.0)
        outs[be] = np.concatenate(
            [np.asarray(sess.step()[1]) for _ in range(4)])
    db = _db(outs[backend] - outs["scan"], outs["scan"])
    assert db <= -100, f"{db:.1f} dB"


def test_phase_is_a_time_shift():
    """For a single ringing mode, t = e^{-i*theta*k} delays the output by
    exactly k samples (scaled by the decay eps^k): the analytic claim the
    whole feature rests on."""
    density, alpha, beta = 2700.0, 1e-2, 1e-7
    f0 = 900.0
    omega_sq = np.asarray([(2 * np.pi * f0) ** 2 * density])
    lam64, _, _ = lambda_from_modes(density, omega_sq, alpha, beta)
    theta = float(np.angle(lam64[0]))
    eps = float(np.abs(lam64[0]))
    bank = bank_from_material(density, omega_sq, alpha, beta,
                              num_objects=1, block_size=S,
                              dtype=jnp.float32)
    k = 8

    def render(phase_shift):
        sess = ModalSession(bank, config=SolverConfig(block_size=S,
                                                      backend="blocked"))
        t = np.zeros((1, bank.num_modes), np.complex128)
        t[0, 0] = np.exp(-1j * theta * phase_shift) * 1e7
        sess.set_complex_transfer(t)
        sess.hit(0, np.ones(1), kind="point")
        return np.concatenate(
            [np.asarray(sess.step()[1])[:, 0] for _ in range(8)])

    base = render(0)
    shifted = render(k)
    # shifted[s] == eps^k * base[s - k] (skip the first block: the force
    # injection itself is not a pure ringing state)
    a = shifted[S + k: 6 * S]
    b = (eps ** k) * base[S: 6 * S - k]
    db = _db(a - b, b)
    assert db <= -90, f"{db:.1f} dB"


def test_itd_binaural_cross_correlation():
    """Two shared-state listeners with per-mode ear phases e^{-i w tau}:
    the right channel lags the left by exactly tau samples — interaural
    time difference without any post-mix filter."""
    sess, md, lam64 = _session(num_listeners=2, num_objects=1,
                               num_modes=10)
    tau = 12                                # samples of ITD
    theta = np.angle(lam64)                 # per-mode omega_d * h
    m = sess.bank.num_modes
    rows = np.zeros((2, 1, m), np.complex128)
    rows[0, 0, : md.num_modes] = 1e7        # left ear: zero delay
    rows[1, 0, : md.num_modes] = 1e7 * np.exp(-1j * theta * tau)
    sess.set_complex_transfer(rows)
    rng = np.random.default_rng(5)
    sess.hit(0, rng.standard_normal(md.num_modes), kind="gaussian",
             width_us=500.0)
    mix = np.concatenate([np.asarray(sess.step()[1]) for _ in range(16)])
    left, right = mix[:, 0], mix[:, 1]
    # skip the first block (mixed injection transient), correlate the tail
    a, b = left[S:], right[S:]
    xc = np.correlate(b, a, mode="full")
    best = int(np.argmax(xc)) - (len(a) - 1)
    # b (right) is a delayed to within a sample (per-mode phases are
    # exact; the broadband correlation peak quantizes on the grid)
    assert abs(best - tau) <= 1, (best, tau)
    # direction: right is DELAYED, so left leads (a[s] matches b[s+tau])
    assert float(np.dot(a[: -tau], b[tau:])) > float(np.dot(a[tau:],
                                                            b[: -tau]))


def test_complex_span_matches_per_block():
    """The chunked span with complex rows == per-block stepping."""
    rng = np.random.default_rng(7)
    a, md, _ = _session(with_lam64=True)
    b, _, _ = _session(with_lam64=False)
    t = (rng.uniform(0.5, 2.0, (2, a.bank.num_modes))
         * np.exp(1j * rng.uniform(-np.pi, np.pi, (2, a.bank.num_modes))))
    for s in (a, b):
        s.set_complex_transfer(t)
        s.hit(0, np.linspace(0.2, 1.0, md.num_modes), kind="gaussian",
              width_us=700.0)
        s.hit(1, np.linspace(-1.0, 0.4, md.num_modes))
    assert a.span_eligible()
    got = a.render_multi(12, blocks_per_dispatch=6)   # span (incl. decay)
    ref = b.render(12)
    db = _db(got - ref, ref)
    assert db <= -100, f"{db:.1f} dB"


def test_set_listener_clears_phase(synth_model_root):
    """An FFAT listener move is magnitude-only: stale phase must not
    survive it."""
    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    from openpbso_tpu.ops.ffat import build_ffat

    model = load_model(resolve_model_dir(synth_model_root, "synth"))
    n = model.num_modes_audible
    bank = bank_from_material(
        model.material.density, model.modes.omega_squared[:n],
        model.material.alpha, model.material.beta,
        block_size=S, dtype=jnp.float32)
    sess = ModalSession(bank, ffat=build_ffat(model.ffat_maps,
                                              bank.num_modes),
                        config=SolverConfig(block_size=S,
                                            backend="blocked"))
    t = np.full((1, bank.num_modes), 1e7) * np.exp(
        1j * np.linspace(0, 1, bank.num_modes))
    sess.set_complex_transfer(t)
    assert sess.state.transfer_im is not None
    sess.set_listener(np.asarray([0.9, 0.4, 0.2]))
    assert sess.state.transfer_im is None


def test_scene_binaural_itd(synth_model_root):
    """Scene(binaural=True, itd=True): an off-axis source produces a
    measurable interaural lag matching the ear-distance geometry, on top
    of the FFAT level differences."""
    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    from openpbso_tpu.models.scene import Scene, SceneInstance

    model = load_model(resolve_model_dir(synth_model_root, "synth"))
    # NOTE the delay must stay below the narrowband ambiguity window:
    # per-mode phase determines the delay only modulo the mode spacing
    # (ITD from discrete modes aliases beyond ~SR/delta_f samples — the
    # same ambiguity human hearing has above ~1.5 kHz), so use a
    # big-but-plausible head, not an arbitrary one
    ear_distance = 0.4   # lag = d/c ~ 51 samples
    sc = Scene([SceneInstance(model, np.zeros(3))], block_size=S,
               backend="blocked", binaural=True,
               ear_distance=ear_distance, itd=True, dtype=jnp.float32)
    assert sc.session.auto_itd
    # listener on the +x ear axis: the +x (right) ear is FARTHER from the
    # origin object, so the right channel is the delayed one
    sc.set_listener(np.asarray([3.0, 0.0, 0.0]))
    assert sc.session.state.transfer_im is not None
    sc.hit(0, 3, kind="gaussian", width_us=400.0)
    mix = sc.render(24)
    a, b = mix[S:, 0], mix[S:, 1]     # left, right
    xc = np.correlate(b, a, mode="full")
    lag = int(np.argmax(xc)) - (len(a) - 1)
    expected = ear_distance / 343.0 * SAMPLE_RATE   # ~51 samples
    assert abs(lag - expected) < 4, (lag, expected)


def test_complex_xfade_is_linear_ramp():
    """smooth_transfer with COMPLEX rows (round-3): the ramped block obeys
    the linear identity sound = (1-r)*render(t0) + r*render(t1) exactly
    (both channels ramp independently, ops/integrator._xfade_rows)."""
    rng = np.random.default_rng(11)

    def build():
        sess, md, _ = _session(backend="blocked")
        sess.config = dataclasses.replace(sess.config, smooth_transfer=True)
        return sess, md

    m_all = _session()[0].bank.num_modes
    t0 = (rng.uniform(0.5, 2.0, (2, m_all))
          * np.exp(1j * rng.uniform(-np.pi, np.pi, (2, m_all))))
    t1 = (rng.uniform(0.5, 2.0, (2, m_all))
          * np.exp(1j * rng.uniform(-np.pi, np.pi, (2, m_all))))
    space = rng.standard_normal(10)

    # ramped session: install t0, ring for 2 blocks, then move to t1
    sess, md = build()
    sess.set_complex_transfer(t0)
    sess.hit(0, space, kind="gaussian", width_us=400.0)
    for _ in range(2):
        sess.step()
    state_before = sess.state
    sess.set_complex_transfer(t1)          # smooth: next block ramps
    assert sess._xfade_from is not None
    _, mix_ramp, _ = sess.step()
    mix_ramp = np.asarray(mix_ramp)

    # constant-row references from the SAME pre-move state
    refs = {}
    for name, t in (("t0", t0), ("t1", t1)):
        s2, _ = build()
        s2.state = state_before
        s2._clock = 2 * S
        # copy the host slot mirrors: without them the fresh session would
        # prove itself idle and dispatch the decay path while the gaussian
        # is still producing
        s2._expiry[...] = sess._expiry
        s2._t0[...] = sess._t0
        s2.set_complex_transfer(t)
        s2._xfade_from = None              # constant-row block
        _, mix, _ = s2.step()
        refs[name] = np.asarray(mix)
    r = ((np.arange(1, S + 1) / S)[:, None]).astype(np.float32)
    expect = (1 - r) * refs["t0"] + r * refs["t1"]
    db = _db(mix_ramp - expect, expect)
    assert db <= -100, f"{db:.1f} dB"


def test_scene_itd_with_smooth_transfer(synth_model_root):
    """Scene(itd=True, smooth_transfer=True) composes since round 3: a
    listener move during a binaural ITD stream ramps BOTH channels and
    keeps the interaural lag of the new geometry."""
    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    from openpbso_tpu.models.scene import Scene, SceneInstance

    model = load_model(resolve_model_dir(synth_model_root, "synth"))
    ear_distance = 0.4
    sc = Scene([SceneInstance(model, np.zeros(3))], block_size=S,
               backend="blocked", binaural=True,
               ear_distance=ear_distance, itd=True, smooth_transfer=True,
               dtype=jnp.float32)
    sc.set_listener(np.asarray([3.0, 0.0, 0.0]))
    sc.hit(0, 3, kind="gaussian", width_us=400.0)
    mix = sc.render(6)
    assert np.isfinite(mix).all() and np.abs(mix).max() > 0
    # move mid-stream: the next block is the complex xfade
    sc.set_listener(np.asarray([0.0, 3.0, 0.0]))
    assert sc.session._xfade_from is not None
    mix2 = sc.render(18)
    assert np.isfinite(mix2).all()
    # after the move the listener sits on +y: the ear axis (+x) is
    # symmetric, so the interaural lag collapses to ~0
    a, b = mix2[S:, 0], mix2[S:, 1]
    xc = np.correlate(b, a, mode="full")
    lag = int(np.argmax(xc)) - (len(a) - 1)
    assert abs(lag) <= 2, lag
