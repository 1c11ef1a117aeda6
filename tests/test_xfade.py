"""Smooth listener motion: per-sample transfer interpolation (xfade step)."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from openpbso_tpu.ops.coeffs import bank_from_material
from openpbso_tpu.runtime.session import ModalSession
from openpbso_tpu.runtime.solver import (SolverConfig, step_block,
                                         step_block_xfade)
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

BLOCK = 256
M = 16


def _session(smooth, backend="blocked"):
    md = synth_mode_data(M, 8, seed=9)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              block_size=BLOCK, dtype=jnp.float32)
    return ModalSession(bank, config=SolverConfig(
        block_size=BLOCK, backend=backend, smooth_transfer=smooth))


def _ring(sess):
    rng = np.random.default_rng(1)
    sess.hit(0, rng.standard_normal(M), kind="gaussian", width_us=400.0)
    for _ in range(3):
        sess.step()


def test_xfade_is_linear_blend_of_constant_transfers():
    s = _session(False)
    _ring(s)
    t_prev = s.state.transfer
    t_new = t_prev * jnp.linspace(0.2, 3.0, t_prev.shape[-1])[None, :]
    kw = dict(block_size=BLOCK, backend="blocked")
    # render the same block under both constant transfers and the ramp
    st_new = dataclasses.replace(s.state, transfer=t_new.astype(t_prev.dtype))
    _, snd_a, _, _ = step_block(s.state, s.bank, s.gains, **kw)     # t_prev
    _, snd_b, _, _ = step_block(st_new, s.bank, s.gains, **kw)      # t_new
    st2, snd_x, _, _ = step_block_xfade(st_new, s.bank, s.gains, t_prev, **kw)
    ramp = (np.arange(1, BLOCK + 1) / BLOCK)[None, :]
    blend = (1 - ramp) * np.asarray(snd_a) + ramp * np.asarray(snd_b)
    scale = np.abs(blend).max()
    np.testing.assert_allclose(np.asarray(snd_x) / scale, blend / scale,
                               rtol=0, atol=1e-5)
    # endpoint: the last sample sits on the t_new side (ramp weight 1)
    np.testing.assert_allclose(np.asarray(snd_x)[:, -1],
                               np.asarray(snd_b)[:, -1], rtol=1e-5)
    # state update is transfer-independent
    _, z_ref = np.asarray(st2.z_re), None
    st_ref, _, _, _ = step_block(st_new, s.bank, s.gains, **kw)
    np.testing.assert_allclose(np.asarray(st2.z_re),
                               np.asarray(st_ref.z_re), rtol=0, atol=0)


def test_xfade_backends_agree(dberr):
    s = _session(False)
    _ring(s)
    t_prev = s.state.transfer
    t_new = t_prev * 2.5
    st = dataclasses.replace(s.state, transfer=t_new)
    _, snd_b, _, _ = step_block_xfade(st, s.bank, s.gains, t_prev,
                                      block_size=BLOCK, backend="blocked")
    _, snd_s, _, _ = step_block_xfade(st, s.bank, s.gains, t_prev,
                                      block_size=BLOCK, backend="scan")
    assert dberr(np.asarray(snd_b), np.asarray(snd_s)) < -100


def test_xfade_noop_matches_plain_step():
    s = _session(False)
    _ring(s)
    kw = dict(block_size=BLOCK, backend="blocked")
    _, snd_p, mix_p, _ = step_block(s.state, s.bank, s.gains, **kw)
    _, snd_x, mix_x, _ = step_block_xfade(s.state, s.bank, s.gains,
                                          s.state.transfer, **kw)
    np.testing.assert_allclose(np.asarray(snd_x), np.asarray(snd_p),
                               rtol=0, atol=0)


def test_session_smooth_listener_reduces_discontinuity():
    outs = {}
    for smooth in (False, True):
        s = _session(smooth)
        _ring(s)
        # fake a listener-driven transfer jump (no FFAT in this synth bank):
        # smooth sessions remember the outgoing row like set_listener does
        pre = np.asarray(s.step()[1])          # block before the jump
        t_new = s.state.transfer * 4.0
        if smooth:
            s._xfade_from = s.state.transfer
        s.state = dataclasses.replace(s.state, transfer=t_new)
        a = np.concatenate([pre] +
                           [np.asarray(s.step()[1]) for _ in range(2)])
        outs[smooth] = a
        assert s._xfade_from is None
    # discontinuity AT the seam where the 4x transfer jump lands, measured
    # against the stream's own natural sample-to-sample slope
    for smooth, a in outs.items():
        seam = abs(a[BLOCK, 0] - a[BLOCK - 1, 0])
        slope = np.abs(np.diff(a[BLOCK - 32:BLOCK - 1, 0])).max()
        if smooth:
            assert seam < 2.0 * slope, (seam, slope)   # no audible step
        else:
            assert seam > 3.0 * slope, (seam, slope)   # the zipper click
    # after the ramp block both agree (transfer settled at t_new)
    np.testing.assert_allclose(outs[True][2 * BLOCK:],
                               outs[False][2 * BLOCK:], rtol=0, atol=0)


def test_smooth_plus_decay_interaction():
    s = _session(True)
    s.hit(0, np.ones(M), kind="point")
    while not s._idle():
        s.step()
    s.step()  # decay path
    s._xfade_from = s.state.transfer
    s.state = dataclasses.replace(s.state, transfer=s.state.transfer * 2.0)
    s.step()  # xfade takes priority over decay, consumes the pending move
    assert s._xfade_from is None
    mix = np.asarray(s.step()[1])  # back on the decay path
    assert np.isfinite(mix).all()
