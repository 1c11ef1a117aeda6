"""Round-5 runtime-review burn-down: regression tests for the findings of
the high-effort review of openpbso_tpu/runtime (session/engine/server/
checkpoint/wsbridge thread-safety and persistence gaps).

1. load_session restores the float64 AR(2) host mirror (_ar_host) — the
   span path builds its impulse tables from it, not from the f32 device
   copy, so a restored retuned drag must not render with default tables.
2. load_state fails STRUCTURALLY when snapshot and template disagree on
   the complex-transfer leaf (silent phase drop / bare KeyError before).
3. swap_model drains pending command events validated against the OLD
   model (a stale high-object hit would kill the new synth thread).
4. AR retunes are latest-wins PER OBJECT (a global capacity-1 slot
   dropped the first of two different-object retunes in one window).
5. engine.start() after a failure joins the old consume thread before
   clearing the stop flag (two consumers would interleave one queue).
6. set_use_transfer(False) clears a complex row's phase leaf (the unit
   transfer is pure-real).
7. sustained/clear events drop-on-full like hits (reference semantics,
   modal_solver.h:330-333) instead of wedging the caller thread.
8. engine.control runs session mutations on the synthesis thread,
   re-raising exceptions on the caller, never killing the stream.
9. The WS frame reader reassembles fragmented messages (RFC 6455
   section 5.4), with control frames interleaving mid-message.
"""
import socket
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from openpbso_tpu.config import UNIT_TRANSFER
from openpbso_tpu.ops.coeffs import (bank_from_material, build_modal_bank,
                                     lambda_from_modes)
from openpbso_tpu.runtime.audio import RawCollectorSink
from openpbso_tpu.runtime.checkpoint import (load_session, load_state,
                                             save_session, save_state,
                                             swap_model)
from openpbso_tpu.runtime.engine import StreamingEngine
from openpbso_tpu.runtime.session import ModalSession
from openpbso_tpu.runtime.solver import SolverConfig
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

S = 128


def _session(num_objects=2, span=False):
    md = synth_mode_data(12, 8, seed=3)
    if span:
        lam64, b, valid = lambda_from_modes(
            CERAMIC.density, md.omega_squared, CERAMIC.alpha, CERAMIC.beta)
        o = num_objects
        bank = build_modal_bank(
            np.broadcast_to(lam64, (o,) + lam64.shape),
            np.broadcast_to(b, (o,) + b.shape),
            np.broadcast_to(valid, (o,) + valid.shape),
            block_size=S, shared=False, dtype=jnp.float32)
        return ModalSession(bank, config=SolverConfig(block_size=S,
                                                      backend="blocked"),
                            num_slots=4,
                            lam64=np.broadcast_to(lam64,
                                                  (o,) + lam64.shape))
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=num_objects, block_size=S,
                              dtype=jnp.float32)
    return ModalSession(bank, config=SolverConfig(block_size=S,
                                                  backend="blocked"),
                        num_slots=4)


def test_load_session_restores_ar_host_mirror(tmp_path):
    space = np.linspace(0.3, 1.0, 12)
    sess = _session(span=True)
    sess.set_ar_params(0, a=(0.9, 0.05), sigma=0.002, mu=0.1)
    path = str(tmp_path / "snap.npz")
    save_session(path, sess)

    fresh = _session(span=True)
    load_session(path, fresh)
    np.testing.assert_array_equal(fresh._ar_host[0], [0.9, 0.05])
    assert fresh._ar_g == {}   # stale length-keyed tables dropped
    # the retuned drag renders identically through the SPAN path (whose
    # impulse tables come from the host mirror, not the device state)
    for s in (sess, fresh):
        s.sustained_start(0, space)
    a_out = np.asarray(sess.render_multi(4, 4))
    b_out = np.asarray(fresh.render_multi(4, 4))
    assert np.abs(a_out).max() > 0
    np.testing.assert_array_equal(a_out, b_out)


def test_load_state_structure_mismatch_is_an_error(tmp_path):
    rng = np.random.default_rng(0)
    sess = _session()
    o, m = sess.bank.num_objects, sess.bank.num_modes
    t = rng.uniform(0.5, 2.0, (o, m)) * np.exp(1j * rng.uniform(0, 1,
                                                                (o, m)))
    sess.set_complex_transfer(t)
    assert sess.state.transfer_im is not None
    p_complex = str(tmp_path / "complex.npz")
    save_state(p_complex, sess.state)

    fresh = _session()
    with pytest.raises(ValueError, match="STRUCTURES"):
        load_state(p_complex, fresh.state)          # would drop the phase
    p_real = str(tmp_path / "real.npz")
    save_state(p_real, fresh.state)
    with pytest.raises(ValueError, match="STRUCTURES"):
        load_state(p_real, sess.state)              # was a bare KeyError


def test_swap_model_drains_stale_command_events():
    big = _session(num_objects=8)
    engine = StreamingEngine(big, RawCollectorSink())
    assert engine.hit(5, np.ones(12))               # valid for 8 objects
    engine.set_ar_params(7, a=(0.9, 0.05))
    engine.set_listener(np.array([1.0, 0.0, 0.0]))
    small = _session(num_objects=2)
    swap_model(engine, small)
    assert engine.session is small
    assert engine._events.empty()                   # hit(5) would raise
    assert engine._arprm.take() == []
    assert engine._transfer.take() is None


def test_ar_retunes_are_latest_wins_per_object():
    engine = StreamingEngine(_session(), RawCollectorSink())
    engine.set_ar_params(0, a=(0.9, 0.05))
    engine.set_ar_params(1, a=(0.5, 0.2))           # must not drop obj 0
    engine._apply_events()
    a = np.asarray(engine.session.state.sustained.a)
    np.testing.assert_allclose(a[0], [0.9, 0.05], rtol=1e-6)
    np.testing.assert_allclose(a[1], [0.5, 0.2], rtol=1e-6)
    # newest retune of the SAME object still wins
    engine.set_ar_params(0, a=(0.8, 0.1))
    engine.set_ar_params(0, a=(0.7, 0.2))
    assert len(engine._arprm.take()) == 1


def test_restart_after_failure_leaves_one_consumer():
    import time

    engine = StreamingEngine(_session(), RawCollectorSink())
    engine.start()
    try:
        engine._stop.set()     # simulate the failure path's stop flag
        deadline = time.time() + 10
        while engine._synth_thread.is_alive() and time.time() < deadline:
            time.sleep(0.01)   # synth exits fast; the CONSUME thread may
        #                        still sit in its 0.2 s poll — the window
        #                        under test
        assert not engine._synth_thread.is_alive()
        engine.start()         # must JOIN the old threads before clearing
        consumers = [t for t in threading.enumerate()
                     if t.name == "pbso-audio" and t.is_alive()]
        assert len(consumers) == 1
        assert engine.healthy
    finally:
        engine.stop()


def test_unit_transfer_clears_complex_phase():
    rng = np.random.default_rng(1)
    sess = _session()
    o, m = sess.bank.num_objects, sess.bank.num_modes
    sess.set_complex_transfer(rng.uniform(0.5, 2.0, (o, m))
                              * np.exp(1j * rng.uniform(0, 1, (o, m))))
    assert sess.state.transfer_im is not None
    sess.set_use_transfer(False)
    assert sess.state.transfer_im is None
    np.testing.assert_array_equal(np.asarray(sess.state.transfer),
                                  np.full((o, m), UNIT_TRANSFER,
                                          np.float32))


def test_sustained_events_drop_on_full():
    engine = StreamingEngine(_session(), RawCollectorSink())
    space = np.ones(12)
    while engine.hit(0, space):
        pass                                        # fill the queue
    assert engine.sustained_start(0, space) is False
    assert engine.sustained_update(0, space) is False
    assert engine.sustained_end(0) is False
    assert engine.clear_forces() is False           # none may block


def test_engine_control_runs_on_synth_thread():
    engine = StreamingEngine(_session(), RawCollectorSink())
    # not running: inline fallback
    seen = []
    assert engine.control(seen.append) is True
    assert seen == [engine.session]
    engine.start()
    try:
        applied = threading.Event()
        names = []

        def fn(sess):
            names.append(threading.current_thread().name)
            applied.set()

        assert engine.control(fn) is True
        assert applied.is_set() and names == ["pbso-synth"]

        def boom(sess):
            raise ValueError("boom")

        with pytest.raises(ValueError, match="boom"):
            engine.control(boom)
        assert engine.healthy                       # stream survived
    finally:
        engine.stop()


def _client_frame(opcode: int, payload: bytes, fin: bool) -> bytes:
    mask = b"\x12\x34\x56\x78"
    assert len(payload) < 126
    head = bytes([(0x80 if fin else 0) | opcode, 0x80 | len(payload)])
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return head + mask + masked


def test_ws_reader_reassembles_fragmented_messages():
    from openpbso_tpu.runtime.wsbridge import OP_PING, OP_TEXT, _FrameReader
    a, b = socket.socketpair()
    try:
        reader = _FrameReader(b)
        a.sendall(_client_frame(OP_TEXT, b'{"cmd":', fin=False)
                  + _client_frame(OP_PING, b"hb", fin=True)   # interleaved
                  + _client_frame(0, b'"stats"}', fin=True))
        op, payload = reader.read_frame()
        assert op == OP_PING and payload == b"hb"
        op, payload = reader.read_frame()
        assert op == OP_TEXT and payload == b'{"cmd":"stats"}'
        # an unfragmented frame still round-trips
        a.sendall(_client_frame(OP_TEXT, b'{"cmd":"quit"}', fin=True))
        assert reader.read_frame() == (OP_TEXT, b'{"cmd":"quit"}')
        # a new data frame mid-reassembly is a protocol violation
        a.sendall(_client_frame(OP_TEXT, b"x", fin=False)
                  + _client_frame(OP_TEXT, b"y", fin=True))
        with pytest.raises(ConnectionError, match="fragment"):
            reader.read_frame()
    finally:
        a.close()
        b.close()
