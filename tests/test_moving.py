"""Moving-listener transfer schedules (solver.step_multi_transfers) and
future-dated hits: whole moving renders in one dispatch per chunk."""
import numpy as np
import pytest

from openpbso_tpu.ops.coeffs import bank_from_material
from openpbso_tpu.runtime.session import ModalSession
from openpbso_tpu.runtime.solver import SolverConfig
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

S = 128


@pytest.fixture
def ffat_scene(synth_model_root):
    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    from openpbso_tpu.ops.ffat import build_ffat

    paths = resolve_model_dir(synth_model_root, "synth")
    model = load_model(paths)
    n_aud = model.num_modes_audible

    def make(smooth=False):
        bank = bank_from_material(
            model.material.density, model.modes.omega_squared[:n_aud],
            model.material.alpha, model.material.beta,
            block_size=S)
        ffat = build_ffat(model.ffat_maps, num_modes=bank.num_modes)
        return ModalSession(bank, ffat=ffat, config=SolverConfig(
            block_size=S, backend="blocked", smooth_transfer=smooth))

    return make, model


def _path(t):
    ang = 0.3 * (1 + np.arange(t))
    return np.stack([1.3 * np.cos(ang), np.full(t, 0.4),
                     1.3 * np.sin(ang)], axis=1)


def test_render_moving_matches_per_move_dispatches(ffat_scene, dberr):
    """One scheduled dispatch == the reference flow of one set_listener +
    render per move (block-constant transfer semantics)."""
    make, model = ffat_scene
    space = model.modal_force_vertex(2)
    pos = _path(6)
    per_block = np.repeat(pos, 2, axis=0)          # hold each pos 2 blocks

    ref = make(smooth=False)
    ref.hit(0, space, kind="gaussian", width_us=400.0)
    chunks = []
    for p in pos:
        ref.set_listener(p)
        chunks.append(ref.render_multi(2))
    want = np.concatenate(chunks, axis=0)

    got_sess = make(smooth=False)
    got_sess.hit(0, space, kind="gaussian", width_us=400.0)
    got = got_sess.render_moving(per_block, blocks_per_dispatch=12)
    assert np.abs(want).max() > 0
    assert dberr(got, want) <= -100
    assert got_sess.sample_clock == ref.sample_clock


def test_render_moving_smooth_ramps_every_block(ffat_scene, dberr):
    """smooth=True == one step_block_xfade per move (2-block holds ramp
    to the new row then settle: prev carried by the scan)."""
    make, model = ffat_scene
    space = model.modal_force_vertex(1)
    pos = _path(4)
    per_block = np.repeat(pos, 2, axis=0)

    ref = make(smooth=True)
    ref.set_listener(pos[0] * 1.05)   # settle an initial row
    ref.hit(0, space, kind="gaussian", width_us=400.0)
    chunks = []
    for p in pos:
        ref.set_listener(p)           # pends one xfade block
        chunks.append(np.asarray(ref.step()[1]))
        chunks.append(np.asarray(ref.step()[1]))
    want = np.concatenate(chunks, axis=0)

    got_sess = make(smooth=True)
    got_sess.set_listener(pos[0] * 1.05)
    got_sess.hit(0, space, kind="gaussian", width_us=400.0)
    # replicate the same per-block row sequence the per-move flow saw:
    # moved block ramps from carry, hold block ramps (constant) to itself
    got = got_sess.render_moving(per_block, blocks_per_dispatch=8,
                                 smooth=True)
    assert dberr(got, want) <= -100


def test_future_dated_hits_fire_inside_span(dberr):
    md = synth_mode_data(10, 6, seed=4)
    from openpbso_tpu.ops.coeffs import lambda_from_modes
    lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                    CERAMIC.alpha, CERAMIC.beta)

    def make():
        bank = bank_from_material(CERAMIC.density, md.omega_squared,
                                  CERAMIC.alpha, CERAMIC.beta,
                                  block_size=S)
        return ModalSession(bank, config=SolverConfig(block_size=S,
                                                      backend="blocked"),
                            lam64=lam64)

    space = np.linspace(0.4, 1.0, 10)
    # reference flow: hit live at each block boundary
    ref = make()
    chunks = []
    for blk in range(8):
        if blk in (0, 3, 5):
            ref.hit(0, space, kind="gaussian", width_us=200.0)
        chunks.append(np.asarray(ref.step()[1]))
    want = np.concatenate(chunks, axis=0)

    # scheduled flow: all hits future-dated, one span dispatch
    got_sess = make()
    for blk in (0, 3, 5):
        got_sess.hit(0, space, kind="gaussian", width_us=200.0,
                     when=blk * S)
    got = got_sess.render_multi(8, blocks_per_dispatch=8)
    assert np.abs(want).max() > 0
    assert dberr(got, want) <= -100

    with pytest.raises(ValueError):
        got_sess.hit(0, space, when=3)       # not block-aligned
    with pytest.raises(ValueError):
        got_sess.hit(0, space, when=0)       # in the past


# --------------------------------------------------------------- Doppler


def _tone_session(f0=1000.0, block=512, density=2700.0,
                  alpha=1e-2, beta=1e-7):
    """Single object, single lightly-damped mode at ~f0 Hz, unit transfer."""
    import jax.numpy as jnp
    omega = 2 * np.pi * f0
    omega_sq = np.asarray([omega * omega * density])
    bank = bank_from_material(density, omega_sq, alpha, beta,
                              num_objects=1, block_size=block,
                              dtype=jnp.float32)
    return ModalSession(bank, config=SolverConfig(block_size=block,
                                                  backend="blocked"))


def _dominant_freq(x, sr=44100):
    """Frequency from zero-crossing count (sub-Hz at ~1 s windows)."""
    sign = np.sign(x)
    crossings = np.count_nonzero(np.diff(sign) != 0)
    return crossings / 2 * sr / x.size


def test_doppler_frequency_shift():
    """An approaching listener hears the mode shifted by (1 + v/c):
    the core physical claim of the delay model (ops/doppler.py)."""
    from openpbso_tpu.config import SAMPLE_RATE, SOUND_SPEED
    block = 512
    f0 = 1000.0
    v = 0.05 * SOUND_SPEED                    # 17.15 m/s approach
    sess = _tone_session(f0=f0, block=block)
    sess.hit(0, np.ones(1), kind="point")
    t_blocks = 86                             # ~1 s
    times = np.arange(t_blocks) * block / SAMPLE_RATE
    r0 = 30.0                                 # stays positive: r(1s) = 12.85
    rel = np.zeros((t_blocks, 3))
    rel[:, 0] = r0 - v * times                # radial approach
    mix = sess.render_doppler(rel)
    assert mix.shape == (t_blocks * block, 2)
    # measure on a window after arrival (r0/c = 87 ms) and before the end
    w0, w1 = int(0.3 * SAMPLE_RATE), int(0.95 * SAMPLE_RATE)
    got = _dominant_freq(mix[w0:w1, 0])
    want = f0 * (1 + v / SOUND_SPEED)         # 1050 Hz
    assert abs(got - want) < 5.0, f"measured {got:.1f} Hz, want {want:.1f}"
    # sanity: an unshifted render measures f0, not f0*(1+v/c)
    sess2 = _tone_session(f0=f0, block=block)
    sess2.hit(0, np.ones(1), kind="point")
    ref = sess2.render(t_blocks)
    ref_f = _dominant_freq(ref[w0:w1, 0])
    assert abs(ref_f - f0) < 5.0


def test_doppler_arrival_delay_and_static_parity():
    """A static listener at distance r hears the same signal delayed by
    r/c — silence before the wavefront arrives, exact integer-delay copy
    after (linear interp is exact at integer delays)."""
    from openpbso_tpu.config import SAMPLE_RATE, SOUND_SPEED
    block = 256
    delay_samples = 64
    r = delay_samples * SOUND_SPEED / SAMPLE_RATE
    t_blocks = 8
    a = _tone_session(f0=700.0, block=block)
    b = _tone_session(f0=700.0, block=block)
    for s in (a, b):
        s.hit(0, np.ones(1), kind="gaussian", width_us=400.0)
    rel = np.zeros((t_blocks, 3))
    rel[:, 2] = r
    got = a.render_doppler(rel)
    ref = b.render(t_blocks)
    n = t_blocks * block
    assert np.abs(got[:delay_samples]).max() == 0.0     # not yet arrived
    np.testing.assert_allclose(got[delay_samples:, 0],
                               ref[: n - delay_samples, 0],
                               rtol=0, atol=1e-7)


def test_doppler_multi_listener_path_validation():
    """Multi-listener render_doppler accepts [T, 3]/[T, L, 3]/[T, L, O, 3]
    paths (round-3; the single-listener-only restriction is gone) and
    rejects mismatched listener counts."""
    import jax.numpy as jnp
    md = synth_mode_data(8, 8, seed=3)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=2, block_size=128,
                              dtype=jnp.float32)
    sess = ModalSession(bank, config=SolverConfig(block_size=128),
                        num_listeners=2)
    with pytest.raises(ValueError, match="listener path"):
        sess.render_doppler(np.ones((4, 3, 3)))    # 3 != L=2
    out = sess.render_doppler(np.ones((4, 3)) * 2.0)   # shared path
    assert out.shape == (4 * 128, 2) and np.isfinite(out).all()


# ------------------------------------------------- live Doppler (engine)


def test_doppler_postmix_span_block_parity():
    """DopplerPostMix: one span == chained blocks (same delay line), and
    constant delay reproduces a pure shift of the source."""
    import jax.numpy as jnp

    from openpbso_tpu.config import OUTPUT_SCALE
    from openpbso_tpu.ops.doppler import DopplerPostMix

    rng = np.random.default_rng(3)
    o, s, nb = 2, 128, 6
    positions = np.asarray([[2.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    sound = rng.standard_normal((o, nb * s)).astype(np.float32)

    a = DopplerPostMix(positions, max_distance=10.0)
    blocks = [np.asarray(a(jnp.asarray(sound[:, i*s:(i+1)*s]), None))
              for i in range(nb)]
    ref = np.concatenate(blocks, axis=0)
    b = DopplerPostMix(positions, max_distance=10.0)
    got = np.concatenate(
        [np.asarray(b.process_span(jnp.asarray(sound[:, :3*s]))),
         np.asarray(b.process_span(jnp.asarray(sound[:, 3*s:])))], axis=0)
    np.testing.assert_allclose(got, ref, atol=1e-6)

    # constant delay == fractionally shifted source (after arrival);
    # device index math is f32 (resolves ~1e-4 of a sample at these
    # buffer lengths), so compare at 1e-3 of the signal scale
    c = DopplerPostMix(positions[:1], max_distance=10.0)
    out = np.asarray(c.process_span(jnp.asarray(sound[:1])))[:, 0]
    n = sound.shape[-1]
    approx = np.zeros(n, np.float32)
    i = np.arange(n) - c._d_cur[0]
    i0 = np.floor(i).astype(int)
    fr = (i - i0).astype(np.float32)
    # pad one leading zero: the arrival-boundary sample interpolates
    # between pre-arrival silence and the first emitted sample
    src = np.concatenate([np.zeros(1, np.float32), sound[0]])
    valid = i0 >= -1
    approx[valid] = ((1 - fr[valid]) * src[i0[valid] + 1]
                     + fr[valid] * src[np.minimum(i0[valid] + 2, n)])
    np.testing.assert_allclose(out * OUTPUT_SCALE, approx, atol=2e-3)


def test_live_doppler_frequency_shift_in_engine():
    """An approaching listener raises the received pitch on LIVE blocks
    (round-2 VERDICT item 7): counted cycles match the emission clock at
    the retarded time, f0/SR * (N_total - d_final), which differs from
    the static-delay count by the full Doppler accumulation."""
    import time

    import jax.numpy as jnp

    from openpbso_tpu.config import SAMPLE_RATE, SOUND_SPEED
    from openpbso_tpu.ops.coeffs import (bank_from_material,
                                         lambda_from_modes)
    from openpbso_tpu.ops.doppler import DopplerPostMix
    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig

    f0 = 900.0
    density = 2700.0
    omega = 2 * np.pi * f0
    beta = 2.0 * 1e-4 / omega          # xi = 1e-4: ~1.8 s ring time
    omega_sq = np.asarray([omega ** 2 * density])
    lam64, _, _ = lambda_from_modes(density, omega_sq, 0.0, beta)
    bank = bank_from_material(density, omega_sq, 0.0, beta,
                              num_objects=1, block_size=128,
                              dtype=jnp.float32)
    sess = ModalSession(bank, config=SolverConfig(block_size=128,
                                                  backend="blocked"),
                        lam64=lam64)
    pm = DopplerPostMix(np.zeros((1, 3)), max_distance=12.0)
    sink = RawCollectorSink()
    eng = StreamingEngine(sess, sink, post_mix=pm, lookahead=4)
    eng.set_listener(np.asarray([10.0, 0.0, 0.0]))   # start far
    eng.start()
    try:
        eng.hit(0, np.ones(1), kind="point")
        time.sleep(0.15)
        # approach from 10 m to 2 m in small steps
        for r in np.linspace(10.0, 2.0, 60):
            eng.set_listener(np.asarray([r, 0.0, 0.0]))
            time.sleep(0.008)
        time.sleep(0.2)
    finally:
        eng.stop()
    assert eng.error is None
    audio = sink.concatenated()[:, 0]
    n_tot = audio.shape[0]
    d_f = float(pm._d_cur[0])
    d_i = 10.0 / SOUND_SPEED * SAMPLE_RATE
    # the hit applies at some block h0 > 0 and the wavefront arrives at
    # n_a = h0 + d_i; cycles received from arrival to end follow the
    # emission clock at the retarded time:
    #   cycles = f0/SR * ((n_tot - d_f) - (n_a - d_i))
    # a STATIC delay would give f0/SR * (n_tot - n_a) — (d_i - d_f)*f0/SR
    # (~21) cycles fewer. This pins the live time-varying delay.
    n_a = int(np.argmax(audio != 0.0))
    crossings = int(np.sum(np.abs(np.diff(np.signbit(audio[n_a:])))))
    cycles = crossings / 2.0
    expected = f0 / SAMPLE_RATE * (n_tot - d_f - n_a + d_i)
    static = f0 / SAMPLE_RATE * (n_tot - n_a)
    assert abs(cycles - expected) < 5.0, (cycles, expected, static)
    assert abs(expected - static) > 15.0   # the effect is measurable
    assert abs(cycles - static) > 10.0     # and measured


def test_render_doppler_multi_listener():
    """Multi-listener render_doppler (round-3): each listener's channel is
    delayed by ITS OWN distance trajectory — channel parity with a
    single-listener session on the same path, and a true broadband
    interaural lag for offset ears."""
    import jax.numpy as jnp

    from openpbso_tpu.config import SAMPLE_RATE, SOUND_SPEED
    from openpbso_tpu.ops.coeffs import (bank_from_material,
                                         lambda_from_modes)
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig
    from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

    s = 128
    md = synth_mode_data(10, 8, seed=5)
    lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                    CERAMIC.alpha, CERAMIC.beta)

    def build(nl):
        bank = bank_from_material(CERAMIC.density, md.omega_squared,
                                  CERAMIC.alpha, CERAMIC.beta,
                                  num_objects=1, block_size=s,
                                  dtype=jnp.float32)
        sess = ModalSession(bank, config=SolverConfig(block_size=s),
                            num_listeners=nl, lam64=lam64)
        sess.hit(0, np.linspace(0.3, 1.0, 10), kind="gaussian",
                 width_us=300.0)
        return sess

    t_blocks = 24
    # ear offsets along x, object at origin; listeners approach along +x
    base = np.stack([np.linspace(6.0, 3.0, t_blocks),
                     np.zeros(t_blocks), np.zeros(t_blocks)], axis=1)
    d_ear = 1.2     # exaggerated ear separation for a clear sample lag
    path2 = np.stack([base + [d_ear / 2, 0, 0],
                      base - [d_ear / 2, 0, 0]], axis=1)  # [T, 2, 3]

    m2 = build(2)
    out2 = m2.render_doppler(path2, blocks_per_dispatch=8)
    assert out2.shape == (t_blocks * s, 2)

    # channel 1 (near ear path = base - d/2... check) vs single-listener
    m1 = build(1)
    out1 = m1.render_doppler(path2[:, 1], blocks_per_dispatch=8)
    a, b = out2[:, 1], out1[:, 0]
    ref = np.abs(b).max()
    assert ref > 0
    assert np.abs(a - b).max() / ref < 1e-4

    # interaural lag: the +x ear is FARTHER (object at origin, path on
    # +x), so channel 0 lags channel 1 by d/c — contracted by the
    # approach's Doppler factor: the received lag between two copies a
    # constant emission-distance d apart satisfies
    # delta (1 + v/c) = d/c (both ears sample the same compressed
    # emission clock). v here: 3 m over 24 blocks.
    l0, l1 = out2[:, 0], out2[:, 1]
    xc = np.correlate(l0[s:], l1[s:], mode="full")
    lag = int(np.argmax(xc)) - (len(l0[s:]) - 1)
    v = 3.0 / (t_blocks * s / SAMPLE_RATE)
    expected = (d_ear / SOUND_SPEED * SAMPLE_RATE
                / (1.0 + v / SOUND_SPEED))          # ~137 samples
    assert abs(lag - expected) <= 2, (lag, expected)


def test_doppler_postmix_object_velocity():
    """DopplerPostMix.set_velocity (the server's object_vel): the post-mix
    integrates the object position on the AUDIO clock — exactly
    v * N / SR per dispatch — and the resulting constant delay ramp
    shifts a tone's received cycle count by the full Doppler
    accumulation (d_i - d_f) * f0 / SR. Zero velocity freezes the
    position where it integrated to."""
    import jax.numpy as jnp

    from openpbso_tpu.config import SAMPLE_RATE, SOUND_SPEED
    from openpbso_tpu.ops.doppler import DopplerPostMix

    f0, n, spans = 900.0, 2048, 8
    pm = DopplerPostMix(np.asarray([[10.0, 0.0, 0.0]]), max_distance=12.0)
    pm.on_listener(np.zeros(3))
    pm._d_cur = pm._d_tgt.copy()      # settled before motion starts
    v = 20.0   # m/s approach (7.4 m over the stream — stays this side)
    pm.set_velocity(0, [-v, 0.0, 0.0])

    t = np.arange(spans * n) / SAMPLE_RATE
    tone = np.sin(2 * np.pi * f0 * t).astype(np.float32)[None, :]
    d_i = float(pm._d_cur[0])
    out = np.concatenate(
        [np.asarray(pm.process_span(jnp.asarray(tone[:, i*n:(i+1)*n])))
         for i in range(spans)], axis=0)[:, 0]
    d_f = float(pm._d_cur[0])

    # audio-clock kinematics: position advanced by exactly v * T_stream
    moved = v * spans * n / SAMPLE_RATE
    np.testing.assert_allclose(pm.positions[0], [10.0 - moved, 0.0, 0.0],
                               atol=1e-9)
    np.testing.assert_allclose(d_f, (10.0 - moved) / SOUND_SPEED
                               * SAMPLE_RATE, atol=1e-9)

    # received cycles follow the emission clock at the retarded time:
    # the delay ramps down at v/c per sample, so even the ARRIVAL is
    # Doppler-advanced — n_a solves n = d(n) -> d_i / (1 + v/c) — and
    # the received emission window runs from n_a - d(n_a) = 0 to
    # n_tot - d_f: cycles = f0/SR * (n_tot - d_f), vs the static count
    # f0/SR * (n_tot - n_a); the surplus is the Doppler accumulation
    n_a = int(np.argmax(out != 0.0))
    assert abs(n_a - d_i / (1.0 + v / SOUND_SPEED)) <= 3.0
    crossings = int(np.sum(np.abs(np.diff(np.signbit(out[n_a:])))))
    cycles = crossings / 2.0
    expected = f0 / SAMPLE_RATE * (spans * n - d_f)
    static = f0 / SAMPLE_RATE * (spans * n - n_a)
    assert abs(cycles - expected) < 3.0, (cycles, expected, static)
    assert abs(expected - static) > 10.0   # effect is measurable
    assert abs(cycles - static) > 8.0      # and measured

    # zero velocity stops the integration where it is
    pm.set_velocity(0, np.zeros(3))
    frozen = pm.positions.copy()
    pm.process_span(jnp.asarray(tone[:, :n]))
    np.testing.assert_array_equal(pm.positions, frozen)


def test_doppler_postmix_per_listener_parity():
    """Per-client live Doppler (num_listeners=L): each (object, listener)
    pair gets its own delay line over the span's [O, L, N] sound; column
    l must equal a single-listener post-mix run on listener l's rows.
    Velocity integration (object_vel) retargets every listener's delay."""
    import jax.numpy as jnp

    from openpbso_tpu.ops.doppler import DopplerPostMix

    rng = np.random.default_rng(7)
    o, ll, s, nb = 2, 2, 128, 6
    n = nb * s
    positions = np.asarray([[2.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    rows = np.asarray([[0.5, 0.0, 0.0], [-1.0, 0.5, 0.0]])   # [L, 3]
    gains = rng.uniform(0.5, 1.5, (o, ll))
    sound = rng.standard_normal((o, ll, n)).astype(np.float32)

    multi = DopplerPostMix(positions, num_listeners=ll, gains=gains,
                           max_distance=10.0)
    multi.on_listener(rows)
    got = np.concatenate(
        [np.asarray(multi.process_span(jnp.asarray(sound[..., :3*s]))),
         np.asarray(multi.process_span(jnp.asarray(sound[..., 3*s:])))],
        axis=0)                                               # [N, L]
    assert got.shape == (n, ll)

    for l in range(ll):
        single = DopplerPostMix(positions, gains=gains[:, l:l+1],
                                max_distance=10.0)
        single.on_listener(rows[l])
        ref = np.concatenate(
            [np.asarray(single.process_span(jnp.asarray(sound[:, l, :3*s]))),
             np.asarray(single.process_span(jnp.asarray(sound[:, l, 3*s:])))],
            axis=0)[:, 0]
        np.testing.assert_allclose(got[:, l], ref, atol=1e-6)
        np.testing.assert_allclose(multi._d_tgt[:, l], single._d_tgt,
                                   atol=1e-12)

    # per-BLOCK entry parity: the block step emits [L, O, S] (listener
    # axis outside); __call__ normalizes it to the span layout, so
    # chained blocks equal the spans bit-for-bit-ish (same delay lines)
    pm_b = DopplerPostMix(positions, num_listeners=ll, gains=gains,
                          max_distance=10.0)
    pm_b.on_listener(rows)
    got_b = np.concatenate(
        [np.asarray(pm_b(jnp.asarray(
            np.swapaxes(sound[..., i*s:(i+1)*s], 0, 1)), None))
         for i in range(nb)], axis=0)
    np.testing.assert_allclose(got_b, got, atol=1e-6)

    # a [3] listener event moves ALL rows there; velocities retarget
    # per-listener delays on the audio clock
    multi.on_listener(np.zeros(3))
    assert multi._d_tgt.shape == (o, ll)
    np.testing.assert_allclose(multi._d_tgt[:, 0], multi._d_tgt[:, 1])
    multi.set_velocity(0, [10.0, 0.0, 0.0])
    d_before = multi._d_tgt.copy()
    multi.process_span(jnp.asarray(sound[..., :3*s]))
    assert (multi._d_tgt[0] > d_before[0]).all()     # receding: delay grew
    np.testing.assert_array_equal(multi._d_tgt[1], d_before[1])


def test_render_moving_chunking_invariant(ffat_scene):
    """Chunked per-dispatch transfer rows (round-3 VERDICT item 4): the
    output is bitwise identical however the path is chunked — each row's
    FFAT lookup is independent and the scan state carries across chunk
    boundaries exactly."""
    make, model = ffat_scene
    t = 12
    path = _path(t)
    outs = []
    for bpd in (3, 12):
        sess = make()
        sess.hit(0, np.ones(model.num_modes_audible), kind="gaussian",
                 width_us=400.0)
        outs.append(sess.render_moving(path, blocks_per_dispatch=bpd))
    assert np.abs(outs[0]).max() > 0
    np.testing.assert_array_equal(outs[0], outs[1])


def test_render_doppler_chunking_invariant(ffat_scene):
    """render_doppler computes its transfer rows per chunk too; the
    delayed mix is bitwise chunking-invariant."""
    make, model = ffat_scene
    t = 12
    path = _path(t)
    outs = []
    for bpd in (4, 12):
        sess = make()
        sess.hit(0, np.ones(model.num_modes_audible), kind="gaussian",
                 width_us=400.0)
        outs.append(sess.render_doppler(path, blocks_per_dispatch=bpd))
    assert np.abs(outs[0]).max() > 0
    np.testing.assert_array_equal(outs[0], outs[1])
