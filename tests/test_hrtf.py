"""Spherical-head HRTF: filter physics, block-streaming exactness, e2e."""
import jax.numpy as jnp
import numpy as np

from openpbso_tpu.config import OUTPUT_SCALE, SAMPLE_RATE
from openpbso_tpu.config import SOUND_SPEED
from openpbso_tpu.ops.hrtf import (DEFAULT_HEAD_RADIUS,
                                   HRTFRenderer, fir_to_freq,
                                   hrtf_mix_block, spherical_hrtf_fir)

BLOCK = 256


def test_itd_and_shadow_physics():
    # source hard right along the ear axis: right ear leads and is brighter
    fir = spherical_hrtf_fir(np.asarray([[1.0, 0.0, 0.0]]), n_taps=128)
    left, right = fir[0, 0], fir[0, 1]
    lag_l = int(np.argmax(np.abs(left)))
    lag_r = int(np.argmax(np.abs(right)))
    expected_itd = 2 * DEFAULT_HEAD_RADIUS / SOUND_SPEED * SAMPLE_RATE
    assert abs((lag_l - lag_r) - expected_itd) <= 2.0   # ~22.5 samples
    # head shadow: contralateral ear loses high frequencies
    freqs = np.fft.rfftfreq(128, 1.0 / SAMPLE_RATE)
    hi = freqs > 5000.0
    hl = np.abs(np.fft.rfft(left))[hi].mean()
    hr = np.abs(np.fft.rfft(right))[hi].mean()
    assert hr > 2.0 * hl
    # frontal source: symmetric ears
    fir_f = spherical_hrtf_fir(np.asarray([[0.0, 0.0, 1.0]]), n_taps=128)
    np.testing.assert_allclose(fir_f[0, 0], fir_f[0, 1], atol=1e-12)


def test_block_streaming_matches_direct_convolution():
    rng = np.random.default_rng(3)
    o, n_blocks, taps = 3, 4, 96
    dirs = rng.standard_normal((o, 3))
    fir = spherical_hrtf_fir(dirs, n_taps=taps)
    hf = fir_to_freq(fir, BLOCK)
    signal = rng.standard_normal((o, n_blocks * BLOCK)).astype(np.float32)

    carry = jnp.zeros((2, taps - 1), jnp.float32)
    mixes = []
    for b in range(n_blocks):
        blk = jnp.asarray(signal[:, b * BLOCK:(b + 1) * BLOCK])
        mix, carry = hrtf_mix_block(blk, hf, carry, block_size=BLOCK)
        mixes.append(np.asarray(mix))
    streamed = np.concatenate(mixes, axis=0)            # [N*S, 2]

    ref = np.zeros((2, n_blocks * BLOCK))
    for oo in range(o):
        for c in range(2):
            full = np.convolve(signal[oo].astype(np.float64), fir[oo, c])
            ref[c] += full[: n_blocks * BLOCK]
    ref = (ref / OUTPUT_SCALE).T
    err = np.abs(streamed - ref).max() / max(np.abs(ref).max(), 1e-30)
    assert err < 1e-5, f"stream vs direct conv rel err {err}"


def test_renderer_end_to_end():
    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig
    from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

    md = synth_mode_data(16, 8, seed=2)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta, num_objects=2,
                              block_size=BLOCK, dtype=jnp.float32)
    sess = ModalSession(bank, config=SolverConfig(block_size=BLOCK,
                                                  backend="blocked"))
    positions = np.asarray([[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]])
    r = HRTFRenderer(sess, positions, n_taps=96)
    r.set_listener(np.zeros(3))
    sess.hit(0, np.ones(16), kind="gaussian", width_us=500.0)  # right object
    audio = r.render(8)
    assert audio.shape == (8 * BLOCK, 2)
    peak = np.abs(audio).max()
    assert peak > 0
    # only the +x object sounds: the right channel must carry more energy
    e_l, e_r = (audio[:, 0] ** 2).sum(), (audio[:, 1] ** 2).sum()
    assert e_r > e_l
    # and lead in time
    xc = np.correlate(audio[:, 1], audio[:, 0], mode="full")
    lag = int(np.argmax(np.abs(xc))) - (audio.shape[0] - 1)
    assert lag < 0, f"right ear should lead, lag={lag}"


def test_hrtf_post_mix_in_streaming_engine():
    import time

    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.ops.hrtf import HRTFPostMix
    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig
    from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

    md = synth_mode_data(12, 8, seed=7)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta, num_objects=2,
                              block_size=128, dtype=jnp.float32)
    sess = ModalSession(bank, config=SolverConfig(block_size=128,
                                                  backend="blocked"))
    positions = np.asarray([[0.7, 0.0, 0.0], [-0.7, 0.0, 0.0]])
    pm = HRTFPostMix(positions, block_size=128, n_taps=96)
    sink = RawCollectorSink()
    eng = StreamingEngine(sess, sink, post_mix=pm)
    eng.start()
    try:
        eng.hit(0, np.ones(12), kind="gaussian", width_us=500.0)  # +x object
        time.sleep(0.4)
        eng.set_listener(np.asarray([0.0, 0.0, 0.2]))  # on_listener path
        time.sleep(0.2)
    finally:
        eng.stop()
    assert eng.error is None
    audio = sink.concatenated()
    assert audio.shape[1] == 2 and np.abs(audio).max() > 0
    # the +x object must load the right ear
    assert (audio[:, 1] ** 2).sum() > (audio[:, 0] ** 2).sum()


def test_hrtf_post_mix_with_lookahead():
    """post_mix must apply per block inside the lookahead batch too."""
    import time

    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.ops.hrtf import HRTFPostMix
    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig
    from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

    md = synth_mode_data(12, 8, seed=8)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta, num_objects=1,
                              block_size=128, dtype=jnp.float32)
    sess = ModalSession(bank, config=SolverConfig(block_size=128,
                                                  backend="blocked"))
    pm = HRTFPostMix(np.asarray([[0.7, 0.0, 0.0]]), block_size=128,
                     n_taps=96)
    sink = RawCollectorSink()
    eng = StreamingEngine(sess, sink, post_mix=pm, lookahead=4)
    eng.start()
    try:
        eng.hit(0, np.ones(12), kind="gaussian", width_us=400.0)
        time.sleep(0.5)
    finally:
        eng.stop()
    assert eng.error is None
    audio = sink.concatenated()
    assert np.abs(audio).max() > 0
    e_l, e_r = (audio[:, 0] ** 2).sum(), (audio[:, 1] ** 2).sum()
    assert e_r > e_l   # +x object loads the right ear through lookahead


def test_hrtf_span_matches_block_streaming():
    """process_span (one 2N-point overlap-save) == per-block hrtf_mix_block
    chaining, including the carry hand-over ACROSS a span/block seam."""
    from openpbso_tpu.ops.hrtf import HRTFPostMix

    rng = np.random.default_rng(5)
    o, taps, s = 3, 96, 128
    positions = rng.standard_normal((o, 3))
    sound = rng.standard_normal((o, 8 * s)).astype(np.float32)

    pm_block = HRTFPostMix(positions, block_size=s, n_taps=taps)
    blocks = [np.asarray(pm_block(jnp.asarray(sound[:, i*s:(i+1)*s]), None))
              for i in range(8)]
    ref = np.concatenate(blocks, axis=0)

    pm_span = HRTFPostMix(positions, block_size=s, n_taps=taps)
    # span of 5 blocks, then one per-block call, then a 2-block span:
    # all three carries must hand over seamlessly
    parts = [np.asarray(pm_span.process_span(jnp.asarray(sound[:, :5*s]))),
             np.asarray(pm_span(jnp.asarray(sound[:, 5*s:6*s]), None)),
             np.asarray(pm_span.process_span(jnp.asarray(sound[:, 6*s:])))]
    got = np.concatenate(parts, axis=0)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
    assert err < 1e-4, err


def test_hrtf_post_mix_rides_span():
    """An engine with lam64 span tables AND an HRTF post-mix keeps the
    span dispatch (round-2 VERDICT item 4): stream healthy, binaural
    output, and the span path demonstrably taken."""
    import time

    from openpbso_tpu.ops.coeffs import bank_from_material, \
        lambda_from_modes
    from openpbso_tpu.ops.hrtf import HRTFPostMix
    from openpbso_tpu.runtime.audio import RawCollectorSink
    from openpbso_tpu.runtime.engine import StreamingEngine
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig
    from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

    md = synth_mode_data(12, 8, seed=9)
    lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                    CERAMIC.alpha, CERAMIC.beta)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta, num_objects=2,
                              block_size=128, dtype=jnp.float32)
    sess = ModalSession(bank, config=SolverConfig(block_size=128,
                                                  backend="blocked"),
                        lam64=lam64)
    pm = HRTFPostMix(np.asarray([[0.7, 0.0, 0.0], [-0.7, 0.0, 0.0]]),
                     block_size=128, n_taps=96)
    sink = RawCollectorSink()
    eng = StreamingEngine(sess, sink, post_mix=pm, lookahead=4)
    assert sess.span_eligible()
    calls = []
    orig = sess._step_span_sound
    sess._step_span_sound = lambda *a, **k: (calls.append(a)
                                             or orig(*a, **k))
    eng.start()
    try:
        eng.hit(0, np.ones(12), kind="gaussian", width_us=500.0)
        time.sleep(0.5)
    finally:
        eng.stop()
    assert eng.error is None
    assert calls, "HRTF stream never took the span dispatch"
    audio = sink.concatenated()
    assert np.abs(audio).max() > 0
    e_l, e_r = (audio[:, 0] ** 2).sum(), (audio[:, 1] ** 2).sum()
    assert e_r > e_l   # +x object loads the right ear through the span
