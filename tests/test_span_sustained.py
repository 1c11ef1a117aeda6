"""Sustained AR(2) channel on the span path (round-3).

Contract: step_span(with_sustained=True) over N = n_blocks * S samples must
match running step_block (with_sustained=True) n_blocks times — the noise
stream is bitwise identical by construction (each block's noise is counter-
derived from the absolute block index, ops/forces.py::_noise_for_blocks),
so the only difference is float rounding of the factored AR evaluation and
the span integrator (<= -60 dB).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from openpbso_tpu.config import SAMPLE_RATE
from openpbso_tpu.ops.coeffs import bank_from_material, lambda_from_modes
from openpbso_tpu.ops.forces import (ar_impulse_g, make_sustained_state,
                                     sustained_block, sustained_span)
from openpbso_tpu.ops.span import build_span_tables
from openpbso_tpu.runtime.solver import step_block, step_span
from openpbso_tpu.runtime.state import make_solver_state
from openpbso_tpu.utils.oracle import OracleARForce
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

S = 64


def _scene(o=4, m=10, seed=3):
    """Shared bank + state with sustained active on objects 0,2 and an
    impact slot planted on objects 0,1 (object 0 exercises the gating)."""
    md = synth_mode_data(m, 8, seed=11)
    lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                    CERAMIC.alpha, CERAMIC.beta)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta, num_objects=o,
                              block_size=S, dtype=jnp.float32)
    state = make_solver_state(o, bank.num_modes, num_slots=4, seed=seed)
    rng = np.random.default_rng(seed)
    slots = state.slots
    slots = dataclasses.replace(
        slots,
        ftype=slots.ftype.at[0, 0].set(2).at[1, 0].set(2),
        width=slots.width.at[:, 0].set(9.0),
        space=slots.space.at[0, 0, :].set(
            jnp.asarray(rng.standard_normal(bank.num_modes), jnp.float32))
        .at[1, 0, :].set(
            jnp.asarray(rng.standard_normal(bank.num_modes), jnp.float32)))
    sus = state.sustained
    sus = dataclasses.replace(
        sus,
        active=sus.active.at[0].set(True).at[2].set(True),
        space=sus.space.at[0, :4].set(
            jnp.asarray(rng.standard_normal(4), jnp.float32))
        .at[2, :4].set(jnp.asarray(rng.standard_normal(4), jnp.float32)))
    transfer = jnp.asarray(rng.uniform(0.5, 2.0, (o, bank.num_modes)),
                           jnp.float32)
    state = dataclasses.replace(state, slots=slots, sustained=sus,
                                transfer=transfer)
    return bank, lam64, state


@pytest.mark.parametrize("n_blocks", [4, 8])
def test_sustained_span_matches_block_sequence(n_blocks, dberr):
    bank, lam64, state = _scene()
    gains = jnp.ones((bank.num_objects, 2), jnp.float32)
    ar_g = jnp.asarray(ar_impulse_g((0.783, 0.116), S), jnp.float32)

    st = state
    ref = []
    for _ in range(n_blocks):
        st, _, mix, _ = step_block(st, bank, gains, block_size=S,
                                   backend="blocked", with_sustained=True)
        ref.append(np.asarray(mix))
    ref = np.concatenate(ref, axis=0)

    tables = build_span_tables(lam64, n_blocks * S,
                               num_modes=bank.num_modes)
    st2, mix2 = step_span(state, bank, tables, gains, n_blocks=n_blocks,
                          block_size=S, with_sustained=True, ar_g=ar_g)
    assert dberr(np.asarray(mix2), ref) <= -60.0
    # the key chain advanced identically (bitwise) and the AR history of
    # active objects agrees to float noise
    np.testing.assert_array_equal(np.asarray(st2.sustained.key),
                                  np.asarray(st.sustained.key))
    np.testing.assert_allclose(np.asarray(st2.sustained.ar_hist),
                               np.asarray(st.sustained.ar_hist),
                               rtol=0, atol=1e-5)
    # oscillator state continues correctly: one more block from each path
    stb, _, mb, _ = step_block(st, bank, gains, block_size=S,
                               backend="blocked", with_sustained=True)
    sts, _, ms, _ = step_block(st2, bank, gains, block_size=S,
                               backend="blocked", with_sustained=True)
    assert dberr(np.asarray(ms), np.asarray(mb)) <= -60.0


def test_sustained_span_gates_slots(dberr):
    """Reference replace-semantics: while sustained is active, an object's
    slot forces are NOT accumulated (modal_solver.h:195-204)."""
    bank, lam64, state = _scene()
    gains = jnp.ones((bank.num_objects, 2), jnp.float32)
    ar_g = jnp.asarray(ar_impulse_g((0.783, 0.116), S), jnp.float32)
    tables = build_span_tables(lam64, 4 * S, num_modes=bank.num_modes)
    _, mix = step_span(state, bank, tables, gains, n_blocks=4,
                       block_size=S, with_sustained=True, ar_g=ar_g)
    # zero object 0's slot explicitly: output must be identical (its slot
    # was already gated off by the active sustained channel)
    slots = state.slots
    state2 = dataclasses.replace(
        state, slots=dataclasses.replace(
            slots, ftype=slots.ftype.at[0, 0].set(0)))
    _, mix2 = step_span(state2, bank, tables, gains, n_blocks=4,
                        block_size=S, with_sustained=True, ar_g=ar_g)
    np.testing.assert_array_equal(np.asarray(mix), np.asarray(mix2))


def test_sustained_span_per_object_ar(dberr):
    """Per-object AR tunings ([O, S+1] impulse tables) span-match the
    per-block path after a retune."""
    bank, lam64, state = _scene()
    gains = jnp.ones((bank.num_objects, 2), jnp.float32)
    o = bank.num_objects
    a_host = np.tile(np.asarray([[0.783, 0.116]]), (o, 1))
    a_host[2] = (0.9, 0.05)
    sus = state.sustained
    state = dataclasses.replace(
        state, sustained=dataclasses.replace(
            sus, a=jnp.asarray(a_host, jnp.float32)))
    ar_g = jnp.asarray(ar_impulse_g(a_host, S), jnp.float32)
    assert ar_g.shape == (o, S + 1)

    st = state
    ref = []
    for _ in range(6):
        st, _, mix, _ = step_block(st, bank, gains, block_size=S,
                                   backend="blocked", with_sustained=True)
        ref.append(np.asarray(mix))
    ref = np.concatenate(ref, axis=0)
    tables = build_span_tables(lam64, 6 * S, num_modes=bank.num_modes)
    _, mix2 = step_span(state, bank, tables, gains, n_blocks=6,
                        block_size=S, with_sustained=True, ar_g=ar_g)
    assert dberr(np.asarray(mix2), ref) <= -60.0


def test_sustained_span_profile_statistics():
    """The span-factored AR(2) profile has the oracle's statistics: mean
    ~= mu, stationary variance, lag-1 autocorrelation (forces.h:107-128,
    Pai et al. 2001) — same contract as test_forces.test_ar_statistics."""
    o, m, s, x = 2, 4, 256, 40
    st = make_sustained_state(o, m, seed=1, dtype=jnp.float64)
    st = dataclasses.replace(
        st, active=jnp.asarray([True, False]),
        space=st.space.at[0].set(1.0))
    g = jnp.asarray(ar_impulse_g((0.783, 0.116), s))
    st2, prof, spc = sustained_span(st, g, x, s)
    prof = np.asarray(prof)
    assert np.all(prof[1] == 0.0)           # inactive object: exact zeros
    sig = prof[0]
    assert sig.mean() == pytest.approx(0.142, abs=0.02)
    a1, a2, sg = 0.783, 0.116, 0.00148
    var = (sg ** 2 * (1 - a2) / ((1 + a2) * ((1 - a2) ** 2 - a1 ** 2)))
    assert np.var(sig) == pytest.approx(var, rel=0.3)
    oracle = OracleARForce(seed=3)
    ref = np.zeros(len(sig))
    oracle.add(ref)
    for arr in (sig, ref):
        ac = np.correlate(arr - arr.mean(), arr - arr.mean(), "full")
        mid = len(ac) // 2
        assert ac[mid + 1] / ac[mid] == pytest.approx(a1 / (1 - a2),
                                                      abs=0.1)


def test_sustained_span_profile_bitwise_noise():
    """sustained_span draws the same counter-derived per-block noise as
    sustained_block: the profiles agree to float rounding (NOT just
    statistically)."""
    o, m, s, x = 3, 4, 64, 5
    st = make_sustained_state(o, m, seed=7, dtype=jnp.float32)
    st = dataclasses.replace(
        st, active=jnp.asarray([True, True, False]),
        space=st.space.at[:2].set(1.0))
    g = jnp.asarray(ar_impulse_g((0.783, 0.116), s), jnp.float32)
    stb = st
    chunks = []
    for i in range(x):
        stb, prof, _ = sustained_block(stb, s, i * s)
        chunks.append(np.asarray(prof))
    ref = np.concatenate(chunks, axis=-1)
    sts, prof_span, _ = sustained_span(st, g, x, s)
    np.testing.assert_allclose(np.asarray(prof_span), ref,
                               rtol=0, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(sts.key), np.asarray(stb.key))


def test_session_sustained_rides_span(dberr):
    """render_multi with an active sustained channel takes the span path
    and matches per-block stepping; engine-level span_eligible no longer
    excludes sustained scenes (VERDICT round-2 item 2)."""
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig

    def build():
        md = synth_mode_data(10, 8, seed=11)
        lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                        CERAMIC.alpha, CERAMIC.beta)
        bank = bank_from_material(CERAMIC.density, md.omega_squared,
                                  CERAMIC.alpha, CERAMIC.beta,
                                  num_objects=3, block_size=S)
        return ModalSession(bank, config=SolverConfig(block_size=S),
                            num_slots=4, lam64=lam64)

    rng = np.random.default_rng(0)
    space = rng.standard_normal(10)
    sess_a = build()
    sess_a.hit(1, rng.standard_normal(10), kind="gaussian", width_us=500.0)
    sess_a.sustained_start(0, space)
    assert sess_a.span_eligible()
    out_a = sess_a.render_multi(8, blocks_per_dispatch=4)

    sess_b = build()
    sess_b.hit(1, rng.standard_normal(10), kind="gaussian", width_us=500.0)
    # note: same rng draws order — rebuild identically
    rng2 = np.random.default_rng(0)
    space2 = rng2.standard_normal(10)
    hit2 = rng2.standard_normal(10)
    sess_c = build()
    sess_c.hit(1, hit2, kind="gaussian", width_us=500.0)
    sess_c.sustained_start(0, space2)
    out_c = np.concatenate([np.asarray(sess_c.step()[1])
                            for _ in range(8)], axis=0)
    assert dberr(out_a, out_c) <= -60.0
    # AR retune invalidates the cached impulse table and still matches
    sess_a.set_ar_params(0, a=(0.9, 0.05), sigma=0.002, mu=0.1)
    sess_c.set_ar_params(0, a=(0.9, 0.05), sigma=0.002, mu=0.1)
    out_a2 = sess_a.render_multi(4, blocks_per_dispatch=4)
    out_c2 = np.concatenate([np.asarray(sess_c.step()[1])
                             for _ in range(4)], axis=0)
    assert dberr(out_a2, out_c2) <= -60.0


def test_sustained_span_with_complex_rows(dberr):
    """Sustained channel + COMPLEX transfer rows on the span (edge of the
    feature matrix): parity with per-block stepping."""
    bank, lam64, state = _scene()
    rng = np.random.default_rng(9)
    m = bank.num_modes
    t = (rng.uniform(0.5, 2.0, (bank.num_objects, m))
         * np.exp(1j * rng.uniform(-np.pi, np.pi, (bank.num_objects, m))))
    state = dataclasses.replace(
        state,
        transfer=jnp.asarray(t.real, jnp.float32),
        transfer_im=jnp.asarray(t.imag, jnp.float32))
    gains = jnp.ones((bank.num_objects, 2), jnp.float32)
    ar_g = jnp.asarray(ar_impulse_g((0.783, 0.116), S), jnp.float32)

    st = state
    ref = []
    for _ in range(6):
        st, _, mix, _ = step_block(st, bank, gains, block_size=S,
                                   backend="blocked", with_sustained=True)
        ref.append(np.asarray(mix))
    ref = np.concatenate(ref, axis=0)
    tables = build_span_tables(lam64, 6 * S, num_modes=bank.num_modes)
    _, mix2 = step_span(state, bank, tables, gains, n_blocks=6,
                        block_size=S, with_sustained=True, ar_g=ar_g)
    assert np.abs(ref).max() > 0
    assert dberr(np.asarray(mix2), ref) <= -60.0


@pytest.mark.slow
def test_sustained_span_ten_seconds_accuracy(dberr):
    """Long-horizon: ~10 s of chained sustained spans stays within the
    span contract vs per-block stepping (f32 drift does not accumulate
    beyond the reduction-order floor; the AR noise chain is bitwise, so
    the comparison isolates the factored evaluation)."""
    bank, lam64, state = _scene()
    gains = jnp.ones((bank.num_objects, 2), jnp.float32)
    ar_g = jnp.asarray(ar_impulse_g((0.783, 0.116), S), jnp.float32)
    n_blocks = 32
    spans = 216                     # 216 * 32 * 64 / 44100 ~= 10 s
    tables = build_span_tables(lam64, n_blocks * S,
                               num_modes=bank.num_modes)
    st_span = st_blk = state
    worst = -np.inf
    for _ in range(spans):
        st_span, mix_s = step_span(st_span, bank, tables, gains,
                                   n_blocks=n_blocks, block_size=S,
                                   with_sustained=True, ar_g=ar_g)
        ref = []
        for _ in range(n_blocks):
            st_blk, _, mix_b, _ = step_block(
                st_blk, bank, gains, block_size=S, backend="blocked",
                with_sustained=True)
            ref.append(np.asarray(mix_b))
        worst = max(worst, dberr(np.asarray(mix_s),
                                 np.concatenate(ref, axis=0)))
    assert worst <= -60.0, f"worst span {worst:.1f} dB"


def test_retuned_sustained_rides_span_with_block_fallback_for_hits():
    """Round-4: a retuned drag rides the span (per-object AR tables are
    warmed for the drag-only bucket); only a concurrent impact hit on
    another object falls back to the warmed per-block step until the
    hit expires."""
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig

    md = synth_mode_data(10, 8, seed=13)
    lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                    CERAMIC.alpha, CERAMIC.beta)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=3, block_size=S)
    sess = ModalSession(bank, config=SolverConfig(block_size=S),
                        num_slots=4, lam64=lam64)
    rng = np.random.default_rng(5)
    sess.sustained_start(0, rng.standard_normal(10))
    assert sess.span_eligible()
    sess.set_ar_params(1, a=(0.9, 0.05), sigma=0.002, mu=0.1)
    assert sess.span_eligible(), \
        "retuned pure drag rides the warmed per-object span variant"
    assert sess._span_bucket(True) == 0
    out = sess.render_multi(2)
    assert np.isfinite(out).all() and np.abs(out).max() > 0
    # an impact on another object needs a bucketed per-object variant
    # warmup does not compile -> per-block fallback while it is live
    sess.hit(2, rng.standard_normal(10), kind="gaussian", width_us=500.0)
    assert not sess.span_eligible()
    out = sess.render_multi(2)
    assert np.isfinite(out).all()
    # drag ends -> span dispatch resumes (impact/decay spans are
    # unaffected by AR tunings)
    sess.sustained_end(0)
    assert sess.span_eligible()


def test_sigma_mu_retune_keeps_ar_tables():
    """The cached device AR tables depend only on ``a``: a sigma/mu-only
    retune must NOT invalidate them (a full per-object rebuild + upload
    on the synthesis thread risks an underrun), while a change to ``a``
    must."""
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig

    md = synth_mode_data(10, 8, seed=13)
    lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                    CERAMIC.alpha, CERAMIC.beta)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=3, block_size=S)
    sess = ModalSession(bank, config=SolverConfig(block_size=S),
                        num_slots=4, lam64=lam64)
    sess.ar_span_table(4)
    assert sess._ar_g
    a0 = tuple(sess._ar_host[1])
    sess.set_ar_params(1, a=a0, sigma=0.5, mu=0.9)     # sigma/mu only
    assert sess._ar_g, "a unchanged: cached tables must survive"
    assert float(sess.state.sustained.sigma[1]) == np.float32(0.5)
    assert float(sess.state.sustained.mu[1]) == np.float32(0.9)
    sess.set_ar_params(1, a=(0.9, 0.05), sigma=0.5, mu=0.9)
    assert not sess._ar_g, "a changed: tables must be invalidated"


def test_retuned_drag_span_matches_block_sequence(dberr):
    """Round-3 VERDICT item 3 contract: a RETUNED drag rendered on the
    span path matches per-block stepping at <= -60 dB."""
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig

    md = synth_mode_data(10, 8, seed=13)
    lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                    CERAMIC.alpha, CERAMIC.beta)

    def build():
        bank = bank_from_material(CERAMIC.density, md.omega_squared,
                                  CERAMIC.alpha, CERAMIC.beta,
                                  num_objects=3, block_size=S)
        return ModalSession(bank, config=SolverConfig(block_size=S),
                            num_slots=4, lam64=lam64)

    rng = np.random.default_rng(7)
    space = rng.standard_normal(10)
    a_sess = build()
    a_sess.set_ar_params(1, a=(0.9, 0.05), sigma=0.002, mu=0.1)
    a_sess.sustained_start(1, space)
    assert a_sess.span_eligible() and a_sess._span_bucket(True) == 0
    out_span = a_sess.render_multi(8, blocks_per_dispatch=4)

    b_sess = build()
    b_sess.set_ar_params(1, a=(0.9, 0.05), sigma=0.002, mu=0.1)
    b_sess.sustained_start(1, space)
    out_blk = np.concatenate([np.asarray(b_sess.step()[1])
                              for _ in range(8)], axis=0)
    assert np.abs(out_blk).max() > 0
    assert dberr(out_span, out_blk) <= -60.0


def test_ar_impulse_g_closed_form_matches_recurrence():
    """ar_impulse_g evaluates the AR(2) impulse response in closed form
    from the characteristic roots; the literal recurrence is the truth."""
    for a in ((0.783, 0.116), (0.9, 0.05), (1.2, -0.36001), (0.5, -0.3)):
        n = 700
        g = ar_impulse_g(a, n)[0]
        ref = np.zeros(n + 1)
        ref[0] = 1.0
        ref[1] = a[0]
        for d in range(2, n + 1):
            ref[d] = a[0] * ref[d - 1] + a[1] * ref[d - 2]
        np.testing.assert_allclose(g, ref, rtol=0, atol=1e-10)
    # (near-)degenerate roots (a1^2/4 + a2 ~ 0) take the binomial-
    # expansion fallback — vectorized, no per-sample loop; check it
    # against the literal recurrence over a long table, at exactly
    # degenerate, perturbed-degenerate, and the trivial a=0 tunings
    for a in ((1.0, -0.25), (1.0, -0.25 + 1e-18), (1.8, -0.81),
              (0.0, 0.0)):
        n = 4096
        g = ar_impulse_g(a, n)[0]
        ref = np.zeros(n + 1)
        ref[0], ref[1] = 1.0, a[0]
        for d in range(2, n + 1):
            ref[d] = a[0] * ref[d - 1] + a[1] * ref[d - 2]
        scale = np.abs(ref).max()
        np.testing.assert_allclose(g, ref, rtol=0, atol=1e-12 * scale)
        assert np.isfinite(g).all()


@pytest.mark.parametrize("glen_blocks", [2, 4, 8])
def test_sustained_span_scanfree_groups_match(glen_blocks, dberr):
    """A g table covering ``glen_blocks`` blocks switches the companion
    propagation to the grouped scan-free form (_companion_states); the
    profile must match the one-block-table (pure scan) evaluation to
    float rounding, and the per-block sequence to the span contract."""
    o, m, s, x = 3, 4, 64, 8
    st = make_sustained_state(o, m, seed=7, dtype=jnp.float32)
    st = dataclasses.replace(
        st, active=jnp.asarray([True, True, False]),
        space=st.space.at[:2].set(1.0))
    g1 = jnp.asarray(ar_impulse_g((0.783, 0.116), s), jnp.float32)
    gg = jnp.asarray(ar_impulse_g((0.783, 0.116), glen_blocks * s),
                     jnp.float32)
    st1, prof1, _ = sustained_span(st, g1, x, s)
    st2, prof2, _ = sustained_span(st, gg, x, s)
    np.testing.assert_allclose(np.asarray(prof2), np.asarray(prof1),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(st2.ar_hist),
                               np.asarray(st1.ar_hist), rtol=0, atol=1e-5)


def test_sustained_span_per_object_grouped(dberr):
    """Per-object tunings with a multi-block g table (the grouped
    per-object path) match the per-block sequence."""
    bank, lam64, state = _scene()
    gains = jnp.ones((bank.num_objects, 2), jnp.float32)
    o = bank.num_objects
    a_host = np.tile(np.asarray([[0.783, 0.116]]), (o, 1))
    a_host[2] = (0.9, 0.05)
    sus = state.sustained
    state = dataclasses.replace(
        state, sustained=dataclasses.replace(
            sus, a=jnp.asarray(a_host, jnp.float32)))
    ar_g = jnp.asarray(ar_impulse_g(a_host, 2 * S), jnp.float32)

    st = state
    ref = []
    for _ in range(6):
        st, _, mix, _ = step_block(st, bank, gains, block_size=S,
                                   backend="blocked", with_sustained=True)
        ref.append(np.asarray(mix))
    ref = np.concatenate(ref, axis=0)
    tables = build_span_tables(lam64, 6 * S, num_modes=bank.num_modes)
    _, mix2 = step_span(state, bank, tables, gains, n_blocks=6,
                        block_size=S, with_sustained=True, ar_g=ar_g)
    assert dberr(np.asarray(mix2), ref) <= -60.0


def test_sustained_span_zero_bucket_steady_drag(dberr):
    """num_slots=0 (steady drag: every impact slot expired) makes the
    sustained channel the span's only slot; output must match the
    1-slot dispatch bitwise when the sliced slot cannot produce."""
    bank, lam64, state = _scene()
    # expire the impact slots: point the planted hits far in the past
    slots = state.slots
    state = dataclasses.replace(
        state, slots=dataclasses.replace(
            slots, ftype=jnp.zeros_like(slots.ftype)))
    gains = jnp.ones((bank.num_objects, 2), jnp.float32)
    ar_g = jnp.asarray(ar_impulse_g((0.783, 0.116), 4 * S), jnp.float32)
    tables = build_span_tables(lam64, 4 * S, num_modes=bank.num_modes)
    _, mix1 = step_span(state, bank, tables, gains, n_blocks=4,
                        block_size=S, num_slots=1, with_sustained=True,
                        ar_g=ar_g)
    _, mix0 = step_span(state, bank, tables, gains, n_blocks=4,
                        block_size=S, num_slots=0, with_sustained=True,
                        ar_g=ar_g)
    np.testing.assert_array_equal(np.asarray(mix0), np.asarray(mix1))


def test_session_steady_drag_uses_zero_bucket():
    """The session's span bucket drops to 0 while a drag is the only live
    excitation, and returns to the slot bucket when a hit lands."""
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig

    md = synth_mode_data(10, 8, seed=13)
    lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                    CERAMIC.alpha, CERAMIC.beta)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=3, block_size=S)
    sess = ModalSession(bank, config=SolverConfig(block_size=S),
                        num_slots=4, lam64=lam64)
    rng = np.random.default_rng(5)
    sess.sustained_start(0, rng.standard_normal(10))
    assert sess._span_bucket(True) == 0
    out = sess.render_multi(4, blocks_per_dispatch=4)
    assert np.isfinite(out).all() and np.abs(out).max() > 0
    sess.hit(1, rng.standard_normal(10), kind="gaussian", width_us=500.0)
    assert sess._span_bucket(True) == 1
    out = sess.render_multi(4, blocks_per_dispatch=4)
    assert np.isfinite(out).all()
