"""Force profile synthesis vs the oracle (forces.h semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from openpbso_tpu.config import SAMPLE_RATE
from openpbso_tpu.ops.forces import (FORCE_GAUSSIAN, FORCE_POINT,
                                     force_block, make_force_slots,
                                     make_sustained_state, sustained_block)
from openpbso_tpu.utils.oracle import (OracleARForce, OracleGaussianForce,
                                       OraclePointForce)


def _slots_with(o, k, m, entries):
    """entries: list of (obj, slot, ftype, t0, width, amp, space)."""
    s = make_force_slots(o, k, m, jnp.float64)
    ftype, t0 = np.array(s.ftype), np.array(s.t0)
    width, amp = np.array(s.width), np.array(s.amp)
    space = np.array(s.space)
    for (oo, kk, ft, tt, ww, aa, sp) in entries:
        ftype[oo, kk] = ft
        t0[oo, kk] = tt
        width[oo, kk] = ww
        amp[oo, kk] = aa
        space[oo, kk] = sp
    return type(s)(ftype=jnp.asarray(ftype), t0=jnp.asarray(t0),
                   width=jnp.asarray(width), amp=jnp.asarray(amp),
                   space=jnp.asarray(space))


def test_point_force_profile():
    """Unit impulse on sample 0 of its activation block, one block only
    (forces.h:81-90)."""
    s = 64
    m = 4
    spc = np.array([1.0, 2.0, 0.0, -1.0])
    slots = _slots_with(1, 2, m, [(0, 0, FORCE_POINT, 0, 1.0, 1.0, spc)])
    oracle = OraclePointForce()
    for blk in range(3):
        tp, sp = force_block(slots, jnp.asarray(blk * s, jnp.int32), s)
        ref = np.zeros(s)
        alive = oracle.add(ref)
        np.testing.assert_allclose(np.asarray(tp[0]), ref)
        np.testing.assert_allclose(np.asarray(sp[0]),
                                   spc if alive else np.zeros(m))


@pytest.mark.parametrize("width_us", [50.0, 400.0])
def test_gaussian_force_profile(width_us):
    """Gaussian profile + block-granular cutoff (forces.h:92-105)."""
    s = 128
    m = 2
    width = max(1, int(width_us / 1e6 * SAMPLE_RATE))
    spc = np.array([1.0, -0.5])
    slots = _slots_with(1, 1, m,
                        [(0, 0, FORCE_GAUSSIAN, 0, float(width), 1.0, spc)])
    oracle = OracleGaussianForce(width_us)
    n_blocks = (10 * width) // s + 2
    for blk in range(n_blocks):
        tp, sp = force_block(slots, jnp.asarray(blk * s, jnp.int32), s)
        ref = np.zeros(s)
        alive = oracle.add(ref)
        np.testing.assert_allclose(np.asarray(tp[0]), ref, atol=1e-12)
        np.testing.assert_allclose(np.asarray(sp[0]),
                                   spc if alive else np.zeros(m))


def test_multiple_forces_sum():
    """Reference sums time profiles and spatial vectors across active forces
    (modal_solver.h:206-221) — the excitation is rank-1 of the sums."""
    s = 64
    m = 3
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 1.0])
    slots = _slots_with(1, 4, m, [
        (0, 0, FORCE_POINT, 0, 1.0, 1.0, a),
        (0, 2, FORCE_GAUSSIAN, 0, 8.0, 1.0, b),
    ])
    tp, sp = force_block(slots, jnp.asarray(0, jnp.int32), s)
    ref_t = np.zeros(s)
    OraclePointForce().add(ref_t)
    g = OracleGaussianForce(8 / SAMPLE_RATE * 1e6)
    g.width_samples = 8  # force exact integer width
    g.center = int(4.5 * 8)
    g.add(ref_t)
    np.testing.assert_allclose(np.asarray(tp[0]), ref_t, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sp[0]), a + b)


def test_future_force_not_yet_active():
    """A slot scheduled for a later block contributes nothing now."""
    s = 32
    slots = _slots_with(1, 1, 2,
                        [(0, 0, FORCE_POINT, 5 * s, 1.0, 1.0,
                          np.array([1.0, 1.0]))])
    tp, sp = force_block(slots, jnp.asarray(0, jnp.int32), s)
    assert float(jnp.abs(tp).sum()) == 0.0
    assert float(jnp.abs(sp).sum()) == 0.0
    tp, sp = force_block(slots, jnp.asarray(5 * s, jnp.int32), s)
    assert float(tp[0, 0]) == 1.0


def test_ar_statistics():
    """AR(2) sustained profile: mean ~= mu and spectrum shape follow
    Pai et al. (forces.h:107-128). Stochastic => statistical comparison."""
    o, m, s = 2, 4, 256
    st = make_sustained_state(o, m, seed=1, dtype=jnp.float64)
    st = type(st)(active=jnp.asarray([True, False]),
                  space=st.space.at[0].set(1.0),
                  ar_hist=st.ar_hist, a=st.a, sigma=st.sigma, mu=st.mu,
                  key=st.key)
    chunks = []
    for i in range(40):
        st, prof, spc = sustained_block(st, s, i * s)
        chunks.append(np.asarray(prof))
    x = np.concatenate(chunks, axis=-1)  # [O, T]
    # inactive object emits exactly zero
    assert np.all(x[1] == 0.0)
    sig = x[0]
    assert sig.mean() == pytest.approx(0.142, abs=0.02)
    # stationary variance of AR(2): sigma^2 * (1-a2) / ((1+a2)((1-a2)^2-a1^2))
    a1, a2, sg = 0.783, 0.116, 0.00148
    var = (sg ** 2 * (1 - a2)
           / ((1 + a2) * ((1 - a2) ** 2 - a1 ** 2)))
    assert np.var(sig) == pytest.approx(var, rel=0.3)
    # oracle comparison of autocorrelation shape
    oracle = OracleARForce(seed=3)
    ref = np.zeros(len(sig))
    oracle.add(ref)
    for arr in (sig, ref):
        ac = np.correlate(arr - arr.mean(), arr - arr.mean(), "full")
        mid = len(ac) // 2
        r1 = ac[mid + 1] / ac[mid]
        # AR(2) theory: rho1 = a1/(1-a2)
        assert r1 == pytest.approx(a1 / (1 - a2), abs=0.1)


def test_sustained_space_replaces_impacts():
    """While sustained, slot forces are gated off (modal_solver.h:195-204)."""
    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.runtime.solver import step_block
    from openpbso_tpu.runtime.state import make_solver_state
    from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data
    import dataclasses
    md = synth_mode_data(4, 4)
    s = 64
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta, num_objects=1,
                              block_size=s, dtype=jnp.float64)
    st = make_solver_state(1, bank.num_modes, dtype=jnp.float64)
    # activate sustained AND plant an impact; sustained must win
    sus = dataclasses.replace(st.sustained,
                              active=st.sustained.active.at[0].set(True),
                              space=st.sustained.space.at[0, 0].set(1.0))
    slots = st.slots
    slots = dataclasses.replace(
        slots,
        ftype=slots.ftype.at[0, 0].set(1),
        space=slots.space.at[0, 0, 1].set(100.0))
    st = dataclasses.replace(st, sustained=sus, slots=slots)
    st2, sound, mix, _ = step_block(st, bank,
                                    jnp.ones((1, 2), jnp.float64),
                                    block_size=s, backend="scan")
    # mode 1 (the impact's direction) must stay silent
    assert float(jnp.abs(st2.z_im[0, 1])) == 0.0
    assert float(jnp.abs(st2.z_im[0, 0])) > 0.0


def test_hertz_force_profile():
    """Hertz pulse sin(pi t/tau)^1.5 over one contact time, then silent."""
    from openpbso_tpu.ops.forces import FORCE_HERTZ
    from openpbso_tpu.utils.oracle import OracleHertzForce
    s = 64
    tau = 150  # samples (~3.4 ms contact)
    spc = np.array([1.0, 2.0])
    slots = _slots_with(1, 1, 2,
                        [(0, 0, FORCE_HERTZ, 0, float(tau), 1.0, spc)])
    oracle = OracleHertzForce(tau / SAMPLE_RATE * 1e6)
    assert oracle.tau == tau
    for blk in range(4):
        tp, sp = force_block(slots, jnp.asarray(blk * s, jnp.int32), s)
        ref = np.zeros(s)
        alive = oracle.add(ref)
        np.testing.assert_allclose(np.asarray(tp[0]), ref, atol=1e-12)
        np.testing.assert_allclose(np.asarray(sp[0]),
                                   spc if alive else np.zeros(2))


def test_hertz_session_kind():
    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig
    from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data
    md = synth_mode_data(8, 4)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              block_size=128, dtype=jnp.float64)
    sess = ModalSession(bank, config=SolverConfig(block_size=128,
                                                  backend="blocked"),
                        dtype=jnp.float64)
    sess.hit(0, np.ones(8), kind="hertz", width_us=2000.0)
    _, mix, _ = sess.step()
    assert float(jnp.abs(mix).max()) > 0
