"""Shared-state multi-listener rendering.

Sound is linear in the transfer row (modal_solver.h:267-269: sound =
q . transfer), so L listeners can share ONE [O, M] oscillator state with
[L, O, M] transfer rows — each listener costs one extra mode-reduce instead
of replicating the state/force/table work L-fold (the round-1 Scene layout).
Contract: identical output to the replicated layout, on every backend and
on the span path.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from openpbso_tpu.models.scene import Scene, SceneInstance
from openpbso_tpu.ops.coeffs import bank_from_material, lambda_from_modes
from openpbso_tpu.runtime.session import ModalSession
from openpbso_tpu.runtime.solver import SolverConfig
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

S = 64
OFFSETS = np.asarray([[0.0, 0.0, 0.0], [0.3, -0.1, 0.2], [-0.4, 0.5, 0.1]])


def _db(err, ref):
    denom = float(np.abs(ref).max())
    if denom == 0:
        return -np.inf
    return 20 * np.log10(max(float(np.abs(err).max()), 1e-300) / denom)


def _session(num_listeners=1, backend="blocked", with_lam64=False,
             num_modes=10, num_objects=3, seed=7):
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
    return sess, md


def _transfer_rows(sess, rng):
    """Distinct per-listener transfer rows [L, O, M]."""
    l = sess.num_listeners
    o, m = sess.bank.num_objects, sess.bank.num_modes
    return rng.uniform(0.5, 2.0, size=(l, o, m)).astype(np.float32)


@pytest.mark.parametrize("backend", ["blocked", "scan"])
def test_multi_matches_per_listener_sessions(backend):
    """Channel l of the L-listener session == a single session rendered
    with listener l's transfer row alone."""
    rng = np.random.default_rng(3)
    multi, md = _session(num_listeners=3, backend=backend)
    rows = _transfer_rows(multi, rng)
    multi.state = dataclasses.replace(multi.state,
                                      transfer=jnp.asarray(rows))
    space = rng.standard_normal(md.num_modes)
    multi.hit(0, space, kind="gaussian", width_us=900.0)
    multi.hit(2, -space, kind="point")
    _, mix_multi, _ = multi.step()
    mixes = [np.asarray(mix_multi)]
    for _ in range(3):
        _, mx, _ = multi.step()
        mixes.append(np.asarray(mx))
    mix_multi = np.concatenate(mixes, axis=0)          # [4S, 3]
    assert mix_multi.shape == (4 * S, 3)

    for l in range(3):
        single, _ = _session(num_listeners=1, backend=backend)
        single.state = dataclasses.replace(single.state,
                                           transfer=jnp.asarray(rows[l]))
        single.hit(0, space, kind="gaussian", width_us=900.0)
        single.hit(2, -space, kind="point")
        ref = np.concatenate([np.asarray(single.step()[1])
                              for _ in range(4)], axis=0)  # [4S, 2]
        db = _db(mix_multi[:, l] - ref[:, 0], ref[:, 0])
        assert db <= -100, f"listener {l} on {backend}: {db:.1f} dB"


def test_decay_fast_path_multi():
    """Idle multi-listener blocks take the decay path with identical
    output to the full step."""
    rng = np.random.default_rng(5)
    sess, md = _session(num_listeners=2)
    rows = _transfer_rows(sess, rng)
    sess.state = dataclasses.replace(sess.state, transfer=jnp.asarray(rows))
    sess.hit(1, rng.standard_normal(md.num_modes))
    sess.step()  # consume the hit block
    # force-slot expiry passed: the session is idle now
    for _ in range(40):
        sess.step()
    assert sess._idle() and sess.decay_eligible()
    ref_state = sess.state
    _, mix_decay, _ = sess.step()
    # compare against the ungated full step from the same state
    sess.state = ref_state
    sess._clock -= S
    _, mix_full, _ = sess._step_full(with_sustained=True, num_slots=None)
    db = _db(np.asarray(mix_decay) - np.asarray(mix_full),
             np.asarray(mix_full))
    assert db <= -120, f"{db:.1f} dB"


def test_span_path_multi():
    """render_multi's one-dispatch span must match per-block stepping for
    [L, O, M] transfer rows (chunked span form)."""
    rng = np.random.default_rng(9)
    a, md = _session(num_listeners=2, with_lam64=True)
    b, _ = _session(num_listeners=2, with_lam64=False)
    rows = _transfer_rows(a, rng)
    a.state = dataclasses.replace(a.state, transfer=jnp.asarray(rows))
    b.state = dataclasses.replace(b.state, transfer=jnp.asarray(rows))
    space = rng.standard_normal(md.num_modes)
    for s in (a, b):
        s.hit(0, space, kind="gaussian", width_us=700.0)
        s.hit(1, 2 * space, kind="point")
    assert a.span_eligible() and not b.span_eligible()
    got = a.render_multi(8, blocks_per_dispatch=4)     # span dispatches
    ref = b.render(8)                                   # per-block
    assert got.shape == ref.shape == (8 * S, 2)
    db = _db(got - ref, ref)
    assert db <= -100, f"{db:.1f} dB"


def test_scene_shared_state_matches_replicated(tmp_path):
    """Scene(listener_offsets=...) default shared-state layout produces the
    replicated layout's output with O (not O*L) solver rows."""
    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    from openpbso_tpu.utils.synth import synth_model_dir

    synth_model_dir(str(tmp_path), "m", num_modes=12, subdivisions=1,
                    ffat_n=8, seed=4)
    mdl = load_model(resolve_model_dir(str(tmp_path), "m"))
    insts = [SceneInstance(mdl, np.asarray([0.0, 0.0, 0.0]), gain=1.0),
             SceneInstance(mdl, np.asarray([1.5, 0.2, 0.0]), gain=0.7)]

    def build(shared):
        sc = Scene(list(insts), block_size=S, backend="blocked",
                   listener_offsets=OFFSETS, shared_state=shared,
                   dtype=jnp.float32)
        sc.set_listener(np.asarray([0.8, 0.6, 0.4]),
                        distance_attenuation=True)
        sc.hit(0, 3, kind="gaussian", width_us=800.0)
        sc.hit(1, 5)
        return sc

    shared = build(True)
    repl = build(False)
    assert shared.session.bank.num_objects == 2
    assert repl.session.bank.num_objects == 6
    got = shared.render(5)
    ref = repl.render(5)
    assert got.shape == ref.shape == (5 * S, 3)
    db = _db(got - ref, ref)
    assert db <= -100, f"{db:.1f} dB"


def test_scene_binaural_shared_state(tmp_path):
    """Binaural via shared state: 2 channels, interaural level difference
    present, O solver rows only."""
    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    from openpbso_tpu.utils.synth import synth_model_dir

    synth_model_dir(str(tmp_path), "m", num_modes=12, subdivisions=1,
                    ffat_n=8, seed=6)
    mdl = load_model(resolve_model_dir(str(tmp_path), "m"))
    sc = Scene([SceneInstance(mdl, np.zeros(3))], block_size=S,
               backend="blocked", binaural=True, dtype=jnp.float32)
    assert sc.session.bank.num_objects == 1
    assert sc.session.num_listeners == 2
    sc.set_listener(np.asarray([1.2, 0.1, 0.0]))  # along the ear axis
    sc.hit(0, 2)
    audio = sc.render(5)
    assert audio.shape == (5 * S, 2)
    assert np.abs(audio).max() > 0
    # ears at different ranges -> channels differ
    assert not np.allclose(audio[:, 0], audio[:, 1])


def test_multi_listener_qnorm_and_warmup():
    """qnorm stays [O, M] (transfer-independent) and warmup leaves the
    multi-listener session untouched."""
    sess, md = _session(num_listeners=2)
    sess.config = dataclasses.replace(sess.config, compute_qnorm=True)
    sess.warmup(qnorm=True)
    assert sess.sample_clock == 0
    sess.hit(0, np.ones(md.num_modes))
    _, mix, qn = sess.step()
    assert mix.shape == (S, 2)
    assert qn.shape == (sess.bank.num_objects, sess.bank.num_modes)
    assert float(np.asarray(qn).max()) > 0


# --------------------------------------------- Scene-level moving renders


@pytest.fixture
def scene_model(tmp_path_factory):
    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    from openpbso_tpu.utils.synth import synth_model_dir
    root = tmp_path_factory.mktemp("scene_model")
    synth_model_dir(str(root), "m", num_modes=12, subdivisions=1,
                    ffat_n=8, seed=9)
    return load_model(resolve_model_dir(str(root), "m"))


def test_scene_render_moving_matches_stepwise(scene_model):
    """Scene.render_moving == stepping the scene with set_listener per
    block (block-constant rows, smooth off)."""
    mk = lambda: Scene(  # noqa: E731
        [SceneInstance(scene_model, np.asarray([0.0, 0.0, 0.0])),
         SceneInstance(scene_model, np.asarray([1.0, 0.2, 0.0]))],
        block_size=S, backend="blocked", dtype=jnp.float32)
    t_blocks = 6
    path = np.stack([np.linspace(0.5, 1.5, t_blocks),
                     np.full(t_blocks, 0.4),
                     np.linspace(0.2, -0.4, t_blocks)], axis=1)
    a = mk()
    a.hit(0, 3, kind="gaussian", width_us=600.0)
    got = a.render_moving(path, smooth=False)
    b = mk()
    b.hit(0, 3, kind="gaussian", width_us=600.0)
    chunks = []
    for t in range(t_blocks):
        b.set_listener(path[t])
        _, mix, _ = b.step()
        chunks.append(np.asarray(mix))
    ref = np.concatenate(chunks, axis=0)
    db = _db(got - ref, ref)
    assert db <= -100, f"{db:.1f} dB"


def test_scene_moving_objects_change_output(scene_model):
    """object_paths moves the objects: a receding object renders
    differently from a static one."""
    mk = lambda: Scene(  # noqa: E731
        [SceneInstance(scene_model, np.zeros(3))],
        block_size=S, backend="blocked", dtype=jnp.float32)
    t_blocks = 8
    path = np.broadcast_to([1.0, 0.4, 0.1], (t_blocks, 3))
    a = mk(); a.hit(0, 3)
    static = a.render_moving(path, smooth=False)
    b = mk(); b.hit(0, 3)
    obj = np.zeros((t_blocks, 1, 3))
    obj[:, 0, 0] = np.linspace(0.0, -2.0, t_blocks)   # receding in -x
    moving = b.render_moving(path, object_paths=obj, smooth=False)
    assert static.shape == moving.shape
    assert not np.allclose(static, moving)


def test_scene_render_doppler(scene_model):
    """Scene Doppler wrapper runs end to end and delays onset by r/c."""
    from openpbso_tpu.config import SAMPLE_RATE, SOUND_SPEED
    sc = Scene([SceneInstance(scene_model, np.zeros(3))],
               block_size=S, backend="blocked", dtype=jnp.float32)
    t_blocks = 8
    r = 2.0
    path = np.broadcast_to([r, 0.0, 0.0], (t_blocks, 3))
    sc.hit(0, 3)
    audio = sc.render_doppler(path)
    n_delay = int(r / SOUND_SPEED * SAMPLE_RATE)
    assert np.abs(audio[: n_delay - 1]).max() == 0.0
    assert np.abs(audio).max() > 0.0


def test_scene_render_moving_multi_listener(scene_model):
    """Multi-listener (binaural) render_moving (round-3): the [T, L, O, M]
    schedule matches stepping the scene with set_listener per block."""
    mk = lambda: Scene(  # noqa: E731
        [SceneInstance(scene_model, np.asarray([0.0, 0.0, 0.0])),
         SceneInstance(scene_model, np.asarray([1.0, 0.2, 0.0]))],
        block_size=S, backend="blocked", binaural=True,
        ear_distance=0.3, dtype=jnp.float32)
    t_blocks = 5
    path = np.stack([np.linspace(0.6, 1.4, t_blocks),
                     np.full(t_blocks, 0.3),
                     np.linspace(0.1, -0.3, t_blocks)], axis=1)
    a = mk()
    assert a.num_listeners == 2
    a.hit(0, 3, kind="gaussian", width_us=600.0)
    got = a.render_moving(path, smooth=False)
    assert got.shape == (t_blocks * S, 2)
    b = mk()
    b.hit(0, 3, kind="gaussian", width_us=600.0)
    chunks = []
    for t in range(t_blocks):
        b.set_listener(path[t])
        _, mix, _ = b.step()
        chunks.append(np.asarray(mix))
    ref = np.concatenate(chunks, axis=0)
    db = _db(got - ref, ref)
    assert db <= -100, f"{db:.1f} dB"
    # smooth (ramped) variant runs and stays finite with L rows too
    c = mk()
    c.hit(0, 3, kind="gaussian", width_us=600.0)
    sm = c.render_moving(path, smooth=True)
    assert np.isfinite(sm).all() and np.abs(sm).max() > 0
