"""Multi-device SPMD block step on the virtual 8-device CPU mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpbso_tpu.ops.coeffs import bank_from_material
from openpbso_tpu.parallel.sharding import (make_mesh, make_sharded_step,
                                            shard_bank, shard_state)
from openpbso_tpu.runtime.solver import step_block
from openpbso_tpu.runtime.state import make_solver_state
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup(o=8, s=128, n_modes=24, dtype=jnp.float32):
    md = synth_mode_data(n_modes, 6, seed=9)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta, num_objects=o,
                              block_size=s, dtype=dtype)
    state = make_solver_state(o, bank.num_modes, num_slots=4, dtype=dtype)
    rng = np.random.default_rng(0)
    slots = state.slots
    # one point hit per object, varying spatial patterns
    space = rng.standard_normal((o, bank.num_modes)).astype(np.float64)
    slots = dataclasses.replace(
        slots,
        ftype=slots.ftype.at[:, 0].set(1),
        space=slots.space.at[:, 0, :].set(jnp.asarray(space, dtype)))
    state = dataclasses.replace(state, slots=slots)
    gains = jnp.ones((o, 2), dtype)
    return bank, state, gains


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_step_matches_single(mesh_shape, dberr):
    s = 128
    bank, state, gains = _setup(o=8, s=s)
    # single-device reference
    ref_state, ref_sound, ref_mix, _ = step_block(
        state, bank, gains, block_size=s, backend="blocked")

    mesh = make_mesh(*mesh_shape)
    step = make_sharded_step(mesh, bank, block_size=s, backend="blocked")
    st = shard_state(mesh, state)
    bk = shard_bank(mesh, bank)
    out_state, sound, mix, _ = step(st, bk, gains)

    assert dberr(np.asarray(sound), np.asarray(ref_sound)) < -100
    assert dberr(np.asarray(mix), np.asarray(ref_mix)) < -100
    assert dberr(np.asarray(out_state.z_im),
                 np.asarray(ref_state.z_im)) < -100


def test_sharded_multi_block_continuity(dberr):
    """State threads correctly across blocks under SPMD."""
    s = 128
    bank, state, gains = _setup(o=8, s=s)
    mesh = make_mesh(4, 2)
    step = make_sharded_step(mesh, bank, block_size=s, backend="blocked")
    st = shard_state(mesh, state)
    bk = shard_bank(mesh, bank)
    ref = state
    chunks_sp, chunks_ref = [], []
    for _ in range(4):
        st, _, mix, _ = step(st, bk, gains)
        chunks_sp.append(np.asarray(mix))
        ref, _, ref_mix, _ = step_block(ref, bank, gains,
                                        block_size=s, backend="blocked")
        chunks_ref.append(np.asarray(ref_mix))
    assert dberr(np.concatenate(chunks_sp), np.concatenate(chunks_ref)) < -90


def test_sharded_hetero_bank(dberr):
    """Per-object lam tables shard over the obj axis."""
    import numpy as np
    from openpbso_tpu.ops.coeffs import build_modal_bank, lambda_from_modes
    s, o = 128, 8
    lams, bs, vs = [], [], []
    for i in range(o):
        md = synth_mode_data(16, 4, seed=50 + i)
        lam, b, v = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                      CERAMIC.alpha, CERAMIC.beta)
        lams.append(lam); bs.append(b); vs.append(v)
    bank = build_modal_bank(np.stack(lams), np.stack(bs), np.stack(vs),
                            block_size=s, shared=False, dtype=jnp.float32)
    assert not bank.shared_tables
    state = make_solver_state(o, bank.num_modes, num_slots=2,
                              dtype=jnp.float32)
    slots = state.slots
    slots = dataclasses.replace(slots, ftype=slots.ftype.at[:, 0].set(1),
                                space=slots.space.at[:, 0, :].set(1.0))
    state = dataclasses.replace(state, slots=slots)
    gains = jnp.ones((o, 2), jnp.float32)
    ref_state, ref_sound, ref_mix, _ = step_block(
        state, bank, gains, block_size=s, backend="blocked")
    mesh = make_mesh(4, 2)
    step = make_sharded_step(mesh, bank, block_size=s, backend="blocked")
    out = step(shard_state(mesh, state), shard_bank(mesh, bank), gains)
    assert dberr(np.asarray(out[2]), np.asarray(ref_mix)) < -100


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_sharded_decay_step_matches_single(mesh_shape, dberr):
    from openpbso_tpu.parallel.sharding import make_sharded_decay_step
    from openpbso_tpu.runtime.solver import decay_block
    s = 128
    bank, state, gains = _setup(o=8, s=s)
    # ring the oscillators with one full block, then clear the slots so
    # the scene is genuinely idle (the decay step's contract)
    state, _, _, _ = step_block(state, bank, gains, block_size=s,
                                backend="blocked")
    state = dataclasses.replace(
        state, slots=dataclasses.replace(
            state.slots, ftype=state.slots.ftype.at[:].set(0)))
    ref_state, ref_sound, ref_mix, _ = decay_block(
        state, bank, gains, block_size=s)

    mesh = make_mesh(*mesh_shape)
    step = make_sharded_decay_step(mesh, bank, block_size=s)
    out_state, sound, mix, _ = step(shard_state(mesh, state),
                                    shard_bank(mesh, bank), gains)
    assert dberr(np.asarray(sound), np.asarray(ref_sound)) < -100
    assert dberr(np.asarray(mix), np.asarray(ref_mix)) < -100
    assert dberr(np.asarray(out_state.z_re),
                 np.asarray(ref_state.z_re)) < -100
