"""Pallas fused kernel vs the blocked backend (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpbso_tpu.ops.coeffs import bank_from_material
from openpbso_tpu.ops.integrator import step_block_blocked
from openpbso_tpu.ops.pallas_integrator import step_block_pallas
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data


def _case(o, n_modes, s, seed=5):
    md = synth_mode_data(n_modes, 8, seed=seed)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta, num_objects=o,
                              block_size=s, dtype=jnp.float32)
    m = bank.num_modes
    rng = np.random.default_rng(seed)
    space = jnp.asarray(rng.standard_normal((o, m)), jnp.float32) * bank.mask
    tr = jnp.asarray(rng.uniform(0.5, 2.0, (o, m)), jnp.float32)
    tp = jnp.asarray(rng.standard_normal((o, s)), jnp.float32)
    z0r = jnp.asarray(rng.standard_normal((o, m)), jnp.float32) * bank.mask
    z0i = jnp.asarray(rng.standard_normal((o, m)), jnp.float32) * bank.mask
    return bank, space, tr, tp, z0r, z0i


@pytest.mark.parametrize("o,chunk", [(1, 64), (3, 64), (8, 128)])
def test_pallas_matches_blocked(o, chunk, dberr):
    s = 256
    bank, space, tr, tp, z0r, z0i = _case(o, 40, s)
    ra = step_block_blocked(z0r, z0i, bank, space, tp, tr, False)
    rb = step_block_pallas(z0r, z0i, bank, space, tp, tr, False,
                           chunk=chunk, interpret=True)
    for a, b, name in zip(ra[:3], rb[:3], ("z_re", "z_im", "sound")):
        assert dberr(np.asarray(b), np.asarray(a)) < -90, name


def test_pallas_multiblock_continuity(dberr):
    """State threads across consecutive pallas blocks."""
    s = 128
    bank, space, tr, tp, z0r, z0i = _case(2, 24, s)
    za = (z0r, z0i)
    zb = (z0r, z0i)
    sounds_a, sounds_b = [], []
    for _ in range(3):
        ra = step_block_blocked(za[0], za[1], bank, space, tp, tr, False)
        za = (ra[0], ra[1])
        sounds_a.append(np.asarray(ra[2]))
        rb = step_block_pallas(zb[0], zb[1], bank, space, tp, tr, False,
                               chunk=64, interpret=True)
        zb = (rb[0], rb[1])
        sounds_b.append(np.asarray(rb[2]))
    assert dberr(np.concatenate(sounds_b, -1),
                 np.concatenate(sounds_a, -1)) < -80


def test_pallas_registered_backend():
    from openpbso_tpu.ops.integrator import BACKENDS
    assert "pallas" in BACKENDS


@pytest.mark.parametrize("obj_tile", [8, 16])
def test_pallas_obj_tile_parameter(obj_tile, dberr):
    """obj_tile (V4 tuning knob) must not change the result."""
    s = 256
    bank, space, tr, tp, z0r, z0i = _case(5, 40, s)
    ra = step_block_blocked(z0r, z0i, bank, space, tp, tr, False)
    rb = step_block_pallas(z0r, z0i, bank, space, tp, tr, False,
                           chunk=64, obj_tile=obj_tile, interpret=True)
    for a, b, name in zip(ra[:3], rb[:3], ("z_re", "z_im", "sound")):
        assert dberr(np.asarray(b), np.asarray(a)) < -90, name


def test_pallas_chunk_clamps_to_block():
    """DEFAULT_CHUNK > block size must clamp, not assert."""
    s = 32
    bank, space, tr, tp, z0r, z0i = _case(2, 24, s)
    out = step_block_pallas(z0r, z0i, bank, space, tp, tr, False,
                            chunk=64, interpret=True)  # clamps to 32
    assert np.isfinite(np.asarray(out[2])).all()
