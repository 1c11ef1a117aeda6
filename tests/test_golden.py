"""Golden-waveform regression pins.

The float64 oracle is itself code that can drift; this fixture pins the
canonical impulse render to a committed waveform so semantic changes in
either the oracle or the device backends are caught across rounds.
"""
import os

import jax.numpy as jnp
import numpy as np

from openpbso_tpu.config import UNIT_TRANSFER
from openpbso_tpu.ops.coeffs import bank_from_material
from openpbso_tpu.ops.integrator import step_block_blocked
from openpbso_tpu.utils.oracle import OracleIntegrator, iir_coefficients
from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "impulse_24modes_quarter_sec.npy")


def _case():
    md = synth_mode_data(24, 8, seed=0)
    rng = np.random.default_rng(3)
    space = rng.standard_normal(24)
    return md, space


def test_oracle_matches_golden(dberr):
    md, space = _case()
    c1, c2, c3 = iir_coefficients(CERAMIC.density, md.omega_squared,
                                  CERAMIC.alpha, CERAMIC.beta, 1.0 / 44100)
    o = OracleIntegrator(c1, c2, c3)
    t = np.full(24, UNIT_TRANSFER)
    ref = np.empty(11025)
    for i in range(11025):
        q = o.step(space * (1.0 if i == 0 else 0.0))
        ref[i] = q @ t
    golden = np.load(GOLDEN)
    assert dberr(ref, golden.astype(np.float64)) < -100


def test_blocked_backend_matches_golden(dberr):
    md, space = _case()
    s = 441  # 11025 = 25 blocks of 441 (odd size exercises generality)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              block_size=s, dtype=jnp.float64)
    m = bank.num_modes
    sp = jnp.zeros((1, m)).at[0, :24].set(jnp.asarray(space))
    tr = jnp.full((1, m), UNIT_TRANSFER)
    zr = zi = jnp.zeros((1, m))
    out = []
    for blk in range(25):
        tp = jnp.zeros((1, s)).at[0, 0].set(1.0) if blk == 0 \
            else jnp.zeros((1, s))
        zr, zi, sound, _ = step_block_blocked(zr, zi, bank, sp, tp, tr,
                                              False)
        out.append(np.asarray(sound[0]))
    golden = np.load(GOLDEN).astype(np.float64)
    assert dberr(np.concatenate(out), golden) < -100
