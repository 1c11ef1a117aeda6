"""SolverState — the complete per-block carried state as one PyTree.

The reference's mutable object graph (integrator ring buffer, active-force
list, latest transfer, AR noise state — modal_solver.h:100-141) becomes a
single immutable PyTree of [O, M]-shaped arrays threaded through the jitted
block step. Everything the audio loop needs between blocks lives here, so a
block step is a pure function ``(state, bank, ffat) -> (state, audio)`` that
XLA can pipeline and the engine can double-buffer.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import UNIT_TRANSFER
from ..ops.forces import (ForceSlots, SustainedState, make_force_slots,
                          make_sustained_state)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolverState:
    z_re: jax.Array            # [O, M] oscillator state Re(z)
    z_im: jax.Array            # [O, M] oscillator state Im(z) (= q)
    slots: ForceSlots          # pending/active impact forces
    sustained: SustainedState  # sustained AR contact channel
    transfer: jax.Array        # [O, M] latest acoustic transfer row, or
    #   [L, O, M] per-listener rows sharing one oscillator state (sound is
    #   linear in the transfer, so L listeners cost L mode-reduces only)
    block_start: jax.Array     # [] int32 global sample index
    transfer_im: jax.Array | None = None   # optional imaginary part: a
    #   COMPLEX transfer t = re + i*im applies a per-mode PHASE as well as
    #   a magnitude (sound_s = Im(t z_s) = re*Im(z) + im*Re(z)) — each
    #   mode is narrowband, so a phase is a time shift at that mode's
    #   frequency: exact interaural time differences (and phase-accurate
    #   complex FFAT maps) at ZERO extra compute, because the blocked and
    #   span forms already carry both P_re/P_im reduce channels and the
    #   complex weights only change the elementwise pre-products.

    @property
    def num_objects(self) -> int:
        return self.z_re.shape[0]

    @property
    def num_modes(self) -> int:
        return self.z_re.shape[1]


def make_solver_state(
    num_objects: int,
    num_modes: int,
    *,
    num_slots: int = 16,
    seed: int = 0,
    unit_transfer: bool = True,
    num_listeners: int = 1,
    dtype=jnp.float32,
) -> SolverState:
    """Fresh state: silent oscillators, empty force slots, unit transfer.

    The unit transfer level is the reference's 1E7 (modal_solver.h:89-92) so
    that disabling FFAT maps reproduces the same output scale.
    ``num_listeners`` > 1 makes the transfer [L, O, M] (shared-state
    multi-listener rows; one output channel per listener).
    """
    o, m = num_objects, num_modes
    tshape = (o, m) if num_listeners <= 1 else (num_listeners, o, m)
    transfer = (jnp.full(tshape, UNIT_TRANSFER, dtype) if unit_transfer
                else jnp.zeros(tshape, dtype))
    return SolverState(
        z_re=jnp.zeros((o, m), dtype),
        z_im=jnp.zeros((o, m), dtype),
        slots=make_force_slots(o, num_slots, m, dtype),
        sustained=make_sustained_state(o, m, seed, dtype),
        transfer=transfer,
        block_start=jnp.asarray(0, jnp.int32),
    )
