from .coeffs import (ModalBank, bank_from_material, build_modal_bank,
                     lambda_from_modes)
from .ffat import FFATMaps, build_ffat, compute_transfer
from .forces import (FORCE_GAUSSIAN, FORCE_NONE, FORCE_POINT, ForceSlots,
                     SustainedState, force_block, make_force_slots,
                     make_sustained_state, sustained_block)
from .integrator import get_backend, step_block_blocked, step_block_scan
