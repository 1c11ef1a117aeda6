from .session import ModalSession
from .solver import SolverConfig, default_gains, step_block, step_multi
from .state import SolverState, make_solver_state
