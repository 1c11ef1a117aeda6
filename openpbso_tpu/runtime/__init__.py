from .session import ModalSession
from .solver import SolverConfig, default_gains, step_block
from .state import SolverState, make_solver_state
