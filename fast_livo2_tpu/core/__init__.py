from .state import NavState, init_state, init_cov, boxplus, boxminus, DIM_STATE  # noqa: F401
