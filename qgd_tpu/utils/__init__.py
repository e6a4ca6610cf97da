"""Analysis and verification utilities (reference src/state_vector_helpers.jl,
calculate_timestep.jl, src/Tests/test_convergence.jl, src/plotting.jl)."""

from .states import (
    get_populations,
    target_helper,
    complex_to_real,
    real_to_complex,
    initial_basis,
)
from .timestep import (
    get_shortest_period,
    estimate_N_timesteps,
    estimate_timesteps_per_period,
)
from .richardson import (
    richardson_extrap_sol,
    richardson_extrap_rel_err,
    get_histories,
    get_runtime_ratios,
    find_target_y,
)

__all__ = [
    "get_populations",
    "target_helper",
    "complex_to_real",
    "real_to_complex",
    "initial_basis",
    "get_shortest_period",
    "estimate_N_timesteps",
    "estimate_timesteps_per_period",
    "richardson_extrap_sol",
    "richardson_extrap_rel_err",
    "get_histories",
    "get_runtime_ratios",
    "find_target_y",
]
