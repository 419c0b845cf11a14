"""Serialization, profiling, and observability utilities."""

from .serialization import (  # noqa: F401
    load_like,
    load_problem_cache,
    save_problem_cache,
    save_pytree,
)
from .profiling import solver_cost, time_fn, trace  # noqa: F401
from .debugging import debug_nans, finite_state, health_report  # noqa: F401
