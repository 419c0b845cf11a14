"""Serialization, profiling, and observability utilities."""

from .serialization import (  # noqa: F401
    load_like,
    load_problem_cache,
    save_problem_cache,
    save_pytree,
)
