"""Pallas TPU kernels (the fused hot path)."""

from .fused_admm import (  # noqa: F401
    FusedCarry,
    FusedResult,
    PaddedProblem,
    fused_solve,
    pad_problem,
    unpad_controls,
    unpad_states,
)
