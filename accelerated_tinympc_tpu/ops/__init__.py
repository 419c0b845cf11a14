"""Pallas TPU kernels (the fused hot path)."""

from .fused_admm import (  # noqa: F401
    DEFAULT_BATCH_TILE,
    FusedCarry,
    FusedResult,
    PaddedProblem,
    fused_solve,
    pad_problem,
    unpad_controls,
    unpad_states,
)
from .stream_admm import (  # noqa: F401
    StreamCarry,
    StreamProblem,
    StreamResult,
    pad_stream_problem,
    stream_solve,
)
