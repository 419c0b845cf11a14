"""Public API layer: high-level solver object, on-device MPC rollouts,
offline codegen, and AOT export (capability parity with the reference's
L3 layers — SURVEY.md §1)."""

from .solver import TinyMPC  # noqa: F401
from .mpc import MPCTrace, default_plant, mpc_rollout, tracking_error  # noqa: F401
from .codegen import build_project, tiny_codegen  # noqa: F401
from .export import (  # noqa: F401
    export_batched_solve,
    load_exported,
    save_exported,
)
