"""Numerical-health utilities (SURVEY.md §5 race-detection/sanitizer row: JAX
purity makes data races structurally absent; what remains is numerical
failure — NaN/Inf escapes and diverging instances — surfaced here instead of
the reference's silent status codes (reference: src/tinympc/admm.cpp:137,151)).
"""

from __future__ import annotations

import contextlib
from typing import Any, Iterator

import jax
import jax.numpy as jnp

from ..types import SOLVED, State


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Scoped jax debug_nans (eager NaN tracebacks; disables under jit-cache
    reuse, so use on the jnp tier while reproducing)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def finite_state(state: State) -> jax.Array:
    """Per-instance all-finite flag over every iterate (scalar for a single
    instance, (B,) for a batch — batch-ness read off ``state.iter``'s rank)."""
    batch_ndim = state.iter.ndim

    def red(a):
        axes = tuple(range(batch_ndim, a.ndim))
        return jnp.all(jnp.isfinite(a), axis=axes)

    flags = [red(getattr(state, f)) for f in
             ("x", "u", "d", "p", "v", "z", "y", "g")]
    out = flags[0]
    for f in flags[1:]:
        out = jnp.logical_and(out, f)
    return out


def health_report(state: State) -> dict[str, Any]:
    """Host-side solve health summary: finite-ness, convergence, residuals —
    the failure-detection surface for fleet monitoring (per-instance status is
    the recovery unit: failed instances can simply be re-dispatched, solves
    are stateless)."""
    finite = jax.device_get(finite_state(state))
    status = jax.device_get(state.status)
    import numpy as np

    finite = np.atleast_1d(finite)
    status = np.atleast_1d(status)
    return {
        "all_finite": bool(finite.all()),
        "nonfinite_instances": np.nonzero(~finite)[0].tolist(),
        "converged_fraction": float((status == SOLVED).mean()),
        "unconverged_instances": np.nonzero(status != SOLVED)[0].tolist()[:64],
        "max_residual": float(
            max(
                np.max(np.atleast_1d(jax.device_get(r)))
                for r in (
                    state.primal_residual_state, state.primal_residual_input,
                    state.dual_residual_state, state.dual_residual_input,
                )
            )
        ),
    }
