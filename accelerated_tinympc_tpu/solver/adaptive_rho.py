"""Adaptive penalty (rho) scheduling — an opt-in extension beyond the
reference.

The reference fixes rho at problem-build time (reference:
src/tinympc/codegen.cpp:254-258 bakes it into the cache; runtime never
touches it). A badly chosen rho leaves the primal/dual residuals unbalanced
and ADMM crawling. This module adds the standard OSQP-style remedy on top of
the scan tier, periodically:

    rho <- clip(rho * sqrt(pri_res / dua_res), rho_min, rho_max)

updating only when BOTH (a) the residual imbalance exceeds ``adapt_factor``
(OSQP's ``adaptive_rho_tolerance``) and (b) progress has stalled (the max
residual stopped decaying between chunks) — a well-chosen rho often shows a
persistently skewed ratio while converging at 100x per chunk, and touching it
would only destroy the contraction. Every update invalidates the Riccati
cache, which is recomputed **on device**
(:func:`..precompute.riccati_cache_jax`), and the scaled duals are rescaled
(``y *= rho_old/rho_new``) so the underlying multipliers are preserved.

This is intentionally a host-driven outer loop around jitted chunks (cache
recompute is rare and expensive relative to iterations); it is an offline/
setup-time tool for finding a good rho as much as a runtime solver.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..precompute import riccati_cache_jax
from ..types import Cache, Problem, Settings, State
from . import admm


def _host_cache_sens(problem: Problem, rho: float, eps: float = 1e-4):
    """Float64 host Riccati cache at ``rho`` plus its d/drho by central
    differences — the Taylor anchor for first-order adaptive caching.
    Differencing is per leaf; the ``rho`` leaf's derivative is exactly 1."""
    import numpy as np

    from ..precompute import riccati_cache

    A = np.asarray(problem.A)
    B = np.asarray(problem.B)
    Q = np.asarray(problem.Q)
    R = np.asarray(problem.R)
    c0 = riccati_cache(A, B, Q, R, rho)
    lo = riccati_cache(A, B, Q, R, rho * (1.0 - eps))
    hi = riccati_cache(A, B, Q, R, rho * (1.0 + eps))
    inv = 1.0 / (2.0 * eps * rho)
    dcache = jax.tree.map(lambda h, l: (h - l) * inv, hi, lo)
    return c0, dcache


class AdaptiveRhoResult(NamedTuple):
    state: State
    cache: Cache          # cache at the final rho (reusable for warm solves)
    rho: float
    iterations: int
    converged: bool
    rho_history: list


def solve_adaptive_rho(
    state: State,
    problem: Problem,
    cache: Cache,
    settings: Settings,
    *,
    chunk: int = 25,
    max_total_iter: int = 2000,
    adapt_factor: float = 5.0,
    stall_factor: float = 1.5,
    rho_min: float = 1e-2,
    rho_max: float = 1e3,
    f64_refresh: bool = False,
    first_order: bool = False,
    trust: float = 2.0,
) -> AdaptiveRhoResult:
    """Solve with periodic rho adaptation (single instance, scan tier).

    Runs ``chunk``-iteration jitted segments; between segments, if the
    primal/dual residual imbalance exceeds ``adapt_factor``, rescales rho,
    the duals, and recomputes the Riccati cache on device. Terminates on the
    ``settings`` tolerances or ``max_total_iter``.

    ``f64_refresh=True`` recomputes the post-update cache on the host in
    float64 (:func:`..precompute.riccati_cache`) instead of on device in the
    problem dtype — the reference insists the Riccati precompute run in
    double for robustness on ill-conditioned plants
    (reference: examples/codegen_cartpole.cpp:9-11); the f32 on-device
    refresh is adequate for well-conditioned plants and keeps the loop
    host-transfer-free.

    ``first_order=True`` replaces the Riccati re-solve with first-order
    adaptive caching (PAPERS.md "First-Order Adaptive Caching"): the cache
    refreshes as ``C(rho) ~= C(c) + dC/drho * (rho - c)`` from float64
    central-difference sensitivities at the Taylor center ``c``,
    re-anchoring (one exact f64 rebuild + sensitivity) only when rho leaves
    ``[c/trust, c*trust]``.  For the batched per-instance form (where the
    refresh runs on device and the axpy saving is the point) see
    :func:`.batched_ops.solve_adaptive_rho_batched`.
    """
    pri_tol = float(settings.abs_pri_tol)
    dua_tol = float(settings.abs_dua_tol)
    # Residuals recorded every iteration; zero tolerance disables early exit
    # inside a chunk (the outer loop owns termination).
    chunk_settings = settings.replace(
        abs_pri_tol=0.0, abs_dua_tol=0.0, max_iter=chunk, check_termination=1
    )

    run_chunk = jax.jit(admm.solve, static_argnums=())
    rho = float(cache.rho)
    anchor = None  # (center, cache(center), dcache/drho) for first_order
    history = [rho]
    total = 0
    converged = False
    prev_max_res = float("inf")
    while total < max_total_iter:
        state = run_chunk(state, problem, cache, chunk_settings)
        total += chunk
        pri = float(
            jnp.maximum(state.primal_residual_state,
                        state.primal_residual_input)
        )
        dua = float(
            jnp.maximum(state.dual_residual_state, state.dual_residual_input)
        )
        if pri < pri_tol and dua < dua_tol:
            converged = True
            break
        max_res = max(pri, dua)
        stalled = max_res * stall_factor > prev_max_res
        prev_max_res = max_res
        ratio = (max(pri, 1e-12) / max(dua, 1e-12)) ** 0.5
        if stalled and (ratio > adapt_factor or ratio < 1.0 / adapt_factor):
            new_rho = float(jnp.clip(rho * ratio, rho_min, rho_max))
            if new_rho != rho:
                scale = rho / new_rho
                state = state.replace(y=state.y * scale, g=state.g * scale)
                if first_order:
                    if anchor is None or not (
                        anchor[0] / trust <= new_rho <= anchor[0] * trust
                    ):
                        anchor = (new_rho, *_host_cache_sens(
                            problem, new_rho
                        ))
                    c, cache0, dcache = anchor
                    delta = new_rho - c
                    cache = jax.tree.map(
                        lambda o, d: o + d * delta, cache0, dcache
                    )
                elif f64_refresh:
                    import numpy as np

                    from ..precompute import riccati_cache

                    cache = riccati_cache(
                        np.asarray(problem.A), np.asarray(problem.B),
                        np.asarray(problem.Q), np.asarray(problem.R),
                        new_rho,
                    )
                else:
                    cache = riccati_cache_jax(
                        problem.A, problem.B, problem.Q, problem.R,
                        jnp.asarray(new_rho, problem.A.dtype),
                    )
                rho = new_rho
                history.append(rho)
                prev_max_res = float("inf")  # fresh contraction after swap
    return AdaptiveRhoResult(
        state=state, cache=cache, rho=rho, iterations=total,
        converged=converged, rho_history=history,
    )
