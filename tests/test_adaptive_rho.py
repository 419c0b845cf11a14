"""Adaptive-rho extension: rescues badly scaled problems the fixed-rho
reference design cannot solve efficiently, and stays inert on well-scaled
ones. Demo problem: tight input box + 1000:1 Q:R scale, where fixed-rho
iteration counts span 51 (rho=100) to divergence (rho<=0.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import random_lti_problem
from accelerated_tinympc_tpu.precompute import riccati_cache
from accelerated_tinympc_tpu.solver import admm
from accelerated_tinympc_tpu.solver.adaptive_rho import solve_adaptive_rho

TOL = 2e-3


def _setup(rho):
    problem, _ = random_lti_problem(
        seed=3, nx=8, nu=3, horizon=15, bound=5.0, q_scale=100.0, r_scale=0.1
    )
    problem = problem.replace(
        u_min=jnp.full_like(problem.u_min, -0.3),
        u_max=jnp.full_like(problem.u_max, 0.3),
    )
    cache = riccati_cache(
        np.asarray(problem.A), np.asarray(problem.B),
        np.asarray(problem.Q), np.asarray(problem.R), rho,
    )
    rng = np.random.default_rng(0)
    st = atm.set_x0(
        atm.init_state(8, 3, 15),
        jnp.asarray(rng.standard_normal(8), jnp.float32),
    )
    return problem, cache, st


def test_rescues_badly_scaled_rho():
    """rho=0.01 (four orders below the sweet spot): fixed rho fails within
    1500 iterations; adaptive converges in ~200 after one rho jump."""
    problem, cache, st = _setup(rho=1e-2)
    settings = atm.Settings(abs_pri_tol=TOL, abs_dua_tol=TOL)

    fixed = jax.jit(admm.solve, static_argnums=())(
        st, problem, cache,
        settings.replace(max_iter=1500, check_termination=1),
    )
    assert not bool(fixed.status == atm.SOLVED), "premise: fixed rho fails"

    res = solve_adaptive_rho(
        st, problem, cache, settings, chunk=25, max_total_iter=1500
    )
    assert res.converged, (res.iterations, res.rho_history)
    assert len(res.rho_history) > 1, "rho never adapted"
    assert res.iterations <= 500


def test_inert_on_well_scaled_problem():
    """At a good rho the adapter should not thrash: no rho updates, and the
    trajectory is bit-identical to the fixed-rho solve."""
    problem, cache, st = _setup(rho=100.0)
    settings = atm.Settings(abs_pri_tol=TOL, abs_dua_tol=TOL)
    res = solve_adaptive_rho(
        st, problem, cache, settings, chunk=25, max_total_iter=500
    )
    assert res.converged
    assert len(res.rho_history) == 1, res.rho_history

    fixed = jax.jit(admm.solve, static_argnums=())(
        st, problem, cache,
        settings.replace(max_iter=500, check_termination=1),
    )
    assert bool(fixed.status == atm.SOLVED)
    # same rho, chunked vs single loop: controls agree
    np.testing.assert_allclose(
        np.asarray(res.state.u), np.asarray(fixed.u), rtol=0, atol=1e-4
    )


def test_final_cache_reusable():
    """The returned cache at the adapted rho warm-solves immediately."""
    problem, cache, st = _setup(rho=1e-2)
    settings = atm.Settings(abs_pri_tol=TOL, abs_dua_tol=TOL)
    res = solve_adaptive_rho(
        st, problem, cache, settings, chunk=25, max_total_iter=1500
    )
    assert res.converged
    out = jax.jit(admm.solve, static_argnums=())(
        res.state, problem, res.cache,
        settings.replace(max_iter=50, check_termination=1),
    )
    assert bool(out.status == atm.SOLVED)
    assert int(out.iter) <= 10


def test_first_order_refresh_single():
    """first_order=True (first-order adaptive caching, PAPERS.md) rescues
    the same badly-scaled problem as the exact refresh, with controls at
    the same solution within tolerance scale and a comparable budget."""
    problem, cache, st = _setup(rho=1e-2)
    settings = atm.Settings(abs_pri_tol=TOL, abs_dua_tol=TOL)

    exact = solve_adaptive_rho(
        st, problem, cache, settings, chunk=25, max_total_iter=1500,
        f64_refresh=True,
    )
    fo = solve_adaptive_rho(
        st, problem, cache, settings, chunk=25, max_total_iter=1500,
        first_order=True,
    )
    assert fo.converged, (fo.iterations, fo.rho_history)
    assert fo.iterations <= 2 * exact.iterations + 100
    du = float(jnp.max(jnp.abs(fo.state.u - exact.state.u)))
    assert du < 10 * TOL, du
