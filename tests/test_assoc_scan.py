"""Associative-scan sweep parity vs the sequential scan tier — per-sweep and
full-solve, at the reference horizon (N=10) and a long horizon (N=64), where
this tier is the latency win."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import quadrotor_hovering_setup, random_lti_problem
from accelerated_tinympc_tpu.precompute import riccati_cache
from accelerated_tinympc_tpu.solver import admm
from accelerated_tinympc_tpu.solver.assoc_scan import (
    backward_pass_assoc,
    forward_pass_assoc,
    solve_assoc,
)


def _random_state(problem, seed):
    rng = np.random.default_rng(seed)
    nx, nu, N = problem.nx, problem.nu, problem.horizon
    st = atm.init_state(nx, nu, N)
    fill = lambda shape: jnp.asarray(rng.standard_normal(shape), jnp.float32)
    return st.replace(
        x=st.x.at[0, :].set(fill((nx,))),
        d=fill((N - 1, nu)),
        q=fill((N, nx)),
        r=fill((N - 1, nu)),
        p=st.p.at[-1].set(fill((nx,))),
    )


CASES = ["quadrotor_N10", "random_N64"]


@pytest.fixture(scope="module", params=CASES)
def setup(request):
    if request.param == "quadrotor_N10":
        problem, cache, _ = quadrotor_hovering_setup()
    else:
        problem, rho = random_lti_problem(seed=5, nx=8, nu=3, horizon=64)
        cache = riccati_cache(
            np.asarray(problem.A), np.asarray(problem.B),
            np.asarray(problem.Q), np.asarray(problem.R), rho,
        )
    return problem, cache


def test_forward_sweep_parity(setup):
    problem, cache = setup
    st = _random_state(problem, 0)
    got = jax.jit(lambda s: forward_pass_assoc(s, problem, cache))(st)
    want = jax.jit(lambda s: admm.forward_pass(s, problem, cache))(st)
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(want.x), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.u), np.asarray(want.u), rtol=1e-5, atol=1e-4
    )


def test_backward_sweep_parity(setup):
    problem, cache = setup
    st = _random_state(problem, 1)
    got = jax.jit(lambda s: backward_pass_assoc(s, problem, cache))(st)
    want = jax.jit(lambda s: admm.backward_pass_grad(s, problem, cache))(st)
    np.testing.assert_allclose(
        np.asarray(got.p), np.asarray(want.p), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.d), np.asarray(want.d), rtol=1e-5, atol=1e-4
    )


def test_full_solve_parity(setup):
    problem, cache = setup
    st = _random_state(problem, 2)
    settings = atm.Settings(max_iter=20, check_termination=0)
    got = jax.jit(lambda s: solve_assoc(s, problem, cache, settings))(st)
    want = jax.jit(lambda s: admm.solve(s, problem, cache, settings))(st)
    np.testing.assert_allclose(
        np.asarray(got.u), np.asarray(want.u), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(want.x), rtol=1e-4, atol=2e-4
    )


def test_batched_via_vmap(setup):
    problem, cache = setup
    sts = jax.tree.map(
        lambda *ls: jnp.stack(ls), *[_random_state(problem, s) for s in (3, 4)]
    )
    settings = atm.Settings(max_iter=10, check_termination=0)
    got = jax.jit(
        jax.vmap(lambda s: solve_assoc(s, problem, cache, settings))
    )(sts)
    want = jax.jit(
        jax.vmap(lambda s: admm.solve(s, problem, cache, settings))
    )(sts)
    np.testing.assert_allclose(
        np.asarray(got.u), np.asarray(want.u), rtol=1e-4, atol=2e-4
    )
