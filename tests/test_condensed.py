"""Condensed-operator tier vs scan tier parity: identical schedule, different
sweep realization (dense operators vs lax.scan) — results must agree to f32
matmul accumulation error, well inside the 1e-4 control-parity bar."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import quadrotor_hovering_setup
from accelerated_tinympc_tpu.precompute import condensed_operators
from accelerated_tinympc_tpu.solver.batched import init_state_batched, solve_batched
from accelerated_tinympc_tpu.solver.condensed import (
    flat_from_state,
    flatten_problem,
    init_flat_state,
    solve_condensed,
    state_from_flat,
)

B = 4
TOL = 1e-4


@pytest.fixture(scope="module")
def setup():
    problem, cache, x0 = quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    fp = flatten_problem(problem, cache)
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.1 * rng.standard_normal((B, x0.size)),
        jnp.float32,
    )
    return problem, cache, ops, fp, x0s


def _run_scan(problem, cache, x0s, settings):
    st = init_state_batched(x0s.shape[0], problem.nx, problem.nu, problem.horizon)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    return jax.jit(lambda s: solve_batched(s, problem, cache, settings))(st)


def _run_condensed(problem, ops, fp, x0s, settings):
    fs = init_flat_state(x0s.shape[0], problem.nx, problem.nu, problem.horizon)
    fs = fs.replace(x0=x0s)
    out = jax.jit(
        lambda s: solve_condensed(s, fp, ops, settings, problem.nx)
    )(fs)
    return state_from_flat(out, problem.nx, problem.nu, problem.horizon)


@pytest.mark.parametrize(
    "settings",
    [
        atm.Settings(max_iter=25, check_termination=0),
        atm.Settings(
            abs_pri_tol=0.05, abs_dua_tol=0.05, max_iter=400, check_termination=1
        ),
    ],
    ids=["fixed25", "adaptive"],
)
def test_condensed_matches_scan(setup, settings):
    problem, cache, ops, fp, x0s = setup
    got = _run_condensed(problem, ops, fp, x0s, settings)
    want = _run_scan(problem, cache, x0s, settings)
    if settings.check_termination:
        np.testing.assert_array_equal(np.asarray(got.iter), np.asarray(want.iter))
        np.testing.assert_array_equal(
            np.asarray(got.status), np.asarray(want.status)
        )
    for name in ("u", "x", "d", "y", "g"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(want, name)),
            rtol=0,
            atol=TOL,
            err_msg=name,
        )
    # The costate p has magnitude O(100); its drift is relative.
    np.testing.assert_allclose(
        np.asarray(got.p), np.asarray(want.p), rtol=1e-4, atol=5e-3, err_msg="p"
    )


def test_roundtrip_layout(setup):
    problem, cache, ops, fp, x0s = setup
    settings = atm.Settings(max_iter=10, check_termination=0)
    st = _run_scan(problem, cache, x0s, settings)
    flat = flat_from_state(st, problem.nx, problem.nu)
    back = state_from_flat(flat, problem.nx, problem.nu, problem.horizon)
    for name in ("x", "u", "p", "d", "v", "z", "y", "g"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st, name)), np.asarray(getattr(back, name)),
            err_msg=name,
        )
