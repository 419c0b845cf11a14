"""Native C++ runtime solver (native/src/tinympc_native.cpp via ctypes):
independent double-precision implementation cross-checked against the JAX
engine — precompute, single solves (fixed + adaptive), batched solves, and
the receding-horizon warm-start protocol."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import cartpole, quadrotor_hovering_setup
from accelerated_tinympc_tpu.native import NativeSolver
from accelerated_tinympc_tpu.precompute import riccati_cache

HOVER_Q = None  # loaded from model data


@pytest.fixture(scope="module")
def quad():
    problem, cache, x0 = quadrotor_hovering_setup()
    return problem, cache, np.asarray(x0, np.float64)


@pytest.fixture(scope="module")
def native_quad(quad):
    problem, cache, x0 = quad
    ns = NativeSolver(
        np.asarray(problem.A, np.float64), np.asarray(problem.B, np.float64),
        np.asarray(problem.Q, np.float64), np.asarray(problem.R, np.float64),
        rho=float(cache.rho), horizon=10,
        max_iter=30, check_termination=0,
    )
    ns.set_bounds(u_min=-0.5, u_max=0.5, x_min=-5.0, x_max=5.0)
    ns.set_xref(np.asarray(problem.Xref, np.float64))
    return ns


def test_native_precompute_matches(quad, native_quad):
    """The C++ Riccati fixed point reproduces the shipped reference cache and
    the Python precompute."""
    problem, cache, _ = quad
    got = native_quad.get_cache()
    np.testing.assert_allclose(
        got["Kinf"], np.asarray(cache.Kinf, np.float64), rtol=0, atol=2e-4
    )
    ours = riccati_cache(
        np.asarray(problem.A), np.asarray(problem.B),
        np.asarray(problem.Q), np.asarray(problem.R), float(cache.rho),
        dtype=np.float64,
    )
    np.testing.assert_allclose(got["Kinf"], ours.Kinf, rtol=0, atol=1e-9)
    np.testing.assert_allclose(got["Pinf"], ours.Pinf, rtol=1e-9, atol=1e-7)


def test_native_solve_matches_jax(quad, native_quad):
    problem, cache, x0 = quad
    native_quad.reset_duals()
    native_quad.set_x0(x0)
    info = native_quad.solve()
    assert info["iterations"] == 30
    u_native = native_quad.get_u()

    st = atm.set_x0(atm.init_state(12, 4, 10), jnp.asarray(x0, jnp.float32))
    out = jax.jit(
        lambda s: atm.solve(
            s, problem, cache, atm.Settings(max_iter=30, check_termination=0)
        )
    )(st)
    np.testing.assert_allclose(
        u_native, np.asarray(out.u, np.float64), rtol=0, atol=2e-4
    )


def test_native_batch(quad, native_quad):
    _, _, x0 = quad
    rng = np.random.default_rng(0)
    x0s = x0[None] + 0.05 * rng.standard_normal((4, 12))
    u, iters, status = native_quad.solve_batch(x0s)
    assert u.shape == (4, 9, 4)
    assert np.all(iters == 30)
    # batch solves are cold-start independent: instance 0 equals a standalone
    # cold solve
    ns2 = NativeSolver(
        *(np.asarray(v, np.float64) for v in (
            quad[0].A, quad[0].B, quad[0].Q, quad[0].R)),
        rho=float(quad[1].rho), horizon=10, max_iter=30, check_termination=0,
    )
    ns2.set_bounds(u_min=-0.5, u_max=0.5, x_min=-5.0, x_max=5.0)
    ns2.set_xref(np.asarray(quad[0].Xref, np.float64))
    ns2.set_x0(x0s[0])
    ns2.solve()
    np.testing.assert_allclose(u[0], ns2.get_u(), rtol=0, atol=1e-12)


def test_native_adaptive_and_warm_start(quad):
    """Receding-horizon loop with the native solver follows the engine's
    trajectory (reference protocol: reset duals, carry slacks)."""
    problem, cache, x0 = quad
    ns = NativeSolver(
        np.asarray(problem.A, np.float64), np.asarray(problem.B, np.float64),
        np.asarray(problem.Q, np.float64), np.asarray(problem.R, np.float64),
        rho=float(cache.rho), horizon=10,
        max_iter=100, check_termination=1,
    )
    ns.set_bounds(u_min=-0.5, u_max=0.5, x_min=-5.0, x_max=5.0)
    ns.set_xref(np.asarray(problem.Xref, np.float64))
    A = np.asarray(problem.A, np.float64)
    B = np.asarray(problem.B, np.float64)
    x = x0.copy()
    errs = []
    for _ in range(70):
        ns.reset_duals()
        ns.set_x0(x)
        ns.solve()
        u0 = ns.get_u()[0]
        x = A @ x + B @ u0
        errs.append(np.linalg.norm(x - np.asarray(problem.Xref[0])))
    assert errs[-1] < 0.01, errs[-1]


def test_cartpole_native(tmp_path):
    ns = NativeSolver(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG,
        rho=cartpole.RHO, horizon=10, max_iter=25, check_termination=0,
    )
    ns.set_bounds(u_min=-5.0, u_max=5.0, x_min=-5.0, x_max=5.0)
    ns.set_x0(np.array([0.3, 0.0, 0.1, 0.0]))
    ns.solve()
    u_native = ns.get_u()

    problem = cartpole.cartpole_problem(10)
    cache = riccati_cache(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG, cartpole.RHO
    )
    st = atm.set_x0(
        atm.init_state(4, 1, 10), jnp.asarray([0.3, 0, 0.1, 0], jnp.float32)
    )
    out = jax.jit(
        lambda s: atm.solve(
            s, problem, cache, atm.Settings(max_iter=25, check_termination=0)
        )
    )(st)
    np.testing.assert_allclose(
        u_native, np.asarray(out.u, np.float64), rtol=0, atol=1e-4
    )


def test_native_cones_match_engine():
    """Native runtime SOC support: the f64 host solver with a thrust cone
    matches the engine's coned scan solve and keeps its slack in the cone."""
    from accelerated_tinympc_tpu.solver import admm
    from accelerated_tinympc_tpu.solver.cones import (
        Cone, ConeSet, cone_slack_update, cone_violation,
    )

    dt, horizon = 0.1, 15
    I3 = np.eye(3)
    A = np.block([[I3, dt * I3], [0 * I3, I3]])
    B = np.vstack([0.5 * dt * dt * I3, dt * I3])
    Q = np.concatenate([np.full(3, 10.0), np.full(3, 1.0)])
    R = np.full(3, 1.0)
    cone = Cone(ball=(0, 1), axis=2, mu=1.0, shift=3.0)
    cones = ConeSet(input_cones=(cone,))
    x0 = np.asarray([3.0, -2.0, 4.0, -1.0, 1.0, -1.5])

    ns = NativeSolver(
        A, B, Q, R, rho=1.0, horizon=horizon,
        max_iter=400, check_termination=1,
    )
    ns.set_cones(cones)
    ns.set_x0(x0)
    info = ns.solve()
    assert info["solved"]

    problem = atm.Problem(
        A=jnp.asarray(A, jnp.float32), B=jnp.asarray(B, jnp.float32),
        Q=jnp.asarray(Q, jnp.float32), R=jnp.asarray(R, jnp.float32),
        u_min=jnp.full((horizon - 1, 3), -1e17, jnp.float32),
        u_max=jnp.full((horizon - 1, 3), 1e17, jnp.float32),
        x_min=jnp.full((horizon, 6), -1e17, jnp.float32),
        x_max=jnp.full((horizon, 6), 1e17, jnp.float32),
        Xref=jnp.zeros((horizon, 6), jnp.float32),
        Uref=jnp.zeros((horizon - 1, 3), jnp.float32),
    )
    from accelerated_tinympc_tpu.precompute import riccati_cache

    cache = riccati_cache(A, B, Q, R, 1.0)
    sets = atm.Settings(
        max_iter=400, check_termination=1,
        en_input_bound=False, en_state_bound=False,
    )
    st = atm.set_x0(atm.init_state(6, 3, horizon), jnp.asarray(x0, jnp.float32))
    ref = jax.jit(
        lambda s: admm.solve(
            s, problem, cache, sets, project=cone_slack_update(cones)
        )
    )(st)
    assert int(ref.status) == atm.SOLVED
    # Same check schedule (f64 vs f32 may differ by a knife-edge check) and
    # matching controls at tolerance scale.
    u_native = ns.get_u().reshape(horizon - 1, 3)
    np.testing.assert_allclose(
        u_native, np.asarray(ref.u), rtol=0, atol=5e-3
    )
    assert float(cone_violation(jnp.asarray(u_native), cone)) < 5e-3


def test_native_adaptive_rho():
    """Native rho adaptation rescues a 4-orders-mis-scaled penalty the
    fixed-rho solve cannot handle in the same budget (the native
    counterpart of solver/adaptive_rho.py; same hard problem as
    tests/test_adaptive_rho.py)."""
    from accelerated_tinympc_tpu.models import random_lti_problem

    problem, _ = random_lti_problem(
        seed=3, nx=8, nu=3, horizon=15, bound=5.0, q_scale=100.0,
        r_scale=0.1,
    )
    A = np.asarray(problem.A); Bm = np.asarray(problem.B)
    Q = np.asarray(problem.Q); R = np.asarray(problem.R)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(8)

    def make(rho):
        ns = NativeSolver(A, Bm, Q, R, rho=rho, horizon=15,
                          max_iter=1500, check_termination=1,
                          abs_pri_tol=2e-3, abs_dua_tol=2e-3)
        ns.set_bounds(u_min=np.full((14, 3), -0.3),
                      u_max=np.full((14, 3), 0.3))
        ns.set_x0(x0)
        return ns

    fixed = make(1e-2)
    assert not fixed.solve()["solved"], "premise: fixed bad rho fails"

    adapt = make(1e-2)
    info = adapt.solve_adaptive_rho(chunk=25, max_total_iter=1500)
    assert info["solved"], info
    assert info["rho"] != 1e-2, "rho never adapted"
    assert info["iterations"] <= 800
    # The adapted solver re-solves quickly from the warm state.
    adapt.reset_duals()
    adapt.set_x0(x0 * 0.9)
    again = adapt.solve()
    assert again["solved"]


def test_native_batch_adaptive():
    """Batched native adaptation: mis-scaled instances get per-instance rho
    trajectories and converge; the well-scaled baseline solves too."""
    from accelerated_tinympc_tpu.models import random_lti_problem

    problem, _ = random_lti_problem(
        seed=3, nx=8, nu=3, horizon=15, bound=5.0, q_scale=100.0,
        r_scale=0.1,
    )
    A = np.asarray(problem.A); Bm = np.asarray(problem.B)
    Q = np.asarray(problem.Q); R = np.asarray(problem.R)
    ns = NativeSolver(A, Bm, Q, R, rho=1e-2, horizon=15,
                      max_iter=1500, check_termination=1,
                      abs_pri_tol=2e-3, abs_dua_tol=2e-3)
    ns.set_bounds(u_min=np.full((14, 3), -0.3),
                  u_max=np.full((14, 3), 0.3))
    rng = np.random.default_rng(0)
    x0s = rng.standard_normal((6, 8))
    u, rho, iters, solved = ns.solve_batch_adaptive(x0s, max_total_iter=4000)
    assert solved.all(), (iters, rho)
    assert (rho != 1e-2).all(), "no instance adapted"
    assert u.shape == (6, 14, 3)
