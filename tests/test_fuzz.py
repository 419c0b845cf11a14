"""Randomized cross-tier consistency fuzzing: for random stabilizable plants
across (nx, nu, N) shapes, all four solver tiers must agree on the same ADMM
trajectory (fixed iterations; tolerances scaled for f32 drift)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import random_lti_problem
from accelerated_tinympc_tpu.ops.fused_admm import (
    FusedCarry,
    fused_solve,
    pad_problem,
)
from accelerated_tinympc_tpu.precompute import condensed_operators, riccati_cache
from accelerated_tinympc_tpu.solver import admm
from accelerated_tinympc_tpu.solver.assoc_scan import solve_assoc
from accelerated_tinympc_tpu.solver.batched import init_state_batched, solve_batched
from accelerated_tinympc_tpu.solver.condensed import (
    flatten_problem,
    init_flat_state,
    solve_condensed,
)

SHAPES = [
    (2, 1, 4),
    (4, 2, 8),
    (7, 3, 12),
    (12, 4, 10),
    (9, 5, 17),
]
ITERS = 15
B = 4


@pytest.mark.parametrize("nx,nu,N", SHAPES)
def test_all_tiers_agree(nx, nu, N):
    problem, rho = random_lti_problem(seed=nx * 31 + nu, nx=nx, nu=nu,
                                      horizon=N)
    cache = riccati_cache(
        np.asarray(problem.A), np.asarray(problem.B),
        np.asarray(problem.Q), np.asarray(problem.R), rho,
    )
    rng = np.random.default_rng(nx + nu + N)
    x0s = jnp.asarray(rng.standard_normal((B, nx)) * 0.3, jnp.float32)
    settings = atm.Settings(max_iter=ITERS, check_termination=0)

    # scan tier (batched)
    st = init_state_batched(B, nx, nu, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    u_scan = np.asarray(
        jax.jit(lambda s: solve_batched(s, problem, cache, settings))(st).u
    )

    # assoc tier (vmapped)
    sts = jax.tree.map(
        lambda a: a, st
    )
    u_assoc = np.asarray(
        jax.jit(
            jax.vmap(lambda s: solve_assoc(s, problem, cache, settings))
        )(sts).u
    )

    # condensed tier
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), N
    )
    fp = flatten_problem(problem, cache)
    fs = init_flat_state(B, nx, nu, N).replace(x0=x0s)
    out = jax.jit(
        lambda s: solve_condensed(s, fp, ops, settings, nx)
    )(fs)
    u_cond = np.asarray(out.U).reshape(B, N - 1, nu)

    # fused tier (interpreter)
    pp = pad_problem(problem, cache, ops)
    res = fused_solve(
        x0s, FusedCarry.zeros(B, pp), pp, max_iter=ITERS,
        check_termination=0, batch_tile=B, interpret=True,
    )
    u_fused = np.asarray(
        res.U[:, : (N - 1) * nu]
    ).reshape(B, N - 1, nu)

    scale = max(1.0, np.abs(u_scan).max())
    tol = 2e-4 * scale
    np.testing.assert_allclose(u_assoc, u_scan, rtol=0, atol=tol,
                               err_msg="assoc")
    np.testing.assert_allclose(u_cond, u_scan, rtol=0, atol=tol,
                               err_msg="condensed")
    np.testing.assert_allclose(u_fused, u_scan, rtol=0, atol=tol,
                               err_msg="fused")
