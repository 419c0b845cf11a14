"""Fused Pallas kernel vs the jnp tiers, via the Pallas interpreter on CPU
(SURVEY.md §4: kernel paths must be testable without a TPU). Semantics bar:
same schedule as the reference iteration, controls inside the 1e-4 parity
band, identical iteration counts / convergence flags in adaptive mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import quadrotor_hovering_setup
from accelerated_tinympc_tpu.ops.fused_admm import (
    FusedCarry,
    fused_solve,
    pad_problem,
    unpad_controls,
    unpad_states,
)
from accelerated_tinympc_tpu.precompute import condensed_operators
from accelerated_tinympc_tpu.solver.batched import init_state_batched, solve_batched

B = 8


@pytest.fixture(scope="module")
def setup():
    problem, cache, x0 = quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.1 * rng.standard_normal((B, x0.size)),
        jnp.float32,
    )
    return problem, cache, pp, x0s


def _run_scan(problem, cache, x0s, settings):
    st = init_state_batched(x0s.shape[0], problem.nx, problem.nu, problem.horizon)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    return jax.jit(lambda s: solve_batched(s, problem, cache, settings))(st)


class TestFixedIterations:
    @pytest.fixture(scope="class")
    def result(self, setup):
        problem, cache, pp, x0s = setup
        carry = FusedCarry.zeros(B, pp)
        got = fused_solve(
            x0s, carry, pp, max_iter=25, check_termination=0, batch_tile=B,
            interpret=True,
        )
        want = _run_scan(
            problem, cache, x0s, atm.Settings(max_iter=25, check_termination=0)
        )
        return got, want, pp

    def test_controls(self, result):
        got, want, pp = result
        u = np.asarray(got.U[:, : pp.dims[1] * (pp.dims[2] - 1)]).reshape(
            B, pp.dims[2] - 1, pp.dims[1]
        )
        np.testing.assert_allclose(
            u, np.asarray(want.u), rtol=0, atol=1e-4
        )

    def test_states(self, result):
        got, want, pp = result
        x = np.asarray(unpad_states(got, pp))
        np.testing.assert_allclose(x, np.asarray(want.x), rtol=0, atol=2e-4)

    def test_warm_start_carries(self, result):
        got, want, pp = result
        nu, N = pp.dims[1], pp.dims[2]
        Du = nu * (N - 1)
        np.testing.assert_allclose(
            np.asarray(got.carry.D[:, :Du]),
            np.asarray(want.d).reshape(B, -1),
            rtol=0, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got.carry.Y[:, :Du]),
            np.asarray(want.y).reshape(B, -1),
            rtol=0, atol=1e-4,
        )

    def test_padded_lanes_stay_zero(self, result):
        got, _want, pp = result
        nu, N = pp.dims[1], pp.dims[2]
        Du, Dx = nu * (N - 1), pp.dims[0] * N
        assert np.all(np.asarray(got.U[:, Du:]) == 0)
        assert np.all(np.asarray(got.X[:, Dx:]) == 0)
        assert np.all(np.asarray(got.carry.G[:, Dx:]) == 0)


class TestAdaptive:
    @pytest.fixture(scope="class")
    def result(self, setup):
        problem, cache, pp, x0s = setup
        carry = FusedCarry.zeros(B, pp)
        got = fused_solve(
            x0s, carry, pp, max_iter=400, check_termination=1,
            abs_pri_tol=0.05, abs_dua_tol=0.05, batch_tile=B, interpret=True,
        )
        want = _run_scan(
            problem, cache, x0s,
            atm.Settings(
                abs_pri_tol=0.05, abs_dua_tol=0.05, max_iter=400,
                check_termination=1,
            ),
        )
        return got, want, pp

    def test_iterations_and_status(self, result):
        got, want, _pp = result
        np.testing.assert_array_equal(
            np.asarray(got.stats[:, 0]).astype(int), np.asarray(want.iter)
        )
        solved = np.asarray(got.stats[:, 1]) > 0.5
        np.testing.assert_array_equal(
            solved, np.asarray(want.status) == atm.SOLVED
        )

    def test_iterations_diverge(self, result):
        got, _want, _pp = result
        assert len(set(np.asarray(got.stats[:, 0]).tolist())) > 1

    def test_controls(self, result):
        got, want, pp = result
        u0 = np.asarray(unpad_controls(got, pp))
        np.testing.assert_allclose(
            u0, np.asarray(want.u[:, 0, :]), rtol=0, atol=1e-4
        )

    def test_residual_stats(self, result):
        got, want, _pp = result
        res = np.asarray(got.stats[:, 2:6])
        want_res = np.stack(
            [
                np.asarray(want.primal_residual_state),
                np.asarray(want.dual_residual_state),
                np.asarray(want.primal_residual_input),
                np.asarray(want.dual_residual_input),
            ],
            axis=-1,
        )
        np.testing.assert_allclose(res, want_res, rtol=0, atol=3e-4)


class TestWideHorizon:
    """Generality beyond one 128-lane tile: N=22 -> Dx=264 -> Dxp=384 (three
    lane tiles on the state side), exercising the widen/chunked-max paths."""

    @pytest.fixture(scope="class")
    def wide_setup(self):
        from accelerated_tinympc_tpu.models import random_lti_problem
        from accelerated_tinympc_tpu.precompute import riccati_cache

        problem, rho = random_lti_problem(seed=11, nx=12, nu=4, horizon=22)
        cache = riccati_cache(
            np.asarray(problem.A), np.asarray(problem.B),
            np.asarray(problem.Q), np.asarray(problem.R), rho,
        )
        ops = condensed_operators(
            cache, np.asarray(problem.A), np.asarray(problem.B), 22
        )
        pp = pad_problem(problem, cache, ops)
        assert pp.Dxp == 384 and pp.Dup == 128  # the case under test
        rng = np.random.default_rng(2)
        x0s = jnp.asarray(rng.standard_normal((8, 12)) * 0.3, jnp.float32)
        return problem, cache, pp, x0s

    @pytest.mark.parametrize("mode", ["fixed", "adaptive"])
    def test_parity_vs_scan(self, wide_setup, mode):
        problem, cache, pp, x0s = wide_setup
        carry = FusedCarry.zeros(8, pp)
        if mode == "fixed":
            got = fused_solve(
                x0s, carry, pp, max_iter=20, check_termination=0,
                batch_tile=8, interpret=True,
            )
            settings = atm.Settings(max_iter=20, check_termination=0)
        else:
            got = fused_solve(
                x0s, carry, pp, max_iter=100, check_termination=1,
                abs_pri_tol=0.05, abs_dua_tol=0.05, batch_tile=8,
                interpret=True,
            )
            settings = atm.Settings(
                abs_pri_tol=0.05, abs_dua_tol=0.05, max_iter=100,
                check_termination=1,
            )
        want = _run_scan(problem, cache, x0s, settings)
        u = np.asarray(got.U[:, : 21 * 4]).reshape(8, 21, 4)
        np.testing.assert_allclose(
            u, np.asarray(want.u), rtol=1e-4, atol=2e-4
        )
        if mode == "adaptive":
            np.testing.assert_array_equal(
                np.asarray(got.stats[:, 0]).astype(int), np.asarray(want.iter)
            )


def test_non_tile_multiple_batch(setup):
    """Batches that aren't tile multiples are padded internally and sliced
    back (serving-friendly; TinyMPC produces such batches)."""
    problem, cache, pp, x0s = setup
    x0_odd = x0s[:5]
    got = fused_solve(
        x0_odd, FusedCarry.zeros(5, pp), pp, max_iter=20,
        check_termination=0, batch_tile=4, interpret=True,
    )
    assert got.U.shape[0] == 5 and got.stats.shape[0] == 5
    want = fused_solve(
        x0s[:8], FusedCarry.zeros(8, pp), pp, max_iter=20,
        check_termination=0, batch_tile=4, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.U[:5]), rtol=0, atol=1e-6
    )


def test_adaptive_warmup_equivalence(setup):
    """warmup_iters below the earliest convergence leaves adaptive results
    identical (the warmup chunk just skips bookkeeping no instance needed)."""
    problem, cache, pp, x0s = setup
    kw = dict(max_iter=400, check_termination=1, abs_pri_tol=0.05,
              abs_dua_tol=0.05, batch_tile=8, interpret=True)
    plain = fused_solve(x0s, FusedCarry.zeros(8, pp), pp, **kw)
    warm = fused_solve(x0s, FusedCarry.zeros(8, pp), pp, warmup_iters=32, **kw)
    assert np.asarray(plain.stats[:, 0]).min() > 32  # premise: no early conv
    np.testing.assert_array_equal(
        np.asarray(plain.stats[:, 0]), np.asarray(warm.stats[:, 0])
    )
    np.testing.assert_allclose(
        np.asarray(plain.U), np.asarray(warm.U), rtol=0, atol=1e-6
    )


def test_bf16x3_parity(setup):
    """algo='bf16x3' (3-pass split-operand bf16 matmuls + f32 polish tail)
    stays inside the 1e-4 control-parity bar over the reference's full
    100-iteration budget."""
    problem, cache, pp, x0s = setup
    got = fused_solve(
        x0s, FusedCarry.zeros(B, pp), pp, max_iter=100, check_termination=0,
        batch_tile=B, interpret=True, algo="bf16x3",
    )
    want = _run_scan(
        problem, cache, x0s, atm.Settings(max_iter=100, check_termination=0)
    )
    err = np.max(np.abs(
        np.asarray(got.U[:, :36]).reshape(B, 9, 4) - np.asarray(want.u)
    ))
    assert err < 1e-4, err


def test_bf16x3_adaptive(setup):
    """Adaptive bf16x3 (bf16x3 between checks, f32 check iterations): every
    instance converges with true-f32-residual guarantees and the controls
    stay inside the parity band vs f32 adaptive; iteration counts may shift
    near the threshold (the documented trade), but on this well-conditioned
    problem they should match f32 adaptive exactly."""
    problem, cache, pp, x0s = setup
    kw = dict(
        max_iter=400, check_termination=5, abs_pri_tol=0.05,
        abs_dua_tol=0.05, batch_tile=B, interpret=True,
    )
    got3 = fused_solve(x0s, FusedCarry.zeros(B, pp), pp, algo="bf16x3", **kw)
    gotf = fused_solve(x0s, FusedCarry.zeros(B, pp), pp, algo="f32", **kw)
    s3 = np.asarray(got3.stats)
    assert np.all(s3[:, 1] == 1.0), "all instances must converge"
    # Recorded residuals are exact f32 residuals of the returned iterates
    # and must satisfy the tolerances.
    assert np.all(s3[:, 2:6] < 0.05 + 1e-6), s3[:, 2:6].max()
    # Both stop at the (loose) 0.05 residual band, so the two solutions are
    # each ~tol from the fixed point; the cross-algo gap is bf16x3 drift on
    # top of that, well under the stopping band.
    err = np.max(np.abs(np.asarray(got3.U[:, :36]) -
                        np.asarray(gotf.U[:, :36])))
    assert err < 5e-4, err
    assert np.array_equal(s3[:, 0], np.asarray(gotf.stats)[:, 0])
