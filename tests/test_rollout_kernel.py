"""In-kernel receding-horizon rollout (ops/fused_rollout.py) vs the
scan-of-kernels rollout (api/mpc.fused_mpc_rollout) via the Pallas
interpreter. Per-tick semantics are the reference MPC loop
(reference: examples/quadrotor_hovering.cpp:90-114 — dual reset, warm
slacks, pre-projection u0 applied, plant step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.api import fused_mpc_rollout
from accelerated_tinympc_tpu.models import random_lti_problem
from accelerated_tinympc_tpu.ops import pad_problem
from accelerated_tinympc_tpu.ops.fused_admm import FusedCarry
from accelerated_tinympc_tpu.ops.fused_rollout import (
    fused_rollout,
    rollout_const_seq,
    rollout_ops,
)
from accelerated_tinympc_tpu.precompute import condensed_operators


@pytest.fixture(scope="module")
def quad():
    problem, cache, x0 = atm.models.quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rops = rollout_ops(problem, pp)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((6, 12)),
        jnp.float32,
    )
    return problem, cache, pp, rops, x0s


def test_fixed_matches_wrapper(quad):
    problem, _cache, pp, rops, x0s = quad
    B, T = x0s.shape[0], 5
    res = fused_rollout(x0s, FusedCarry.zeros(B, pp), pp, rops, T,
                        max_iter=25, interpret=True, batch_tile=B)
    xf, us, carry = fused_mpc_rollout(
        pp, x0s, T, problem=problem, max_iter=25, batch_tile=B,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(res.us), np.asarray(us),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.x_final), np.asarray(xf),
                               rtol=0, atol=1e-4)
    # warm-start carry matches too (continuations are equivalent)
    for a, b in zip(res.final.carry, carry):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-4)
    assert np.all(np.asarray(res.iters) == 25.0)


def test_adaptive_matches_wrapper(quad):
    problem, _cache, pp, rops, x0s = quad
    B, T = x0s.shape[0], 6
    res = fused_rollout(x0s, FusedCarry.zeros(B, pp), pp, rops, T,
                        max_iter=40, check_termination=1,
                        abs_pri_tol=1e-3, abs_dua_tol=1e-3,
                        interpret=True, batch_tile=B)
    xf, us, _ = fused_mpc_rollout(
        pp, x0s, T, problem=problem, max_iter=40, check_termination=1,
        abs_pri_tol=1e-3, abs_dua_tol=1e-3, batch_tile=B, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(res.us), np.asarray(us),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.x_final), np.asarray(xf),
                               rtol=0, atol=1e-4)


def test_adaptive_schedule_matches_scan_tier(quad):
    """Per-tick iteration counts equal the scan tier's early-exiting
    rollout (reference defaults semantics, admm.cpp:91-109)."""
    from accelerated_tinympc_tpu.api import mpc_rollout

    problem, cache, pp, rops, x0s = quad
    B, T = x0s.shape[0], 8
    res = fused_rollout(x0s, FusedCarry.zeros(B, pp), pp, rops, T,
                        max_iter=30, check_termination=1,
                        abs_pri_tol=1e-3, abs_dua_tol=1e-3,
                        interpret=True, batch_tile=B)
    settings = atm.Settings(max_iter=30, check_termination=1,
                            abs_pri_tol=1e-3, abs_dua_tol=1e-3)
    _, _, trace = jax.jit(lambda x: mpc_rollout(
        problem, cache, settings, x, T, batched=True))(x0s)
    it_k = np.asarray(res.iters)
    it_s = np.asarray(trace.iters).astype(np.float32)
    # interpret-mode FMA drift can shift knife-edge checks; demand
    # near-total agreement (on chip this is 100%, see BASELINE.md)
    agree = float((it_k == it_s).mean())
    assert agree > 0.9, (agree, it_k[:, 0], it_s[:, 0])


def test_tracking_matches_wrapper():
    from accelerated_tinympc_tpu.models import quadrotor_tracking_setup

    problem, cache, x0, Xref_total = quadrotor_tracking_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rops = rollout_ops(problem, pp)
    rng = np.random.default_rng(1)
    B, T = 3, 5
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.02 * rng.standard_normal((B, 12)),
        jnp.float32,
    )
    Xref_total = jnp.asarray(Xref_total)
    cs = rollout_const_seq(pp, problem.Q, cache.Pinf, Xref_total, T)
    res = fused_rollout(x0s, FusedCarry.zeros(B, pp), pp, rops, T,
                        max_iter=25, const_seq=cs, interpret=True,
                        batch_tile=B)
    xf, us, _ = fused_mpc_rollout(
        pp, x0s, T, problem=problem, max_iter=25, batch_tile=B,
        Xref_total=Xref_total, Pinf=cache.Pinf, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(res.us), np.asarray(us),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.x_final), np.asarray(xf),
                               rtol=0, atol=1e-4)


def test_continuation_equals_one_run(quad):
    """Rollout T=6 == rollout T=4 then T=2 continued from (x_final, carry):
    the in-kernel tick protocol preserves the wrapper's warm-start chain."""
    problem, _cache, pp, rops, x0s = quad
    B = x0s.shape[0]
    full = fused_rollout(x0s, FusedCarry.zeros(B, pp), pp, rops, 6,
                         max_iter=20, interpret=True, batch_tile=B)
    head = fused_rollout(x0s, FusedCarry.zeros(B, pp), pp, rops, 4,
                         max_iter=20, interpret=True, batch_tile=B)
    tail = fused_rollout(head.x_final, head.final.carry, pp, rops, 2,
                         max_iter=20, interpret=True, batch_tile=B)
    np.testing.assert_allclose(
        np.asarray(tail.us), np.asarray(full.us[4:]), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(tail.x_final), np.asarray(full.x_final),
        rtol=0, atol=1e-4
    )


@pytest.mark.parametrize("nx,nu,N", [
    (4, 1, 12),    # cartpole-like: g capped at MAX_PACK? Du=11 -> g=8
    (6, 2, 9),     # Du=16, g=8
    (12, 4, 10),   # flagship, g=3
    (8, 3, 24),    # Du=69 -> g=1, Dug=128
    (5, 4, 40),    # Du=156 -> g=1, Dug=256 (wide input space)
])
def test_shape_fuzz_matches_wrapper(nx, nu, N):
    """The in-kernel mission across packing regimes (g=8/3/1, Dug up to
    256): parity with the scan-of-kernels rollout on every shape."""
    from accelerated_tinympc_tpu.precompute import riccati_cache

    problem, rho = random_lti_problem(seed=nx * 100 + nu, nx=nx, nu=nu,
                                      horizon=N)
    cache = riccati_cache(
        np.asarray(problem.A), np.asarray(problem.B),
        np.asarray(problem.Q), np.asarray(problem.R), rho,
    )
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rops = rollout_ops(problem, pp)
    rng = np.random.default_rng(1)
    B, T = 7, 3
    x0s = jnp.asarray(0.2 * rng.standard_normal((B, nx)), jnp.float32)
    res = fused_rollout(x0s, FusedCarry.zeros(B, pp), pp, rops, T,
                        max_iter=12, check_termination=2,
                        interpret=True, batch_tile=8)
    xf, us, _ = fused_mpc_rollout(
        pp, x0s, T, problem=problem, max_iter=12, check_termination=2,
        batch_tile=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(res.us), np.asarray(us),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.x_final), np.asarray(xf),
                               rtol=0, atol=1e-4)


def test_unpacked_g1_and_batch_padding():
    """g=1 layout (Du > 64) plus a batch that is not a tile multiple."""
    from accelerated_tinympc_tpu.precompute import riccati_cache

    problem, rho = random_lti_problem(seed=3, nx=8, nu=8, horizon=10)
    cache = riccati_cache(
        np.asarray(problem.A), np.asarray(problem.B),
        np.asarray(problem.Q), np.asarray(problem.R), rho,
    )
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    assert pp.g == 1
    rops = rollout_ops(problem, pp)
    rng = np.random.default_rng(2)
    B, T = 5, 4
    x0s = jnp.asarray(0.3 * rng.standard_normal((B, 8)), jnp.float32)
    res = fused_rollout(x0s, FusedCarry.zeros(B, pp), pp, rops, T,
                        max_iter=15, interpret=True, batch_tile=8)
    xf, us, _ = fused_mpc_rollout(
        pp, x0s, T, problem=problem, max_iter=15, batch_tile=8,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(res.us), np.asarray(us),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.x_final), np.asarray(xf),
                               rtol=0, atol=1e-4)


class TestConedMission:
    """SOC cones inside the in-kernel mission (round-5: cone_ops threaded
    through the tick core — reference projection stage admm.cpp:45-61
    applied every iteration of every tick, one Pallas launch)."""

    def _setup(self):
        from accelerated_tinympc_tpu.ops.fused_admm import pad_cones
        from accelerated_tinympc_tpu.solver.cones import Cone, ConeSet

        problem, cache, x0 = atm.models.quadrotor_hovering_setup()
        ops = condensed_operators(
            cache, np.asarray(problem.A), np.asarray(problem.B),
            problem.horizon,
        )
        pp = pad_problem(problem, cache, ops)
        rops = rollout_ops(problem, pp)
        cones = ConeSet(
            input_cones=(Cone(ball=(0, 1), axis=2, mu=1.0),),
            state_cones=(Cone(ball=(0, 1), axis=2, mu=2.0, shift=0.5),),
        )
        cone_ops = pad_cones(pp, cones)
        rng = np.random.default_rng(7)
        x0s = jnp.asarray(
            np.asarray(x0)[None] + 0.05 * rng.standard_normal((5, 12)),
            jnp.float32,
        )
        return problem, pp, rops, cone_ops, x0s

    @pytest.mark.parametrize("check", [0, 2])
    def test_matches_scan_of_kernels(self, check):
        problem, pp, rops, cone_ops, x0s = self._setup()
        B, T = x0s.shape[0], 5
        res = fused_rollout(
            x0s, FusedCarry.zeros(B, pp), pp, rops, T,
            max_iter=20, check_termination=check, cone_ops=cone_ops,
            interpret=True, batch_tile=B,
        )
        xf, us, carry = fused_mpc_rollout(
            pp, x0s, T, problem=problem, max_iter=20,
            check_termination=check, cone_ops=cone_ops,
            batch_tile=B, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(res.us), np.asarray(us),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.x_final), np.asarray(xf),
                                   rtol=0, atol=1e-4)
        for a, b in zip(res.final.carry, carry):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-4)

    def test_cone_actually_binds(self):
        """The coned mission's slacks satisfy the input cone and differ
        from the unconed mission (the projection is live, not a no-op)."""
        from accelerated_tinympc_tpu.solver.cones import Cone, cone_violation

        problem, pp, rops, cone_ops, x0s = self._setup()
        B, T = x0s.shape[0], 4
        coned = fused_rollout(
            x0s, FusedCarry.zeros(B, pp), pp, rops, T,
            max_iter=25, cone_ops=cone_ops, interpret=True, batch_tile=B,
        )
        plain = fused_rollout(
            x0s, FusedCarry.zeros(B, pp), pp, rops, T,
            max_iter=25, interpret=True, batch_tile=B,
        )
        nu = 4
        Z = np.asarray(coned.final.carry.Z)[:, : (pp.dims[2] - 1) * nu]
        Z = Z.reshape(B, -1, nu)
        cone = Cone(ball=(0, 1), axis=2, mu=1.0)
        viol = float(np.max(np.asarray(cone_violation(jnp.asarray(Z), cone))))
        assert viol < 1e-5, viol
        assert float(np.abs(np.asarray(coned.us) - np.asarray(plain.us)).max()) > 1e-4
