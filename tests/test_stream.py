"""Streaming long-horizon fused tier vs the scan tier, via the Pallas
interpreter on CPU (SURVEY.md §4: kernel paths must be testable without a
TPU). The streaming kernel shares the reference iteration's exact arithmetic
order (reference: src/tinympc/admm.cpp:111-152), so fixed-iteration parity
with the scan tier is bit-level on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.ops.stream_admm import (
    StreamCarry,
    pad_stream_problem,
    stream_solve,
)
from accelerated_tinympc_tpu.precompute import riccati_cache
from accelerated_tinympc_tpu.solver.batched import (
    init_state_batched,
    solve_batched,
)
from accelerated_tinympc_tpu.types import Problem

NX, NU, N = 6, 2, 64
B = 5


def _make_problem(nx=NX, nu=NU, n=N, seed=0, bound=0.7):
    rng = np.random.default_rng(seed)
    A = np.eye(nx) + 0.02 * rng.standard_normal((nx, nx))
    Bm = 0.2 * rng.standard_normal((nx, nu))
    Q = np.abs(rng.standard_normal(nx)) + 1.0
    R = np.abs(rng.standard_normal(nu)) + 1.0
    cache = riccati_cache(A, Bm, Q, R, rho=1.0)
    problem = Problem(
        A=jnp.asarray(A, jnp.float32), B=jnp.asarray(Bm, jnp.float32),
        Q=jnp.asarray(Q, jnp.float32), R=jnp.asarray(R, jnp.float32),
        u_min=jnp.full((n - 1, nu), -bound, jnp.float32),
        u_max=jnp.full((n - 1, nu), bound, jnp.float32),
        x_min=jnp.full((n, nx), -4.0, jnp.float32),
        x_max=jnp.full((n, nx), 4.0, jnp.float32),
        Xref=jnp.zeros((n, nx), jnp.float32),
        Uref=jnp.zeros((n - 1, nu), jnp.float32),
    )
    return problem, cache


def _run_scan(problem, cache, x0s, max_iter):
    st = init_state_batched(
        x0s.shape[0], problem.nx, problem.nu, problem.horizon
    )
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    return jax.jit(lambda s: solve_batched(
        s, problem, cache,
        atm.Settings(max_iter=max_iter, check_termination=0),
    ))(st)


@pytest.fixture(scope="module")
def setup():
    problem, cache = _make_problem()
    sp = pad_stream_problem(problem, cache)
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.standard_normal((B, NX)) * 0.5, jnp.float32)
    return problem, cache, sp, x0s


def test_fixed_parity(setup):
    problem, cache, sp, x0s = setup
    got = stream_solve(x0s, StreamCarry.zeros(B, sp), sp, max_iter=30,
                       knot_block=16, interpret=True)
    want = _run_scan(problem, cache, x0s, 30)
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.u), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.X), np.asarray(want.x), rtol=0, atol=1e-6
    )


def test_residual_stats(setup):
    """Final-iteration residuals match the reference definitions
    (admm.cpp:95-98: pre-projection iterates vs new slacks; old-vs-new
    slacks scaled by rho)."""
    problem, cache, sp, x0s = setup
    got = stream_solve(x0s, StreamCarry.zeros(B, sp), sp, max_iter=30,
                       knot_block=16, interpret=True)
    w_prev, w_fin = (_run_scan(problem, cache, x0s, n) for n in (29, 30))
    for i in range(B):
        want = np.asarray([
            jnp.max(jnp.abs(w_fin.x[i] - w_fin.vnew[i])),
            jnp.max(jnp.abs(w_prev.v[i] - w_fin.vnew[i])) * cache.rho,
            jnp.max(jnp.abs(w_fin.u[i] - w_fin.znew[i])),
            jnp.max(jnp.abs(w_prev.z[i] - w_fin.znew[i])) * cache.rho,
        ])
        np.testing.assert_allclose(
            np.asarray(got.stats[i, 2:6]), want, rtol=0, atol=1e-6
        )
    assert np.all(np.asarray(got.stats[:, 0]) == 30)


def test_warm_start_chain(setup):
    """30 + 10 iterations through the carry equals one 40-iteration solve
    (warm-start contract, reference workspace persistence)."""
    problem, cache, sp, x0s = setup
    a = stream_solve(x0s, StreamCarry.zeros(B, sp), sp, max_iter=30,
                     knot_block=16, interpret=True)
    b = stream_solve(x0s, a.carry, sp, max_iter=10, knot_block=16,
                     interpret=True)
    want = _run_scan(problem, cache, x0s, 40)
    np.testing.assert_allclose(
        np.asarray(b.U), np.asarray(want.u), rtol=0, atol=1e-6
    )


def test_knot_block_invariance(setup):
    """Results are independent of the streaming block size (pure tiling)."""
    problem, cache, sp, x0s = setup
    outs = [
        stream_solve(x0s, StreamCarry.zeros(B, sp), sp, max_iter=12,
                     knot_block=kb, interpret=True)
        for kb in (8, 16, 64)
    ]
    for o in outs[1:]:
        np.testing.assert_array_equal(np.asarray(outs[0].U), np.asarray(o.U))


def test_bounds_disabled():
    """en_*_bound=False skips the projections (reference admm.cpp:50-60
    flag guards)."""
    problem, cache = _make_problem(bound=1e9)
    sp = pad_stream_problem(problem, cache)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.standard_normal((3, NX)) * 0.5, jnp.float32)
    got = stream_solve(x0s, StreamCarry.zeros(3, sp), sp, max_iter=15,
                       knot_block=16, en_state_bound=False,
                       en_input_bound=False, interpret=True)
    st = init_state_batched(3, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, problem, cache,
        atm.Settings(max_iter=15, check_termination=0,
                     en_state_bound=False, en_input_bound=False),
    ))(st)
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.u), rtol=0, atol=1e-6
    )


def test_per_knot_bounds_parity():
    """Per-knot bound schedules (reference workspace full-horizon bound
    matrices, set_bound_constraints) now stream alongside qc: a funnel
    schedule matches the scan tier (round-1 rejected these — the streams
    are iteration-constant reads, measured free)."""
    problem, cache = _make_problem()
    t_u = np.linspace(1.0, 0.2, N - 1)[:, None].astype(np.float32)
    t_x = np.linspace(4.0, 1.0, N)[:, None].astype(np.float32)
    problem = problem.replace(
        u_min=jnp.asarray(-0.7 * t_u), u_max=jnp.asarray(0.7 * t_u),
        x_min=jnp.asarray(-t_x), x_max=jnp.asarray(t_x),
    )
    sp = pad_stream_problem(problem, cache)
    assert sp.has_knot_bounds
    rng = np.random.default_rng(11)
    x0s = jnp.asarray(rng.standard_normal((B, NX)) * 0.5, jnp.float32)
    got = stream_solve(x0s, StreamCarry.zeros(B, sp), sp, max_iter=30,
                       knot_block=16, interpret=True)
    want = _run_scan(problem, cache, x0s, 30)
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.u), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.X), np.asarray(want.x), rtol=0, atol=1e-6
    )
    # Block-size invariance holds with the bound streams in the phase.
    alt = stream_solve(x0s, StreamCarry.zeros(B, sp), sp, max_iter=30,
                       knot_block=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.U), np.asarray(alt.U))


def test_per_knot_bounds_adaptive():
    """Per-knot bounds compose with the in-kernel freeze: schedules match
    the scan tier's freeze exactly."""
    from accelerated_tinympc_tpu.types import SOLVED

    problem, cache = _make_problem()
    t_u = np.linspace(1.0, 0.3, N - 1)[:, None].astype(np.float32)
    problem = problem.replace(
        u_min=jnp.asarray(-0.7 * t_u), u_max=jnp.asarray(0.7 * t_u),
    )
    sp = pad_stream_problem(problem, cache)
    assert sp.has_knot_bounds
    B2 = 12
    rng = np.random.default_rng(12)
    scale = np.repeat([0.05, 0.4, 2.0], B2 // 3)[:, None]
    x0s = jnp.asarray(scale * rng.standard_normal((B2, NX)), jnp.float32)
    res = stream_solve(
        x0s, StreamCarry.zeros(B2, sp), sp, max_iter=60,
        check_termination=5, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
        knot_block=16, interpret=True,
    )
    st = init_state_batched(B2, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, problem, cache,
        atm.Settings(max_iter=60, check_termination=5,
                     abs_pri_tol=5e-3, abs_dua_tol=5e-3),
    ))(st)
    np.testing.assert_array_equal(
        np.asarray(res.stats[:, 0]).astype(int), np.asarray(want.iter)
    )
    np.testing.assert_array_equal(
        np.asarray(res.stats[:, 1]) > 0.5, np.asarray(want.status) == SOLVED
    )
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=1e-4
    )


def test_nondivisor_knot_block(setup):
    """knot_block is clamped to a divisor of N."""
    problem, cache, sp, x0s = setup
    got = stream_solve(x0s, StreamCarry.zeros(B, sp), sp, max_iter=12,
                       knot_block=24, interpret=True)  # 24 -> 16 for N=64
    want = _run_scan(problem, cache, x0s, 12)
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.u), rtol=0, atol=1e-6
    )


def test_stream_ref_vectors_tracking(setup):
    """stream_ref_vectors rebuilds qc/pterm device-side: solving with a
    shifted reference through it matches padding the problem from scratch."""
    problem, cache, sp, x0s = setup
    rng = np.random.default_rng(9)
    Xref2 = jnp.asarray(rng.standard_normal((N, NX)) * 0.3, jnp.float32)
    from accelerated_tinympc_tpu.ops.stream_admm import stream_ref_vectors

    sp2 = stream_ref_vectors(sp, problem.Q, cache.Pinf, Xref2)
    got = stream_solve(x0s, StreamCarry.zeros(B, sp2), sp2, max_iter=15,
                       knot_block=16, interpret=True)
    sp_full = pad_stream_problem(problem.replace(Xref=Xref2), cache)
    want = stream_solve(x0s, StreamCarry.zeros(B, sp_full), sp_full,
                        max_iter=15, knot_block=16, interpret=True)
    # device-side f32 qc/pterm build vs the host float64 build: ~1 ulp in the
    # operands, a few 1e-6 after 15 iterations
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.U), rtol=0, atol=1e-5
    )
    # and both match the scan tier on the shifted problem
    w = _run_scan(problem.replace(Xref=Xref2), cache, x0s, 15)
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(w.u), rtol=0, atol=1e-5
    )


def test_stream_cones_parity(setup):
    """In-kernel SOC projection at long horizon: streaming tier matches the
    scan tier's cone path (input + state cones, N=64)."""
    from accelerated_tinympc_tpu.solver.cones import (
        Cone, ConeSet, cone_slack_update,
    )

    problem, cache, sp, x0s = setup
    cones = ConeSet(
        input_cones=(Cone(ball=(0,), axis=1, mu=0.8, shift=1.0),),
        state_cones=(Cone(ball=(0, 1), axis=2, mu=2.0, shift=3.0),),
    )
    res = stream_solve(
        x0s, StreamCarry.zeros(B, sp), sp, max_iter=30, interpret=True,
        cones=cones,
    )
    st = init_state_batched(B, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, problem, cache,
        atm.Settings(max_iter=30, check_termination=0),
        project=cone_slack_update(cones),
    ))(st)
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.X), np.asarray(want.x), rtol=0, atol=2e-5
    )


def test_sharded_stream_solve(setup):
    """Streaming kernel per shard over an 8-device mesh: sharded ==
    unsharded per-instance numerics; shared operands replicate."""
    from accelerated_tinympc_tpu.ops.stream_admm import LANES
    from accelerated_tinympc_tpu.parallel import (
        make_batch_mesh, replicate, shard_batch, sharded_stream_solve,
    )

    problem, cache, sp, _ = setup
    nd = 8
    Bn = LANES * nd
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.standard_normal((Bn, NX)) * 0.5, jnp.float32)
    carry = StreamCarry.zeros(Bn, sp)
    want = stream_solve(x0s, carry, sp, max_iter=8, interpret=True)

    mesh = make_batch_mesh(nd)
    solve = sharded_stream_solve(mesh, max_iter=8, interpret=True)
    got, stats = solve(
        shard_batch(x0s, mesh), shard_batch(carry, mesh),
        replicate(sp, mesh),
    )
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.U), rtol=0, atol=1e-6
    )
    assert float(stats["n_total"]) == Bn


def _adaptive_setup(setup, B2=12, seed=9):
    problem, cache, sp, _ = setup
    rng = np.random.default_rng(seed)
    scale = np.repeat([0.05, 0.4, 2.0], B2 // 3)[:, None]
    x0s = jnp.asarray(scale * rng.standard_normal((B2, NX)), jnp.float32)
    return problem, cache, sp, x0s, B2


def test_adaptive_freeze_vs_scan(setup):
    """In-kernel per-instance early termination: iteration counts, solved
    flags and all frozen iterates match the scan tier's freeze semantics
    (reference early exit admm.cpp:135-144 skips slack-save + backward;
    solver/batched.py reproduces it exactly, and the streaming adaptive
    kernel's masked write-back must too)."""
    problem, cache, sp, x0s, B2 = _adaptive_setup(setup)
    res = stream_solve(
        x0s, StreamCarry.zeros(B2, sp), sp, max_iter=60,
        check_termination=5, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
        knot_block=16, interpret=True,
    )
    st = init_state_batched(B2, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, problem, cache,
        atm.Settings(max_iter=60, check_termination=5,
                     abs_pri_tol=5e-3, abs_dua_tol=5e-3),
    ))(st)
    np.testing.assert_array_equal(
        np.asarray(res.stats[:, 0]).astype(int), np.asarray(want.iter)
    )
    from accelerated_tinympc_tpu.types import SOLVED

    np.testing.assert_array_equal(
        np.asarray(res.stats[:, 1]) > 0.5, np.asarray(want.status) == SOLVED
    )
    assert len(np.unique(np.asarray(want.iter))) > 2, "no termination spread"
    # Cross-graph XLA-CPU FMA contraction drifts ~4e-5 on the hard
    # cold-start transients (CLAUDE.md interpret-vs-chip lesson); the
    # schedule equality above is the exact contract, iterates at the
    # project's 1e-4 parity bar.
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.X), np.asarray(want.x), rtol=0, atol=1e-4
    )
    # The full warm-start carry is frozen too (workspace persistence).
    from accelerated_tinympc_tpu.ops.stream_admm import _unpack

    for pk, wv in ((res.carry.z, want.z), (res.carry.v, want.v),
                   (res.carry.y, want.y), (res.carry.g, want.g),
                   (res.carry.d, want.d)):
        got = _unpack(pk, B2, wv.shape[-1])[:, : wv.shape[1]]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(wv), rtol=0, atol=1e-4
        )
    # Recorded residuals match the scan tier's at the exit check.
    for row, field in ((2, want.primal_residual_state),
                       (3, want.dual_residual_state),
                       (4, want.primal_residual_input),
                       (5, want.dual_residual_input)):
        # Residuals are differences of near-equal quantities — the ~1e-5
        # cross-graph drift is relatively amplified here; exactness is
        # pinned by the schedule equality above and the on-chip bit checks.
        np.testing.assert_allclose(
            np.asarray(res.stats[:, row]), np.asarray(field),
            rtol=1e-3, atol=1e-5,
        )


def test_adaptive_per_count_parity(setup):
    """Each instance's trajectories equal a fixed-iteration streaming solve
    of its recorded count (the cascade contract, now at per-iteration
    granularity inside one kernel dispatch)."""
    problem, cache, sp, x0s, B2 = _adaptive_setup(setup)
    res = stream_solve(
        x0s, StreamCarry.zeros(B2, sp), sp, max_iter=60,
        check_termination=5, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
        knot_block=16, interpret=True,
    )
    iters = np.asarray(res.stats[:, 0]).astype(int)
    assert len(np.unique(iters)) > 1
    for k in np.unique(iters):
        want = stream_solve(
            x0s, StreamCarry.zeros(B2, sp), sp, max_iter=int(k),
            knot_block=16, interpret=True,
        )
        sel = iters == k
        # Same kernel arithmetic; interpret-mode XLA-CPU FMA contraction
        # differs per graph shape (CLAUDE.md) — bit-exactness is pinned on
        # chip (tools/check_stream_adaptive_chip.py), 1e-6 here.
        np.testing.assert_allclose(
            np.asarray(res.U)[sel], np.asarray(want.U)[sel],
            rtol=0, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(res.X)[sel], np.asarray(want.X)[sel],
            rtol=0, atol=1e-6,
        )


def test_adaptive_knot_block_invariance(setup):
    """Adaptive results are independent of the streaming block size,
    including every recorded iteration count."""
    problem, cache, sp, x0s, B2 = _adaptive_setup(setup)
    outs = [
        stream_solve(
            x0s, StreamCarry.zeros(B2, sp), sp, max_iter=60,
            check_termination=5, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
            knot_block=kb, interpret=True,
        )
        for kb in (8, 16, 64)
    ]
    for o in outs[1:]:
        np.testing.assert_array_equal(
            np.asarray(outs[0].stats[:, 0]), np.asarray(o.stats[:, 0])
        )
        np.testing.assert_allclose(
            np.asarray(outs[0].U), np.asarray(o.U), rtol=0, atol=1e-6
        )


def test_adaptive_warm_start(setup):
    """Adaptive solves compose with the warm-start carry: a fixed prefix
    followed by an adaptive solve matches the scan tier given the same
    prefix (workspace persistence, reference tiny_wrapper.cpp)."""
    problem, cache, sp, x0s, B2 = _adaptive_setup(setup)
    a = stream_solve(x0s, StreamCarry.zeros(B2, sp), sp, max_iter=7,
                     knot_block=16, interpret=True)
    b = stream_solve(x0s, a.carry, sp, max_iter=40, check_termination=5,
                     abs_pri_tol=5e-3, abs_dua_tol=5e-3, knot_block=16,
                     interpret=True)
    st = _run_scan(problem, cache, x0s, 7)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, problem, cache,
        atm.Settings(max_iter=40, check_termination=5,
                     abs_pri_tol=5e-3, abs_dua_tol=5e-3),
    ))(st)
    np.testing.assert_array_equal(
        np.asarray(b.stats[:, 0]).astype(int), np.asarray(want.iter)
    )
    np.testing.assert_allclose(
        np.asarray(b.U), np.asarray(want.u), rtol=0, atol=1e-4
    )


def test_adaptive_cones(setup):
    """Adaptive + SOC cones: frozen-lane semantics hold with the in-kernel
    cone projection active."""
    from accelerated_tinympc_tpu.solver.cones import (
        Cone, ConeSet, cone_slack_update,
    )

    problem, cache, sp, x0s, B2 = _adaptive_setup(setup)
    cones = ConeSet(
        input_cones=(Cone(ball=(0,), axis=1, mu=0.8, shift=1.0),),
        state_cones=(Cone(ball=(0, 1), axis=2, mu=2.0, shift=3.0),),
    )
    res = stream_solve(
        x0s, StreamCarry.zeros(B2, sp), sp, max_iter=60,
        check_termination=5, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
        knot_block=16, interpret=True, cones=cones,
    )
    st = init_state_batched(B2, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, problem, cache,
        atm.Settings(max_iter=60, check_termination=5,
                     abs_pri_tol=5e-3, abs_dua_tol=5e-3),
        project=cone_slack_update(cones),
    ))(st)
    np.testing.assert_array_equal(
        np.asarray(res.stats[:, 0]).astype(int), np.asarray(want.iter)
    )
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=1e-4
    )


def test_sharded_stream_adaptive(setup):
    """Adaptive kernel per shard over an 8-device mesh: per-instance
    schedules and iterates match the unsharded adaptive solve exactly
    (each device's tiles run their own while_loop — no cross-device
    synchronization in the iteration loop)."""
    from accelerated_tinympc_tpu.ops.stream_admm import LANES
    from accelerated_tinympc_tpu.parallel import (
        make_batch_mesh, replicate, shard_batch, sharded_stream_solve,
    )

    problem, cache, sp, _ = setup
    nd = 8
    Bn = LANES * nd
    rng = np.random.default_rng(4)
    scale = np.repeat([0.05, 0.4, 2.0], -(-Bn // 3))[:Bn, None]
    x0s = jnp.asarray(scale * rng.standard_normal((Bn, NX)), jnp.float32)
    carry = StreamCarry.zeros(Bn, sp)
    want = stream_solve(
        x0s, carry, sp, max_iter=30, check_termination=5,
        abs_pri_tol=5e-3, abs_dua_tol=5e-3, interpret=True,
    )
    mesh = make_batch_mesh(nd)
    solve = sharded_stream_solve(
        mesh, max_iter=30, check_termination=5,
        abs_pri_tol=5e-3, abs_dua_tol=5e-3, interpret=True,
    )
    got, stats = solve(
        shard_batch(x0s, mesh), shard_batch(carry, mesh),
        replicate(sp, mesh),
    )
    np.testing.assert_array_equal(
        np.asarray(got.stats[:, 0]), np.asarray(want.stats[:, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(got.stats[:, 1]), np.asarray(want.stats[:, 1])
    )
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.U), rtol=0, atol=1e-6
    )
    assert float(stats["n_total"]) == Bn


def test_stream_cascade_inkernel(setup):
    """The composition: adaptive segments (in-kernel per-instance freeze)
    + cross-tile survivor compaction equals ONE long adaptive call —
    iteration counts, solved flags, trajectories, the full warm-start
    carry and the recorded residuals, all bit-exact (the freeze preserves
    the exact early-exit state, so segment boundaries at check multiples
    are invisible)."""
    from accelerated_tinympc_tpu.solver.cascade import stream_cascade_solve

    problem, cache, sp, x0s, B2 = _adaptive_setup(setup)
    one = stream_solve(
        x0s, StreamCarry.zeros(B2, sp), sp, max_iter=60,
        check_termination=5, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
        knot_block=16, interpret=True,
    )
    U, X, stats, carry = stream_cascade_solve(
        x0s, StreamCarry.zeros(B2, sp), sp, max_iter=60, segment_iters=10,
        check_termination=5, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
        knot_block=16, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(stats[:, 0]), np.asarray(one.stats[:, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(stats[:, 1]), np.asarray(one.stats[:, 1])
    )
    np.testing.assert_array_equal(np.asarray(U), np.asarray(one.U))
    np.testing.assert_array_equal(np.asarray(X), np.asarray(one.X))
    for name in ("d", "y", "g", "z", "v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(carry, name)),
            np.asarray(getattr(one.carry, name)),
        )
    np.testing.assert_array_equal(
        np.asarray(stats[:, 2:6]), np.asarray(one.stats[:, 2:6])
    )


def test_stream_cascade_inkernel_cadence_validation(setup):
    """segment_iters must be a multiple of check_termination in in-kernel
    mode (segment-local check cadence must compose to the global one)."""
    from accelerated_tinympc_tpu.solver.cascade import stream_cascade_solve

    problem, cache, sp, x0s = setup
    with pytest.raises(ValueError, match="multiple of check_termination"):
        stream_cascade_solve(
            x0s, StreamCarry.zeros(B, sp), sp, max_iter=60,
            segment_iters=12, check_termination=5, interpret=True,
        )


def test_stream_cascade(setup):
    """Segment-level early termination for the streaming tier: every
    instance's controls are BIT-exact against a fixed-iteration solve of
    its recorded iteration count (segments compose exactly through the
    carry), and stragglers run to max_iter."""
    from accelerated_tinympc_tpu.solver.cascade import stream_cascade_solve

    problem, cache, sp, _ = setup
    rng = np.random.default_rng(9)
    B2 = 12
    scale = np.repeat([0.05, 0.4, 2.0], B2 // 3)[:, None]
    x0s = jnp.asarray(
        scale * rng.standard_normal((B2, NX)), jnp.float32
    )
    carry = StreamCarry.zeros(B2, sp)
    U, X, stats, carry_out = stream_cascade_solve(
        x0s, carry, sp, max_iter=60, segment_iters=10,
        abs_pri_tol=5e-3, abs_dua_tol=5e-3, interpret=True,
    )
    stats = np.asarray(stats)
    iters = stats[:, 0].astype(int)
    assert set(np.unique(iters)).issubset({10, 20, 30, 40, 50, 60})
    assert len(np.unique(iters)) > 1, "no early-termination spread"
    # Bit-exactness per recorded count.
    for k in np.unique(iters):
        want = stream_solve(
            x0s, StreamCarry.zeros(B2, sp), sp, max_iter=int(k),
            interpret=True,
        )
        sel = iters == k
        np.testing.assert_array_equal(
            np.asarray(U)[sel], np.asarray(want.U)[sel]
        )
        np.testing.assert_array_equal(
            np.asarray(X)[sel], np.asarray(want.X)[sel]
        )
    # Solved flags consistent with the residual predicate at the exit.
    solved = stats[:, 1] > 0.5
    ok = (stats[:, 2] < 5e-3) & (stats[:, 4] < 5e-3) \
        & (stats[:, 3] < 5e-3) & (stats[:, 5] < 5e-3)
    np.testing.assert_array_equal(solved, ok)
