"""Heterogeneous-streaming tier (per-instance plants at long horizons) vs
the vmapped scan tier, via the Pallas interpreter on CPU (SURVEY.md §4:
kernel paths must be testable without a TPU). The kernel shares the
reference iteration's arithmetic order (reference: src/tinympc/admm.cpp:111-152)
crossed with per-instance plants (tiny_wrapper.hpp:6 one-problem-per-process,
run as a fleet)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.ops.hstream_admm import (
    gather_hstream,
    hstream_carry_zeros,
    hstream_solve,
    pad_hstream_from_plants,
    pad_hstream_problem,
)
from accelerated_tinympc_tpu.precompute import riccati_cache
from accelerated_tinympc_tpu.solver.batched import (
    init_state_batched,
    solve_batched,
)
from accelerated_tinympc_tpu.types import Problem

NX, NU, N = 6, 2, 64
B = 5


def _make_fleet(n=N, batch=B, nx=NX, nu=NU, bound=0.7):
    """batch distinct random plants as batch-leading Problem/Cache pytrees."""
    problems, caches = [], []
    for seed in range(batch):
        rng = np.random.default_rng(seed)
        A = np.eye(nx) + 0.02 * rng.standard_normal((nx, nx))
        Bm = 0.2 * rng.standard_normal((nx, nu))
        Q = np.abs(rng.standard_normal(nx)) + 1.0
        R = np.abs(rng.standard_normal(nu)) + 1.0
        caches.append(riccati_cache(A, Bm, Q, R, rho=1.0 + 0.5 * seed))
        problems.append(Problem(
            A=jnp.asarray(A, jnp.float32), B=jnp.asarray(Bm, jnp.float32),
            Q=jnp.asarray(Q, jnp.float32), R=jnp.asarray(R, jnp.float32),
            u_min=jnp.full((n - 1, nu), -bound, jnp.float32),
            u_max=jnp.full((n - 1, nu), bound, jnp.float32),
            x_min=jnp.full((n, nx), -4.0, jnp.float32),
            x_max=jnp.full((n, nx), 4.0, jnp.float32),
            Xref=jnp.zeros((n, nx), jnp.float32),
            Uref=jnp.zeros((n - 1, nu), jnp.float32),
        ))
    prob_b = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)
    cache_b = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *caches
    )
    return prob_b, cache_b


def _run_scan(prob_b, cache_b, x0s, max_iter):
    st = init_state_batched(x0s.shape[0], NX, NU, int(prob_b.Xref.shape[1]))
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    return jax.jit(lambda s: solve_batched(
        s, prob_b, cache_b,
        atm.Settings(max_iter=max_iter, check_termination=0),
        problem_axes=0, cache_axes=0,
    ))(st)


@pytest.fixture(scope="module")
def setup():
    prob_b, cache_b = _make_fleet()
    hsp = pad_hstream_problem(prob_b, cache_b)
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.standard_normal((B, NX)) * 0.5, jnp.float32)
    return prob_b, cache_b, hsp, x0s


def test_fixed_parity(setup):
    """Distinct plant per instance at N=64: controls/trajectories match the
    vmapped scan tier (problem_axes=0) to f32 parity."""
    prob_b, cache_b, hsp, x0s = setup
    res = hstream_solve(x0s, hstream_carry_zeros(B, hsp), hsp,
                        max_iter=20, knot_block=16, interpret=True)
    want = _run_scan(prob_b, cache_b, x0s, 20)
    # atol 1e-4 (the project parity bar): the kernel's tree-accumulated
    # per-lane matvecs (_dotb) round differently from the scan tier's
    # matmuls; drift compounds over the iterations.
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.X), np.asarray(want.x), rtol=0, atol=1e-4
    )


def test_long_horizon_parity():
    """VERDICT r3 item 1's bar: N >= 256 fleet solves matching the vmapped
    scan tier. Run at f64 (stronger than the f32 bar): cold-start transients
    at long horizons legitimately reach O(1e3+) magnitudes in the first few
    iterations, where f32 last-ulp reassociation noise (knot-block-dependent
    FMA contraction on the CPU backend) amplifies through the clip
    boundaries — at f64 the parity is exact to 1e-9 and pins the semantics."""
    n = 256
    with jax.enable_x64(True):
        prob_b, cache_b = _make_fleet(n=n, batch=3)
        prob_b = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), prob_b)
        cache_b = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), cache_b)
        hsp = pad_hstream_problem(prob_b, cache_b, dtype=jnp.float64)
        rng = np.random.default_rng(2)
        x0s = jnp.asarray(rng.standard_normal((3, NX)) * 0.5, jnp.float64)
        from accelerated_tinympc_tpu.ops.stream_admm import StreamCarry

        res = hstream_solve(x0s, StreamCarry.zeros(3, hsp, jnp.float64), hsp,
                            max_iter=5, knot_block=32, interpret=True)
        st = init_state_batched(3, NX, NU, n, jnp.float64)
        st = st.replace(x=st.x.at[:, 0, :].set(x0s))
        want = jax.jit(lambda s: solve_batched(
            s, prob_b, cache_b,
            atm.Settings(max_iter=5, check_termination=0),
            problem_axes=0, cache_axes=0,
        ))(st)
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=1e-9
    )


def test_adaptive_freeze_vs_scan():
    """In-kernel per-instance early termination for per-instance plants at
    streaming horizons: iteration counts and solved flags match the scan
    tier's freeze exactly (reference early exit admm.cpp:135-144); iterates
    at 1e-3 (per-lane FMA-tree interpret drift on hard 60-iteration
    transients — exactness pinned at f64 below and on chip)."""
    from accelerated_tinympc_tpu.types import SOLVED

    B2 = 12
    prob_b, cache_b = _make_fleet(batch=B2)
    hsp = pad_hstream_problem(prob_b, cache_b)
    rng = np.random.default_rng(1)
    scale = np.repeat([0.05, 0.4, 2.0], B2 // 3)[:, None]
    x0s = jnp.asarray(scale * rng.standard_normal((B2, NX)), jnp.float32)
    res = hstream_solve(
        x0s, hstream_carry_zeros(B2, hsp), hsp, max_iter=60,
        check_termination=5, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
        knot_block=16, interpret=True,
    )
    st = init_state_batched(B2, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, prob_b, cache_b,
        atm.Settings(max_iter=60, check_termination=5,
                     abs_pri_tol=5e-3, abs_dua_tol=5e-3),
        problem_axes=0, cache_axes=0,
    ))(st)
    iters = np.asarray(res.stats[:, 0]).astype(int)
    np.testing.assert_array_equal(iters, np.asarray(want.iter))
    assert len(np.unique(iters)) > 2, "no termination spread"
    np.testing.assert_array_equal(
        np.asarray(res.stats[:, 1]) > 0.5, np.asarray(want.status) == SOLVED
    )
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res.X), np.asarray(want.x), rtol=0, atol=1e-3
    )


def test_adaptive_big_knot_block_capped():
    """Requesting a large knot_block in adaptive mode is clamped to the
    adaptive 128-sublane cap (the interpret-mode reassociation anomaly's
    onset is one octave earlier for the adaptive kernel's larger graphs —
    see the cap comment in hstream_solve): schedules still match the scan
    freeze exactly."""
    from accelerated_tinympc_tpu.types import SOLVED

    B2 = 6
    prob_b, cache_b = _make_fleet(batch=B2)
    hsp = pad_hstream_problem(prob_b, cache_b)
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.standard_normal((B2, NX)) * 0.4, jnp.float32)
    res = hstream_solve(
        x0s, hstream_carry_zeros(B2, hsp), hsp, max_iter=40,
        check_termination=5, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
        knot_block=64, interpret=True,   # clamped to 16 at SX=SU=8
    )
    st = init_state_batched(B2, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, prob_b, cache_b,
        atm.Settings(max_iter=40, check_termination=5,
                     abs_pri_tol=5e-3, abs_dua_tol=5e-3),
        problem_axes=0, cache_axes=0,
    ))(st)
    np.testing.assert_array_equal(
        np.asarray(res.stats[:, 0]).astype(int), np.asarray(want.iter)
    )
    np.testing.assert_array_equal(
        np.asarray(res.stats[:, 1]) > 0.5, np.asarray(want.status) == SOLVED
    )


def test_adaptive_f64_exact():
    """The adaptive kernel's exactness contract at f64 (the established
    pin for this kernel family): schedules equal the f64 scan freeze, and
    each instance's trajectories equal a fixed-iteration hstream solve of
    its recorded count to 1e-9 (freeze = pre-backward d / pre-save slacks /
    advanced duals, admm.cpp:135-144)."""
    from accelerated_tinympc_tpu.ops.stream_admm import StreamCarry

    B2 = 9
    with jax.enable_x64(True):
        prob_b, cache_b = _make_fleet(batch=B2)
        prob_b = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), prob_b)
        cache_b = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64), cache_b
        )
        hsp = pad_hstream_problem(prob_b, cache_b, dtype=jnp.float64)
        rng = np.random.default_rng(3)
        scale = np.repeat([0.05, 0.4, 2.0], B2 // 3)[:, None]
        x0s = jnp.asarray(
            scale * rng.standard_normal((B2, NX)), jnp.float64
        )
        res = hstream_solve(
            x0s, StreamCarry.zeros(B2, hsp, jnp.float64), hsp,
            max_iter=40, check_termination=5,
            abs_pri_tol=5e-3, abs_dua_tol=5e-3,
            knot_block=16, interpret=True,
        )
        st = init_state_batched(B2, NX, NU, N, jnp.float64)
        st = st.replace(x=st.x.at[:, 0, :].set(x0s))
        want = jax.jit(lambda s: solve_batched(
            s, prob_b, cache_b,
            atm.Settings(max_iter=40, check_termination=5,
                         abs_pri_tol=5e-3, abs_dua_tol=5e-3),
            problem_axes=0, cache_axes=0,
        ))(st)
        iters = np.asarray(res.stats[:, 0]).astype(int)
        np.testing.assert_array_equal(iters, np.asarray(want.iter))
        assert len(np.unique(iters)) > 1
        for k in np.unique(iters):
            fixed = hstream_solve(
                x0s, StreamCarry.zeros(B2, hsp, jnp.float64), hsp,
                max_iter=int(k), knot_block=16, interpret=True,
            )
            sel = iters == k
            np.testing.assert_allclose(
                np.asarray(res.U)[sel], np.asarray(fixed.U)[sel],
                rtol=0, atol=1e-9,
            )
            np.testing.assert_allclose(
                np.asarray(res.X)[sel], np.asarray(fixed.X)[sel],
                rtol=0, atol=1e-9,
            )


def test_residual_stats(setup):
    """Final-iteration residuals match the reference definitions
    (admm.cpp:95-98: pre-projection iterates vs new slacks; old-vs-new
    slacks scaled by each instance's own rho)."""
    prob_b, cache_b, hsp, x0s = setup
    res = hstream_solve(x0s, hstream_carry_zeros(B, hsp), hsp,
                        max_iter=12, knot_block=16, interpret=True)
    w_prev, w_fin = (_run_scan(prob_b, cache_b, x0s, n) for n in (11, 12))
    rho = np.asarray(cache_b.rho).reshape(B)
    for i in range(B):
        want = np.asarray([
            jnp.max(jnp.abs(w_fin.x[i] - w_fin.vnew[i])),
            jnp.max(jnp.abs(w_prev.v[i] - w_fin.vnew[i])) * rho[i],
            jnp.max(jnp.abs(w_fin.u[i] - w_fin.znew[i])),
            jnp.max(jnp.abs(w_prev.z[i] - w_fin.znew[i])) * rho[i],
        ])
        # atol 5e-5: _dotb tree accumulation vs the scan tier.
        np.testing.assert_allclose(
            np.asarray(res.stats[i, 2:6]), want, rtol=0, atol=5e-5
        )
    assert np.all(np.asarray(res.stats[:, 0]) == 12)


def test_warm_start_chain(setup):
    """Two chained 6-iteration solves == one 12-iteration solve (the carry
    holds the full iterate set; reference workspace persistence)."""
    prob_b, cache_b, hsp, x0s = setup
    r1 = hstream_solve(x0s, hstream_carry_zeros(B, hsp), hsp,
                       max_iter=6, knot_block=16, interpret=True)
    r2 = hstream_solve(x0s, r1.carry, hsp,
                       max_iter=6, knot_block=16, interpret=True)
    ref = hstream_solve(x0s, hstream_carry_zeros(B, hsp), hsp,
                        max_iter=12, knot_block=16, interpret=True)
    # atol 5e-5 (as test_hetero's handoff check): iterations 5-6 run in
    # final-phase form in the chained run but in-loop plain form in the
    # 12-run; XLA CPU FMA-contracts the two graphs differently.
    np.testing.assert_allclose(
        np.asarray(r2.U), np.asarray(ref.U), rtol=0, atol=5e-5
    )


def test_knot_block_invariance(setup):
    """The streaming block size is pure tiling: at f64, results agree to
    1e-9 across block sizes (reassociation-level rounding only; at f32 the
    same noise amplifies through clip boundaries on cold-start transients).
    Block sizes above the 256-sublane cap are clamped by hstream_solve —
    see the cap comment there; tools/tpu_check_hstream.py re-checks
    invariance on the real chip."""
    from accelerated_tinympc_tpu.ops.stream_admm import StreamCarry

    prob_b, cache_b, hsp, x0s = setup
    with jax.enable_x64(True):
        prob64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), prob_b)
        cache64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), cache_b)
        hsp64 = pad_hstream_problem(prob64, cache64, dtype=jnp.float64)
        x64 = jnp.asarray(x0s, jnp.float64)
        rs = [
            hstream_solve(x64, StreamCarry.zeros(B, hsp64, jnp.float64),
                          hsp64, max_iter=8, knot_block=kb, interpret=True)
            for kb in (4, 8, 16, 32)
        ]
    for r in rs[1:]:
        np.testing.assert_allclose(np.asarray(rs[0].U), np.asarray(r.U),
                                   rtol=0, atol=1e-9)


def test_on_device_build(setup):
    """pad_hstream_from_plants (vmapped Riccati on CPU) matches the
    host-f64-cache packing to f32 tolerance."""
    prob_b, cache_b, hsp, x0s = setup
    rho = jnp.asarray([1.0 + 0.5 * s for s in range(B)], jnp.float32)
    hsp_dev, _ = jax.jit(
        lambda: pad_hstream_from_plants(
            prob_b.A, prob_b.B, prob_b.Q, prob_b.R, rho, prob_b,
            riccati="vmap",
        )
    )()
    res = hstream_solve(x0s, hstream_carry_zeros(B, hsp_dev), hsp_dev,
                        max_iter=12, knot_block=16, interpret=True)
    want = hstream_solve(x0s, hstream_carry_zeros(B, hsp), hsp,
                         max_iter=12, knot_block=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.U), rtol=0, atol=5e-4
    )


def test_per_knot_bound_schedules():
    """Per-instance per-knot bound schedules stream alongside the knot
    blocks (hsp.u_min_k/... operands); parity vs the scan tier, which takes
    the same (B, knots, k) bounds natively."""
    n, batch = 32, 3
    prob_b, cache_b = _make_fleet(n=n, batch=batch)
    hsp_uniform = pad_hstream_problem(prob_b, cache_b)
    rng = np.random.default_rng(7)
    # ramp the input box tighter over the horizon, differently per instance,
    # and pinch a state-bound window mid-horizon
    u_lim = 0.7 - 0.5 * np.linspace(0, 1, n - 1)[None, :, None] \
        * (1.0 + 0.3 * rng.standard_normal((batch, 1, 1)))
    x_lim = np.full((batch, n, NX), 4.0)
    x_lim[:, n // 2: n // 2 + 4, :] = 0.8
    prob_b = prob_b.replace(
        u_min=jnp.asarray(-u_lim, jnp.float32),
        u_max=jnp.asarray(u_lim, jnp.float32),
        x_min=jnp.asarray(-x_lim, jnp.float32),
        x_max=jnp.asarray(x_lim, jnp.float32),
    )
    hsp = pad_hstream_problem(prob_b, cache_b)
    assert hsp.u_min_k is not None and hsp.x_max_k is not None
    x0s = jnp.asarray(rng.standard_normal((batch, NX)) * 0.5, jnp.float32)
    res = hstream_solve(x0s, hstream_carry_zeros(batch, hsp), hsp,
                        max_iter=15, knot_block=8, interpret=True)
    st = init_state_batched(batch, NX, NU, n)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, prob_b, cache_b,
        atm.Settings(max_iter=15, check_termination=0),
        problem_axes=0, cache_axes=0,
    ))(st)
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=1e-4
    )
    # the schedule must actually bind (otherwise this tests nothing): the
    # tight mid-horizon state window forces controls away from the
    # uniform-bound solution
    loose = hstream_solve(
        x0s, hstream_carry_zeros(batch, hsp_uniform), hsp_uniform,
        max_iter=15, knot_block=8, interpret=True)
    assert float(np.abs(np.asarray(res.U) - np.asarray(loose.U)).max()) > 1e-3


def test_gather_hstream(setup):
    """Compaction primitive: gathering a subset re-packs problem + carry so
    a re-dispatched solve equals the original instances' continuation."""
    from accelerated_tinympc_tpu.ops.hetero_admm import LANES

    prob_b, cache_b, hsp, x0s = setup
    r1 = hstream_solve(x0s, hstream_carry_zeros(B, hsp), hsp,
                       max_iter=5, knot_block=16, interpret=True)
    keep = np.array([3, 1], np.int32)
    idx = np.concatenate([keep, np.full(LANES - 2, 3, np.int32)])
    hsp2, carry2, x02 = gather_hstream(hsp, r1.carry, x0s, jnp.asarray(idx))
    r2 = hstream_solve(x02, carry2, hsp2,
                       max_iter=5, knot_block=16, interpret=True)
    ref = hstream_solve(x0s, r1.carry, hsp,
                        max_iter=5, knot_block=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(r2.U[:2]), np.asarray(ref.U)[keep], rtol=0, atol=1e-6
    )


def test_hstream_cones_parity(setup):
    """Static SOC cones in the streaming hetero kernel match the scan tier's
    cone path on distinct plants."""
    from accelerated_tinympc_tpu.solver.cones import (
        Cone, ConeSet, cone_slack_update,
    )

    prob_b, cache_b, hsp, x0s = setup
    cones = ConeSet(input_cones=(Cone(ball=(0,), axis=1, mu=0.9,
                                      shift=1.0),))
    res = hstream_solve(x0s, hstream_carry_zeros(B, hsp), hsp,
                        max_iter=15, knot_block=16, interpret=True,
                        cones=cones)
    st = init_state_batched(B, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, prob_b, cache_b,
        atm.Settings(max_iter=15, check_termination=0),
        problem_axes=0, cache_axes=0,
        project=cone_slack_update(cones),
    ))(st)
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=1e-4
    )


def test_hstream_cascade_inkernel():
    """Adaptive segments + plant-aware compaction equals one long adaptive
    hstream call: schedules/flags exact; iterates pinned at f64 (this
    family's exactness convention — per-lane FMA-tree interpret drift at
    f32)."""
    from accelerated_tinympc_tpu.ops.stream_admm import StreamCarry
    from accelerated_tinympc_tpu.solver.cascade import hstream_cascade_solve

    B2 = 9
    with jax.enable_x64(True):
        prob_b, cache_b = _make_fleet(batch=B2)
        prob_b = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), prob_b)
        cache_b = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64), cache_b
        )
        hsp = pad_hstream_problem(prob_b, cache_b, dtype=jnp.float64)
        rng = np.random.default_rng(3)
        scale = np.repeat([0.05, 0.4, 2.0], B2 // 3)[:, None]
        x0s = jnp.asarray(
            scale * rng.standard_normal((B2, NX)), jnp.float64
        )
        one = hstream_solve(
            x0s, StreamCarry.zeros(B2, hsp, jnp.float64), hsp, max_iter=40,
            check_termination=5, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
            knot_block=16, interpret=True,
        )
        U, X, stats, carry = hstream_cascade_solve(
            x0s, StreamCarry.zeros(B2, hsp, jnp.float64), hsp, max_iter=40,
            segment_iters=10, check_termination=5,
            abs_pri_tol=5e-3, abs_dua_tol=5e-3,
            knot_block=16, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(stats[:, 0]), np.asarray(one.stats[:, 0])
        )
        np.testing.assert_array_equal(
            np.asarray(stats[:, 1]), np.asarray(one.stats[:, 1])
        )
        np.testing.assert_allclose(
            np.asarray(U), np.asarray(one.U), rtol=0, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(X), np.asarray(one.X), rtol=0, atol=1e-9
        )
        for name in ("d", "y", "g", "z", "v"):
            np.testing.assert_allclose(
                np.asarray(getattr(carry, name)),
                np.asarray(getattr(one.carry, name)), rtol=0, atol=1e-9,
            )


def test_hstream_cascade(setup):
    """Segment-level early termination for the hetero-streaming tier
    (VERDICT r3 item 1): at f64 (removing the f32 segment-handoff FMA
    noise the warm-start test documents), iteration schedules AND controls
    match a fixed-iteration solve of each instance's recorded count to
    1e-9; stragglers run to max_iter; the survivors' plant tensors travel
    with them through compactions."""
    from accelerated_tinympc_tpu.ops.stream_admm import StreamCarry
    from accelerated_tinympc_tpu.solver.cascade import hstream_cascade_solve

    prob_b, cache_b, _hsp, _x0s = setup
    with jax.enable_x64(True):
        prob64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), prob_b)
        cache64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                               cache_b)
        hsp = pad_hstream_problem(prob64, cache64, dtype=jnp.float64)
        rng = np.random.default_rng(9)
        scale = np.array([0.02, 0.02, 0.5, 2.5, 2.5])[:, None]
        x0s = jnp.asarray(scale * rng.standard_normal((B, NX)), jnp.float64)
        U, X, stats, carry_out = hstream_cascade_solve(
            x0s, StreamCarry.zeros(B, hsp, jnp.float64), hsp,
            max_iter=40, segment_iters=10, segment_growth=1.0,
            knot_block=16, abs_pri_tol=5e-3, abs_dua_tol=5e-3,
            interpret=True,
        )
        stats = np.asarray(stats)
        iters = stats[:, 0].astype(int)
        assert set(np.unique(iters)).issubset({10, 20, 30, 40})
        assert len(np.unique(iters)) > 1, "no early-termination spread"
        for k in np.unique(iters):
            want = hstream_solve(
                x0s, StreamCarry.zeros(B, hsp, jnp.float64), hsp,
                max_iter=int(k), knot_block=16, interpret=True,
            )
            sel = iters == k
            np.testing.assert_allclose(np.asarray(U)[sel],
                                       np.asarray(want.U)[sel],
                                       rtol=0, atol=1e-9)
            np.testing.assert_allclose(np.asarray(X)[sel],
                                       np.asarray(want.X)[sel],
                                       rtol=0, atol=1e-9)
    solved = stats[:, 1] > 0.5
    ok = (stats[:, 2] < 5e-3) & (stats[:, 4] < 5e-3) \
        & (stats[:, 3] < 5e-3) & (stats[:, 5] < 5e-3)
    np.testing.assert_array_equal(solved, ok)


def test_sharded_hstream_solve(setup):
    """Hetero-streaming kernel per shard over an 8-device mesh: batch AND
    plants shard on the lane-tile axis; sharded == unsharded per-instance
    numerics; residual stats psum'd."""
    from accelerated_tinympc_tpu.ops.hetero_admm import LANES
    from accelerated_tinympc_tpu.parallel import (
        make_batch_mesh, shard_batch, sharded_hstream_solve,
    )

    nd = 8
    Bn = LANES * nd
    prob_s, cache_s = _make_fleet(n=32, batch=8)
    reps = Bn // 8
    tile = lambda t: jax.tree.map(
        lambda a: jnp.tile(jnp.asarray(a),
                           (reps,) + (1,) * (jnp.asarray(a).ndim - 1)),
        t,
    )
    prob_b, cache_b = tile(prob_s), tile(cache_s)
    hsp = pad_hstream_problem(prob_b, cache_b)
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.standard_normal((Bn, NX)) * 0.5, jnp.float32)
    carry = hstream_carry_zeros(Bn, hsp)
    want = hstream_solve(x0s, carry, hsp, max_iter=6, knot_block=16,
                         interpret=True)

    mesh = make_batch_mesh(nd)
    solve = sharded_hstream_solve(mesh, max_iter=6, knot_block=16,
                                  interpret=True)
    got, stats = solve(
        shard_batch(x0s, mesh), shard_batch(carry, mesh),
        shard_batch(hsp, mesh),
    )
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.U), rtol=0, atol=1e-6
    )
    assert float(stats["n_total"]) == Bn


def test_hstream_ref_vectors_tracking(setup):
    """Per-instance sliding reference windows (long-horizon fleet tracking):
    rebuilding qc/pterm on device for a new window matches a fresh pack."""
    prob_b, cache_b, hsp, x0s = setup
    rng = np.random.default_rng(4)
    Xref2 = jnp.asarray(rng.standard_normal((B, N, NX)) * 0.3, jnp.float32)
    hsp2 = jax.jit(
        lambda: pad_hstream_problem(prob_b.replace(Xref=Xref2), cache_b)
    )()
    from accelerated_tinympc_tpu.ops.hstream_admm import hstream_ref_vectors

    hsp3 = jax.jit(
        lambda: hstream_ref_vectors(hsp, prob_b.Q, cache_b.Pinf, Xref2)
    )()
    np.testing.assert_allclose(np.asarray(hsp3.qc), np.asarray(hsp2.qc),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hsp3.pterm),
                               np.asarray(hsp2.pterm), rtol=0, atol=1e-6)
    r2 = hstream_solve(x0s, hstream_carry_zeros(B, hsp2), hsp2,
                       max_iter=8, knot_block=16, interpret=True)
    r3 = hstream_solve(x0s, hstream_carry_zeros(B, hsp3), hsp3,
                       max_iter=8, knot_block=16, interpret=True)
    np.testing.assert_allclose(np.asarray(r3.U), np.asarray(r2.U),
                               rtol=0, atol=1e-6)


def test_hstream_per_instance_cones():
    """Per-instance cone mu/shift AND ball/axis geometry in the hstream
    kernel (the hetero kernel's lane-packed operands, resident per tile):
    cross-kernel parity vs hetero_solve with identical operands at a
    VMEM-resident horizon, and the overrides demonstrably bind (static-path
    results differ)."""
    from accelerated_tinympc_tpu.ops.hetero_admm import (
        HeteroCarry, hetero_solve, pad_hetero_cone_masks,
        pad_hetero_cone_params, pad_hetero_problem,
    )
    from accelerated_tinympc_tpu.solver.cones import Cone, ConeSet

    n, Bn, nu = 16, 5, 3
    prob_b, cache_b = _make_fleet(n=n, batch=Bn, nu=nu, bound=2.0)
    hsp = pad_hstream_problem(prob_b, cache_b)
    hp = pad_hetero_problem(prob_b, cache_b)
    rng = np.random.default_rng(6)
    x0s = jnp.asarray(rng.standard_normal((Bn, NX)) * 0.8, jnp.float32)

    cones = ConeSet(input_cones=(Cone(ball=(0, 1), axis=2, mu=0.6,
                                      shift=1.5),))
    mu_u = np.linspace(0.3, 1.1, Bn)[None, :]
    sh_u = np.linspace(1.0, 2.0, Bn)[None, :]
    cp = pad_hetero_cone_params(cones, Bn, mu_u=mu_u, shift_u=sh_u)
    ball = np.zeros((Bn, nu), np.float32)
    ball[: Bn // 2, [0, 1]] = 1.0
    ball[Bn // 2:, [1, 2]] = 1.0
    axis = np.full(Bn, 2, np.int64)
    axis[Bn // 2:] = 0
    cm = pad_hetero_cone_masks(cones, Bn, NX, nu,
                               ball_u=[ball], axis_u=[axis])

    kw = dict(max_iter=25, interpret=True)
    r_hs = hstream_solve(x0s, hstream_carry_zeros(Bn, hsp), hsp,
                         knot_block=8, cones=cones, cone_params=cp,
                         cone_masks=cm, **kw)
    r_he = hetero_solve(x0s, HeteroCarry.zeros(hp), hp, cones=cones,
                        cone_params=cp, cone_masks=cm, **kw)
    np.testing.assert_allclose(np.asarray(r_hs.U), np.asarray(r_he.U),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(r_hs.X), np.asarray(r_he.X),
                               rtol=0, atol=5e-5)
    # The per-instance operands bind: static-cone results differ.
    r_static = hstream_solve(x0s, hstream_carry_zeros(Bn, hsp), hsp,
                             knot_block=8, cones=cones, **kw)
    assert float(jnp.max(jnp.abs(r_static.U - r_hs.U))) > 1e-3
