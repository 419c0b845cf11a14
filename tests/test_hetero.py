"""Heterogeneous-plant fused tier (ops/hetero_admm.py) vs the jnp tiers, via
the Pallas interpreter on CPU (SURVEY.md §4: kernel paths must be testable
without a TPU). One distinct plant per instance — the capability the
reference's one-problem-per-process design rules out (reference:
src/tinympc/tiny_wrapper.hpp:6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import random_lti_problem
from accelerated_tinympc_tpu.ops.hetero_admm import (
    LANES,
    HeteroCarry,
    hetero_solve,
    pad_hetero_from_plants,
    pad_hetero_problem,
)
from accelerated_tinympc_tpu.precompute import riccati_cache
from accelerated_tinympc_tpu.solver.batched import (
    init_state_batched,
    solve_batched,
)

NX, NU, N = 12, 4, 10
B = 24  # deliberately non-multiple of LANES: exercises lane padding


def _stack(trees):
    return jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees
    )


@pytest.fixture(scope="module")
def setup():
    probs, caches, rhos = [], [], []
    for seed in range(B):
        p, rho = random_lti_problem(seed=seed, nx=NX, nu=NU, horizon=N)
        c = riccati_cache(
            np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q),
            np.asarray(p.R), rho,
        )
        probs.append(p)
        caches.append(c)
        rhos.append(rho)
    prob_b = _stack(probs)
    cache_b = _stack(caches)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.standard_normal((B, NX)) * 0.4, jnp.float32)
    return prob_b, cache_b, jnp.asarray(rhos, jnp.float32), x0s


def _run_scan(prob_b, cache_b, x0s, max_iter):
    st = init_state_batched(x0s.shape[0], NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    return solve_batched(
        st, prob_b, cache_b,
        atm.Settings(max_iter=max_iter, check_termination=0),
        problem_axes=0, cache_axes=0,
    )


def test_fixed_iteration_parity(setup):
    """Kernel matches the scan tier per instance across 24 distinct plants."""
    prob_b, cache_b, _rhos, x0s = setup
    hp = pad_hetero_problem(prob_b, cache_b)
    res = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, max_iter=50, interpret=True
    )
    w = _run_scan(prob_b, cache_b, x0s, 50)
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(w.u), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.X), np.asarray(w.x), rtol=0, atol=1e-4
    )


def test_stats_residuals(setup):
    """Stats lanes carry the reference's final-iteration residuals
    (admm.cpp:95-98)."""
    prob_b, cache_b, rhos, x0s = setup
    hp = pad_hetero_problem(prob_b, cache_b)
    res = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, max_iter=25, interpret=True
    )
    w = _run_scan(prob_b, cache_b, x0s, 25)
    pri_s = jnp.max(jnp.abs(w.x - w.vnew), axis=(1, 2))
    pri_u = jnp.max(jnp.abs(w.u - w.znew), axis=(1, 2))
    dua_s = rhos * jnp.max(jnp.abs(w.v - w.vnew), axis=(1, 2))
    dua_u = rhos * jnp.max(jnp.abs(w.z - w.znew), axis=(1, 2))
    # atol 5e-5: the kernel's tree-accumulated matvecs (_dotb) round
    # differently from the scan tier's sequential sums; 25 iterations of
    # f32 reassociation noise stay well inside the 1e-4 parity bar.
    np.testing.assert_allclose(res.stats[:, 2], pri_s, rtol=0, atol=5e-5)
    np.testing.assert_allclose(res.stats[:, 3], dua_s, rtol=0, atol=5e-5)
    np.testing.assert_allclose(res.stats[:, 4], pri_u, rtol=0, atol=5e-5)
    np.testing.assert_allclose(res.stats[:, 5], dua_u, rtol=0, atol=5e-5)
    assert float(res.stats[0, 0]) == 25.0


def test_warm_start_carry(setup):
    """Two chained 15-iteration solves equal one 30-iteration solve (the
    reference's solve-to-solve workspace reuse)."""
    prob_b, cache_b, _rhos, x0s = setup
    hp = pad_hetero_problem(prob_b, cache_b)
    a = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, max_iter=15, interpret=True
    )
    b = hetero_solve(x0s, a.carry, hp, max_iter=15, interpret=True)
    full = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, max_iter=30, interpret=True
    )
    # atol 5e-5: the mid-solve handoff re-enters the kernel, where XLA may
    # round _dotb's tree accumulation differently than the in-loop body;
    # the bit difference amplifies over the remaining iterations but stays
    # well inside the 1e-4 parity bar (measured 3e-5 worst instance).
    np.testing.assert_allclose(
        np.asarray(b.U), np.asarray(full.U), rtol=0, atol=5e-5
    )


def test_on_device_build_from_plants(setup):
    """pad_hetero_from_plants (vmapped on-device Riccati) matches the
    host-float64 cache build to solver accuracy."""
    prob_b, _cache_b, rhos, x0s = setup
    hp, caches = pad_hetero_from_plants(
        prob_b.A, prob_b.B, prob_b.Q, prob_b.R, rhos, prob_b
    )
    res = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, max_iter=40, interpret=True
    )
    w = _run_scan(prob_b, caches, x0s, 40)
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(w.u), rtol=0, atol=1e-4
    )


def test_sharded_hetero_solve():
    """Hetero kernel per shard over an 8-device mesh: sharded == unsharded
    per-instance numerics, plants sharded along with the batch."""
    from accelerated_tinympc_tpu.parallel import (
        make_batch_mesh, shard_batch, sharded_hetero_solve,
    )

    nd = 8
    Bn = LANES * nd  # one lane tile per device
    probs, caches = [], []
    for seed in range(4):
        p, rho = random_lti_problem(seed=seed, nx=6, nu=2, horizon=6)
        c = riccati_cache(
            np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q),
            np.asarray(p.R), rho,
        )
        probs.append(p)
        caches.append(c)
    reps = Bn // 4
    prob_b = jax.tree.map(
        lambda a: jnp.tile(a, (reps,) + (1,) * (a.ndim - 1)), _stack(probs)
    )
    cache_b = jax.tree.map(
        lambda a: jnp.tile(a, (reps,) + (1,) * (a.ndim - 1)), _stack(caches)
    )
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.standard_normal((Bn, 6)) * 0.4, jnp.float32)
    hp = pad_hetero_problem(prob_b, cache_b)
    want = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, max_iter=20, interpret=True
    )

    mesh = make_batch_mesh(nd)
    solve = sharded_hetero_solve(mesh, max_iter=20, interpret=True)
    got, stats = solve(
        shard_batch(x0s, mesh),
        shard_batch(HeteroCarry.zeros(hp), mesh),
        shard_batch(hp, mesh),
    )
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.U), rtol=0, atol=1e-6
    )
    assert float(stats["n_total"]) == Bn
    np.testing.assert_allclose(
        float(stats["primal_residual_state_max"]),
        float(jnp.max(want.stats[:, 2])), rtol=0, atol=1e-6,
    )


def test_multi_tile():
    """A batch spanning >1 lane tile (B > LANES) keeps per-instance parity."""
    Bn = LANES + 17
    probs, caches = [], []
    for seed in range(7):
        p, rho = random_lti_problem(seed=seed, nx=6, nu=2, horizon=6)
        c = riccati_cache(
            np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q),
            np.asarray(p.R), rho,
        )
        probs.append(p)
        caches.append(c)
    reps = -(-Bn // 7)
    prob_b = jax.tree.map(
        lambda a: jnp.tile(a, (reps,) + (1,) * (a.ndim - 1))[:Bn], _stack(probs)
    )
    cache_b = jax.tree.map(
        lambda a: jnp.tile(a, (reps,) + (1,) * (a.ndim - 1))[:Bn], _stack(caches)
    )
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.standard_normal((Bn, 6)) * 0.4, jnp.float32)
    hp = pad_hetero_problem(prob_b, cache_b)
    res = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, max_iter=30, interpret=True
    )
    st = init_state_batched(Bn, 6, 2, 6)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    w = solve_batched(
        st, prob_b, cache_b,
        atm.Settings(max_iter=30, check_termination=0),
        problem_axes=0, cache_axes=0,
    )
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(w.u), rtol=0, atol=1e-4
    )


def test_hetero_cones_parity(setup):
    """In-kernel SOC projection (static ConeSet shared across distinct
    plants) matches the scan tier's cone path per instance."""
    from accelerated_tinympc_tpu.solver.cones import (
        Cone, ConeSet, cone_slack_update, cone_violation,
    )

    prob_b, cache_b, _rhos, x0s = setup
    cones = ConeSet(input_cones=(Cone(ball=(0, 1), axis=2, mu=1.0,
                                      shift=2.0),))
    hp = pad_hetero_problem(prob_b, cache_b)
    res = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, max_iter=40, interpret=True,
        cones=cones,
    )
    st = init_state_batched(B, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = solve_batched(
        st, prob_b, cache_b,
        atm.Settings(max_iter=40, check_termination=0),
        problem_axes=0, cache_axes=0,
        project=cone_slack_update(cones),
    )
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=2e-5,
    )
    # Scan-tier slack obeys the cone exactly; the kernel matched it above.
    assert float(cone_violation(want.znew, cones.input_cones[0])) <= 1e-6


def test_adaptive_parity(setup):
    """Adaptive hetero kernel: per-instance iteration counts, solved flags
    and controls match the scan tier's early-exit semantics across 24
    distinct plants."""
    prob_b, cache_b, _rhos, x0s = setup
    hp = pad_hetero_problem(prob_b, cache_b)
    res = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, max_iter=200, check_termination=2,
        abs_pri_tol=5e-3, abs_dua_tol=5e-3, interpret=True,
    )
    st = init_state_batched(B, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = solve_batched(
        st, prob_b, cache_b,
        atm.Settings(max_iter=200, check_termination=2,
                     abs_pri_tol=5e-3, abs_dua_tol=5e-3),
        problem_axes=0, cache_axes=0,
    )
    np.testing.assert_array_equal(
        np.asarray(res.stats[:, 0], np.int32), np.asarray(want.iter)
    )
    np.testing.assert_array_equal(
        np.asarray(res.stats[:, 1]) > 0.5,
        np.asarray(want.status) == atm.types.SOLVED,
    )
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(want.u), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.X), np.asarray(want.x), rtol=0, atol=1e-4
    )
    # Spread sanity: distinct plants should not all share one count.
    assert len(set(np.asarray(res.stats[:, 0]).tolist())) > 1


def test_adaptive_warm_start_carry(setup):
    """Adaptive-mode carries warm-start a follow-up solve identically to the
    scan tier's re-solve protocol (duals reset, slacks kept)."""
    prob_b, cache_b, _rhos, x0s = setup
    hp = pad_hetero_problem(prob_b, cache_b)
    kw = dict(max_iter=60, check_termination=5, abs_pri_tol=1e-2,
              abs_dua_tol=1e-2, interpret=True)
    r1 = hetero_solve(x0s, HeteroCarry.zeros(hp), hp, **kw)
    r2 = hetero_solve(x0s * 0.9, r1.carry.reset_duals(), hp, **kw)

    st = init_state_batched(B, NX, NU, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    sets = atm.Settings(max_iter=60, check_termination=5,
                        abs_pri_tol=1e-2, abs_dua_tol=1e-2)
    w1 = solve_batched(st, prob_b, cache_b, sets,
                       problem_axes=0, cache_axes=0)
    st2 = w1.replace(
        x=w1.x.at[:, 0, :].set(x0s * 0.9),
        y=jnp.zeros_like(w1.y), g=jnp.zeros_like(w1.g),
    )
    w2 = solve_batched(st2, prob_b, cache_b, sets,
                       problem_axes=0, cache_axes=0)
    np.testing.assert_array_equal(
        np.asarray(r2.stats[:, 0], np.int32), np.asarray(w2.iter)
    )
    np.testing.assert_allclose(
        np.asarray(r2.U), np.asarray(w2.u), rtol=0, atol=1e-4
    )


def test_hetero_cascade_bit_exact(setup):
    """Compaction cascade over the hetero adaptive kernel is BIT-exact vs
    one long adaptive call (per-lane arithmetic is lane-invariant, unlike
    the lane-packed homogeneous kernel)."""
    from accelerated_tinympc_tpu.solver.cascade import hetero_cascade_solve

    prob_b, cache_b, _rhos, x0s = setup
    hp = pad_hetero_problem(prob_b, cache_b)
    kw = dict(max_iter=200, check_termination=2,
              abs_pri_tol=5e-3, abs_dua_tol=5e-3, interpret=True)
    want = hetero_solve(x0s, HeteroCarry.zeros(hp), hp, **kw)
    U, X, stats, carry = hetero_cascade_solve(
        x0s, HeteroCarry.zeros(hp), hp, segment_iters=10, **kw
    )
    np.testing.assert_array_equal(np.asarray(stats[:, :2]),
                                  np.asarray(want.stats[:, :2]))
    np.testing.assert_array_equal(np.asarray(U), np.asarray(want.U))
    np.testing.assert_array_equal(np.asarray(X), np.asarray(want.X))
    for f in ("d", "y", "g", "z", "v"):
        # carry is repacked for the full batch; compare the live rows.
        got = getattr(carry, f)
        ref = getattr(want.carry, f)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_per_instance_cone_params(setup):
    """Heterogeneous cone geometry: per-instance mu/shift lanes. Instances
    sharing the static scalars match the scalar path (to array-vs-folded
    rounding); instances with different mu match a scalar run at that
    mu."""
    from accelerated_tinympc_tpu.ops.hetero_admm import (
        pad_hetero_cone_params,
    )
    from accelerated_tinympc_tpu.solver.cones import Cone, ConeSet

    prob_b, cache_b, _rhos, x0s = setup
    hp = pad_hetero_problem(prob_b, cache_b)
    base = Cone(ball=(0, 1), axis=2, mu=1.0, shift=2.0)
    cones = ConeSet(input_cones=(base,))
    # Half the fleet keeps mu=1.0, half tightens to mu=0.4.
    mu = np.full(B, 1.0, np.float32)
    mu[B // 2:] = 0.4
    cp = pad_hetero_cone_params(cones, B, mu_u=mu[None, :])
    kw = dict(max_iter=40, interpret=True)
    got = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, cones=cones, cone_params=cp, **kw
    )
    w_loose = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, cones=cones, **kw
    )
    tight = ConeSet(input_cones=(base._replace(mu=0.4),))
    w_tight = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, cones=tight, **kw
    )
    # atol 2e-5: scalar-mu kernels constant-fold (mu*a+s)/(mu^2+1) into
    # cheaper exact forms; the lane-array path performs the literal
    # arithmetic, so the two round differently by a few ulp per iteration.
    h = B // 2
    np.testing.assert_allclose(
        np.asarray(got.U[:h]), np.asarray(w_loose.U[:h]), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.U[h:]), np.asarray(w_tight.U[h:]), rtol=0, atol=2e-5
    )
    # And the tight half genuinely differs from the loose run.
    assert float(np.max(np.abs(
        np.asarray(got.U[h:]) - np.asarray(w_loose.U[h:])
    ))) > 1e-4


def test_per_instance_cone_masks(setup):
    """Heterogeneous cone *structure*: per-instance ball/axis index masks
    (pad_hetero_cone_masks). Instances whose masks encode the static
    geometry match the static path; instances with a different ball/axis
    match a static run at that geometry."""
    from accelerated_tinympc_tpu.ops.hetero_admm import (
        pad_hetero_cone_masks,
    )
    from accelerated_tinympc_tpu.solver.cones import Cone, ConeSet

    prob_b, cache_b, _rhos, x0s = setup
    hp = pad_hetero_problem(prob_b, cache_b)
    base = Cone(ball=(0, 1), axis=2, mu=1.0, shift=2.0)
    alt = Cone(ball=(1, 2), axis=0, mu=1.0, shift=2.0)
    cones = ConeSet(input_cones=(base,))
    h = B // 2
    ball = np.zeros((B, NU), np.float32)
    ball[:h, [0, 1]] = 1.0
    ball[h:, [1, 2]] = 1.0
    axis = np.full(B, 2, np.int64)
    axis[h:] = 0
    cm = pad_hetero_cone_masks(cones, B, NX, NU,
                               ball_u=[ball], axis_u=[axis])
    kw = dict(max_iter=40, interpret=True)
    got = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, cones=cones, cone_masks=cm, **kw
    )
    w_base = hetero_solve(x0s, HeteroCarry.zeros(hp), hp, cones=cones, **kw)
    w_alt = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp,
        cones=ConeSet(input_cones=(alt,)), **kw
    )
    np.testing.assert_allclose(
        np.asarray(got.U[:h]), np.asarray(w_base.U[:h]), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.U[h:]), np.asarray(w_alt.U[h:]), rtol=0, atol=2e-5
    )
    # The two geometries genuinely produce different controls.
    assert float(np.max(np.abs(
        np.asarray(got.U[h:]) - np.asarray(w_base.U[h:])
    ))) > 1e-4
    # Defaulted masks (no overrides) reproduce the static path.
    cm_static = pad_hetero_cone_masks(cones, B, NX, NU)
    got_static = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, cones=cones, cone_masks=cm_static,
        **kw
    )
    np.testing.assert_allclose(
        np.asarray(got_static.U), np.asarray(w_base.U), rtol=0, atol=2e-5
    )


def test_cascade_with_per_instance_cones(setup):
    """Per-instance cone operands survive compaction: the cascade gathers
    cone_params/cone_masks alongside the plant tensors at each re-pack
    (gather_hetero_rows), staying BIT-exact vs one long adaptive call."""
    from accelerated_tinympc_tpu.ops.hetero_admm import (
        pad_hetero_cone_masks,
        pad_hetero_cone_params,
    )
    from accelerated_tinympc_tpu.solver.cascade import hetero_cascade_solve
    from accelerated_tinympc_tpu.solver.cones import Cone, ConeSet

    prob_b, cache_b, _rhos, x0s = setup
    hp = pad_hetero_problem(prob_b, cache_b)
    base = Cone(ball=(0, 1), axis=2, mu=1.0, shift=2.0)
    cones = ConeSet(input_cones=(base,))
    rng = np.random.default_rng(7)
    mu = (0.4 + 0.8 * rng.random(B)).astype(np.float32)
    cp = pad_hetero_cone_params(cones, B, mu_u=mu[None, :])
    h = B // 2
    ball = np.zeros((B, NU), np.float32)
    ball[:h, [0, 1]] = 1.0
    ball[h:, [1, 2]] = 1.0
    axis = np.full(B, 2, np.int64)
    axis[h:] = 0
    cm = pad_hetero_cone_masks(cones, B, NX, NU,
                               ball_u=[ball], axis_u=[axis])
    kw = dict(max_iter=200, check_termination=2,
              abs_pri_tol=5e-3, abs_dua_tol=5e-3, interpret=True,
              cones=cones, cone_params=cp, cone_masks=cm)
    want = hetero_solve(x0s, HeteroCarry.zeros(hp), hp, **kw)
    U, X, stats, _carry = hetero_cascade_solve(
        x0s, HeteroCarry.zeros(hp), hp, segment_iters=10, **kw
    )
    np.testing.assert_array_equal(np.asarray(stats[:, :2]),
                                  np.asarray(want.stats[:, :2]))
    np.testing.assert_array_equal(np.asarray(U), np.asarray(want.U))
    np.testing.assert_array_equal(np.asarray(X), np.asarray(want.X))
    # Per-instance iteration counts must genuinely differ (compaction
    # actually re-packed) and the cone geometry genuinely binds.
    it = np.asarray(stats[:, 0], np.int64)
    assert it.min() < it.max()


def test_per_knot_bounds(setup):
    """Per-knot bound schedules (the reference's (N-1,nu)/(N,nx) arrays, one
    set per instance) run in the kernel and match the scan tier."""
    prob_b, cache_b, _rhos, x0s = setup
    rng = np.random.default_rng(13)
    # Tightening input funnel + per-knot state box, distinct per instance.
    funnel = np.linspace(1.2, 0.3, N - 1)[None, :, None]
    u_lim = jnp.asarray(
        funnel * (1.0 + 0.2 * rng.random((B, 1, NU))), jnp.float32
    )
    x_lim = jnp.asarray(
        np.linspace(5.0, 2.0, N)[None, :, None]
        * (1.0 + 0.1 * rng.random((B, 1, NX))), jnp.float32,
    )
    prob_k = prob_b.replace(
        u_min=-u_lim, u_max=u_lim, x_min=-x_lim, x_max=x_lim,
    )
    hp = pad_hetero_problem(prob_k, cache_b)
    res = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, max_iter=40, interpret=True
    )
    w = _run_scan(prob_k, cache_b, x0s, 40)
    np.testing.assert_allclose(
        np.asarray(res.U), np.asarray(w.u), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.X), np.asarray(w.x), rtol=0, atol=1e-4
    )
