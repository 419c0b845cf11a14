"""Adaptive rho at hetero-kernel speed (solver/adaptive_hetero.py): the
OSQP-style per-instance adaptation of solve_adaptive_rho_batched with the
iteration chunks on the hetero Pallas kernel (interpreted here; reference
rho-bake anchor: src/tinympc/codegen.cpp:254-292)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import random_lti_problem
from accelerated_tinympc_tpu.precompute import riccati_cache
from accelerated_tinympc_tpu.solver.adaptive_hetero import (
    solve_adaptive_rho_hetero,
)
from accelerated_tinympc_tpu.solver.batched_ops import (
    solve_adaptive_rho_batched,
)

B = 6
NX, NU, N = 8, 3, 10


@pytest.fixture(scope="module")
def plants():
    problems = []
    for seed in range(B):
        p, rho = random_lti_problem(seed=seed, nx=NX, nu=NU, horizon=N)
        problems.append(p)
    prob_b = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.standard_normal((B, NX)) * 0.4, jnp.float32)
    A = jnp.stack([p.A for p in problems])
    Bm = jnp.stack([p.B for p in problems])
    Q = jnp.stack([p.Q for p in problems])
    R = jnp.stack([p.R for p in problems])
    return prob_b, A, Bm, Q, R, x0s


def test_matches_einsum_tier_schedules(plants):
    """The adaptation schedule (rounds, per-instance rho trajectory,
    convergence set) matches solve_adaptive_rho_batched decision-for-
    decision; iterates agree to kernel-vs-einsum f32 tolerance."""
    prob_b, A, Bm, Q, R, x0s = plants
    rho0 = jnp.asarray([1.0, 1.0, 1e-3, 1e-3, 1e3, 1e3], jnp.float32)
    settings = atm.Settings(abs_pri_tol=0.02, abs_dua_tol=0.02,
                            check_termination=1)
    kw = dict(chunk=25, max_rounds=40)
    want = jax.jit(
        lambda x, r: solve_adaptive_rho_batched(
            x, prob_b, A, Bm, Q, R, r, settings, riccati="vmap", **kw)
    )(x0s, rho0)
    got = solve_adaptive_rho_hetero(
        x0s, prob_b, A, Bm, Q, R, rho0, settings,
        riccati="vmap", interpret=True, **kw,
    )
    assert bool(jnp.all(got.solved))
    np.testing.assert_array_equal(np.asarray(got.solved),
                                  np.asarray(want.state.solved))
    # Well-scaled instances: rho untouched, identical schedules.
    np.testing.assert_allclose(np.asarray(got.rho[:2]), [1.0, 1.0])
    # Rescued instances: same adaptation decisions (rho within kernel-vs-
    # einsum residual noise), iteration counts in the same chunk rounds.
    np.testing.assert_allclose(np.asarray(got.rho), np.asarray(want.rho),
                               rtol=5e-2)
    got_rounds = np.ceil(np.asarray(got.total_iter) / kw["chunk"])
    want_rounds = np.ceil(np.asarray(want.total_iter) / kw["chunk"])
    np.testing.assert_array_equal(got_rounds, want_rounds)
    # Controls agree at the adaptation tolerance scale.
    U_want = np.asarray(want.state.U).reshape(B, N - 1, NU)
    np.testing.assert_allclose(np.asarray(got.U), U_want, rtol=0, atol=5e-2)


def test_rescues_misscaled(plants):
    """Mis-scaled instances converge within a small multiple of the
    well-scaled ones (the einsum tier's rescue property, at kernel speed);
    without adaptation they do not converge in the same budget."""
    prob_b, A, Bm, Q, R, x0s = plants
    rho0 = jnp.asarray([1.0, 1.0, 1e-3, 1e-3, 1e3, 1e3], jnp.float32)
    settings = atm.Settings(abs_pri_tol=0.02, abs_dua_tol=0.02,
                            check_termination=1)
    got = solve_adaptive_rho_hetero(
        x0s, prob_b, A, Bm, Q, R, rho0, settings,
        chunk=25, max_rounds=40, riccati="vmap", interpret=True,
    )
    assert bool(jnp.all(got.solved)), np.asarray(got.total_iter)
    iters = np.asarray(got.total_iter, np.float64)
    assert iters[2:].max() <= 8 * iters[:2].max() + 100

    from accelerated_tinympc_tpu.ops.hetero_admm import (
        HeteroCarry, hetero_solve, pad_hetero_from_plants,
    )

    hp, _ = pad_hetero_from_plants(A, Bm, Q, R, rho0, prob_b,
                                   riccati="vmap")
    fixed = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp,
        max_iter=int(got.rounds) * 25, check_termination=1,
        abs_pri_tol=0.02, abs_dua_tol=0.02, interpret=True,
    )
    assert not bool(jnp.all(fixed.stats[2:, 1] > 0.5))


def test_newton_refresh_matches_fixed_point(plants):
    """riccati="newton" (Newton-Kleinman warm refreshes — the round-4 fast
    path, 5.8x the whole loop on chip, BASELINE.md) reproduces the
    fixed-point refresh's adaptation outcome: same converged set, same rho
    decisions at f32 cache-difference scale, iteration counts in the same
    chunk rounds for nearly all instances."""
    prob_b, A, Bm, Q, R, x0s = plants
    rho0 = jnp.asarray([1.0, 1.0, 1e-3, 1e-3, 1e3, 1e3], jnp.float32)
    settings = atm.Settings(abs_pri_tol=0.02, abs_dua_tol=0.02,
                            check_termination=1)
    kw = dict(chunk=25, max_rounds=40, interpret=True)
    fp = solve_adaptive_rho_hetero(
        x0s, prob_b, A, Bm, Q, R, rho0, settings, riccati="kernel", **kw)
    nt = solve_adaptive_rho_hetero(
        x0s, prob_b, A, Bm, Q, R, rho0, settings, riccati="newton", **kw)
    np.testing.assert_array_equal(np.asarray(nt.solved),
                                  np.asarray(fp.solved))
    assert bool(jnp.all(nt.solved))
    np.testing.assert_allclose(np.asarray(nt.rho), np.asarray(fp.rho),
                               rtol=5e-2)
    same_round = np.mean(
        np.ceil(np.asarray(nt.total_iter) / 25)
        == np.ceil(np.asarray(fp.total_iter) / 25))
    assert same_round >= 0.8, (np.asarray(nt.total_iter),
                               np.asarray(fp.total_iter))
    np.testing.assert_allclose(np.asarray(nt.U), np.asarray(fp.U),
                               rtol=0, atol=5e-2)


def test_sharded_matches_unsharded():
    """sharded_adaptive_hetero on the 8-device virtual mesh: per-instance
    adaptation decisions (converged set, rho trajectory endpoints, chunk-
    round schedules) match the unsharded fused loop — shard-local while
    loops are decision-for-decision identical because rounds after an
    instance converges freeze it verbatim (round 5, VERDICT item 2)."""
    from accelerated_tinympc_tpu.parallel import (
        make_batch_mesh, shard_batch, sharded_adaptive_hetero,
    )

    B16 = 16
    problems = []
    for seed in range(B16):
        p, _rho = random_lti_problem(seed=seed, nx=NX, nu=NU, horizon=N)
        problems.append(p)
    prob_b = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)
    A = jnp.stack([p.A for p in problems])
    Bm = jnp.stack([p.B for p in problems])
    Q = jnp.stack([p.Q for p in problems])
    R = jnp.stack([p.R for p in problems])
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.standard_normal((B16, NX)) * 0.4, jnp.float32)
    rho0 = jnp.asarray(
        [1.0, 1e-3, 1e3, 1.0] * 4, jnp.float32
    )
    settings = atm.Settings(abs_pri_tol=0.02, abs_dua_tol=0.02,
                            check_termination=1)
    kw = dict(chunk=25, max_rounds=40, riccati="vmap", interpret=True)

    want = solve_adaptive_rho_hetero(
        x0s, prob_b, A, Bm, Q, R, rho0, settings, **kw)

    mesh = make_batch_mesh(8)
    solve = sharded_adaptive_hetero(mesh, settings, **kw)
    res, stats = solve(
        shard_batch(x0s, mesh), shard_batch(prob_b, mesh),
        shard_batch(A, mesh), shard_batch(Bm, mesh),
        shard_batch(Q, mesh), shard_batch(R, mesh),
        shard_batch(rho0, mesh),
    )
    assert res["U"].sharding.spec[0] == "batch"
    assert float(stats["n_total"]) == B16
    assert float(stats["n_solved"]) == float(np.sum(np.asarray(want.solved)))
    assert int(stats["rounds_max"]) <= int(want.rounds)

    np.testing.assert_array_equal(np.asarray(res["solved"]),
                                  np.asarray(want.solved))
    # Same adaptation decisions per instance: rho endpoints within
    # cross-graph f32 residual noise (interpret-mode FMA drift between the
    # 2-instance shard graphs and the 16-instance graph — CLAUDE.md), and
    # iteration counts in the same chunk rounds.
    np.testing.assert_allclose(np.asarray(res["rho"]),
                               np.asarray(want.rho), rtol=5e-2)
    got_rounds = np.ceil(np.asarray(res["total_iter"]) / kw["chunk"])
    want_rounds = np.ceil(np.asarray(want.total_iter) / kw["chunk"])
    np.testing.assert_array_equal(got_rounds, want_rounds)
    np.testing.assert_allclose(np.asarray(res["U"]), np.asarray(want.U),
                               rtol=0, atol=5e-2)
    # Adapted caches stitch back batch-leading (fleet adoption surface).
    np.testing.assert_allclose(np.asarray(res["cache"].Kinf),
                               np.asarray(want.cache.Kinf),
                               rtol=2e-4, atol=2e-4)


def test_newton_nx_gt_16_routes_to_jnp():
    """riccati="newton" with nx>16 (above the Pallas slab layout) runs the
    vmapped jnp Newton-Kleinman refresh (round-5 routing, mirroring
    fleet.set_plants) — same converged set and rho decisions as the
    fixed-point refresh."""
    B2, nx2, nu2, N2 = 4, 18, 4, 8
    problems = [random_lti_problem(seed=s, nx=nx2, nu=nu2, horizon=N2)[0]
                for s in range(B2)]
    prob_b = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)
    A = jnp.stack([p.A for p in problems])
    Bm = jnp.stack([p.B for p in problems])
    Q = jnp.stack([p.Q for p in problems])
    R = jnp.stack([p.R for p in problems])
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.standard_normal((B2, nx2)) * 0.3, jnp.float32)
    rho0 = jnp.asarray([1.0, 1e-3, 1e3, 1.0], jnp.float32)
    settings = atm.Settings(abs_pri_tol=0.02, abs_dua_tol=0.02,
                            check_termination=1)
    kw = dict(chunk=25, max_rounds=30, interpret=True)
    fp = solve_adaptive_rho_hetero(
        x0s, prob_b, A, Bm, Q, R, rho0, settings, riccati="vmap", **kw)
    nt = solve_adaptive_rho_hetero(
        x0s, prob_b, A, Bm, Q, R, rho0, settings, riccati="newton", **kw)
    np.testing.assert_array_equal(np.asarray(nt.solved),
                                  np.asarray(fp.solved))
    np.testing.assert_allclose(np.asarray(nt.rho), np.asarray(fp.rho),
                               rtol=5e-2)
