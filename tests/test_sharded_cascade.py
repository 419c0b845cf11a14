"""Sharded early-termination compaction cascade (VERDICT r3 item 7): the
single-device cascade's reclaim, per shard under a mesh — a straggler pins
only its own shard's bucket. Reference anchor: the early exit
src/tinympc/admm.cpp:135-144 made mesh-level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import quadrotor_hovering_setup
from accelerated_tinympc_tpu.ops import FusedCarry, fused_solve, pad_problem
from accelerated_tinympc_tpu.parallel import (
    make_batch_mesh,
    sharded_cascade_solve,
)
from accelerated_tinympc_tpu.precompute import condensed_operators

ND = 8
BL = 32           # per-shard batch
BT = 16           # fixed kernel batch tile (bucket counts change, tiles don't)
B = ND * BL


@pytest.fixture(scope="module")
def setup():
    problem, cache, x0 = quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rng = np.random.default_rng(5)
    # Mixed difficulty, shard-structured (test_cascade's recipe): shards
    # 0-5 easy perturbations of the hover point, shards 6-7 hard stragglers.
    scale = np.concatenate([
        np.full(6 * BL, 0.01), np.full(2 * BL, 1.5),
    ])[:, None]
    x0s = jnp.asarray(
        np.asarray(x0)[None] + scale * rng.standard_normal((B, 12)),
        jnp.float32,
    )
    return pp, x0s


def test_iteration_exact_and_reclaims(setup):
    """Per-instance iteration schedules are EXACTLY the one-call adaptive
    solve's (segments compose through the carry, per shard; controls at the
    homogeneous cascade's 1e-4 slot-drift bound), and
    easy shards' buckets shrink while the straggler shards keep theirs —
    reclaimed compute is visible in the segment log."""
    pp, x0s = setup
    sets = dict(max_iter=60, check_termination=5, abs_pri_tol=0.2,
                abs_dua_tol=0.2)
    want = fused_solve(
        x0s, FusedCarry.zeros(B, pp), pp, batch_tile=BT,
        interpret=True, **sets,
    )
    mesh = make_batch_mesh(ND)
    log: list = []
    run = sharded_cascade_solve(
        mesh, pp, segment_iters=10, segment_growth=1.0,
        batch_tile=BT, min_bucket=2, interpret=True, segment_log=log,
        **sets,
    )
    got = run(x0s, FusedCarry.zeros(B, pp))
    np.testing.assert_array_equal(
        np.asarray(got.stats[:, 0]), np.asarray(want.stats[:, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(got.stats[:, 1]), np.asarray(want.stats[:, 1])
    )
    # U at the homogeneous cascade's established bound (test_cascade:
    # compaction moves survivors to new lane slots, where the packed
    # kernel's f32 arithmetic rounds differently at the last ulp).
    np.testing.assert_allclose(
        np.asarray(got.U), np.asarray(want.U), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tuple(got.carry)[0]), np.asarray(tuple(want.carry)[0]),
        rtol=0, atol=1e-4,
    )
    # Reclaim: buckets shrank below the full shard size once the easy
    # shards converged.
    assert log, "no compactions happened"
    # per-shard buckets shrank: survivors rebalanced across shards.
    assert min(b for _, b in log) < BL, log
