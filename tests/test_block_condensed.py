"""Block-condensed long-horizon tier (solver/block_condensed.py): the
MXU-fed sweeps must reproduce the scan tier's semantics exactly — same
iteration schedules, controls in the FMA band (block boundaries only
reorder summation). Reference recursions: src/tinympc/admm.cpp:15-37."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import random_lti_problem
from accelerated_tinympc_tpu.precompute import riccati_cache
from accelerated_tinympc_tpu.solver import admm
from accelerated_tinympc_tpu.solver.block_condensed import solve_block


def _setup(N, seed=1, nx=8, nu=3):
    p, rho = random_lti_problem(seed=seed, nx=nx, nu=nu, horizon=N)
    c = riccati_cache(np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q),
                      np.asarray(p.R), rho)
    x0 = jnp.asarray(
        np.random.default_rng(seed).standard_normal(nx) * 0.3, jnp.float32
    )
    return p, c, atm.set_x0(atm.init_state(nx, nu, N), x0)


@pytest.mark.parametrize("N,kb", [
    (10, 4),     # kb < m, tail block (m=9 = 2*4 + 1)
    (33, 16),    # m=32 = 2*16, no tail
    (65, 16),    # m=64, no tail
    (130, 32),   # m=129 = 4*32 + 1, tail 1
    (10, 64),    # kb > m: single clamped block
])
def test_matches_scan_tier(N, kb):
    p, c, st = _setup(N)
    s = atm.Settings(max_iter=25, check_termination=1)
    a = jax.jit(lambda ss: admm.solve(ss, p, c, s))(st)
    b = jax.jit(lambda ss: solve_block(ss, p, c, s, block=kb))(st)
    assert int(a.iter) == int(b.iter)
    assert int(a.status) == int(b.status)
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                               rtol=0, atol=1e-5)
    # warm-start fields agree too (continuations compose)
    for f in ("d", "p", "z", "v", "y", "g"):
        np.testing.assert_allclose(
            np.asarray(getattr(b, f)), np.asarray(getattr(a, f)),
            rtol=0, atol=1e-5, err_msg=f,
        )


def test_fixed_iteration_mode():
    p, c, st = _setup(64)
    s = atm.Settings(max_iter=15, check_termination=0)
    a = jax.jit(lambda ss: admm.solve(ss, p, c, s))(st)
    b = jax.jit(lambda ss: solve_block(ss, p, c, s, block=16))(st)
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u),
                               rtol=0, atol=1e-5)


def test_vmapped_batch():
    p, c, _ = _setup(64)
    B = 6
    x0s = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, 8)) * 0.3, jnp.float32
    )
    s = atm.Settings(max_iter=20, check_termination=1)
    sts = jax.vmap(
        lambda x: atm.set_x0(atm.init_state(8, 3, 64), x)
    )(x0s)
    a = jax.jit(jax.vmap(lambda ss: admm.solve(ss, p, c, s)))(sts)
    b = jax.jit(jax.vmap(
        lambda ss: solve_block(ss, p, c, s, block=16)
    ))(sts)
    np.testing.assert_array_equal(np.asarray(a.iter), np.asarray(b.iter))
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u),
                               rtol=0, atol=1e-5)


def test_cones_and_relaxation_compose():
    from accelerated_tinympc_tpu.solver.cones import (
        Cone, ConeSet, cone_slack_update,
    )

    p, c, st = _setup(64)
    project = cone_slack_update(
        ConeSet(input_cones=(Cone(ball=(0, 1), axis=2, mu=1.0),))
    )
    s = atm.Settings(max_iter=20, check_termination=1, alpha=1.6)
    a = jax.jit(lambda ss: admm.solve(ss, p, c, s, project=project))(st)
    b = jax.jit(
        lambda ss: solve_block(ss, p, c, s, block=16, project=project)
    )(st)
    assert int(a.iter) == int(b.iter)
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u),
                               rtol=0, atol=1e-5)


def test_per_instance_plants_matches_batched_scan():
    """solve_block_batched (device-built per-instance block operators,
    round 5): schedule-identical to solve_batched(problem_axes=0) with
    parity at the device-f32-operator scale."""
    from accelerated_tinympc_tpu.solver.batched import (
        init_state_batched, solve_batched,
    )
    from accelerated_tinympc_tpu.solver.block_condensed import (
        block_ops_batched, solve_block_batched,
    )

    B, N, nx, nu = 5, 65, 8, 3
    probs, caches = [], []
    for s in range(B):
        p, rho = random_lti_problem(seed=s, nx=nx, nu=nu, horizon=N)
        probs.append(p)
        caches.append(riccati_cache(
            np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q),
            np.asarray(p.R), rho))
    prob_b = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    cache_b = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *caches)
    x0s = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, nx)) * 0.3, jnp.float32)
    st = init_state_batched(B, nx, nu, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    s = atm.Settings(max_iter=25, check_termination=1)
    a = jax.jit(lambda ss: solve_batched(
        ss, prob_b, cache_b, s, problem_axes=0, cache_axes=0))(st)
    b = jax.jit(lambda ss: solve_block_batched(
        ss, prob_b, cache_b, s, block=16))(st)
    np.testing.assert_array_equal(np.asarray(a.iter), np.asarray(b.iter))
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(b.status))
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u),
                               rtol=0, atol=1e-4)
    # prebuilt ops path (amortized across solves): same schedules; values
    # within the cross-graph FMA band (ops built in a separate jit —
    # XLA CPU contracts FMAs per graph shape, CLAUDE.md).
    ops = block_ops_batched(cache_b, prob_b.A, prob_b.B, N, 16)
    c = jax.jit(lambda ss: solve_block_batched(
        ss, prob_b, cache_b, s, block=16, ops=ops))(st)
    np.testing.assert_array_equal(np.asarray(b.iter), np.asarray(c.iter))
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(c.u),
                               rtol=0, atol=1e-5)


def test_rollout_through_tinympc_surface():
    """TinyMPC(tier="block").rollout: block-condensed per-tick solves under
    the reference receding-horizon protocol — parity with the scan tier."""
    p, c, _ = _setup(65)
    outs = {}
    for tier in ("block", "scan"):
        m = atm.TinyMPC.from_parts(
            p, c, settings=atm.Settings(max_iter=20, check_termination=1),
            tier=tier, batch=3, block=16,
        )
        x0 = jnp.asarray(
            np.random.default_rng(0).standard_normal((3, 8)) * 0.3,
            jnp.float32,
        )
        m.set_x0(x0)
        outs[tier] = m.rollout(5)
    du = float(np.abs(np.asarray(outs["block"][1])
                      - np.asarray(outs["scan"][1])).max())
    assert du < 1e-5, du
