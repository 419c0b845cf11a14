"""Aux subsystems (SURVEY.md §5): profiling helpers, numerical-health
reporting, and checkpoint/resume of warm-start state across processes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import quadrotor_hovering_setup
from accelerated_tinympc_tpu.utils import save_pytree
from accelerated_tinympc_tpu.utils.debugging import finite_state, health_report
from accelerated_tinympc_tpu.utils.profiling import solver_cost, time_fn
from accelerated_tinympc_tpu.utils.serialization import load_like


class TestProfiling:
    def test_time_fn(self):
        f = jax.jit(lambda x: x * 2.0)
        stats = time_fn(f, jnp.ones((8, 8)), reps=2)
        assert stats["best_s"] > 0 and stats["mean_s"] >= stats["best_s"]

    def test_solver_cost_model(self):
        c = solver_cost(12, 4, 10, iters=100)
        assert c["flops_padded"] > c["flops"] > 0
        # padded model matches the fused kernel's issued matmuls: 5 per iter
        # at 128x128 lanes
        assert c["flops_padded"] == 2 * 100 * 5 * 128 * 128


class TestHealth:
    def test_finite_and_report(self):
        problem, cache, x0 = quadrotor_hovering_setup()
        st = atm.set_x0(atm.init_state(12, 4, 10), jnp.asarray(x0, jnp.float32))
        out = jax.jit(
            lambda s: atm.solve(
                s, problem, cache, atm.Settings(max_iter=10, check_termination=0)
            )
        )(st)
        assert bool(finite_state(out))
        rep = health_report(out)
        assert rep["all_finite"] and rep["nonfinite_instances"] == []

    def test_detects_nan(self):
        st = atm.init_state(12, 4, 10)
        st = st.replace(u=st.u.at[0, 0].set(jnp.nan))
        rep = health_report(st)
        assert not rep["all_finite"]
        assert rep["nonfinite_instances"] == [0]


class TestCheckpointResume:
    """Warm-start state survives a save/load cycle: resuming mid-MPC produces
    the same trajectory as an uninterrupted run (the reference's analogue is
    its persistent in-memory workspace, quadrotor_hovering.cpp:99-104)."""

    def test_resume_matches_uninterrupted(self, tmp_path):
        problem, cache, x0 = quadrotor_hovering_setup()
        settings = atm.Settings(max_iter=15, check_termination=0)
        from accelerated_tinympc_tpu.api import mpc_rollout

        x0j = jnp.asarray(x0, jnp.float32)
        # uninterrupted 20 ticks
        _, xf_full, trace_full = jax.jit(
            lambda x: mpc_rollout(problem, cache, settings, x, 20)
        )(x0j)

        # 10 ticks, checkpoint, restore in a fresh pytree, 10 more
        st10, x10, _ = jax.jit(
            lambda x: mpc_rollout(problem, cache, settings, x, 10)
        )(x0j)
        ck = tmp_path / "state.npz"
        save_pytree(ck, (st10, x10))
        st_loaded, x_loaded = load_like(ck, (st10, x10))
        _, xf_resumed, trace_tail = jax.jit(
            lambda s, x: mpc_rollout(
                problem, cache, settings, jnp.asarray(x), 10, state=s
            )
        )(jax.tree.map(jnp.asarray, st_loaded), x_loaded)

        np.testing.assert_allclose(
            np.asarray(xf_resumed), np.asarray(xf_full), rtol=0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(trace_tail.u), np.asarray(trace_full.u[10:]),
            rtol=0, atol=1e-6,
        )
