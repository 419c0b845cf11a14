"""All three shipped discretization rates end-to-end (reference:
examples/problem_data/quadrotor_{20,50,100}hz_params.hpp) plus the shipped
hover reference trajectories (reference: examples/trajectory_data/
quadrotor_{20hz,100hz}_ref_hover.hpp — the caller adapts NTOTAL; here
trajectories are just arrays)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.api import mpc_rollout, tracking_error
from accelerated_tinympc_tpu.models import (
    load_trajectory,
    quadrotor_hovering_setup,
)


@pytest.mark.parametrize("hz,ticks", [(20, 70), (50, 150), (100, 250)])
def test_hovering_converges_at_all_rates(hz, ticks):
    problem, cache, x0 = quadrotor_hovering_setup(hz)
    settings = atm.Settings(max_iter=25, check_termination=0)
    _, xf, trace = jax.jit(
        lambda x: mpc_rollout(problem, cache, settings, x, ticks)
    )(jnp.asarray(x0, jnp.float32))
    err = float(jnp.linalg.norm(xf - problem.Xref[0]))
    assert err < 0.02, f"{hz} Hz hover error {err}"
    assert np.all(np.isfinite(np.asarray(trace.u)))


@pytest.mark.parametrize(
    "hz,traj", [(20, "quadrotor_20hz_ref_hover"),
                (100, "quadrotor_100hz_ref_hover")]
)
def test_hover_trajectory_tracking(hz, traj):
    """Track the shipped hover reference trajectories at their matching
    rates."""
    problem, cache, _ = quadrotor_hovering_setup(hz)
    Xref_total = load_trajectory(traj)
    ticks = min(Xref_total.shape[0] - problem.horizon - 1, 200)
    settings = atm.Settings(max_iter=20, check_termination=0)
    x0 = Xref_total[0]
    Xref_dev = jnp.asarray(Xref_total, jnp.float32)
    _, _, trace = jax.jit(
        lambda x: mpc_rollout(
            problem, cache, settings, x, ticks, Xref_total=Xref_dev
        )
    )(jnp.asarray(x0, jnp.float32))
    err = np.asarray(tracking_error(trace, Xref_dev))
    assert err[5:].max() < 0.1, err.max()


@pytest.mark.parametrize(
    "hz,golden,ticks",
    [(50, "hovering50_fixed50", 150), (100, "hovering100_fixed50", 250)],
)
def test_hovering_matches_reference_golden(hz, golden, ticks):
    """Direct reference parity at 50/100 Hz: engine rollout vs the golden
    trajectory dumped from the reference binary built with the matching
    problem-data header (tools/golden harness, PARAM_HEADER=...)."""
    from golden_utils import load_traj_csv

    problem, cache, x0 = quadrotor_hovering_setup(hz)
    settings = atm.Settings(max_iter=50, check_termination=0)
    _, _, trace = jax.jit(
        lambda x: mpc_rollout(problem, cache, settings, x, ticks)
    )(jnp.asarray(x0, jnp.float32))
    want = load_traj_csv(golden, 12, 4)
    np.testing.assert_allclose(
        np.asarray(trace.u), want["u0"], rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(trace.x), want["x0"], rtol=0, atol=1e-3
    )
