"""Shared helpers for golden-parity tests: CSV loaders for the dump harness
outputs (tools/golden/golden_quadrotor.cpp, golden_cartpole) and an MPC
receding-horizon driver mirroring the reference example loops."""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import accelerated_tinympc_tpu as atm

GOLDEN = pathlib.Path(__file__).parent / "golden"


def load_traj_csv(name: str, nx: int, nu: int) -> dict[str, np.ndarray]:
    rows = np.loadtxt(GOLDEN / f"{name}_traj.csv", delimiter=",")
    return {
        "x0": rows[:, 1 : 1 + nx],
        "u0": rows[:, 1 + nx : 1 + nx + nu],
        "iters": rows[:, 1 + nx + nu].astype(int),
        "status": rows[:, 2 + nx + nu].astype(int),
    }


def load_solve0_csv(name: str, horizon: int, nx: int, nu: int) -> dict[str, np.ndarray]:
    """Full-workspace dump after the first solve; matrices were emitted row-major
    with shape (dim, horizon) — transpose into our time-major layout."""
    out: dict[str, np.ndarray] = {}
    for line in (GOLDEN / f"{name}_solve0.csv").read_text().splitlines():
        parts = line.split(",")
        key, vals = parts[0], np.asarray([float(v) for v in parts[1:]])
        if key in ("x", "q", "p", "v", "vnew", "g"):
            out[key] = vals.reshape(nx, horizon).T
        elif key in ("u", "r", "d", "z", "znew", "y"):
            out[key] = vals.reshape(nu, horizon - 1).T
        elif key == "residuals":
            out[key] = vals
        else:
            out[key] = vals.astype(int)
    return out


def run_mpc_loop(
    problem: atm.Problem,
    cache: atm.Cache,
    settings: atm.Settings,
    x0: np.ndarray,
    steps: int,
    Xref_total: np.ndarray | None = None,
    dtype=jnp.float32,
):
    """Receding-horizon loop with on-device plant simulation
    (reference: examples/quadrotor_hovering.cpp:90-114 / quadrotor_tracking.cpp:93-118).

    Returns (x0_hist (steps, nx), u0_hist (steps, nu), iters (steps,)).
    """
    nx, nu = problem.nx, problem.nu
    N = problem.horizon
    state = atm.init_state(nx, nu, N, dtype)

    @jax.jit
    def tick(state, x, Xref):
        prob = problem.replace(Xref=Xref)
        state = atm.set_x0(atm.reset_duals(state), x)
        state = atm.solve(state, prob, cache, settings)
        u0 = state.u[0]
        x_next = (
            jnp.matmul(prob.A, x, precision=jax.lax.Precision.HIGHEST)
            + jnp.matmul(prob.B, u0, precision=jax.lax.Precision.HIGHEST)
        )
        return state, x_next, u0

    x = jnp.asarray(x0, dtype)
    x0_hist, u0_hist, iters = [], [], []
    for k in range(steps):
        Xref = (
            problem.Xref
            if Xref_total is None
            else jnp.asarray(Xref_total[k : k + N], dtype)
        )
        x0_hist.append(np.asarray(x))
        state, x, u0 = tick(state, x, Xref)
        u0_hist.append(np.asarray(u0))
        iters.append(int(state.iter))
    return np.stack(x0_hist), np.stack(u0_hist), np.asarray(iters)
