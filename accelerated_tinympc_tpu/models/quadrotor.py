"""Crazyflie-style quadrotor LTI problem family.

12 states (position, Rodrigues attitude params, linear/angular velocity), 4 motor
thrust inputs, discretized at 20/50/100 Hz — numeric data imported from the
reference's problem headers (reference: examples/problem_data/quadrotor_*hz_params.hpp,
examples/trajectory_data/*.hpp) via tools/import_reference_data.py.

Builders reproduce the reference example setups:
- hovering: box bounds u in [-0.5, 0.5], x in [-5, 5], hover setpoint z = 2
  (reference: examples/quadrotor_hovering.cpp:44-47,83-85).
- tracking: sliding window over a full reference trajectory
  (reference: examples/quadrotor_tracking.cpp:84-101).
"""

from __future__ import annotations

import pathlib
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..types import Cache, Problem

DATA_DIR = pathlib.Path(__file__).parent / "data"

NX, NU = 12, 4
HOVER_SETPOINT = np.array([0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0], np.float64)
HOVER_X0 = np.array([0, 1, 0, 0.2, 0, 0, 0.1, 0, 0, 0, 0, 0], np.float64)


def _load(hz: int) -> dict[str, np.ndarray]:
    return dict(np.load(DATA_DIR / f"quadrotor_{hz}hz_params.npz"))


def load_quadrotor_cache(hz: int = 20, dtype: Any = jnp.float32) -> Cache:
    """The precomputed Riccati cache shipped with the reference data headers
    (reference: examples/problem_data/quadrotor_20hz_params.hpp:35-87)."""
    d = _load(hz)
    as_dt = lambda k: jnp.asarray(d[k], dtype)
    return Cache(
        rho=as_dt("rho"), Kinf=as_dt("Kinf"), Pinf=as_dt("Pinf"),
        Quu_inv=as_dt("Quu_inv"), AmBKt=as_dt("AmBKt"), coeff_d2p=as_dt("coeff_d2p"),
    )


def load_quadrotor_problem(
    hz: int = 20,
    horizon: int = 10,
    *,
    u_bound: float = 0.5,
    x_bound: float = 5.0,
    Xref: np.ndarray | None = None,
    dtype: Any = jnp.float32,
) -> Problem:
    """Quadrotor Problem with constant box bounds and an optional reference
    window; defaults mirror examples/quadrotor_hovering.cpp:44-50."""
    d = _load(hz)
    N, m = horizon, horizon - 1
    if Xref is None:
        Xref = np.zeros((N, NX))
    return Problem(
        A=jnp.asarray(d["Adyn"], dtype),
        B=jnp.asarray(d["Bdyn"], dtype),
        Q=jnp.asarray(d["Q"], dtype),
        R=jnp.asarray(d["R"], dtype),
        u_min=jnp.full((m, NU), -u_bound, dtype),
        u_max=jnp.full((m, NU), u_bound, dtype),
        x_min=jnp.full((N, NX), -x_bound, dtype),
        x_max=jnp.full((N, NX), x_bound, dtype),
        Xref=jnp.asarray(Xref, dtype),
        Uref=jnp.zeros((m, NU), dtype),
    )


def load_trajectory(name: str = "quadrotor_20hz_y_axis_line") -> np.ndarray:
    """Full reference trajectory, shape (NTOTAL, nx)
    (reference: examples/trajectory_data/*.hpp)."""
    return np.load(DATA_DIR / f"{name}.npz")["Xref"]


def quadrotor_hovering_setup(
    hz: int = 20, horizon: int = 10, dtype: Any = jnp.float32
) -> tuple[Problem, Cache, np.ndarray]:
    """(problem, cache, x0) for the hovering example: hover setpoint z=2
    replicated over the horizon, canonical initial state
    (reference: examples/quadrotor_hovering.cpp:83-88)."""
    Xref = np.tile(HOVER_SETPOINT, (horizon, 1))
    problem = load_quadrotor_problem(hz, horizon, Xref=Xref, dtype=dtype)
    cache = load_quadrotor_cache(hz, dtype)
    return problem, cache, HOVER_X0.copy()


def quadrotor_tracking_setup(
    hz: int = 20,
    horizon: int = 10,
    trajectory: str = "quadrotor_20hz_y_axis_line",
    dtype: Any = jnp.float32,
) -> tuple[Problem, Cache, np.ndarray, np.ndarray]:
    """(problem, cache, x0, Xref_total) for the tracking example; the caller
    slides ``problem.Xref`` over ``Xref_total`` each tick
    (reference: examples/quadrotor_tracking.cpp:84-101)."""
    Xref_total = load_trajectory(trajectory)
    problem = load_quadrotor_problem(
        hz, horizon, Xref=Xref_total[:horizon], dtype=dtype
    )
    cache = load_quadrotor_cache(hz, dtype)
    x0 = Xref_total[0].copy()
    return problem, cache, x0, Xref_total
