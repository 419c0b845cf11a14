"""Second-order-cone constraints — a beyond-reference capability.

The reference projects slacks onto box constraints only
(reference: src/tinympc/admm.cpp:45-61); thrust-limited quadrotors and
powered-descent problems additionally need second-order cones
``||w[ball]|| <= mu * w[axis]`` (e.g. a thrust-tilt cone on the input).
This module adds axis-aligned SOC projection to the ADMM slack stage for the
jnp tiers via the ``project`` override of
:func:`..solver.admm.admm_iteration` — cones are *static* Python metadata,
so code paths without cones trace byte-identically to the golden-verified
reference semantics.

Projection of ``(v, s)`` onto ``K = {(v, s): ||v|| <= mu s}`` is the
standard closed form (Boyd & Vandenberghe, §8.1.1 exercise; also the
projection used by OSQP-style conic solvers):

* ``||v|| <= mu s``            -> already in the cone, unchanged;
* ``mu ||v|| <= -s``           -> in the polar cone, project to 0;
* otherwise                    -> ``c = (mu ||v|| + s) / (mu^2 + 1)``,
  result ``(v * mu c / ||v||, c)`` on the cone boundary.

When both box bounds and cones are active the slack stage composes them
sequentially (box clip, then each cone in order). The composition is the
standard practical heuristic for intersections under ADMM — it is *not* the
exact projection onto the intersection; ADMM still converges to a point
satisfying every set applied last in a fixed point, and the final slack is
verified against each cone in the tests. Use cones alone (bounds disabled)
for the exact-single-set case.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import Problem, Settings, State
from .admm import update_slack


class Cone(NamedTuple):
    """One axis-aligned second-order cone
    ``||w[ball]|| <= mu * (w[axis] + shift)``.

    ``ball``/``axis`` index the per-knot decision vector (input ``u_i`` or
    state ``x_i``); static Python values so traced code specializes on them.
    ``shift`` translates the cone apex along the axis — e.g. a thrust-tilt
    cone on *hover-relative* inputs (the LTI deviation form absorbs constant
    gravity) is ``||u_xy|| <= mu * (u_z + g_hover)``.
    """

    ball: tuple[int, ...]
    axis: int
    mu: float
    shift: float = 0.0


class ConeSet(NamedTuple):
    """Static cone constraints for a problem: cones on the input vector at
    every knot, and/or on the state vector at every knot."""

    input_cones: tuple[Cone, ...] = ()
    state_cones: tuple[Cone, ...] = ()


def project_cone(w: jax.Array, cone: Cone) -> jax.Array:
    """Project per-knot vectors ``w (..., dim)`` onto ``cone``. Exact
    Euclidean projection, vectorized over every leading axis."""
    idx = jnp.asarray(cone.ball, jnp.int32)
    v = jnp.take(w, idx, axis=-1)
    s = w[..., cone.axis] + jnp.asarray(cone.shift, w.dtype)
    a = jnp.sqrt(jnp.sum(v * v, axis=-1))
    mu = jnp.asarray(cone.mu, w.dtype)

    inside = a <= mu * s
    polar = mu * a <= -s
    c = (mu * a + s) / (mu * mu + 1.0)
    # Guard a == 0 (then `inside` or `polar` holds and the scale is unused).
    scale = jnp.where(inside, 1.0, mu * c / jnp.where(a == 0.0, 1.0, a))
    scale = jnp.where(polar, 0.0, scale)
    s_new = jnp.where(inside, s, jnp.where(polar, 0.0, c))
    s_new = s_new - jnp.asarray(cone.shift, w.dtype)

    w = w.at[..., cone.axis].set(s_new.astype(w.dtype))
    # Scatter the scaled ball coordinates back.
    v_new = v * scale[..., None]
    for j, k in enumerate(cone.ball):
        w = w.at[..., k].set(v_new[..., j].astype(w.dtype))
    return w


def cone_slack_update(cones: ConeSet):
    """Build an ``update_slack`` replacement applying box bounds (if enabled)
    then each cone in ``cones`` sequentially. Pass as
    ``admm_iteration(..., project=cone_slack_update(cones))`` or
    ``solve(..., project=...)`` / ``solve_batched(..., project=...)``."""

    def project(
        state: State, problem: Problem, settings: Settings
    ) -> State:
        state = update_slack(state, problem, settings)
        znew, vnew = state.znew, state.vnew
        for cone in cones.input_cones:
            znew = project_cone(znew, cone)
        for cone in cones.state_cones:
            vnew = project_cone(vnew, cone)
        return state.replace(znew=znew, vnew=vnew)

    return project


def cone_violation(w: jax.Array, cone: Cone) -> jax.Array:
    """Max violation ``||w[ball]|| - mu * (w[axis] + shift)`` over all
    leading axes (<= 0 means satisfied) — observability helper for
    tests/metrics."""
    idx = jnp.asarray(cone.ball, jnp.int32)
    v = jnp.take(w, idx, axis=-1)
    a = jnp.sqrt(jnp.sum(v * v, axis=-1))
    return jnp.max(a - cone.mu * (w[..., cone.axis] + cone.shift))
