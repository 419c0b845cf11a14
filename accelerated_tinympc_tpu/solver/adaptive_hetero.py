"""Per-instance adaptive rho at heterogeneous-kernel speed.

:func:`.batched_ops.solve_adaptive_rho_batched` runs its iteration chunks on
the per-instance-operator einsum tier — HBM-bound through ~45 KB of condensed
operators per instance per iteration. A per-instance rho is *just a
per-instance cache*, which is exactly :mod:`..ops.hetero_admm`'s layout:
this module runs the same OSQP-style stall-guarded adaptation (reference
rho-in-the-cache anchor: src/tinympc/codegen.cpp:254-292 bakes rho into
Q1/R1 and the Riccati cache; the adaptation re-runs that bake per instance
on device) with the iteration chunks on the hetero Pallas kernel, the cache
refresh on the batched Pallas Riccati kernel (:mod:`..ops.riccati_kernel`),
and the operand repack limited to the cache-dependent fields
(:func:`..ops.hetero_admm.repack_hetero_caches`).

**One dispatch.** The whole round loop lives in a single ``lax.while_loop``
(both Pallas kernels trace fine inside it): on this deployment's relay
backend every host dispatch costs ~30 ms — more than a round's actual
compute — so host-orchestrated rounds can never beat the einsum tier's
fused loop regardless of kernel speed (measured: 40 orchestrated rounds =
1.6 s vs the einsum tier's 1.2 s at B=4096, both dominated by per-dispatch
overhead; the fused form removes it).

Round structure mirrors ``solve_adaptive_rho_batched`` decision-for-decision
(chunked iterations with per-instance early-termination freezing, stall x
imbalance guard, sqrt(pri/dua) rescale, dual rescale by rho_old/rho_new,
warm-started refresh gated on any-changed, instances solved in an earlier
round frozen verbatim) — pinned in tests/test_adaptive_hetero.py; iterates
agree to kernel-vs-einsum f32 tolerance.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..types import Cache, Problem, Settings

LANES = 128


class AdaptiveHeteroResult(NamedTuple):
    U: jax.Array            # (B, N-1, nu) final pre-projection controls
    X: jax.Array            # (B, N, nx)
    rho: jax.Array          # (B,) final per-instance rho
    cache: Cache            # batch-leading caches at the final rho
    solved: jax.Array       # (B,) bool
    total_iter: jax.Array   # (B,) int32
    rounds: jax.Array       # () int32
    carry: Any              # lane-packed HeteroCarry (warm-start ready)


def _expand_row(row: jax.Array, reps: int) -> jax.Array:
    """(NT, L) per-tile lane row -> (NT*reps, L)."""
    return jnp.repeat(row, reps, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "max_rounds", "adapt_factor", "stall_factor", "rho_min",
        "rho_max", "riccati", "interpret", "cones", "settings",
    ),
)
def solve_adaptive_rho_hetero(
    x0: jax.Array,
    problem: Problem,
    A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array, rho0: jax.Array,
    settings: Settings,
    *,
    chunk: int = 25,
    max_rounds: int = 40,
    adapt_factor: float = 5.0,
    stall_factor: float = 1.5,
    rho_min: float = 1e-2,
    rho_max: float = 1e3,
    riccati: str = "auto",
    interpret: bool = False,
    cones=None,
    cone_params: jax.Array | None = None,
    cone_masks: jax.Array | None = None,
) -> AdaptiveHeteroResult:
    """OSQP-style per-instance rho adaptation, fully fused (see module
    docstring). Arguments mirror
    :func:`.batched_ops.solve_adaptive_rho_batched` (``A/B/Q/R (B, ...)``
    per-instance plants, ``rho0 (B,)``, ``problem`` batch-leading
    bounds/Xref); ``cones`` + hetero-layout ``cone_params``/``cone_masks``
    add the kernel's in-VMEM SOC projections. Jittable end to end."""
    from ..ops.hetero_admm import (
        HeteroCarry, _lane_pack_vec, hetero_solve, pad_hetero_problem,
        repack_hetero_caches,
    )

    if getattr(settings, "alpha", 1.0) != 1.0:
        raise ValueError(
            "Settings.alpha is not implemented on the hetero kernel chunks "
            "(reference alpha=1 schedule); use solve_adaptive_rho_scan"
        )
    batch = x0.shape[0]
    nx, nu = A.shape[-1], B.shape[-1]
    N = problem.Xref.shape[-2]
    m = N - 1
    nt = -(-batch // LANES)
    check_every = max(1, settings.check_termination)
    use_kernel = (riccati in ("kernel", "newton") and nx <= 16) or (
        riccati == "auto" and nx <= 16 and jax.default_backend() == "tpu"
    )

    def build_caches(rho, warm=None):
        if riccati == "newton" and nx > 16 and warm is not None:
            # The Pallas Newton kernel is nx<=16 (slab layout); larger
            # plants take the vmapped jnp Newton-Kleinman (same math,
            # same warm-gain precondition — fleet.set_plants does the
            # same routing).
            from ..precompute import riccati_newton_jax

            return jax.vmap(
                lambda a, b, q, r, p, K0: riccati_newton_jax(
                    a, b, q, r, p, K0, tol=1e-6
                )
            )(A, B, Q, R, rho, warm.Kinf)
        if use_kernel:
            from ..ops.riccati_kernel import (
                riccati_cache_kernel, riccati_cache_newton,
            )

            if riccati in ("newton", "auto") and warm is not None:
                # Newton-Kleinman warm refresh: quadratic outer convergence
                # from the previous round's gain (always stabilizing —
                # A - B K is rho-independent). The refresh is 91% of a
                # round's cost with the fixed-point kernel; Newton cuts it
                # 102x — whole loop 5.8x, 41.8k adaptive solves/s at B=4096
                # (BASELINE.md round-4 decomposition). riccati="kernel"
                # keeps the pure fixed-point refresh (reference-truncated
                # iterates end to end).
                return riccati_cache_newton(
                    A, B, Q, R, rho, warm.Kinf, interpret=interpret,
                )
            return riccati_cache_kernel(
                A, B, Q, R, rho,
                P0=warm.Pinf if warm is not None else None,
                K0=warm.Kinf if warm is not None else None,
                interpret=interpret,
            )
        from ..precompute import riccati_cache_jax

        if warm is None:
            return jax.vmap(riccati_cache_jax)(A, B, Q, R, rho)
        return jax.vmap(
            lambda a, b, q, r, p, P0, K0: riccati_cache_jax(
                a, b, q, r, p, P0=P0, K0=K0
            )
        )(A, B, Q, R, rho, warm.Pinf, warm.Kinf)

    prob_b = problem.replace(A=A, B=B, Q=Q, R=R)
    rho0 = jnp.asarray(rho0, jnp.float32)
    caches0 = build_caches(rho0)
    hp0 = pad_hetero_problem(prob_b, caches0)
    SU, SX = hp0.SU, hp0.SX

    def run_chunk(carry, hp):
        return hetero_solve(
            x0, carry, hp, max_iter=chunk, check_termination=check_every,
            abs_pri_tol=settings.abs_pri_tol,
            abs_dua_tol=settings.abs_dua_tol,
            en_input_bound=settings.en_input_bound,
            en_state_bound=settings.en_state_bound,
            interpret=interpret, cones=cones,
            cone_params=cone_params, cone_masks=cone_masks,
        )

    def pick_rows(mask_f32, S):
        return _expand_row(_lane_pack_vec(mask_f32[:, None], 1, nt), S)

    def sel(msk, a, b):
        return a * msk + b * (1.0 - msk)

    def body(st):
        (rnd, hp, carry, caches, rho, prev_max, solved_in, iters, acc) = st
        prev = carry
        res = run_chunk(carry, hp)
        stats = res.stats
        solved_now = stats[:, 1] > 0.5
        pri = jnp.maximum(stats[:, 2], stats[:, 4])
        dua = jnp.maximum(stats[:, 3], stats[:, 5])

        # Instances solved in an earlier round stay frozen verbatim (the
        # kernel re-solves them from the warm carry; discard that — the
        # previous round's merged carry IS the frozen state, so no separate
        # accumulator copy of the dual/slack fields is carried).
        sin = solved_in.astype(jnp.float32)
        mu_u = pick_rows(sin, m * SU)
        mu_x = pick_rows(sin, N * SX)
        carry = res.carry.replace(
            d=sel(mu_u, prev.d, res.carry.d),
            y=sel(mu_u, prev.y, res.carry.y),
            g=sel(mu_x, prev.g, res.carry.g),
            z=sel(mu_u, prev.z, res.carry.z),
            v=sel(mu_x, prev.v, res.carry.v),
        )
        U = jnp.where(solved_in[:, None, None], acc["U"], res.U)
        X = jnp.where(solved_in[:, None, None], acc["X"], res.X)
        r_pri = jnp.where(solved_in, acc["pri"], pri)
        r_dua = jnp.where(solved_in, acc["dua"], dua)
        iters = jnp.where(
            solved_in, iters, iters + stats[:, 0].astype(jnp.int32)
        )
        solved = solved_in | solved_now

        # OSQP-style stall x imbalance guard (as solve_adaptive_rho_batched).
        max_res = jnp.maximum(r_pri, r_dua)
        stalled = max_res * stall_factor > prev_max
        ratio = jnp.sqrt(
            jnp.maximum(r_pri, 1e-12) / jnp.maximum(r_dua, 1e-12)
        )
        imbalanced = (ratio > adapt_factor) | (ratio < 1.0 / adapt_factor)
        do_adapt = stalled & imbalanced & (~solved)
        new_rho = jnp.where(
            do_adapt, jnp.clip(rho * ratio, rho_min, rho_max), rho
        )
        changed = new_rho != rho
        prev_max = jnp.where(changed, jnp.inf, max_res)

        # Dual rescale by rho_old/rho_new (lane-packed layout).
        scale = jnp.where(changed, rho / new_rho, jnp.ones_like(rho))
        carry = carry.replace(
            y=carry.y * pick_rows(scale, m * SU),
            g=carry.g * pick_rows(scale, N * SX),
        )

        # Warm cache refresh + cache-only repack. The per-instance `kept`
        # mask keeps unchanged instances' cache bits verbatim, so a round
        # where nothing changed leaves every operand bit identical whether
        # or not the refresh runs (repack is deterministic). With the
        # Newton refresh the any-changed lax.cond gate is therefore pure
        # overhead (it forces per-round copies of the full HeteroProblem
        # operand tree) and is dropped; the expensive fixed-point/vmap
        # refresh modes keep it.
        def refresh():
            new_caches = build_caches(new_rho, warm=caches)
            kept = jax.tree.map(
                lambda n, o: jnp.where(
                    changed.reshape((-1,) + (1,) * (n.ndim - 1)), n, o
                ),
                new_caches, caches,
            )
            return repack_hetero_caches(hp, kept, prob_b.Xref), kept

        if use_kernel and riccati in ("newton", "auto"):
            hp2, caches2 = refresh()
        else:
            hp2, caches2 = jax.lax.cond(
                jnp.any(changed), refresh, lambda: (hp, caches)
            )
        acc = {"U": U, "X": X, "pri": r_pri, "dua": r_dua}
        return (rnd + 1, hp2, carry, caches2, new_rho, prev_max, solved,
                iters, acc)

    def cond(st):
        rnd, solved = st[0], st[6]
        return jnp.logical_and(rnd < max_rounds, jnp.any(~solved))

    carry0 = HeteroCarry.zeros(hp0)
    zb = jnp.zeros((batch,), jnp.float32)
    acc0 = {
        "U": jnp.zeros((batch, m, nu), jnp.float32),
        "X": jnp.zeros((batch, N, nx), jnp.float32),
        "pri": zb, "dua": zb,
    }
    (rounds, _hp, fcarry, caches, rho, _pm, solved, iters, acc) = (
        jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), hp0, carry0, caches0, rho0,
             jnp.full((batch,), jnp.inf, jnp.float32),
             jnp.zeros((batch,), bool), jnp.zeros((batch,), jnp.int32),
             acc0),
        )
    )
    from ..ops.hetero_admm import HeteroCarry as _HC

    return AdaptiveHeteroResult(
        U=acc["U"], X=acc["X"], rho=rho, cache=caches, solved=solved,
        total_iter=iters, rounds=rounds,
        carry=_HC(d=fcarry.d, y=fcarry.y, g=fcarry.g, z=fcarry.z,
                  v=fcarry.v),
    )
