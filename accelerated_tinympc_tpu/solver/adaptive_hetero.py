"""Per-instance adaptive rho at heterogeneous-kernel speed.

:func:`.batched_ops.solve_adaptive_rho_batched` runs its iteration chunks on
the per-instance-operator einsum tier — HBM-bound through ~45 KB of condensed
operators per instance per iteration, ~100x slower than the plain adaptive
hetero kernel (BASELINE.md). But a per-instance rho is *just a per-instance
cache*, which is exactly :mod:`..ops.hetero_admm`'s layout: this module runs
the same OSQP-style stall-guarded adaptation (reference rho-in-the-cache
anchor: src/tinympc/codegen.cpp:254-292 bakes rho into Q1/R1 and the Riccati
cache; the adaptation re-runs that bake per instance on device) with the
iteration chunks on the hetero Pallas kernel and the cache refresh on the
batched Pallas Riccati kernel (:mod:`..ops.riccati_kernel`).

Round structure mirrors ``solve_adaptive_rho_batched`` exactly (chunked
iterations with per-instance early-termination freezing, stall x imbalance
guard, sqrt(pri/dua) rescale, dual rescale by rho_old/rho_new, warm-started
refresh, instances solved in an earlier round frozen verbatim), so the
adaptation schedules match the einsum tier's decision-for-decision (pinned in
tests/test_adaptive_hetero.py); iterates agree to kernel-vs-einsum f32
tolerance.

Host-orchestrated rounds (one jitted solve + one jitted decide/refresh per
round, like the compaction cascades): adaptation needs the convergence set on
the host anyway to stop early, and rounds are few (converged instances cost
one re-dispatch each round — see ``solve_adaptive_rho_cascade``'s compaction
variant for reclaiming even that).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Cache, Problem, Settings

LANES = 128


class AdaptiveHeteroResult(NamedTuple):
    U: jax.Array            # (B, N-1, nu) final pre-projection controls
    X: jax.Array            # (B, N, nx)
    rho: jax.Array          # (B,) final per-instance rho
    cache: Cache            # batch-leading caches at the final rho
    solved: jax.Array       # (B,) bool
    total_iter: jax.Array   # (B,) int32
    rounds: int
    carry: Any              # lane-packed HeteroCarry (warm-start ready)


def _expand_row(row: jax.Array, reps: int) -> jax.Array:
    """(NT, L) per-tile lane row -> (NT*reps, L)."""
    return jnp.repeat(row, reps, axis=0)


@functools.lru_cache(maxsize=8)
def _jit_round(chunk, check_every, pri_tol, dua_tol, en_ib, en_sb,
               interpret, cones, has_cp, has_cm):
    from ..ops.hetero_admm import hetero_solve

    def fn(x0, carry, hp, cp, cm):
        return hetero_solve(
            x0, carry, hp, max_iter=chunk, check_termination=check_every,
            abs_pri_tol=pri_tol, abs_dua_tol=dua_tol,
            en_input_bound=en_ib, en_state_bound=en_sb,
            interpret=interpret, cones=cones,
            cone_params=cp if has_cp else None,
            cone_masks=cm if has_cm else None,
        )

    return fn if interpret else jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _jit_decide(adapt_factor, stall_factor, rho_min, rho_max, riccati_kernel,
                interpret):
    """One dispatch per round: freeze solved instances into the running
    result, apply the stall x imbalance guard, rescale rho + duals, refresh
    caches (warm) where rho changed, re-pack the kernel problem."""
    from ..ops.hetero_admm import _lane_pack_vec, pad_hetero_problem

    def fn(res, prob_b, caches, rho, prev_max, solved_in, iter_in,
           acc, nt, dims):
        nx, nu, N = dims
        m = N - 1
        stats = res.stats
        solved_now = stats[:, 1] > 0.5
        pri = jnp.maximum(stats[:, 2], stats[:, 4])
        dua = jnp.maximum(stats[:, 3], stats[:, 5])

        # Freeze instances solved in an *earlier* round verbatim (the
        # kernel re-solves them from the warm carry; discard that).
        def pick_rows(S):
            mrow = _lane_pack_vec(
                solved_in.astype(jnp.float32)[:, None], 1, nt
            )
            return _expand_row(mrow, S)

        def sel(msk, a, b):
            return a * msk + b * (1.0 - msk)

        mu = pick_rows(m * (caches.Kinf.shape[-2] and 0) + 0)  # placeholder
        del mu
        carry = res.carry
        SU = carry.d.shape[0] // (nt * m)
        SX = carry.g.shape[0] // (nt * N)
        mu_u = pick_rows(m * SU)
        mu_x = pick_rows(N * SX)
        carry = carry.replace(
            d=sel(mu_u, acc["d"], carry.d), y=sel(mu_u, acc["y"], carry.y),
            g=sel(mu_x, acc["g"], carry.g), z=sel(mu_u, acc["z"], carry.z),
            v=sel(mu_x, acc["v"], carry.v),
        )
        U = jnp.where(solved_in[:, None, None], acc["U"], res.U)
        X = jnp.where(solved_in[:, None, None], acc["X"], res.X)
        r_pri = jnp.where(solved_in, acc["pri"], pri)
        r_dua = jnp.where(solved_in, acc["dua"], dua)
        iters = jnp.where(
            solved_in, iter_in,
            iter_in + stats[:, 0].astype(jnp.int32),
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

        # Dual rescale by rho_old/rho_new (lane-packed carry layout).
        scale = jnp.where(changed, rho / new_rho, jnp.ones_like(rho))
        srow = _lane_pack_vec(scale[:, None], 1, nt)
        carry = carry.replace(
            y=carry.y * _expand_row(srow, m * SU),
            g=carry.g * _expand_row(srow, N * SX),
        )

        # Warm cache refresh where rho changed; unchanged instances keep
        # their cache bits (masked select), so the re-pack reproduces their
        # operands verbatim.
        if riccati_kernel:
            from ..ops.riccati_kernel import riccati_cache_kernel

            new_caches = riccati_cache_kernel(
                prob_b.A, prob_b.B, prob_b.Q, prob_b.R, new_rho,
                P0=caches.Pinf, K0=caches.Kinf,
            )
        else:
            from ..precompute import riccati_cache_jax

            new_caches = jax.vmap(
                lambda a, b, q, r, p, P0, K0: riccati_cache_jax(
                    a, b, q, r, p, P0=P0, K0=K0
                )
            )(prob_b.A, prob_b.B, prob_b.Q, prob_b.R, new_rho,
              caches.Pinf, caches.Kinf)
        caches = jax.tree.map(
            lambda n, o: jnp.where(
                changed.reshape((-1,) + (1,) * (n.ndim - 1)), n, o
            ),
            new_caches, caches,
        )
        hp = pad_hetero_problem(prob_b, caches)
        acc = {
            "d": carry.d, "y": carry.y, "g": carry.g, "z": carry.z,
            "v": carry.v, "U": U, "X": X, "pri": r_pri, "dua": r_dua,
        }
        return (hp, carry, caches, new_rho, prev_max, solved, iters, acc)

    if interpret:
        return fn
    return jax.jit(fn, static_argnames=("nt", "dims"))


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
    cone_params=None,
    cone_masks=None,
) -> AdaptiveHeteroResult:
    """OSQP-style per-instance rho adaptation with the iteration chunks on
    the hetero Pallas kernel (see module docstring).

    Arguments mirror :func:`.batched_ops.solve_adaptive_rho_batched`
    (``A/B/Q/R (B, ...)`` per-instance plants, ``rho0 (B,)``, ``problem``
    batch-leading bounds/Xref); ``cones`` + hetero-layout ``cone_params`` /
    ``cone_masks`` add the kernel's in-VMEM SOC projections. Not jittable
    (host-orchestrated rounds); each round is two dispatches.
    """
    from ..ops.hetero_admm import HeteroCarry, pad_hetero_problem

    batch = x0.shape[0]
    nx, nu = A.shape[-1], B.shape[-1]
    N = problem.Xref.shape[-2]
    nt = -(-batch // LANES)
    check_every = max(1, settings.check_termination)
    use_kernel = riccati == "kernel" or (
        riccati == "auto" and nx <= 16 and jax.default_backend() == "tpu"
    )

    if use_kernel:
        from ..ops.riccati_kernel import riccati_cache_kernel

        caches = riccati_cache_kernel(A, B, Q, R, rho0)
    else:
        from ..precompute import riccati_cache_jax

        caches = jax.vmap(riccati_cache_jax)(A, B, Q, R, rho0)
    prob_b = problem.replace(A=A, B=B, Q=Q, R=R)
    hp = jax.jit(pad_hetero_problem)(prob_b, caches)

    run = _jit_round(
        chunk, check_every, float(settings.abs_pri_tol),
        float(settings.abs_dua_tol), bool(settings.en_input_bound),
        bool(settings.en_state_bound), interpret, cones,
        cone_params is not None, cone_masks is not None,
    )
    decide = _jit_decide(
        float(adapt_factor), float(stall_factor), float(rho_min),
        float(rho_max), use_kernel, interpret,
    )

    carry = HeteroCarry.zeros(hp)
    rho = jnp.asarray(rho0, jnp.float32)
    prev_max = jnp.full((batch,), jnp.inf, jnp.float32)
    solved = jnp.zeros((batch,), bool)
    iters = jnp.zeros((batch,), jnp.int32)
    zb = jnp.zeros((batch,), jnp.float32)
    acc = {
        "d": carry.d, "y": carry.y, "g": carry.g, "z": carry.z,
        "v": carry.v,
        "U": jnp.zeros((batch, N - 1, nu), jnp.float32),
        "X": jnp.zeros((batch, N, nx), jnp.float32),
        "pri": zb, "dua": zb,
    }

    rounds = 0
    while rounds < max_rounds:
        res = run(x0, carry, hp, cone_params, cone_masks)
        (hp, carry, caches, rho, prev_max, solved, iters, acc) = decide(
            res, prob_b, caches, rho, prev_max, solved, iters, acc,
            nt=nt, dims=(nx, nu, N),
        )
        rounds += 1
        if bool(np.all(jax.device_get(solved))):
            break

    return AdaptiveHeteroResult(
        U=acc["U"], X=acc["X"], rho=rho, cache=caches, solved=solved,
        total_iter=iters, rounds=rounds,
        carry=HeteroCarry(d=acc["d"], y=acc["y"], g=acc["g"], z=acc["z"],
                          v=acc["v"]),
    )
