"""Multi-chip scaling: shard the batch axis over a device mesh.

The reference has zero distribution (SURVEY.md §2 — grep-verified: no
NCCL/MPI/threads anywhere); its scaling unit is "one MCU, one problem". The
TPU-native scaling story is the inverse: the per-instance ADMM solve
(reference: src/tinympc/admm.cpp:111-152) is embarrassingly parallel across
instances, so the batch axis shards over ICI with **zero** cross-device traffic
in the solve itself; collectives appear only for global convergence/residual
statistics (`psum`/`all_gather` ride ICI within a slice, DCN across hosts).

Design: one 1-D ``batch`` mesh axis. ``shard_map`` runs the local batch shard
through the same solver tiers used single-chip (scan / condensed / fused —
identical numerics), then a ``psum`` reduces the convergence stats. Multi-host
entry is standard ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import SOLVED, Cache, Problem, Settings, State
from ..solver.batched import solve_batched

BATCH_AXIS = "batch"


def make_batch_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first ``n_devices``) local-process devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (BATCH_AXIS,), devices=devs)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Place a batch-leading pytree with the batch axis sharded over the mesh."""
    def put(x):
        spec = P(BATCH_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place shared (problem/cache) pytrees replicated on every device."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def sharded_solve(
    mesh: Mesh,
    settings: Settings,
    *,
    solver: Callable[..., State] | None = None,
) -> Callable[[State, Problem, Cache], tuple[State, dict[str, jax.Array]]]:
    """Build a jitted sharded solve: batch-sharded state in, batch-sharded
    state + *globally reduced* stats out.

    The returned callable expects ``state`` sharded over ``BATCH_AXIS`` (see
    :func:`shard_batch`) and ``problem``/``cache`` replicated. Stats are
    reduced with ``psum``/``pmax`` over the mesh so every host sees global
    values — the cross-device traffic is only these scalars.
    """
    local_solve = solver or (
        lambda s, p, c: solve_batched(s, p, c, settings)
    )

    def shard_fn(state: State, problem: Problem, cache: Cache):
        out = local_solve(state, problem, cache)
        converged = (out.status == SOLVED).astype(jnp.float32)
        n_local = jnp.asarray(out.iter.shape[0], jnp.float32)
        stats = {
            "n_total": jax.lax.psum(n_local, BATCH_AXIS),
            "n_converged": jax.lax.psum(jnp.sum(converged), BATCH_AXIS),
            "iterations_sum": jax.lax.psum(
                jnp.sum(out.iter.astype(jnp.float32)), BATCH_AXIS
            ),
            "iterations_max": jax.lax.pmax(jnp.max(out.iter), BATCH_AXIS),
            "primal_residual_state_max": jax.lax.pmax(
                jnp.max(out.primal_residual_state), BATCH_AXIS
            ),
            "primal_residual_input_max": jax.lax.pmax(
                jnp.max(out.primal_residual_input), BATCH_AXIS
            ),
            "dual_residual_state_max": jax.lax.pmax(
                jnp.max(out.dual_residual_state), BATCH_AXIS
            ),
            "dual_residual_input_max": jax.lax.pmax(
                jnp.max(out.dual_residual_input), BATCH_AXIS
            ),
        }
        return out, stats

    batch_spec = P(BATCH_AXIS)
    # check_vma=False: the solver builds fresh (device-invariant) constants for
    # status/iter resets, which trips the varying-manual-axes consistency check
    # inside while_loop carries; semantics are unaffected (batch-parallel).
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(batch_spec, P(), P()),
        out_specs=(batch_spec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def summarize_stats(stats: dict[str, jax.Array]) -> dict[str, float]:
    """Host-side scalarization of the psum'd stats."""
    n = float(stats["n_total"])
    return {
        "n_total": n,
        "converged_fraction": float(stats["n_converged"]) / max(n, 1.0),
        "iterations_mean": float(stats["iterations_sum"]) / max(n, 1.0),
        "iterations_max": float(stats["iterations_max"]),
        "primal_residual_state_max": float(stats["primal_residual_state_max"]),
        "primal_residual_input_max": float(stats["primal_residual_input_max"]),
        "dual_residual_state_max": float(stats["dual_residual_state_max"]),
        "dual_residual_input_max": float(stats["dual_residual_input_max"]),
    }


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host entry (DCN): standard JAX distributed runtime bring-up.
    No-op when running single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def sharded_fused_solve(
    mesh: Mesh,
    pp,
    *,
    max_iter: int = 100,
    check_termination: int = 0,
    abs_pri_tol: float = 1e-3,
    abs_dua_tol: float = 1e-3,
    batch_tile: int = 512,
    interpret: bool = False,
):
    """The production configuration: the fused Pallas kernel per shard under
    ``shard_map`` — each device runs its local batch through one whole-solve
    kernel launch, with only the convergence stats psum'd over the mesh.

    Returns a jitted ``(x0s, carry) -> (FusedResult, stats)`` where ``x0s``
    and every carry leaf are batch-sharded (see :func:`shard_batch`) and the
    result stays batch-sharded. ``pp`` (operators/problem vectors) is
    replicated automatically as closure constants.
    """
    from ..ops.fused_admm import fused_solve

    def shard_fn(x0s, carry):
        res = fused_solve(
            x0s, carry, pp, max_iter=max_iter,
            check_termination=check_termination,
            abs_pri_tol=abs_pri_tol, abs_dua_tol=abs_dua_tol,
            batch_tile=batch_tile, interpret=interpret,
        )
        n_local = jnp.asarray(res.stats.shape[0], jnp.float32)
        stats = {
            "n_total": jax.lax.psum(n_local, BATCH_AXIS),
            "n_converged": jax.lax.psum(jnp.sum(res.stats[:, 1]), BATCH_AXIS),
            "iterations_sum": jax.lax.psum(
                jnp.sum(res.stats[:, 0]), BATCH_AXIS
            ),
            "iterations_max": jax.lax.pmax(
                jnp.max(res.stats[:, 0]), BATCH_AXIS
            ),
            # residual lanes (2-5): pri_state, dua_state, pri_input, dua_input
            # — valid in both modes (the fixed kernel fills them from its
            # final iteration). Only the solved flag (lane 1) is untracked in
            # fixed-iteration mode, so n_converged is meaningful only in
            # adaptive mode.
            "primal_residual_state_max": jax.lax.pmax(
                jnp.max(res.stats[:, 2]), BATCH_AXIS
            ),
            "dual_residual_state_max": jax.lax.pmax(
                jnp.max(res.stats[:, 3]), BATCH_AXIS
            ),
            "primal_residual_input_max": jax.lax.pmax(
                jnp.max(res.stats[:, 4]), BATCH_AXIS
            ),
            "dual_residual_input_max": jax.lax.pmax(
                jnp.max(res.stats[:, 5]), BATCH_AXIS
            ),
        }
        return res, stats

    batch_spec = P(BATCH_AXIS)
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(batch_spec, batch_spec),
        out_specs=(batch_spec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_fused_rollout(
    mesh: Mesh,
    pp,
    rops,
    n_ticks: int,
    *,
    max_iter: int = 100,
    check_termination: int = 0,
    abs_pri_tol: float = 1e-3,
    abs_dua_tol: float = 1e-3,
    batch_tile: int = 512,
    interpret: bool = False,
    const_seq: jax.Array | None = None,
):
    """The in-kernel receding-horizon mission (:func:`..ops.fused_rollout.
    fused_rollout`) per shard under ``shard_map``: each device runs its
    local batch's entire K-tick MPC mission in one Pallas launch — ticks
    are plant-local, so the mission needs **zero** cross-device traffic;
    only per-mission iteration stats are psum'd (the reference's host MPC
    loop, examples/quadrotor_hovering.cpp:90-114, made fleet-wide).

    Returns a jitted ``(x0s, carry) -> (RolloutResult, stats)``; ``x0s``
    and carry leaves batch-sharded, ``us``/``iters`` sharded on their
    batch (second) axis.
    """
    from ..ops.fused_rollout import fused_rollout

    def shard_fn(x0s, carry):
        res = fused_rollout(
            x0s, carry, pp, rops, n_ticks, max_iter=max_iter,
            check_termination=check_termination,
            abs_pri_tol=abs_pri_tol, abs_dua_tol=abs_dua_tol,
            batch_tile=batch_tile, interpret=interpret,
            const_seq=const_seq,
        )
        stats = {
            "n_total": jax.lax.psum(
                jnp.asarray(res.x_final.shape[0], jnp.float32), BATCH_AXIS
            ),
            "iterations_sum": jax.lax.psum(jnp.sum(res.iters), BATCH_AXIS),
            "iterations_max": jax.lax.pmax(jnp.max(res.iters), BATCH_AXIS),
            "last_tick_iterations_mean": jax.lax.pmean(
                jnp.mean(res.iters[-1]), BATCH_AXIS
            ),
        }
        return res, stats

    batch_spec = P(BATCH_AXIS)
    tick_batch = P(None, BATCH_AXIS)
    from ..ops.fused_rollout import RolloutResult
    from ..ops.fused_admm import FusedCarry, FusedResult

    res_spec = RolloutResult(
        x_final=batch_spec, us=tick_batch, iters=tick_batch,
        final=FusedResult(
            U=batch_spec, X=batch_spec,
            carry=FusedCarry(*([batch_spec] * 5)), stats=batch_spec,
        ),
    )
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(batch_spec, batch_spec),
        out_specs=(res_spec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_hetero_solve(
    mesh: Mesh,
    *,
    max_iter: int = 100,
    en_input_bound: bool = True,
    en_state_bound: bool = True,
    interpret: bool = False,
):
    """Heterogeneous-plant fused kernel per shard: every instance carries its
    own plant AND the batch (plants included) shards over the mesh — the full
    inversion of the reference's one-problem-per-process scaling unit
    (reference: src/tinympc/tiny_wrapper.hpp:6).

    Returns a jitted ``(x0s, carry, hp) -> (HeteroResult, stats)``. ``x0s``,
    every carry leaf, and every ``hp`` array leaf are batch-sharded on their
    leading axis (lane-tile granularity: the global tile count ``hp.tiles``
    must divide by the mesh size, i.e. pad the batch to a multiple of
    ``128 * n_devices``). Residual stats are psum'd; the solve itself is
    communication-free.
    """
    from ..ops.hetero_admm import HeteroCarry, HeteroProblem, hetero_solve

    nd = mesh.devices.size

    def shard_fn(x0s, carry, hp):
        hp = hp.replace(batch=hp.batch // nd)
        res = hetero_solve(
            x0s, carry, hp, max_iter=max_iter,
            en_input_bound=en_input_bound, en_state_bound=en_state_bound,
            interpret=interpret,
        )
        n_local = jnp.asarray(res.stats.shape[0], jnp.float32)
        stats = {
            "n_total": jax.lax.psum(n_local, BATCH_AXIS),
            "iterations_max": jax.lax.pmax(
                jnp.max(res.stats[:, 0]), BATCH_AXIS
            ),
            "primal_residual_state_max": jax.lax.pmax(
                jnp.max(res.stats[:, 2]), BATCH_AXIS
            ),
            "dual_residual_state_max": jax.lax.pmax(
                jnp.max(res.stats[:, 3]), BATCH_AXIS
            ),
            "primal_residual_input_max": jax.lax.pmax(
                jnp.max(res.stats[:, 4]), BATCH_AXIS
            ),
            "dual_residual_input_max": jax.lax.pmax(
                jnp.max(res.stats[:, 5]), BATCH_AXIS
            ),
        }
        return res, stats

    batch_spec = P(BATCH_AXIS)
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(batch_spec, batch_spec, batch_spec),
        out_specs=(batch_spec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_adaptive_hetero(
    mesh: Mesh,
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
):
    """Per-instance adaptive rho at hetero-kernel speed under a device mesh
    — the flagship fused adaptation loop
    (:func:`..solver.adaptive_hetero.solve_adaptive_rho_hetero`: chunked
    hetero-kernel iterations + Newton-Kleinman/fixed-point Riccati
    refreshes in ONE ``lax.while_loop``) sharded over the batch axis
    (reference rho-in-the-cache anchor: src/tinympc/codegen.cpp:254-292).

    Per-instance rho is shard-local state, so the whole adaptation loop is
    communication-free: each shard runs its own fused while_loop and exits
    when *its* instances converge (a globally-synchronized loop would add
    a psum per round for zero benefit — rounds after an instance converges
    freeze it verbatim, so shard-local exit is decision-for-decision
    identical per instance; pinned in tests/test_parallel.py). Collectives
    appear only in the returned summary stats.

    Returns a jitted
    ``(x0s, problem_b, A, B, Q, R, rho0) -> (result_dict, stats)``.
    Every argument is a GLOBAL batch-leading array (``B`` divisible by the
    mesh size; divisible by ``128 * n_devices`` keeps shard-local lane
    packing identical to the unsharded loop's, giving per-instance
    schedule parity). ``result_dict`` holds the
    :class:`..solver.adaptive_hetero.AdaptiveHeteroResult` fields
    batch-stitched (``rounds`` becomes the per-shard maximum, in
    ``stats``); ``cones`` is a static shared :class:`ConeSet` (per-instance
    cone params need lane-packed operands whose global layout matches the
    128-aligned shard split — use the unsharded loop or pack per shard).
    """
    from ..solver.adaptive_hetero import solve_adaptive_rho_hetero

    def shard_fn(x0s, prob_b, A, B_, Q, R, rho0):
        res = solve_adaptive_rho_hetero(
            x0s, prob_b, A, B_, Q, R, rho0, settings,
            chunk=chunk, max_rounds=max_rounds,
            adapt_factor=adapt_factor, stall_factor=stall_factor,
            rho_min=rho_min, rho_max=rho_max, riccati=riccati,
            interpret=interpret, cones=cones,
        )
        n_local = jnp.asarray(x0s.shape[0], jnp.float32)
        solved_local = jnp.sum(res.solved.astype(jnp.float32))
        stats = {
            "n_total": jax.lax.psum(n_local, BATCH_AXIS),
            "n_solved": jax.lax.psum(solved_local, BATCH_AXIS),
            "rounds_max": jax.lax.pmax(res.rounds, BATCH_AXIS),
            "iterations_max": jax.lax.pmax(
                jnp.max(res.total_iter), BATCH_AXIS
            ),
        }
        out = {
            "U": res.U, "X": res.X, "rho": res.rho, "cache": res.cache,
            "solved": res.solved, "total_iter": res.total_iter,
            "carry": res.carry,
        }
        return out, stats

    batch_spec = P(BATCH_AXIS)
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(batch_spec,) * 7,
        out_specs=(batch_spec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_hstream_solve(
    mesh: Mesh,
    *,
    max_iter: int = 100,
    knot_block: int = 16,
    check_termination: int = 0,
    abs_pri_tol: float = 1e-3,
    abs_dua_tol: float = 1e-3,
    en_input_bound: bool = True,
    en_state_bound: bool = True,
    interpret: bool = False,
    cones=None,
):
    """Heterogeneous streaming kernel per shard: per-instance plants at long
    horizons (ops/hstream_admm.py), batch + plants sharded over the mesh on
    the lane-tile axis, solve communication-free, residual stats psum'd.

    Returns a jitted ``(x0s, carry, hsp) -> (StreamResult, stats)``. ``x0s``,
    every carry leaf (``(NT, N, S, L)``), and every ``hsp`` array leaf shard
    on their leading axis (the global tile count must divide by the mesh
    size: pad the batch to a multiple of ``128 * n_devices``).

    ``check_termination > 0`` runs the adaptive kernel per shard (in-kernel
    per-instance freeze; tiles exit early independently per device).
    """
    from ..ops.hstream_admm import hstream_solve

    nd = mesh.devices.size

    def shard_fn(x0s, carry, hsp):
        hsp = hsp.replace(batch=hsp.batch // nd)
        res = hstream_solve(
            x0s, carry, hsp, max_iter=max_iter, knot_block=knot_block,
            check_termination=check_termination,
            abs_pri_tol=abs_pri_tol, abs_dua_tol=abs_dua_tol,
            en_input_bound=en_input_bound, en_state_bound=en_state_bound,
            interpret=interpret, cones=cones,
        )
        n_local = jnp.asarray(res.stats.shape[0], jnp.float32)
        stats = {
            "n_total": jax.lax.psum(n_local, BATCH_AXIS),
            "primal_residual_state_max": jax.lax.pmax(
                jnp.max(res.stats[:, 2]), BATCH_AXIS
            ),
            "dual_residual_state_max": jax.lax.pmax(
                jnp.max(res.stats[:, 3]), BATCH_AXIS
            ),
            "primal_residual_input_max": jax.lax.pmax(
                jnp.max(res.stats[:, 4]), BATCH_AXIS
            ),
            "dual_residual_input_max": jax.lax.pmax(
                jnp.max(res.stats[:, 5]), BATCH_AXIS
            ),
        }
        return res, stats

    batch_spec = P(BATCH_AXIS)
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(batch_spec, batch_spec, batch_spec),
        out_specs=(batch_spec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_stream_solve(
    mesh: Mesh,
    *,
    max_iter: int = 100,
    knot_block: int = 32,
    check_termination: int = 0,
    abs_pri_tol: float = 1e-3,
    abs_dua_tol: float = 1e-3,
    en_input_bound: bool = True,
    en_state_bound: bool = True,
    interpret: bool = False,
    cones=None,
):
    """Streaming long-horizon kernel per shard: the batch (lane tiles)
    shards over the mesh, the shared problem operands replicate, the solve
    is communication-free, residual stats are psum'd.

    Returns a jitted ``(x0s, carry, sp) -> (StreamResult, stats)``. ``x0s``
    and every carry leaf shard on the leading axis (lane-tile granularity:
    the tile count must divide by the mesh size — pad the batch to a
    multiple of ``128 * n_devices``); ``sp`` is replicated.

    ``check_termination > 0`` runs the adaptive kernel per shard (in-kernel
    per-instance freeze; tiles exit early independently on every device —
    no cross-device synchronization in the iteration loop).
    """
    from ..ops.stream_admm import stream_solve

    def shard_fn(x0s, carry, sp):
        res = stream_solve(
            x0s, carry, sp, max_iter=max_iter, knot_block=knot_block,
            check_termination=check_termination,
            abs_pri_tol=abs_pri_tol, abs_dua_tol=abs_dua_tol,
            en_input_bound=en_input_bound, en_state_bound=en_state_bound,
            interpret=interpret, cones=cones,
        )
        n_local = jnp.asarray(res.stats.shape[0], jnp.float32)
        stats = {
            "n_total": jax.lax.psum(n_local, BATCH_AXIS),
            "primal_residual_state_max": jax.lax.pmax(
                jnp.max(res.stats[:, 2]), BATCH_AXIS
            ),
            "dual_residual_state_max": jax.lax.pmax(
                jnp.max(res.stats[:, 3]), BATCH_AXIS
            ),
            "primal_residual_input_max": jax.lax.pmax(
                jnp.max(res.stats[:, 4]), BATCH_AXIS
            ),
            "dual_residual_input_max": jax.lax.pmax(
                jnp.max(res.stats[:, 5]), BATCH_AXIS
            ),
        }
        return res, stats

    batch_spec = P(BATCH_AXIS)
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(batch_spec, batch_spec, P()),
        out_specs=(batch_spec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_cascade_solve(
    mesh: Mesh,
    pp,
    *,
    max_iter: int = 100,
    check_termination: int = 1,
    segment_iters: int | None = None,
    segment_growth: float = 4.0,
    abs_pri_tol: float = 1e-3,
    abs_dua_tol: float = 1e-3,
    batch_tile: int | None = None,
    min_bucket: int | None = None,
    interpret: bool = False,
    segment_log: list | None = None,
):
    """Early-termination compaction cascade under a device mesh (the
    reference's early exit, src/tinympc/admm.cpp:135-144, made mesh-level;
    single-device semantics in :func:`..solver.cascade.cascade_solve`,
    which see for the segment/scheduling contract — identical here).

    Design: shard_map keeps every shard the same shape, so purely
    *shard-local* compaction would let one straggler-heavy shard pin every
    shard's bucket at its own survivor count. Instead the survivor set is
    **rebalanced globally** between segments: one jitted gather pulls the
    survivors (wherever they live) into the next, smaller, evenly-sharded
    bucket — the few hard instances ride the interconnect so every shard
    keeps an equal share of the remaining work; the kernel segments
    themselves run communication-free under ``shard_map``. Survivor rows
    are the only cross-shard traffic, and they shrink geometrically.

    Returns a host-side callable ``run(x0, carry) -> FusedResult`` over
    GLOBAL batch-leading arrays (``B`` divisible by the mesh size).
    Iteration schedules compose exactly as in the single-device cascade;
    controls match at its established 1e-4 lane-slot bound
    (tests/test_sharded_cascade.py). ``segment_log`` (optional list)
    records (iters_done, per-shard bucket) pairs — the reclaimed-compute
    audit trail.
    """
    from ..ops.fused_admm import FusedCarry, FusedResult, fused_solve
    from ..solver.cascade import _next_pow2

    nd = mesh.devices.size
    if check_termination <= 0:
        raise ValueError("sharded cascade requires adaptive mode")
    if segment_iters is None:
        segment_iters = check_termination * max(
            1, round(25 / check_termination)
        )
    if segment_iters % check_termination != 0:
        raise ValueError(
            "segment_iters must be a multiple of check_termination"
        )
    if segment_growth < 1.0:
        raise ValueError("segment_growth must be >= 1.0")

    batch_spec = P(BATCH_AXIS)
    pri = jnp.float32(abs_pri_tol)
    dua = jnp.float32(abs_dua_tol)
    seg_cache: dict = {}

    def seg(k, bt):
        if (k, bt) not in seg_cache:
            def shard_fn(x0s, carry):
                return fused_solve(
                    x0s, carry, pp, max_iter=k,
                    check_termination=check_termination,
                    abs_pri_tol=pri, abs_dua_tol=dua, batch_tile=bt,
                    interpret=interpret,
                )

            mapped = jax.shard_map(
                shard_fn, mesh=mesh,
                in_specs=(batch_spec, batch_spec),
                out_specs=batch_spec, check_vma=False,
            )
            seg_cache[(k, bt)] = mapped if interpret else jax.jit(mapped)
        return seg_cache[(k, bt)]

    # Output buffers stay replicated: the scatter pulls each shard's
    # segment rows home; survivor traffic shrinks geometrically.
    repl = NamedSharding(mesh, P())

    def _scatter(out, res, idx, off):
        rows = ((res.U, res.X, res.stats.at[:, 0].add(off))
                + tuple(res.carry))
        out = tuple(
            buf.at[idx].set(r, out_sharding=repl)
            for buf, r in zip(out, rows)
        )
        return out, res.stats[:, 1]

    def _scatter_init(res, idx, B, off):
        rows = ((res.U, res.X, res.stats.at[:, 0].add(off))
                + tuple(res.carry))
        out = tuple(
            jnp.zeros((B + 1, r.shape[1]), r.dtype).at[idx].set(
                r, out_sharding=repl
            )
            for r in rows
        )
        return out, res.stats[:, 1]

    bsh = NamedSharding(mesh, P(BATCH_AXIS))

    def _gather(x0_b, carry, loc):
        # Survivors gather straight into the next batch-sharded bucket —
        # the rebalancing collective.
        g = lambda a: a.at[loc].get(out_sharding=bsh)
        return g(x0_b), jax.tree.map(g, carry)

    def _finalize(out, B):
        return tuple(a[:B] for a in out)

    # Only the Pallas segment needs the interpret no-jit policy; the
    # scatter/gather/finalize steps are plain XLA and stay jitted (eager ops
    # on shard_map outputs would need an ambient mesh context).
    scatter = jax.jit(_scatter, donate_argnums=0)
    scatter_init = jax.jit(_scatter_init, static_argnums=2)
    gather = jax.jit(_gather)
    finalize = jax.jit(_finalize, static_argnums=1)

    def run(x0, carry):
        B = x0.shape[0]
        if B % nd:
            raise ValueError(f"batch {B} must divide by mesh size {nd}")
        bl = B // nd
        mb = min_bucket if min_bucket is not None else min(128, bl)
        bt0 = batch_tile if batch_tile is not None else min(512, bl)
        active_idx = np.arange(B, dtype=np.int64)
        x0_b = shard_batch(x0, mesh)
        carry_b = shard_batch(carry, mesh)
        out = None
        done_iters = 0
        cur_seg = segment_iters
        while True:
            n_active = active_idx.size
            k = min(cur_seg, max_iter - done_iters)
            bps = x0_b.shape[0] // nd  # per-shard bucket this segment
            res = seg(k, min(bt0, bps))(x0_b, carry_b)
            idx = np.full(res.stats.shape[0], B, np.int64)
            idx[:n_active] = active_idx
            if out is None:
                out, solved_col = scatter_init(
                    res, jnp.asarray(idx), B, jnp.float32(done_iters)
                )
            else:
                out, solved_col = scatter(
                    out, res, jnp.asarray(idx), jnp.float32(done_iters)
                )
            done_iters += k
            if done_iters >= max_iter:
                break
            solved = np.asarray(jax.device_get(solved_col))[:n_active] > 0.5
            keep = np.nonzero(~solved)[0]
            if keep.size == 0:
                break
            cur_seg = max(
                check_termination,
                int(cur_seg * segment_growth)
                // check_termination * check_termination,
            )
            active_idx = active_idx[keep]
            # Global rebalance: next bucket = nd x pow2(per-shard share).
            per_shard = min(bl, max(mb, _next_pow2(-(-keep.size // nd))))
            bucket = per_shard * nd
            local = np.concatenate([
                keep, np.full(bucket - keep.size, keep[-1], keep.dtype),
            ])
            if segment_log is not None:
                segment_log.append((done_iters, per_shard))
            x0_b, carry_b = gather(x0_b, res.carry, jnp.asarray(local))

        out = finalize(out, B)
        return FusedResult(
            U=out[0], X=out[1], carry=FusedCarry(*out[3:]), stats=out[2],
        )

    return run
