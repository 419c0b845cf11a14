"""Heterogeneous-plant fused Pallas kernel: one distinct plant per instance.

The reference binds one plant per process (global workspace, reference:
src/tinympc/tiny_wrapper.hpp:6); the per-instance-operator jnp tier
(:mod:`..solver.batched_ops`) already inverts that, but its condensed
operators are ~45 KB *per instance* and re-read every iteration — the tier is
HBM-bound and loses to the plain scan tier at scale. This kernel is the
TPU-native fast path for truly heterogeneous batches, built on the opposite
trade:

* **Small per-instance data.** Only the plant/cache matrices ride along
  (~1.8 KB/instance: A, B, Kinf, Quu_inv, AmBKt and friends), loaded into
  VMEM **once** per batch tile and reused across every iteration. HBM
  traffic per solve is O(problem size), not O(iterations x operators).
* **Batch on lanes, sweeps on the VPU.** A tile is 128 instances on the lane
  axis. Each per-instance matrix is stored *transposed-3D* as
  ``(r_in, r_out, LANES)``; a per-lane matvec is a broadcast-multiply and a
  reduction over the leading (major) axis — ``sum(M3 * v[:, None, :], 0)``
  — which Mosaic unrolls into full-width ``(r_out, LANES)`` FMAs. No MXU:
  with a different matrix in every lane there is nothing for the systolic
  array to share, and the recurrence form does ~3x fewer FLOPs than the
  per-instance condensed-operator form anyway.
* **Whole solve in one kernel.** Both horizon sweeps of every ADMM iteration
  (reference: src/tinympc/admm.cpp:27-37 forward rollout, :15-22 backward
  gradient recursion) run as statically-unrolled in-VMEM recurrences, with
  the slack projection (admm.cpp:45-61), dual ascent (:67-71) and
  linear-cost refresh (:77-85) fused between them. ``r``/``q`` are never
  materialized across iterations — rebuilt on the fly from the
  post-dual-update slacks/duals exactly as the reference schedule implies
  (admm.cpp:129 runs before :132).

Semantics match :mod:`..solver.admm` stage for stage in fixed-iteration mode
(``check_termination == 0`` — the deterministic golden/benchmark mode);
residual stats come from the final iteration using the pre-save ``v``/``z``
(admm.cpp:95-98). For per-instance early termination / adaptive use
:func:`..solver.batched_ops.solve_instance_ops`.

Mosaic discipline (CLAUDE.md): batch lives on lanes, every per-instance
scalar is a full-width row, reductions to ``(1, LANES)`` happen once outside
all loops, and narrow outputs pack via one-hot sublane masks.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Cache, Problem

LANES = 128


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _dotb(M3: jax.Array, v: jax.Array) -> jax.Array:
    """Per-lane matvec: ``M3 (r_in, r_out, L)`` transposed-3D matrices,
    ``v (r_in, L)`` -> ``(r_out, L)``. Unrolls to r_in full-width
    multiply-adds, accumulated as a pairwise tree: the sweeps are dependent
    recurrences, so the add chain's latency is on the critical path — the
    tree cuts its depth from r_in to log2(r_in) (measured +5% whole-kernel
    on-chip vs a single sequential accumulator)."""
    p = M3 * v[:, None, :]
    while p.shape[0] > 1:
        h = p.shape[0] // 2
        q = p[:h] + p[h:2 * h]
        p = jnp.concatenate([q, p[2 * h:]], axis=0) if p.shape[0] % 2 else q
    return p[0]


@struct.dataclass
class HeteroProblem:
    """Kernel-ready per-instance operands, lane-packed into batch tiles.

    Matrix fields are transposed-3D ``(NT*r_in, r_out, LANES)`` — entry
    ``[t*r_in + k, j, l]`` is element ``(j, k)`` of instance ``t*LANES + l``'s
    matrix (zero-padded to ``SX = pad8(nx)`` / ``SU = pad8(nu)`` so padded
    dims stay identically zero through every stage). Vector fields are
    lane-packed 2D. ``dims = (nx, nu, N)`` is static."""

    A3: jax.Array        # (NT*SX, SX, L)   A
    B3: jax.Array        # (NT*SU, SX, L)   B   (contract u -> x)
    K3: jax.Array        # (NT*SX, SU, L)   Kinf (contract x -> u)
    Kt3: jax.Array       # (NT*SU, SX, L)   Kinf^T (contract r -> x)
    Quu3: jax.Array      # (NT*SU, SU, L)   Quu_inv
    Bt3: jax.Array       # (NT*SX, SU, L)   B^T (contract p -> u-dim)
    M3: jax.Array        # (NT*SX, SX, L)   AmBKt
    u_min: jax.Array     # (NT*m*SU, L) per-knot per-instance bounds
    u_max: jax.Array
    x_min: jax.Array     # (NT*N*SX, L)
    x_max: jax.Array
    qc: jax.Array        # (NT*N*SX, L)  -(Q o Xref_i) per knot
    pterm: jax.Array     # (NT*SX, L)    -Pinf^T Xref_{N-1}
    rho_u: jax.Array     # (NT*SU, L)    rho broadcast to input rows
    rho_x: jax.Array     # (NT*SX, L)
    dims: tuple = struct.field(pytree_node=False)  # (nx, nu, N)
    batch: int = struct.field(pytree_node=False)

    @property
    def SX(self) -> int:
        return self.A3.shape[1]

    @property
    def SU(self) -> int:
        return self.Quu3.shape[1]

    @property
    def tiles(self) -> int:
        return self.pterm.shape[0] // self.SX


def _lane_pack_vec(a: jax.Array, S: int, nt: int) -> jax.Array:
    """(B, k) -> (NT*S, L): instance b = t*LANES + l on lane l of tile t,
    rows zero-padded k -> S."""
    Bn, k = a.shape
    out = jnp.zeros((nt * LANES, S), a.dtype)
    out = out.at[:Bn, :k].set(a)
    return out.reshape(nt, LANES, S).transpose(0, 2, 1).reshape(nt * S, LANES)


def _lane_pack_mat(a: jax.Array, R_in: int, R_out: int, nt: int) -> jax.Array:
    """(B, r_out, r_in) -> transposed-3D (NT*R_in, R_out, L)."""
    Bn, r_out, r_in = a.shape
    out = jnp.zeros((nt * LANES, R_in, R_out), a.dtype)
    out = out.at[:Bn, :r_in, :r_out].set(a.transpose(0, 2, 1))
    return (
        out.reshape(nt, LANES, R_in, R_out)
        .transpose(0, 2, 3, 1)
        .reshape(nt * R_in, R_out, LANES)
    )


def _unpack_rows(p: jax.Array, S: int) -> jax.Array:
    """(NT*S, L) lane-packed -> (NT*L, S) batch-leading (padding rows kept)."""
    nt = p.shape[0] // S
    return p.reshape(nt, S, LANES).transpose(0, 2, 1).reshape(nt * LANES, S)


def _repack_rows(a: jax.Array, S: int) -> jax.Array:
    """(B, S) batch-leading -> (NT*S, L) lane-packed (batch padded to a lane
    multiple with zeros)."""
    Bn = a.shape[0]
    nt = -(-Bn // LANES)
    out = jnp.zeros((nt * LANES, S), a.dtype).at[:Bn].set(a)
    return out.reshape(nt, LANES, S).transpose(0, 2, 1).reshape(nt * S, LANES)


def _unpack_mat3(p: jax.Array, R_in: int) -> jax.Array:
    """(NT*R_in, R_out, L) -> (NT*L, R_in, R_out)."""
    R_out = p.shape[1]
    nt = p.shape[0] // R_in
    return (
        p.reshape(nt, R_in, R_out, LANES)
        .transpose(0, 3, 1, 2)
        .reshape(nt * LANES, R_in, R_out)
    )


def _repack_mat3(a: jax.Array) -> jax.Array:
    """(B, R_in, R_out) -> (NT*R_in, R_out, L)."""
    Bn, R_in, R_out = a.shape
    nt = -(-Bn // LANES)
    out = jnp.zeros((nt * LANES, R_in, R_out), a.dtype).at[:Bn].set(a)
    return (
        out.reshape(nt, LANES, R_in, R_out)
        .transpose(0, 2, 3, 1)
        .reshape(nt * R_in, R_out, LANES)
    )


def pad_hetero_cone_params(
    cones, batch: int,
    mu_u=None, shift_u=None, mu_x=None, shift_x=None,
    dtype: Any = jnp.float32,
) -> jax.Array:
    """Lane-pack per-instance cone parameters for :func:`hetero_solve`.

    ``mu_u``/``shift_u`` are ``(n_input_cones, B)`` (or None to use the
    cones' static scalars), likewise ``mu_x``/``shift_x`` for state cones —
    heterogeneous constraint geometry (e.g. per-lander tilt limits) to go
    with the heterogeneous plants. Returns the stacked ``(NT*C*8, L)``
    operand (per cone: row 0 = mu lanes, row 1 = shift lanes, rows 2-7
    pad the 8-sublane tile), input cones first."""
    nt = -(-batch // LANES)
    blocks = []

    def push(cone_list, mu, shift):
        for c, cone in enumerate(cone_list):
            muv = (jnp.full((batch,), float(cone.mu), dtype)
                   if mu is None else jnp.asarray(mu[c], dtype))
            shv = (jnp.full((batch,), float(cone.shift), dtype)
                   if shift is None else jnp.asarray(shift[c], dtype))
            rows = jnp.stack([
                muv, shv,
                *([jnp.zeros((batch,), dtype)] * 6),
            ], axis=1)  # (B, 8)
            blocks.append(_lane_pack_vec(rows, 8, nt))  # (nt*8, L)

    push(tuple(cones.input_cones), mu_u, shift_u)
    push(tuple(cones.state_cones), mu_x, shift_x)
    C = len(blocks)
    # interleave per tile: want (NT * C*8, L) with tile t's C blocks
    # contiguous — each block is (nt*8, L); restack.
    stacked = jnp.stack(blocks, axis=0)          # (C, nt*8, L)
    stacked = stacked.reshape(C, nt, 8, LANES).transpose(1, 0, 2, 3)
    return stacked.reshape(nt * C * 8, LANES)


def pad_hetero_cone_masks(
    cones, batch: int, nx: int, nu: int,
    ball_u=None, axis_u=None, ball_x=None, axis_x=None,
    dtype: Any = jnp.float32,
) -> jax.Array:
    """Lane-pack per-instance cone *geometry* (ball/axis indices) for
    :func:`hetero_solve` — e.g. a fleet whose landers have the thrust axis
    on different coordinates. ``ball_u``/``axis_u`` are per-input-cone
    lists: ``ball_u[c]`` is ``(B, nu)`` 0/1 membership (or None to
    broadcast the cone's static ``ball``), ``axis_u[c]`` is ``(B,)`` int
    axis indices (or None for the static ``axis``); likewise
    ``ball_x``/``axis_x`` on ``(B, nx)``. Returns the stacked
    ``(NT * MR, L)`` operand (per cone: ball-mask rows then axis-one-hot
    rows at the cone's sublane width), input cones first. When a cone's
    masks encode its static indices the kernel's masked projection matches
    the static one bitwise (ascending ``ball``).

    Validated at pack time (the masked projection's arithmetic silently
    corrupts otherwise): axis indices must lie in ``[0, dim)`` (one-hotting
    a pad sublane would break the zero-pad layout invariant) and each
    instance's effective ball and axis lanes must be disjoint — the trap is
    overriding only ``axis`` while the *static* ball still covers the new
    axis coordinate."""
    nt = -(-batch // LANES)
    SX, SU = _pad8(max(nx, 1)), _pad8(max(nu, 1))
    blocks = []   # list of (rows_per_tile, (nt*rows, L)) lane-packed blocks

    def push(cone_list, dim, S, ball, axis, kind):
        for c, cone in enumerate(cone_list):
            bm = np.zeros((batch, S), np.float32)
            if ball is None or ball[c] is None:
                bm[:, list(cone.ball)] = 1.0
            else:
                bm[:, :dim] = np.asarray(ball[c], np.float32)
            am = np.zeros((batch, S), np.float32)
            if axis is None or axis[c] is None:
                am[:, int(cone.axis)] = 1.0
            else:
                ax = np.asarray(axis[c], np.int64)
                if ax.min() < 0 or ax.max() >= dim:
                    raise ValueError(
                        f"{kind} cone {c}: axis indices must be in "
                        f"[0, {dim}), got [{ax.min()}, {ax.max()}]"
                    )
                am[np.arange(batch), ax] = 1.0
            bad = np.nonzero((bm * am).sum(axis=1) > 0)[0]
            if bad.size:
                raise ValueError(
                    f"{kind} cone {c}: ball and axis lanes overlap for "
                    f"instance(s) {bad[:8].tolist()}{'...' if bad.size > 8 else ''} "
                    "— when overriding only axis (or only ball), the other "
                    "defaults to the cone's static indices; pass both"
                )
            rows = jnp.asarray(
                np.concatenate([bm, am], axis=1), dtype
            )  # (B, 2*S)
            blocks.append((2 * S, _lane_pack_vec(rows, 2 * S, nt)))

    push(tuple(cones.input_cones), nu, SU, ball_u, axis_u, "input")
    push(tuple(cones.state_cones), nx, SX, ball_x, axis_x, "state")
    # Per-tile interleave with variable block heights: reshape each block
    # tile-major and concatenate along the row axis (n_blocks arrays, not
    # nt*n_blocks eager slices — relay chatter, see CLAUDE.md).
    mr = sum(rows for rows, _ in blocks)
    parts = [blk.reshape(nt, rows, LANES) for rows, blk in blocks]
    return jnp.concatenate(parts, axis=1).reshape(nt * mr, LANES)


def cone_rows_per_tile(cones, nx: int, nu: int) -> tuple[int, int]:
    """Rows-per-tile of the two lane-packed per-instance cone operands:
    ``(params_rows, masks_rows)`` — the strides needed to gather/re-pack
    them (:func:`gather_hetero_rows`)."""
    ci, cs = len(cones.input_cones), len(cones.state_cones)
    SX, SU = _pad8(max(nx, 1)), _pad8(max(nu, 1))
    return (ci + cs) * 8, 2 * SU * ci + 2 * SX * cs


def gather_hetero_rows(p: jax.Array, rows: int, idx: jax.Array) -> jax.Array:
    """Gather instances ``idx`` out of a lane-packed per-tile row operand
    (``(NT*rows, L)`` — cone params/masks, or any :func:`_lane_pack_vec`
    output) into a fresh lane packing; the cone-operand counterpart of
    :func:`gather_hetero` for the compaction cascade."""
    return _repack_rows(_unpack_rows(p, rows)[idx], rows)


def gather_hetero(
    hp: HeteroProblem, carry: HeteroCarry, x0: jax.Array, idx: jax.Array,
) -> tuple[HeteroProblem, HeteroCarry, jax.Array]:
    """Gather instances ``idx`` out of a lane-packed problem + carry + x0
    into a fresh (smaller) lane packing — the compaction primitive for
    :func:`..solver.cascade.hetero_cascade_solve`. ``idx`` length must be a
    multiple of LANES (pad with repeats of a live instance). Jittable;
    retraces per (in, out) shape pair."""
    nx, nu, N = hp.dims
    m = N - 1
    SX, SU = hp.SX, hp.SU

    def g_rows(p, S):
        return _repack_rows(_unpack_rows(p, S)[idx], S)

    def g_mat(p, R_in):
        return _repack_mat3(_unpack_mat3(p, R_in)[idx])

    hp2 = HeteroProblem(
        A3=g_mat(hp.A3, SX), B3=g_mat(hp.B3, SU), K3=g_mat(hp.K3, SX),
        Kt3=g_mat(hp.Kt3, SU), Quu3=g_mat(hp.Quu3, SU),
        Bt3=g_mat(hp.Bt3, SX), M3=g_mat(hp.M3, SX),
        u_min=g_rows(hp.u_min, m * SU), u_max=g_rows(hp.u_max, m * SU),
        x_min=g_rows(hp.x_min, N * SX), x_max=g_rows(hp.x_max, N * SX),
        qc=g_rows(hp.qc, N * SX), pterm=g_rows(hp.pterm, SX),
        rho_u=g_rows(hp.rho_u, SU), rho_x=g_rows(hp.rho_x, SX),
        dims=hp.dims, batch=int(idx.shape[0]),
    )
    carry2 = HeteroCarry(
        d=g_rows(carry.d, m * SU), y=g_rows(carry.y, m * SU),
        g=g_rows(carry.g, N * SX), z=g_rows(carry.z, m * SU),
        v=g_rows(carry.v, N * SX),
    )
    return hp2, carry2, x0[idx]


def pad_hetero_problem(
    problem: Problem, cache: Cache, dtype: Any = jnp.float32
) -> HeteroProblem:
    """Lane-pack batch-leading ``Problem``/``Cache`` pytrees (every leaf has a
    leading batch axis, as accepted by
    :func:`..solver.batched_ops.build_instance_ops`) into kernel operands.
    Jittable; combine with vmapped :func:`..precompute.riccati_cache_jax` for
    a fully on-device build from raw plants (see
    :func:`pad_hetero_from_plants`).

    Bounds are fully general: per instance AND per knot (the reference's
    ``(N-1, nu)``/``(N, nx)`` bound arrays, one set per instance).
    """
    Bn = problem.A.shape[0]
    nx = problem.A.shape[-1]
    nu = problem.B.shape[-1]
    N = problem.Xref.shape[-2]
    SX, SU = _pad8(nx), _pad8(nu)
    nt = -(-Bn // LANES)
    f = lambda a: jnp.asarray(a, dtype)

    A = f(problem.A)
    Bm = f(problem.B)
    Kinf = f(cache.Kinf)
    Quu = f(cache.Quu_inv)
    AmBKt = f(cache.AmBKt)
    rho = f(cache.rho).reshape(Bn)

    qc = -(f(problem.Xref) * f(problem.Q)[:, None, :])          # (B, N, nx)
    pterm = -jnp.einsum(
        "bi,bij->bj", f(problem.Xref[:, -1]), f(cache.Pinf),
        precision=jax.lax.Precision.HIGHEST,
    )

    def pk(b, knots, k, S):
        # (B, knots, k) -> (NT*knots*S, L), knot rows padded k -> S.
        if k == S:
            return _lane_pack_vec(
                f(b).reshape(Bn, knots * k), knots * S, nt
            )
        full = jnp.zeros((Bn, knots, S), dtype).at[:, :, :k].set(f(b))
        return _lane_pack_vec(full.reshape(Bn, knots * S), knots * S, nt)

    rho_col = rho[:, None]
    return HeteroProblem(
        A3=_lane_pack_mat(A, SX, SX, nt),
        B3=_lane_pack_mat(Bm, SU, SX, nt),
        K3=_lane_pack_mat(Kinf, SX, SU, nt),
        Kt3=_lane_pack_mat(jnp.swapaxes(Kinf, -1, -2), SU, SX, nt),
        Quu3=_lane_pack_mat(Quu, SU, SU, nt),
        Bt3=_lane_pack_mat(jnp.swapaxes(Bm, -1, -2), SX, SU, nt),
        M3=_lane_pack_mat(AmBKt, SX, SX, nt),
        u_min=pk(problem.u_min, N - 1, nu, SU),
        u_max=pk(problem.u_max, N - 1, nu, SU),
        x_min=pk(problem.x_min, N, nx, SX),
        x_max=pk(problem.x_max, N, nx, SX),
        qc=_lane_pack_vec(qc.reshape(Bn, N * nx), N * SX, nt)
        if nx == SX else _lane_pack_vec(
            jnp.zeros((Bn, N, SX), dtype).at[:, :, :nx].set(qc).reshape(
                Bn, N * SX),
            N * SX, nt),
        pterm=_lane_pack_vec(pterm, SX, nt),
        rho_u=_lane_pack_vec(jnp.broadcast_to(rho_col, (Bn, nu)), SU, nt),
        rho_x=_lane_pack_vec(jnp.broadcast_to(rho_col, (Bn, nx)), SX, nt),
        dims=(nx, nu, N),
        batch=Bn,
    )


def repack_hetero_caches(
    hp: HeteroProblem, cache: Cache, Xref: jax.Array,
) -> HeteroProblem:
    """Re-pack only the cache-dependent kernel operands (K3, Kt3, Quu3, M3,
    pterm, rho_u, rho_x) after a per-instance cache/rho refresh — the
    adaptive-rho loop's repack (plants/bounds/qc unchanged, ~40% of a full
    :func:`pad_hetero_problem`). ``cache`` batch-leading; ``Xref (B, N, nx)``
    for the pterm rebuild. Jittable; deterministic, so instances whose cache
    bits didn't change get identical operand bits."""
    nx, nu, N = hp.dims
    Bn = hp.batch
    nt = hp.tiles
    dtype = hp.A3.dtype
    f = lambda a: jnp.asarray(a, dtype)
    Kinf = f(cache.Kinf)
    rho = f(cache.rho).reshape(Bn)[:, None]
    pterm = -jnp.einsum(
        "bi,bij->bj", f(Xref[:, -1]), f(cache.Pinf),
        precision=jax.lax.Precision.HIGHEST,
    )
    return hp.replace(
        K3=_lane_pack_mat(Kinf, hp.SX, hp.SU, nt),
        Kt3=_lane_pack_mat(jnp.swapaxes(Kinf, -1, -2), hp.SU, hp.SX, nt),
        Quu3=_lane_pack_mat(f(cache.Quu_inv), hp.SU, hp.SU, nt),
        M3=_lane_pack_mat(f(cache.AmBKt), hp.SX, hp.SX, nt),
        pterm=_lane_pack_vec(pterm, hp.SX, nt),
        rho_u=_lane_pack_vec(jnp.broadcast_to(rho, (Bn, nu)), hp.SU, nt),
        rho_x=_lane_pack_vec(jnp.broadcast_to(rho, (Bn, nx)), hp.SX, nt),
    )


def pad_hetero_from_plants(
    A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array, rho: jax.Array,
    problem: Problem, dtype: Any = jnp.float32, riccati: str = "auto",
) -> tuple[HeteroProblem, Cache]:
    """On-device build for a batch of distinct plants: batched Riccati
    caches (reference math: src/tinympc/codegen.cpp:268-292) + lane packing.
    ``A (B,nx,nx)``, ``B (B,nx,nu)``, ``Q/R`` raw cost diagonals, ``rho (B,)``;
    ``problem`` supplies batch-leading bounds/Xref. Jittable.

    ``riccati``: ``"kernel"`` (batched Pallas fixed point,
    :mod:`.riccati_kernel` — 16.6x the vmapped builder, slope-timed), ``"vmap"``, or
    ``"auto"`` (kernel on TPU for nx <= 16)."""
    nx, nu = A.shape[-1], B.shape[-1]
    use_kernel = riccati == "kernel" or (
        riccati == "auto" and nx <= 16
        and jax.default_backend() == "tpu"
    )
    if use_kernel:
        from .riccati_kernel import riccati_cache_kernel

        caches = riccati_cache_kernel(A, B, Q, R, rho)
    else:
        from ..precompute import riccati_cache_jax

        caches = jax.vmap(riccati_cache_jax)(A, B, Q, R, rho)
    prob_b = problem.replace(A=A, B=B, Q=Q, R=R)
    return pad_hetero_problem(prob_b, caches, dtype), caches


@struct.dataclass
class HeteroCarry:
    """Warm-start iterate set, lane-packed (same layout as the kernel's
    internal carry). ``zeros`` for a cold start; a solve's returned carry
    warm-starts the next (reference: tiny_api.cpp solve-to-solve workspace
    reuse)."""

    d: jax.Array   # (NT*m*SU, L)
    y: jax.Array
    g: jax.Array   # (NT*N*SX, L)
    z: jax.Array
    v: jax.Array

    @staticmethod
    def zeros(hp: HeteroProblem, dtype: Any = jnp.float32) -> "HeteroCarry":
        nx, nu, N = hp.dims
        m = N - 1
        nt = hp.tiles
        fu = jnp.zeros((nt * m * hp.SU, LANES), dtype)
        fx = jnp.zeros((nt * N * hp.SX, LANES), dtype)
        return HeteroCarry(d=fu, y=fu, g=fx, z=fu, v=fx)

    def reset_duals(self) -> "HeteroCarry":
        return self.replace(y=self.y * 0.0, g=self.g * 0.0)


@struct.dataclass
class HeteroResult:
    """``U (B, m, nu)`` / ``X (B, N, nx)`` final (pre-projection) iterates —
    the reference applies pre-projection u. ``stats (B, 8)``: lanes
    [iterations, 0, pri_state, dua_state, pri_input, dua_input, 0, 0],
    final-iteration residuals per admm.cpp:95-98."""

    carry: HeteroCarry
    U: jax.Array
    X: jax.Array
    stats: jax.Array


def _project_soc_seg(seg, dim: int, S: int, cone, mu=None, shift=None):
    """Exact SOC projection of one knot's rows ``seg (S, L)`` — 128
    instances at once, pure full-width VPU arithmetic (closed form as
    solver/cones.py project_cone; 0/1-mask case resolution, no select_n).
    ``cone`` is static (ball indices / axis baked in); ``mu``/``shift``
    default to the cone's static scalars, or pass per-instance ``(1, L)``
    lane rows (heterogeneous cone geometry)."""
    f32 = jnp.float32
    mu = float(cone.mu) if mu is None else mu
    shift = float(cone.shift) if shift is None else shift
    ax = int(cone.axis)
    a2 = None
    for b in cone.ball:
        sq = seg[b:b + 1] * seg[b:b + 1]
        a2 = sq if a2 is None else a2 + sq
    a = jnp.sqrt(a2)
    s = seg[ax:ax + 1] + shift
    inside = (a <= mu * s).astype(f32)
    polar = (mu * a <= -s).astype(f32)
    boundary = (1.0 - inside) * (1.0 - polar)
    c = (mu * a + s) / (mu * mu + 1.0)
    safe_a = a + (a2 == 0.0).astype(f32)
    scale = inside + boundary * (mu * c / safe_a)
    s_new = inside * s + boundary * c - shift
    rows = []
    for r in range(S):
        if r == ax:
            rows.append(s_new)
        elif r in cone.ball:
            rows.append(seg[r:r + 1] * scale)
        else:
            rows.append(seg[r:r + 1])
    return jnp.concatenate(rows, axis=0)


def _project_soc_seg_masked(seg, S: int, bm, am, mu, shift):
    """Masked variant of :func:`_project_soc_seg`: the cone's geometry is
    per-instance. ``bm``/``am`` are ``(S, L)`` 0/1 lane masks (ball rows /
    axis one-hot per instance); ``mu``/``shift`` a scalar or ``(1, L)``
    row. Same closed form, with the row gather/scatter replaced by
    mask-weighted sums — still pure full-width VPU arithmetic. Where masks
    encode the same indices as the static path, sums add exact zeros in
    ascending row order, so results match the static projection bitwise
    for ascending ``ball`` tuples."""
    f32 = jnp.float32
    a2 = None
    s = None
    for r in range(S):
        b = seg[r:r + 1] * bm[r:r + 1]
        sq = b * b
        a2 = sq if a2 is None else a2 + sq
        t = seg[r:r + 1] * am[r:r + 1]
        s = t if s is None else s + t
    a = jnp.sqrt(a2)
    s = s + shift
    inside = (a <= mu * s).astype(f32)
    polar = (mu * a <= -s).astype(f32)
    boundary = (1.0 - inside) * (1.0 - polar)
    c = (mu * a + s) / (mu * mu + 1.0)
    safe_a = a + (a2 == 0.0).astype(f32)
    scale = inside + boundary * (mu * c / safe_a)
    s_new = inside * s + boundary * c - shift
    return seg * (1.0 - bm - am) + seg * scale * bm + am * s_new


def _apply_cones(W, knots: int, dim: int, S: int, cones, params=None,
                 masks=None):
    """Apply static cones to every knot of ``W (knots*S, L)``. ``params``
    (optional) is a list of per-cone ``(mu_row, shift_row)`` lane rows;
    ``masks`` (optional) a list of per-cone ``(ball_mask, axis_mask)``
    ``(S, L)`` blocks selecting the masked (per-instance-geometry)
    projection."""
    segs = []
    for i in range(knots):
        seg = W[i * S:(i + 1) * S]
        for c, cone in enumerate(cones):
            mu = sh = None
            if params is not None:
                mu, sh = params[c]
            if masks is not None:
                bm, am = masks[c]
                seg = _project_soc_seg_masked(
                    seg, S, bm, am,
                    float(cone.mu) if mu is None else mu,
                    float(cone.shift) if sh is None else sh,
                )
            else:
                seg = _project_soc_seg(seg, dim, S, cone, mu=mu, shift=sh)
        segs.append(seg)
    return jnp.concatenate(segs, axis=0)


def _make_iteration(
    x0_ref, a3, b3, k3, kt3, quu3, bt3, m3,
    umin, umax, xmin, xmax, qc_ref, pterm_ref, rhou_ref, rhox_ref,
    *, nx, nu, N, SX, SU, en_ib, en_sb, ucones, xcones, cp_ref=None,
    cm_ref=None,
):
    """Load the tile's VMEM-resident operands and close the per-iteration
    map over them (shared by the fixed and adaptive kernels). ``cp_ref``
    (optional) holds per-instance cone parameters: stacked per-cone
    8-row blocks [mu row, shift row, 6 pad], input cones first. ``cm_ref``
    (optional) holds per-instance cone *geometry* masks: stacked per-cone
    [ball mask (SU or SX rows), axis mask (ditto)] blocks, input cones
    first (:func:`pad_hetero_cone_masks`)."""
    m = N - 1
    uparams = xparams = None
    if cp_ref is not None:
        cp = cp_ref[:]
        uparams = [
            (cp[c * 8:c * 8 + 1, :], cp[c * 8 + 1:c * 8 + 2, :])
            for c in range(len(ucones))
        ]
        off = len(ucones)
        xparams = [
            (cp[(off + c) * 8:(off + c) * 8 + 1, :],
             cp[(off + c) * 8 + 1:(off + c) * 8 + 2, :])
            for c in range(len(xcones))
        ]
    umasks = xmasks = None
    if cm_ref is not None:
        cm = cm_ref[:]
        off = 0
        umasks, xmasks = [], []
        for _ in ucones:
            umasks.append((cm[off:off + SU], cm[off + SU:off + 2 * SU]))
            off += 2 * SU
        for _ in xcones:
            xmasks.append((cm[off:off + SX], cm[off + SX:off + 2 * SX]))
            off += 2 * SX

    A3 = a3[:]
    B3 = b3[:]
    K3 = k3[:]
    Kt3 = kt3[:]
    Quu3 = quu3[:]
    Bt3 = bt3[:]
    M3 = m3[:]
    qcv = qc_ref[:]
    ptermv = pterm_ref[:]
    rho_uf = jnp.concatenate([rhou_ref[:]] * m, axis=0)    # (m*SU, L)
    rho_xf = jnp.concatenate([rhox_ref[:]] * N, axis=0)    # (N*SX, L)
    uminf = umin[:]   # (m*SU, L) per-knot bounds, pre-packed
    umaxf = umax[:]
    xminf = xmin[:]   # (N*SX, L)
    xmaxf = xmax[:]
    x0v = x0_ref[:]

    def iteration(D, Y, G, full: bool):
        """One full ADMM iteration. ``full`` also returns the slack saves and
        trajectories (only the last two iterations need them: slacks for the
        dual-residual stats, trajectories for the outputs — the fori carry
        stays at the 3 arrays the recurrence actually feeds forward)."""
        # Forward rollout fused with u (reference admm.cpp:27-37).
        xs = [x0v]
        us = []
        for i in range(m):
            u_i = -_dotb(K3, xs[i]) - D[i * SU:(i + 1) * SU]
            us.append(u_i)
            xs.append(_dotb(A3, xs[i]) + _dotb(B3, u_i))
        Unew = jnp.concatenate(us, axis=0)
        Xnew = jnp.concatenate(xs, axis=0)
        # Slack projection (admm.cpp:45-61) + dual ascent (:67-71).
        Su = Unew + Y
        Znew = jnp.clip(Su, uminf, umaxf) if en_ib else Su
        if ucones:
            # SOC projection composes after the box clip (solver/cones.py).
            Znew = _apply_cones(Znew, m, nu, SU, ucones, uparams, umasks)
        Tx = Xnew + G
        Vnew = jnp.clip(Tx, xminf, xmaxf) if en_sb else Tx
        if xcones:
            Vnew = _apply_cones(Vnew, N, nx, SX, xcones, xparams, xmasks)
        Ynew = Su - Znew
        Gnew = Tx - Vnew
        # Linear-cost refresh (admm.cpp:77-85), r/q consumed in place by the
        # backward gradient recursion (admm.cpp:15-22; coeff_d2p dropped as
        # there). Fixed mode: slacks always saved (no early exit).
        Rf = -rho_uf * (Znew - Ynew)
        Qf = qcv - rho_xf * (Vnew - Gnew)
        last = m * SX
        p = ptermv - rhox_ref[:] * (Vnew[last:] - Gnew[last:])
        ds = [None] * m
        for i in reversed(range(m)):
            r_i = Rf[i * SU:(i + 1) * SU]
            ds[i] = _dotb(Quu3, _dotb(Bt3, p) + r_i)
            p = Qf[i * SX:(i + 1) * SX] + _dotb(M3, p) - _dotb(Kt3, r_i)
        Dnew = jnp.concatenate(ds, axis=0)
        if full:
            return Dnew, Ynew, Gnew, Znew, Vnew, Unew, Xnew
        return Dnew, Ynew, Gnew

    return iteration


def _kernel(
    x0_ref, a3, b3, k3, kt3, quu3, bt3, m3,
    umin, umax, xmin, xmax, qc_ref, pterm_ref, rhou_ref, rhox_ref,
    *rest,
    nx: int, nu: int, N: int, SX: int, SU: int,
    max_iter: int, en_ib: bool, en_sb: bool,
    ucones: tuple = (), xcones: tuple = (), has_cparams: bool = False,
    has_cmasks: bool = False,
):
    m = N - 1
    f32 = jnp.float32
    i = 0
    cp_ref = rest[i] if has_cparams else None
    i += 1 if has_cparams else 0
    cm_ref = rest[i] if has_cmasks else None
    i += 1 if has_cmasks else 0
    rest = rest[i:]
    (d0, y0, g0, z0, v0,
     u_out, x_out, d_out, y_out, g_out, z_out, v_out, stats_ref) = rest
    iteration = _make_iteration(
        x0_ref, a3, b3, k3, kt3, quu3, bt3, m3,
        umin, umax, xmin, xmax, qc_ref, pterm_ref, rhou_ref, rhox_ref,
        nx=nx, nu=nu, N=N, SX=SX, SU=SU, en_ib=en_ib, en_sb=en_sb,
        ucones=ucones, xcones=xcones, cp_ref=cp_ref, cm_ref=cm_ref,
    )

    D, Y, G = jax.lax.fori_loop(
        0, max(max_iter - 2, 0),
        lambda _, c: iteration(*c, full=False),
        (d0[:], y0[:], g0[:]),
    )
    # Last two iterations unrolled: the penultimate supplies the pre-save
    # slacks the dual residuals compare against (admm.cpp:96,98), the final
    # one the outputs.
    if max_iter >= 2:
        D, Y, G, Zp, Vp, _U, _X = iteration(D, Y, G, full=True)
    else:
        Zp, Vp = z0[:], v0[:]
    if max_iter >= 1:
        D, Y, G, Z, V, U, X = iteration(D, Y, G, full=True)
    else:
        Z, V = Zp, Vp
        U, X = d0[:] * 0.0, g0[:] * 0.0

    u_out[:] = U
    x_out[:] = X
    d_out[:] = D
    y_out[:] = Y
    g_out[:] = G
    z_out[:] = Z
    v_out[:] = V

    # Final-iteration residuals (admm.cpp:95-98): pre-save v/z vs new slacks.
    rho1 = rhox_ref[0:1, :]
    p_s = jnp.max(jnp.abs(X - V), axis=0, keepdims=True)
    d_s = rho1 * jnp.max(jnp.abs(Vp - V), axis=0, keepdims=True)
    p_u = jnp.max(jnp.abs(U - Z), axis=0, keepdims=True)
    d_u = rho1 * jnp.max(jnp.abs(Zp - Z), axis=0, keepdims=True)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    stats_ref[:] = (
        (row == 0).astype(f32) * float(max_iter)
        + (row == 2).astype(f32) * p_s + (row == 3).astype(f32) * d_s
        + (row == 4).astype(f32) * p_u + (row == 5).astype(f32) * d_u
    )


def _kernel_adaptive(
    tol_ref,
    x0_ref, a3, b3, k3, kt3, quu3, bt3, m3,
    umin, umax, xmin, xmax, qc_ref, pterm_ref, rhou_ref, rhox_ref,
    *rest,
    nx: int, nu: int, N: int, SX: int, SU: int,
    max_iter: int, check_every: int, en_ib: bool, en_sb: bool,
    ucones: tuple = (), xcones: tuple = (), has_cparams: bool = False,
    has_cmasks: bool = False,
):
    """Adaptive (per-instance early-termination) heterogeneous solve.

    Same check-block structure and freeze semantics as the homogeneous
    adaptive kernel (ops/fused_admm._kernel_adaptive; reference early-exit
    dataflow admm.cpp:91-109,135-144): plain iterations between checks, a
    newly-converged instance's result set snapshotted with pre-backward D /
    pre-save Z,V / advanced duals, lanes keep iterating, outputs select by
    the frozen flag. Per-instance bookkeeping lives in full (8, LANES)
    blocks (all sublanes equal) — sublane-keepdims maxima are computed in
    the loop body but never carried at row-1 width.
    """
    m = N - 1
    f32 = jnp.float32
    i = 0
    cp_ref = rest[i] if has_cparams else None
    i += 1 if has_cparams else 0
    cm_ref = rest[i] if has_cmasks else None
    i += 1 if has_cmasks else 0
    rest = rest[i:]
    (d0, y0, g0, z0, v0,
     u_out, x_out, d_out, y_out, g_out, z_out, v_out, stats_ref) = rest
    iteration = _make_iteration(
        x0_ref, a3, b3, k3, kt3, quu3, bt3, m3,
        umin, umax, xmin, xmax, qc_ref, pterm_ref, rhou_ref, rhox_ref,
        nx=nx, nu=nu, N=N, SX=SX, SU=SU, en_ib=en_ib, en_sb=en_sb,
        ucones=ucones, xcones=xcones, cp_ref=cp_ref, cm_ref=cm_ref,
    )
    pri_tol = tol_ref[0, 0]
    dua_tol = tol_ref[0, 1]
    rho8 = jnp.concatenate([rhox_ref[0:1, :]] * 8, axis=0)  # (8, L)

    def red8(a):
        """Row max of ``a (rows, L)`` replicated into an (8, L) block."""
        r = jnp.max(a, axis=0, keepdims=True)
        return jnp.concatenate([r] * 8, axis=0)

    def to_u(m8):
        return jnp.concatenate([m8] * (m * SU // 8), axis=0)

    def to_x(m8):
        return jnp.concatenate([m8] * (N * SX // 8), axis=0)

    def pick(msk, a, b):
        # Exact for 0/1 masks; avoids select_n (unlowerable layouts).
        return a * msk + b * (1.0 - msk)

    def plain_body(_, c):
        # Z/V advance too: the check's dual residuals compare against the
        # immediately-previous slacks (admm.cpp:96,98), not the previous
        # check's.
        D, Y, G, _Z, _V = c
        Dn, Yn, Gn, Znew, Vnew, _U, _X = iteration(D, Y, G, full=True)
        return (Dn, Yn, Gn, Znew, Vnew)

    def cond(st):
        k, done8 = st[0], st[1]
        return jnp.logical_and(
            k < max_iter, jnp.logical_not(jnp.all(done8 > 0.5))
        )

    def body(st):
        (k, done8, D, Y, G, Z, V, lU, lX,
         sD, sY, sG, sZ, sV, sU, sX, itf, r0, r1, r2, r3) = st
        if check_every > 1:
            n_plain = jnp.minimum(
                check_every - jnp.remainder(k, check_every), max_iter - k
            ) - 1
            D, Y, G, Z, V = jax.lax.fori_loop(
                0, n_plain, plain_body, (D, Y, G, Z, V)
            )
            kc = k + n_plain + 1
        else:
            kc = k + 1
        # The check iteration. D/Z/V going in are the pre-backward /
        # pre-slack-save values a newly-frozen instance must keep.
        Dn, Yn, Gn, Znew, Vnew, U, X = iteration(D, Y, G, full=True)
        is_check = jnp.remainder(kc, check_every) == 0
        chk = is_check.astype(f32)
        ps8 = red8(jnp.abs(X - Vnew))
        ds8 = rho8 * red8(jnp.abs(V - Vnew))
        pu8 = red8(jnp.abs(U - Znew))
        du8 = rho8 * red8(jnp.abs(Z - Znew))
        adv8 = 1.0 - done8
        conv8 = (
            (ps8 < pri_tol) & (pu8 < pri_tol)
            & (ds8 < dua_tol) & (du8 < dua_tol)
        ).astype(f32) * chk
        newly8 = adv8 * conv8
        mu_u = to_u(newly8)
        mu_x = to_x(newly8)
        sD = pick(mu_u, D, sD)       # backward pass skipped
        sZ = pick(mu_u, Z, sZ)       # slack save skipped
        sV = pick(mu_x, V, sV)
        sY = pick(mu_u, Yn, sY)      # duals advanced before the check
        sG = pick(mu_x, Gn, sG)
        sU = pick(mu_u, U, sU)
        sX = pick(mu_x, X, sX)
        itf = pick(newly8, itf * 0.0 + kc.astype(f32), itf)
        m_rec = adv8 * chk
        r0 = pick(m_rec, ps8, r0)
        r1 = pick(m_rec, ds8, r1)
        r2 = pick(m_rec, pu8, r2)
        r3 = pick(m_rec, du8, r3)
        done8 = jnp.maximum(done8, newly8)
        return (kc, done8, Dn, Yn, Gn, Znew, Vnew, U, X,
                sD, sY, sG, sZ, sV, sU, sX, itf, r0, r1, r2, r3)

    # Zero-inits derived from real ref data (pure constants materialize in
    # replicated layouts that poison the carry chain — CLAUDE.md).
    zu = d0[:] * 0.0
    zx = g0[:] * 0.0
    z8 = zu[:8]
    init = (
        jnp.zeros((), jnp.int32), z8,
        d0[:], y0[:], g0[:], z0[:], v0[:], zu, zx,
        zu, zu, zx, zu, zx, zu, zx,
        z8, z8, z8, z8, z8,
    )
    (_k, done8, D, Y, G, Z, V, lU, lX,
     sD, sY, sG, sZ, sV, sU, sX, itf, r0, r1, r2, r3) = (
        jax.lax.while_loop(cond, body, init)
    )
    d_u = to_u(done8)
    d_x = to_x(done8)
    u_out[:] = pick(d_u, sU, lU)
    x_out[:] = pick(d_x, sX, lX)
    d_out[:] = pick(d_u, sD, D)
    y_out[:] = pick(d_u, sY, Y)
    g_out[:] = pick(d_x, sG, G)
    z_out[:] = pick(d_u, sZ, Z)
    v_out[:] = pick(d_x, sV, V)
    itf = pick(done8, itf, itf * 0.0 + float(max_iter))
    row = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    stats_ref[:] = (
        (row == 0).astype(f32) * itf + (row == 1).astype(f32) * done8
        + (row == 2).astype(f32) * r0 + (row == 3).astype(f32) * r1
        + (row == 4).astype(f32) * r2 + (row == 5).astype(f32) * r3
    )


def _unpack_lane(p: jax.Array, nt: int, Bn: int, k: int) -> jax.Array:
    """(NT*S, L) rows-major tiles back to (B, S) then first-k columns."""
    S = p.shape[0] // nt
    return (
        p.reshape(nt, S, LANES).transpose(0, 2, 1).reshape(nt * LANES, S)[
            :Bn, :k
        ]
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_iter", "check_termination", "en_input_bound",
                     "en_state_bound", "interpret", "cones"),
)
def hetero_solve(
    x0: jax.Array,
    carry: HeteroCarry,
    hp: HeteroProblem,
    *,
    max_iter: int = 100,
    check_termination: int = 0,
    abs_pri_tol: float | jax.Array = 1e-3,
    abs_dua_tol: float | jax.Array = 1e-3,
    en_input_bound: bool = True,
    en_state_bound: bool = True,
    interpret: bool = False,
    cones=None,
    cone_params: jax.Array | None = None,
    cone_masks: jax.Array | None = None,
) -> HeteroResult:
    """Batched ADMM, one distinct plant per instance.

    ``x0 (B, nx)``; semantics per instance match
    :func:`..solver.admm.solve` (reference: src/tinympc/admm.cpp:111-152).
    ``check_termination == 0`` runs the deterministic fixed-iteration
    kernel; ``> 0`` the adaptive kernel with per-instance convergence
    freezing every that many iterations (same early-exit dataflow as the
    scan tier / homogeneous adaptive kernel; stats row 1 = solved flag,
    row 0 = per-instance iteration count). Tolerances are traced SMEM
    operands — changing them never recompiles. Returns final iterates + a
    warm-start carry + per-instance residual stats.

    ``cones`` (a static :class:`..solver.cones.ConeSet`, shared across the
    batch) adds exact SOC projections to the in-kernel slack stage — with
    knots on sublanes and instances on lanes the projection is pure
    full-width VPU arithmetic (no extra matmuls, unlike the homogeneous
    kernel's lane-packed layout). ``cone_params``
    (:func:`pad_hetero_cone_params`) overrides the cones' mu/shift with
    per-instance lane values — heterogeneous constraint geometry;
    ``cone_masks`` (:func:`pad_hetero_cone_masks`) additionally overrides
    the cones' ball/axis *indices* per instance (masked projection — the
    cone structure itself varies across the fleet).
    """
    nx, nu, N = hp.dims
    m = N - 1
    SX, SU = hp.SX, hp.SU
    nt = hp.tiles
    Bn = hp.batch
    dtype = hp.A3.dtype

    x0p = _lane_pack_vec(jnp.asarray(x0, dtype), SX, nt)

    fu_shape = jax.ShapeDtypeStruct((nt * m * SU, LANES), dtype)
    fx_shape = jax.ShapeDtypeStruct((nt * N * SX, LANES), dtype)

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda t: (t, 0))

    def spec3(r_in, r_out):
        return pl.BlockSpec((r_in, r_out, LANES), lambda t: (t, 0, 0))

    grid = (nt,)
    has_cp = cone_params is not None
    has_cm = cone_masks is not None
    if (has_cp or has_cm) and cones is None:
        raise ValueError("cone_params/cone_masks without cones")
    cone_kw = dict(
        ucones=tuple(cones.input_cones) if cones is not None else (),
        xcones=tuple(cones.state_cones) if cones is not None else (),
        has_cparams=has_cp,
        has_cmasks=has_cm,
    )
    n_cones = (
        len(cones.input_cones) + len(cones.state_cones)
        if cones is not None else 0
    )
    cp_args = (cone_params,) if has_cp else ()
    cp_specs = [spec(n_cones * 8)] if has_cp else []
    if has_cm:
        mr = (2 * SU * len(cones.input_cones)
              + 2 * SX * len(cones.state_cones))
        cp_args = cp_args + (cone_masks,)
        cp_specs = cp_specs + [spec(mr)]
    if check_termination <= 0:
        kernel = functools.partial(
            _kernel, nx=nx, nu=nu, N=N, SX=SX, SU=SU, max_iter=max_iter,
            en_ib=en_input_bound, en_sb=en_state_bound, **cone_kw,
        )
        scalar_args: tuple = ()
        scalar_specs: list = []
    else:
        if max_iter < 1:
            raise ValueError("adaptive hetero solve needs max_iter >= 1")
        kernel = functools.partial(
            _kernel_adaptive, nx=nx, nu=nu, N=N, SX=SX, SU=SU,
            max_iter=max_iter, check_every=check_termination,
            en_ib=en_input_bound, en_sb=en_state_bound, **cone_kw,
        )
        tols = jnp.stack([
            jnp.asarray(abs_pri_tol, jnp.float32).reshape(()),
            jnp.asarray(abs_dua_tol, jnp.float32).reshape(()),
        ]).reshape(1, 2)
        scalar_args = (tols,)
        scalar_specs = [
            pl.BlockSpec((1, 2), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=scalar_specs + [
            spec(SX),                     # x0
            spec3(SX, SX), spec3(SU, SX), spec3(SX, SU), spec3(SU, SX),
            spec3(SU, SU), spec3(SX, SU), spec3(SX, SX),
            spec(m * SU), spec(m * SU), spec(N * SX), spec(N * SX),
            spec(N * SX), spec(SX), spec(SU), spec(SX),
        ] + cp_specs + [
            spec(m * SU), spec(m * SU), spec(N * SX), spec(m * SU),
            spec(N * SX),
        ],
        out_specs=[
            spec(m * SU), spec(N * SX),
            spec(m * SU), spec(m * SU), spec(N * SX), spec(m * SU),
            spec(N * SX), spec(8),
        ],
        out_shape=[
            fu_shape, fx_shape,
            fu_shape, fu_shape, fx_shape, fu_shape, fx_shape,
            jax.ShapeDtypeStruct((nt * 8, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        *scalar_args,
        x0p, hp.A3, hp.B3, hp.K3, hp.Kt3, hp.Quu3, hp.Bt3, hp.M3,
        hp.u_min, hp.u_max, hp.x_min, hp.x_max, hp.qc, hp.pterm,
        hp.rho_u, hp.rho_x, *cp_args,
        carry.d, carry.y, carry.g, carry.z, carry.v,
    )
    U, X, d, y, g, z, v, stats = outs
    return HeteroResult(
        carry=HeteroCarry(d=d, y=y, g=g, z=z, v=v),
        U=_unpack_lane(U, nt, Bn, m * SU).reshape(Bn, m, SU)[:, :, :nu],
        X=_unpack_lane(X, nt, Bn, N * SX).reshape(Bn, N, SX)[:, :, :nx],
        stats=_unpack_lane(stats, nt, Bn, 8),
    )
