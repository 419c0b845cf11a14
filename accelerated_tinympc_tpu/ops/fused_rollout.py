"""In-kernel receding-horizon rollout: the entire K-tick MPC mission in ONE
Pallas kernel launch.

The scan-of-kernels rollout (:func:`..api.mpc.fused_mpc_rollout`) pays a
per-tick cost — kernel setup/teardown and a full HBM round-trip of every
warm-start carry — that matters once the adaptive mode cuts warm ticks to
~2 iterations. Here the tick loop itself runs inside the kernel: the
warm-start carry (x0, D, Z, V) lives in VMEM *scratch* across grid steps,
each tick resets the duals, runs the shared fixed/adaptive iteration core
(:func:`.fused_admm._fixed_core` / :func:`.fused_admm._adaptive_core`),
applies the pre-projection first-knot control to the plant in-kernel, and
writes one 128-lane trace block (packed u0 + per-instance iteration
counts) per tick. HBM traffic per tick is that single trace block — not
eight carry arrays.

Measured on chip (BASELINE.md round 4, on-device slope protocol, B=4096,
70 hovering ticks, tol 1e-3): cold-start missions 7.12 M solves/s at
``check_termination=10`` (2.36x the fixed-100 mission, 1.23x the
scan-of-kernels rollout); warm steady-state missions 45.2 M solves/s at
``check_termination=1`` (~90 us per 4096-wide fleet tick; 1.46-2.59x the
scan-of-kernels form — the advantage is largest exactly where ticks are
shortest).

Per-tick semantics are exactly the reference receding-horizon loop
(reference: examples/quadrotor_hovering.cpp:90-114): measurement into
``x.col(0)``, dual reset y=g=0 (quadrotor_hovering.cpp:99-104 — slacks and
gains warm-start), ``tiny_solve``, apply *pre-projection* ``u.col(0)``,
plant step ``x+ = A x + B u``. Tracking mode slides the reference window
per tick (quadrotor_tracking.cpp:101) via a per-tick streamed ``const_d``
row — the only reference-dependent operand of the folded iteration.

Grid layout: ``(batch_tiles, ticks)`` with ticks innermost — Pallas TPU
executes the grid sequentially and only re-DMAs input blocks whose index
changed, so per-tile operands and initial carries are fetched once per tile
while the tick dimension streams trace blocks out and (in tracking mode)
``const_d`` rows in.

SOC cones (``cone_ops`` from :func:`.fused_admm.pad_cones`) run inside the
tick core exactly as in the one-solve kernel (:func:`.fused_admm._cone_apply`
after the box clip each iteration) — coned missions (powered descent,
examples/soc_landing.py --mission) keep the one-launch warm-tick advantage.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Problem
from .fused_admm import (
    DEFAULT_BATCH_TILE,
    LANES,
    STATS,
    FusedCarry,
    FusedConeOps,
    FusedResult,
    PaddedProblem,
    _adaptive_core,
    _cone_fns,
    _fixed_core,
    _iteration,
    _lane_onehot,
    _make_ws,
    _pack_dx,
    _pack_du,
    _seg_tools,
    _stats_onehot,
    _unpack_dx,
    _unpack_du,
)

_HI = jax.lax.Precision.HIGHEST


class RolloutOps(NamedTuple):
    """Packed plant-step / trace operators for the in-kernel rollout.

    ``W_A (nxg, nxg)``: block-diagonal ``A.T`` per packed instance —
    ``x+ = x @ W_A + U @ W_B0``. ``W_B0 (Dug, nxg)``: ``B.T`` blocks on the
    first-knot control lanes only (all other rows zero, so contracting the
    full packed U extracts u0 and applies the plant in one matmul).
    ``W_sel (Dug, LANES)``: one-hot gather of the g instances' first-knot
    controls into trace lanes ``j*nu + i``.
    """

    W_A: jax.Array
    W_B0: jax.Array
    W_sel: jax.Array


def rollout_ops(problem: Problem, pp: PaddedProblem,
                dtype: Any = jnp.float32) -> RolloutOps:
    """Build the plant/trace operators (host-side, float64 core)."""
    nx, nu, N = pp.dims
    g = pp.g
    Du = (N - 1) * nu
    nxg = pp.W_fx.shape[0]
    Dug = pp.u_min.shape[1]
    if g * (nu + 1) > LANES:
        raise ValueError(
            f"trace block needs g*(nu+1) = {g * (nu + 1)} lanes > {LANES}")
    A = np.asarray(problem.A, np.float64)
    Bm = np.asarray(problem.B, np.float64)
    WA = np.zeros((nxg, nxg), np.float64)
    WB = np.zeros((Dug, nxg), np.float64)
    Wsel = np.zeros((Dug, LANES), np.float64)
    for j in range(g):
        WA[j * nx:(j + 1) * nx, j * nx:(j + 1) * nx] = A.T
        WB[j * Du:j * Du + nu, j * nx:(j + 1) * nx] = Bm.T
        for i in range(nu):
            Wsel[j * Du + i, j * nu + i] = 1.0
    return RolloutOps(
        W_A=jnp.asarray(WA, dtype),
        W_B0=jnp.asarray(WB, dtype),
        W_sel=jnp.asarray(Wsel, dtype),
    )


def _kernel_rollout(
    rho_ref, tol_ref,
    x0_ref, D0_ref, Z0_ref, V0_ref,
    const_ref, u_min_ref, u_max_ref, x_min_ref, x_max_ref, seg_ref,
    w_fx_ref, w_fd_ref, w_gx_ref, w_gd_ref, w_q_ref, w_r_ref,
    w_A_ref, w_B0_ref, w_sel_ref,
    *rest,
    ticks: int, max_iter: int, check_every: int, warmup: int,
    g: int, nu: int, interpret: bool, algo: str, polish: int,
    nc_u: int = 0, nc_x: int = 0, alpha: float = 1.0,
    _ablate: tuple = (),
):
    """One tick of the in-kernel rollout (grid dim 1 = tick index)."""
    t = pl.program_id(1)
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=_HI
    )
    Dug = D0_ref.shape[-1]
    Dxp = V0_ref.shape[-1] // g
    cone_u, cone_x, outs = _cone_fns(rest, nc_u, nc_x, g, Dug, Dxp)
    (trace_out, xf_out,
     U_out, X_out, D_out, Y_out, G_out, Z_out, V_out, stats_out,
     x0_s, D_s, Z_s, V_s) = outs
    iterate = functools.partial(_iteration, cone_u=cone_u, cone_x=cone_x,
                                alpha=alpha)

    @pl.when(t == 0)
    def _init():
        # Fresh tile: load the warm-start carry into the persistent scratch.
        x0_s[:] = x0_ref[:]
        D_s[:] = D0_ref[:]
        Z_s[:] = Z0_ref[:]
        V_s[:] = V0_ref[:]

    x0v = x0_s[:]
    D0 = D_s[:]
    Z0 = Z_s[:]
    V0 = V_s[:]
    # Dual reset each tick (reference: quadrotor_hovering.cpp:100-101);
    # zeros derive from real data (Mosaic layout discipline, CLAUDE.md).
    Y0 = D0 * 0.0
    G0 = V0 * 0.0

    # const_d arrives (1, Dug) baked (hovering) or as a (1, 8, Dug) block of
    # the (T, 8, Dug) per-tick stream (tracking; the row is replicated on 8
    # sublanes because Mosaic rejects 1-sublane blocks of multi-row arrays).
    cd = const_ref[:]
    if cd.ndim == 3:
        cd = cd.reshape(8, cd.shape[-1])[:1, :]
    Xb = dot(x0v, w_fx_ref[:])
    Ub = dot(x0v, w_gx_ref[:])
    consts = (
        Xb, Ub, cd,
        u_min_ref[:], u_max_ref[:], x_min_ref[:], x_max_ref[:],
    )
    W3, Wf = _make_ws((w_fd_ref, w_gd_ref, w_q_ref, w_r_ref), algo)
    segt = _seg_tools(g, Dug, Dxp, seg_ref, interpret)
    smd, smx, _to_du, _to_dx, cat, uncat = segt
    rho = rho_ref[0, 0]
    carry0 = (D0, Y0, G0, Z0, V0)

    if check_every > 0:
        U, X, D, Y, G, Z, V, itf, done, r0, r1, r2, r3 = _adaptive_core(
            iterate, W3, Wf, carry0, consts, rho,
            tol_ref[0, 0], tol_ref[0, 1], segt, g,
            max_iter=max_iter, check_every=check_every, warmup=warmup,
        )
    else:
        Dn, Yn, Gn, Znew, Vnew, U, X, Zp_, Vp_ = _fixed_core(
            iterate, W3, Wf, carry0, consts, max_iter, algo, polish
        )
        D, Y, G, Z, V = Dn, Yn, Gn, Znew, Vnew
        if "no_stats" in _ablate:
            z = (D * 0.0)[:, :LANES]
            zc = z if g == 1 else jnp.concatenate([z] * g, axis=1)
            r0 = r1 = r2 = r3 = zc
        else:
            aX, aV = jnp.abs(X - Vnew), jnp.abs(Vp_ - Vnew)
            aU, aZ = jnp.abs(U - Znew), jnp.abs(Zp_ - Znew)
            r0 = cat([smx(aX, j) for j in range(g)])
            r1 = rho * cat([smx(aV, j) for j in range(g)])
            r2 = cat([smd(aU, j) for j in range(g)])
            r3 = rho * cat([smd(aZ, j) for j in range(g)])
        itf = r0 * 0.0 + float(max_iter)
        done = r0 * 0.0

    # Trace block: packed pre-projection u0 at lanes j*nu..(j+1)*nu plus the
    # tick's per-instance iteration count at lane g*nu + j.
    if "no_trace" not in _ablate:
        tr = dot(U, w_sel_ref[:])
        for j in range(g):
            tr = tr + uncat(itf, j) * _lane_onehot(g * nu + j)
        trace_out[:] = tr

    # Plant step (reference: quadrotor_hovering.cpp:110) on the packed
    # layout; W_B0 extracts u0 and applies B.T in one contraction.
    if "no_plant" in _ablate:
        xn = x0v
    else:
        xn = dot(x0v, w_A_ref[:]) + dot(U, w_B0_ref[:])
    if "no_scratch_io" not in _ablate:
        x0_s[:] = xn
        D_s[:] = D
        Z_s[:] = Z
        V_s[:] = V

    @pl.when(t == ticks - 1)
    def _finish():
        xf_out[:] = xn
        U_out[:] = U
        X_out[:] = X
        D_out[:] = D
        Y_out[:] = Y
        G_out[:] = G
        Z_out[:] = Z
        V_out[:] = V
        stats_out[:] = (
            itf * _stats_onehot(0, g) + done * _stats_onehot(1, g)
            + r0 * _stats_onehot(2, g) + r1 * _stats_onehot(3, g)
            + r2 * _stats_onehot(4, g) + r3 * _stats_onehot(5, g)
        )


class RolloutResult(NamedTuple):
    """``x_final (B, nx)`` plant state after the last tick; ``us (T, B, nu)``
    applied (pre-projection) first-knot controls per tick; ``iters (T, B)``
    per-tick solve iteration counts; ``final`` the last tick's
    :class:`..ops.fused_admm.FusedResult` (for warm-starting a continuation
    or inspecting residuals)."""

    x_final: jax.Array
    us: jax.Array
    iters: jax.Array
    final: FusedResult


def fused_rollout(
    x0: jax.Array,
    carry: FusedCarry,
    pp: PaddedProblem,
    rops: RolloutOps,
    n_ticks: int,
    *,
    max_iter: int = 100,
    check_termination: int = 0,
    abs_pri_tol: float | jax.Array = 1e-3,
    abs_dua_tol: float | jax.Array = 1e-3,
    warmup_iters: int = 0,
    batch_tile: int = DEFAULT_BATCH_TILE,
    interpret: bool = False,
    const_seq: jax.Array | None = None,
    algo: str = "f32",
    polish: int = 8,
    cone_ops: FusedConeOps | None = None,
    alpha: float = 1.0,
    _ablate: tuple = (),
) -> RolloutResult:
    """Run ``n_ticks`` receding-horizon MPC ticks in one kernel launch.

    ``const_seq`` (``(n_ticks, Dug)`` from :func:`rollout_const_seq`)
    streams a per-tick folded reference constant — tracking mode; ``None``
    uses the problem's baked constant (hovering). ``check_termination > 0``
    runs each tick's solve in the adaptive freezing core at the given
    tolerances (the warm-tick fast path); 0 = fixed ``max_iter`` iterations
    per tick. ``cone_ops`` (:func:`.fused_admm.pad_cones`) appends exact
    second-order-cone projections to every tick's slack stage — identical
    composition to :func:`.fused_admm.fused_solve` (coned powered-descent
    missions in one launch). Semantics per tick match
    :func:`..api.mpc.fused_mpc_rollout` exactly (which is the
    scan-of-kernels implementation of the same loop).
    """
    if algo not in ("f32", "bf16x3"):
        raise ValueError(f"unknown algo {algo!r}; use 'f32' or 'bf16x3'")
    if max_iter < 1:
        raise ValueError("at least one iteration per tick")
    if n_ticks < 1:
        raise ValueError("at least one tick")
    nx, nu, N = pp.dims
    g = pp.g
    Du, Dx = (N - 1) * nu, N * nx
    Dxp, Dup = pp.Dxp, pp.Dup
    Dug = pp.u_min.shape[1]
    gDxp = pp.x_min.shape[1]
    nxg = pp.W_fx.shape[0]
    B, _ = x0.shape
    dtype = x0.dtype
    T = int(n_ticks)

    if const_seq is None:
        const_core = (
            jnp.matmul(pp.xref_q, pp.W_eq_u, precision=_HI)
            + jnp.matmul(pp.pterm_c, pp.W_ep_u, precision=_HI)
        )[:, :Du]
        const_d = jnp.tile(const_core, (1, g))
        if Dug != g * Du:
            const_d = jnp.pad(const_d, ((0, 0), (0, Dug - g * Du)))
        tracking = False
    else:
        if const_seq.shape != (T, Dug):
            raise ValueError(
                f"const_seq must be ({T}, {Dug}), got {const_seq.shape}")
        const_d = const_seq
        tracking = True

    nc_u = cone_ops.nc_u if cone_ops is not None else 0
    nc_x = cone_ops.nc_x if cone_ops is not None else 0
    cone_args: tuple = ()
    if nc_u:
        cone_args += (cone_ops.cu_gather, cone_ops.cu_scatter,
                      cone_ops.cu_vec)
    if nc_x:
        cone_args += (cone_ops.cx_gather, cone_ops.cx_scatter,
                      cone_ops.cx_vec)

    # Tile sizing: the one-solve kernel's footprint plus the persistent
    # scratch (x0, D, Z, V) and the double-buffered trace block.
    w_args = (pp.W_fx, pp.W_fd, pp.W_gx, pp.W_gd, pp.W_q, pp.W_r,
              rops.W_A, rops.W_B0, rops.W_sel)
    w_bytes = sum(int(np.prod(w.shape)) * 4 for w in w_args + cone_args)
    per_row = 4 * (
        2 * (nxg + 3 * Dug + 2 * gDxp)
        + 2 * (4 * Dug + 3 * gDxp + g * STATS + nxg + LANES)
        + 10 * gDxp + 6 * Dug
        + (nxg + 2 * Dug + gDxp)          # persistent scratch
    )
    if check_termination > 0:
        per_row += 4 * (6 * g * LANES + 5 * Dug + 5 * gDxp)
    # Cone projection temporaries (same accounting as fused_solve — the
    # adaptive+state-cone configuration OOMs VMEM at the default tile
    # without this term).
    per_row += 4 * 10 * (nc_u * Dug + nc_x * gDxp)
    budget = 12 * 1024 * 1024 - w_bytes
    rows_cap = max(8, (budget // per_row) // 8 * 8)
    rows_want = max(8, (-(-min(batch_tile, max(B, 1)) // g) + 7) // 8 * 8)
    bt_rows = min(rows_want, rows_cap)
    inst_tile = g * bt_rows

    B_pad = ((B + inst_tile - 1) // inst_tile) * inst_tile
    if B_pad != B:
        extra = B_pad - B
        x0 = jnp.concatenate([x0, jnp.zeros((extra, nx), dtype)], axis=0)
        carry = FusedCarry(*(
            jnp.concatenate(
                [a, jnp.zeros((extra, a.shape[1]), a.dtype)], axis=0
            ) for a in carry
        ))
    R = B_pad // g
    grid = (R // bt_rows, T)

    x0p = x0.reshape(R, g * nx)
    if nxg != g * nx:
        x0p = jnp.pad(x0p, ((0, 0), (0, nxg - g * nx)))
    Dp = _pack_du(carry.D, g, Du, Dug)
    Zp = _pack_du(carry.Z, g, Du, Dug)
    Vp = _pack_dx(carry.V, g)

    def batch_spec(width):
        return pl.BlockSpec((bt_rows, width), lambda i, t: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)

    smem_spec = pl.BlockSpec((1, 1), lambda i, t: (0, 0),
                             memory_space=pltpu.SMEM)
    tols = jnp.stack([
        jnp.asarray(abs_pri_tol, jnp.float32).reshape(()),
        jnp.asarray(abs_dua_tol, jnp.float32).reshape(()),
    ]).reshape(1, 2)
    scalar_specs = [
        smem_spec,
        pl.BlockSpec((1, 2), lambda i, t: (0, 0), memory_space=pltpu.SMEM),
    ]
    state_specs = [
        batch_spec(nxg), batch_spec(Dug), batch_spec(Dug), batch_spec(gDxp),
    ]
    if tracking:
        # (T, 8, Dug): tick rows replicated over 8 sublanes so the per-tick
        # block satisfies Mosaic's (8, 128)-divisibility rule.
        const_d = jnp.broadcast_to(const_d[:, None, :], (T, 8, Dug))
        const_d_spec = pl.BlockSpec((1, 8, Dug), lambda i, t: (t, 0, 0),
                                    memory_space=pltpu.VMEM)
    else:
        const_d_spec = const_spec((1, Dug))
    vec_specs = [
        const_d_spec,
        const_spec((1, Dug)), const_spec((1, Dug)),
        const_spec((1, gDxp)), const_spec((1, gDxp)),
        const_spec(pp.seg.shape),
    ]
    w_specs = [const_spec(w.shape) for w in w_args]
    cone_specs = [const_spec(a.shape) for a in cone_args]
    out_shape = [
        jax.ShapeDtypeStruct((R, T * LANES), jnp.float32),   # trace
        jax.ShapeDtypeStruct((R, nxg), dtype),               # x_final
        jax.ShapeDtypeStruct((R, Dug), dtype),               # U
        jax.ShapeDtypeStruct((R, gDxp), dtype),              # X
        jax.ShapeDtypeStruct((R, Dug), dtype),               # D
        jax.ShapeDtypeStruct((R, Dug), dtype),               # Y
        jax.ShapeDtypeStruct((R, gDxp), dtype),              # G
        jax.ShapeDtypeStruct((R, Dug), dtype),               # Z
        jax.ShapeDtypeStruct((R, gDxp), dtype),              # V
        jax.ShapeDtypeStruct((R, g * STATS), jnp.float32),   # stats
    ]
    out_specs = [
        pl.BlockSpec((bt_rows, LANES), lambda i, t: (i, t),
                     memory_space=pltpu.VMEM),
        batch_spec(nxg),
        batch_spec(Dug), batch_spec(gDxp), batch_spec(Dug), batch_spec(Dug),
        batch_spec(gDxp), batch_spec(Dug), batch_spec(gDxp),
        batch_spec(g * STATS),
    ]
    vec_args = (const_d, pp.u_min, pp.u_max, pp.x_min, pp.x_max, pp.seg)
    state_args = (x0p, Dp, Zp, Vp)

    flops_iter = 2 * R * (
        Dug * gDxp + Dug * Dug + gDxp * Dug + Dug * Dug
        + nxg * gDxp + nxg * Dug
        + nc_u * 2 * Dug * Dug + nc_x * 2 * gDxp * gDxp
    )
    cost = pl.CostEstimate(
        flops=flops_iter * max_iter * T,
        bytes_accessed=(
            sum(int(np.prod(a.shape)) * a.dtype.itemsize
                for a in state_args + vec_args + w_args + cone_args)
            + sum(int(np.prod(s.shape)) * s.dtype.itemsize for s in out_shape)
        ),
        transcendentals=0,
    )
    kernel = functools.partial(
        _kernel_rollout,
        ticks=T, max_iter=max_iter, check_every=check_termination,
        warmup=min(warmup_iters, max_iter - 1), g=g, nu=nu,
        interpret=interpret, algo=algo, polish=polish,
        nc_u=nc_u, nc_x=nc_x, alpha=alpha, _ablate=_ablate,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=scalar_specs + state_specs + vec_specs + w_specs
        + cone_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bt_rows, nxg), jnp.float32),
            pltpu.VMEM((bt_rows, Dug), jnp.float32),
            pltpu.VMEM((bt_rows, Dug), jnp.float32),
            pltpu.VMEM((bt_rows, gDxp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(pp.rho, tols, *state_args, *vec_args, *w_args, *cone_args)

    trace, xfp, Up, Xp, Dp, Yp, Gp, Zp, Vp, stats_p = outs
    U = _unpack_du(Up, g, Du, Dup)
    D = _unpack_du(Dp, g, Du, Dup)
    Y = _unpack_du(Yp, g, Du, Dup)
    Z = _unpack_du(Zp, g, Du, Dup)
    X = _unpack_dx(Xp, g)
    G = _unpack_dx(Gp, g)
    V = _unpack_dx(Vp, g)
    stats = stats_p.reshape(B_pad, STATS)
    x_final = xfp[:, : g * nx].reshape(B_pad, nx)
    tr = trace.reshape(R, T, LANES)
    us = (
        tr[:, :, : g * nu].reshape(R, T, g, nu)
        .transpose(1, 0, 2, 3).reshape(T, B_pad, nu)
    )
    iters = (
        tr[:, :, g * nu: g * nu + g].reshape(R, T, g)
        .transpose(1, 0, 2).reshape(T, B_pad)
    )
    if B_pad != B:
        U, X, D, Y, G, Z, V, stats, x_final = (
            a[:B] for a in (U, X, D, Y, G, Z, V, stats, x_final)
        )
        us = us[:, :B]
        iters = iters[:, :B]
    final = FusedResult(
        U=U, X=X, carry=FusedCarry(D=D, Y=Y, G=G, Z=Z, V=V), stats=stats
    )
    return RolloutResult(x_final=x_final, us=us, iters=iters, final=final)


def rollout_const_seq(
    pp: PaddedProblem,
    Q: jax.Array,
    Pinf: jax.Array,
    Xref_total: jax.Array,
    n_ticks: int,
) -> jax.Array:
    """Per-tick folded reference constants for tracking mode: tick ``t``
    uses the window ``Xref_total[t:t+N]`` (reference:
    quadrotor_tracking.cpp:101). Returns ``(n_ticks, Dug)`` rows of
    ``const_d`` — the only reference-dependent operand of the folded
    iteration (see :func:`.fused_admm.ref_vectors`)."""
    from .fused_admm import ref_vectors

    nx, nu, N = pp.dims
    Du = (N - 1) * nu
    g = pp.g
    Dug = pp.u_min.shape[1]

    def one(t):
        window = jax.lax.dynamic_slice_in_dim(Xref_total, t, N, axis=0)
        xq, pc = ref_vectors(pp, Q, Pinf, window)
        core = (
            jnp.matmul(xq, pp.W_eq_u, precision=_HI)
            + jnp.matmul(pc, pp.W_ep_u, precision=_HI)
        )[0, :Du]
        row = jnp.tile(core, (g,))
        if Dug != g * Du:
            row = jnp.pad(row, (0, Dug - g * Du))
        return row

    return jax.vmap(one)(jnp.arange(n_ticks))
