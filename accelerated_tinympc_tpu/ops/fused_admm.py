"""Fused Pallas TPU kernel: the entire batched ADMM solve in one kernel launch.

This is the speed-of-light tier. The condensed formulation
(:mod:`..solver.condensed`) turns each ADMM iteration into a handful of small
matmuls plus elementwise chains; running it as jnp under jit still round-trips
every ``(B, lanes)`` intermediate through HBM once the batch is large, and pays
per-HLO overheads on the sequential iteration loop. Here the whole solve loop
runs inside a single ``pallas_call``: per batch tile, every iterate and every
condensed operator is VMEM-resident for all iterations — HBM traffic is one
read of ``x0``/warm-start carries and one write of results per *solve*, not per
iteration.

Layout: flat time-major vectors padded to the 128-lane width
(``Dx = N*nx -> Dxp``, ``Du = (N-1)*nu -> Dup``), batch tiles of ``bt``
instances on sublanes. All padding is arranged so padded lanes stay identically
zero through every stage (zero operator rows/cols, zero bounds, zero reference
terms), so no masking is needed anywhere except selecting the terminal-knot
lanes of the costate — done with a constant 0/1 lane mask, not slicing.

Semantics: stage-for-stage identical to the reference iteration (reference:
src/tinympc/admm.cpp:111-152): a fixed-iteration mode (the reference with
termination checks disabled — deterministic benchmarking/golden tier) and an
adaptive mode with per-instance convergence freezing replicating the early
exit (residual definitions per reference src/tinympc/admm.cpp:91-109; exit
skips the slack save + backward pass, admm.cpp:135-144).

The costate ``p`` is not materialized: within one iteration only the terminal
knot of ``p`` (refreshed by update_linear_cost, admm.cpp:83-84) feeds the
backward recursion, and the interior knots are never consumed by any later
stage, so the fused tier simply never computes them. ``d`` is the only
backward-pass output with a cross-iteration life.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..precompute import CondensedOperators
from ..types import Cache, Problem

LANES = 128
# Stats output is a full 128-lane row per instance (lane-1 vectors trip Mosaic
# relayout); only the first 6 lanes carry data: iters, solved, 4 residuals.
STATS = 128


def _lane_onehot(i: int, width: int = LANES) -> "jax.Array":
    return (
        jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) == i
    ).astype(jnp.float32)


def _pad_to(n: int, m: int = LANES) -> int:
    return ((n + m - 1) // m) * m


class PaddedProblem(NamedTuple):
    """Lane-padded condensed operators + problem vectors, kernel-ready.

    All ``W_*`` are stored transposed, ``(in_pad, out_pad)``, so every kernel
    contraction is ``Y = X @ W``. ``W_eq`` has zero rows for the terminal-knot
    and padding lanes, making ``Q @ W_eq`` equal the reference's
    ``q_{0..N-2}`` contraction without slicing; ``W_ep`` rows live at the
    terminal-knot lanes so the full-width costate vector contracts like the
    reference's terminal ``p``.
    """

    W_fx: jax.Array   # (nx_pad, Dxp)  x0 -> X
    W_fd: jax.Array   # (Dup, Dxp)     D  -> X
    W_gx: jax.Array   # (nx_pad, Dup)  x0 -> U
    W_gd: jax.Array   # (Dup, Dup)     D  -> U
    W_eq: jax.Array   # (Dxp, Dup)     Q  -> D
    W_er: jax.Array   # (Dup, Dup)     R  -> D
    W_ep: jax.Array   # (Dxp, Dup)     pterm-vec -> D
    xref_q: jax.Array     # (1, Dxp)  = -(Xref * Qdiag), padded
    pterm_c: jax.Array    # (1, Dxp)  = -Xref[-1] @ Pinf in terminal lanes
    mask_term: jax.Array  # (1, Dxp)  1.0 on terminal-knot lanes
    u_min: jax.Array      # (1, Dup)
    u_max: jax.Array
    x_min: jax.Array      # (1, Dxp)
    x_max: jax.Array
    rho: jax.Array        # (1, 1)
    dims: tuple[int, int, int]  # (nx, nu, horizon) — static metadata

    @property
    def nx_pad(self) -> int:
        return self.W_fx.shape[0]

    @property
    def Dxp(self) -> int:
        return self.W_fx.shape[1]

    @property
    def Dup(self) -> int:
        return self.W_gd.shape[1]


def _place(v: np.ndarray, size: int, at: int) -> np.ndarray:
    out = np.zeros(size, np.float64)
    out[at:at + v.size] = v
    return out


def _pad_vec(v: np.ndarray, width: int, dtype) -> jax.Array:
    out = np.zeros((1, width), np.float64)
    out[0, : v.size] = v
    return jnp.asarray(out, dtype)


def pad_problem(
    problem: Problem, cache: Cache, ops: CondensedOperators,
    dtype: Any = jnp.float32,
) -> PaddedProblem:
    """Pad condensed operators/problem data into the kernel layout (host-side,
    float64 until the final cast)."""
    nx, nu, N = problem.nx, problem.nu, problem.horizon
    m = N - 1
    Dx, Du = N * nx, m * nu
    Dxp, Dup, nxp = _pad_to(Dx), _pad_to(Du), _pad_to(nx)
    t0 = Dx - nx  # first terminal-knot lane

    def padW(Wt: np.ndarray, rows: int, cols: int, row0: int = 0) -> jax.Array:
        out = np.zeros((rows, cols), np.float64)
        out[row0:row0 + Wt.shape[0], : Wt.shape[1]] = Wt
        return jnp.asarray(out, dtype)

    o = {k: np.asarray(getattr(ops, k), np.float64) for k in ops._fields}
    return PaddedProblem(
        W_fx=padW(o["Fx0"].T, nxp, Dxp),
        W_fd=padW(o["Fd"].T, Dup, Dxp),
        W_gx=padW(o["Gx0"].T, nxp, Dup),
        W_gd=padW(o["Gd"].T, Dup, Dup),
        W_eq=padW(o["Eq"].T, Dxp, Dup),
        W_er=padW(o["Er"].T, Dup, Dup),
        W_ep=padW(o["Ep"].T, Dxp, Dup, row0=t0),
        xref_q=_pad_vec(
            -(np.asarray(problem.Xref, np.float64)
              * np.asarray(problem.Q, np.float64)).reshape(-1), Dxp, dtype),
        pterm_c=_pad_vec(
            _place(-np.asarray(problem.Xref[-1], np.float64)
                   @ np.asarray(cache.Pinf, np.float64), Dx, t0), Dxp, dtype),
        mask_term=_pad_vec(_place(np.ones(nx), Dx, t0), Dxp, dtype),
        u_min=_pad_vec(np.asarray(problem.u_min, np.float64).reshape(-1), Dup, dtype),
        u_max=_pad_vec(np.asarray(problem.u_max, np.float64).reshape(-1), Dup, dtype),
        x_min=_pad_vec(np.asarray(problem.x_min, np.float64).reshape(-1), Dxp, dtype),
        x_max=_pad_vec(np.asarray(problem.x_max, np.float64).reshape(-1), Dxp, dtype),
        rho=jnp.asarray(np.asarray(cache.rho, np.float64).reshape(1, 1), dtype),
        dims=(nx, nu, N),
    )


def ref_vectors(
    pp: PaddedProblem,
    Q: jax.Array,
    Pinf: jax.Array,
    Xref: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Device-side recomputation of the reference-dependent kernel operands
    for a new horizon window (tracking mode, reference:
    quadrotor_tracking.cpp:101 sliding the window each tick): the baked
    ``xref_q``/``pterm_c`` in :func:`pad_problem` are just these two vectors,
    so updating the reference costs two tiny jnp ops — no re-padding of
    operators.

    ``Q`` is the (nx,) workspace cost diagonal, ``Pinf`` the (nx, nx) cache
    matrix, ``Xref`` the (N, nx) window. Returns ``(xref_q, pterm_c)`` shaped
    ``(1, Dxp)``.
    """
    nx, _nu, N = pp.dims
    Dx = N * nx
    t0 = Dx - nx
    hi = jax.lax.Precision.HIGHEST
    dtype = pp.xref_q.dtype
    xref_q = jnp.zeros((1, pp.Dxp), dtype).at[0, :Dx].set(
        -(Xref * Q).reshape(-1).astype(dtype)
    )
    pterm = -jnp.matmul(Xref[-1], Pinf, precision=hi).astype(dtype)
    pterm_c = jnp.zeros((1, pp.Dxp), dtype).at[0, t0:Dx].set(pterm)
    return xref_q, pterm_c


class FusedCarry(NamedTuple):
    """Warm-start carries persisting across MPC ticks, flat-padded ``(B, .)``.
    The reference keeps these in its global workspace between tiny_solve calls
    (examples/quadrotor_hovering.cpp:99-104 resets only the duals)."""

    D: jax.Array  # (B, Dup)
    Y: jax.Array  # (B, Dup)
    G: jax.Array  # (B, Dxp)
    Z: jax.Array  # (B, Dup)
    V: jax.Array  # (B, Dxp)

    @staticmethod
    def zeros(batch: int, pp: PaddedProblem, dtype=jnp.float32) -> "FusedCarry":
        fu = jnp.zeros((batch, pp.Dup), dtype)
        fx = jnp.zeros((batch, pp.Dxp), dtype)
        return FusedCarry(D=fu, Y=fu, G=fx, Z=fu, V=fx)

    def reset_duals(self) -> "FusedCarry":
        """Zero y/g between ticks (reference: tiny_wrapper.cpp:131-140)."""
        return self._replace(Y=jnp.zeros_like(self.Y), G=jnp.zeros_like(self.G))


class FusedResult(NamedTuple):
    """Kernel outputs. ``U``/``X`` are the final pre-projection iterates (the
    reference applies pre-projection u — examples/quadrotor_hovering.cpp:104-110).
    ``stats[:, 0]`` iterations, ``stats[:, 1]`` solved flag, ``stats[:, 2:6]``
    residuals [pri_state, dua_state, pri_input, dua_input]."""

    U: jax.Array
    X: jax.Array
    carry: FusedCarry
    stats: jax.Array  # (B, STATS) float32; lanes 0-5 meaningful (see above)


def _iteration(D, Y, G, W, consts, precision=jax.lax.Precision.HIGHEST):
    """One condensed ADMM iteration on VMEM-resident values.

    ``precision=HIGHEST`` forces multi-pass f32 MXU matmuls — the default
    single-pass bf16 loses ~3 decimal digits per iteration and drifts the
    100-iteration solve by ~1e-2, blowing the 1e-4 parity bar
    (``preferred_element_type`` alone only pins the accumulator dtype).
    """
    (Xb, Ub, xref_q, pterm_c, mask_term, u_min, u_max, x_min, x_max, rho) = consts
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=precision
    )
    # forward pass (reference: src/tinympc/admm.cpp:27-37); the x0 contractions
    # are loop-invariant and hoisted by the caller (Xb = x0 @ W_fx etc.),
    # leaving 5 matmuls on the per-iteration critical path instead of 7.
    X = Xb + dot(D, W.W_fd)
    U = Ub + dot(D, W.W_gd)
    # slack projection (admm.cpp:45-61)
    Znew = jnp.clip(U + Y, u_min, u_max)
    Vnew = jnp.clip(X + G, x_min, x_max)
    # dual ascent (admm.cpp:67-71)
    Yn = Y + U - Znew
    Gn = G + X - Vnew
    # linear cost (admm.cpp:77-85)
    R = -rho * (Znew - Yn)
    Q = xref_q - rho * (Vnew - Gn)
    ptermv = mask_term * (Q - xref_q) + pterm_c
    # backward pass (admm.cpp:15-22), condensed; only d survives the iteration
    Dn = dot(Q, W.W_eq) + dot(R, W.W_er) + dot(ptermv, W.W_ep)
    return Dn, Yn, Gn, Znew, Vnew, U, X


class _W(NamedTuple):
    W_fx: jax.Array
    W_fd: jax.Array
    W_gx: jax.Array
    W_gd: jax.Array
    W_eq: jax.Array
    W_er: jax.Array
    W_ep: jax.Array


def _kernel_fixed(
    rho_ref,
    x0_ref, D0_ref, Y0_ref, G0_ref, Z0_ref, V0_ref,
    xref_q_ref, pterm_c_ref, mask_term_ref,
    u_min_ref, u_max_ref, x_min_ref, x_max_ref,
    w_fx_ref, w_fd_ref, w_gx_ref, w_gd_ref, w_eq_ref, w_er_ref, w_ep_ref,
    U_out, X_out, D_out, Y_out, G_out, Z_out, V_out, stats_out,
    *, max_iter: int,
):
    """Fixed-iteration fused solve (deterministic tier)."""
    dot_hi = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    Xb = dot_hi(x0_ref[:], w_fx_ref[:])
    Ub = dot_hi(x0_ref[:], w_gx_ref[:])
    consts = (
        Xb, Ub, xref_q_ref[:], pterm_c_ref[:], mask_term_ref[:],
        u_min_ref[:], u_max_ref[:], x_min_ref[:], x_max_ref[:], rho_ref[0, 0],
    )
    W = _W(
        w_fx_ref[:], w_fd_ref[:], w_gx_ref[:], w_gd_ref[:],
        w_eq_ref[:], w_er_ref[:], w_ep_ref[:],
    )
    rho = rho_ref[0, 0]

    def body(_, carry):
        D, Y, G, Z, V = carry
        Dn, Yn, Gn, Znew, Vnew, _U, _X = _iteration(D, Y, G, W, consts)
        return (Dn, Yn, Gn, Znew, Vnew)

    D, Y, G, Z, V = jax.lax.fori_loop(
        0, max_iter - 1, body,
        (D0_ref[:], Y0_ref[:], G0_ref[:], Z0_ref[:], V0_ref[:]),
    )
    # Final iteration keeps the full iterate set for outputs.
    Dn, Yn, Gn, Znew, Vnew, U, X = _iteration(D, Y, G, W, consts)
    U_out[:] = U
    X_out[:] = X
    D_out[:] = Dn
    Y_out[:] = Yn
    G_out[:] = Gn
    Z_out[:] = Znew
    V_out[:] = Vnew
    bt = U.shape[0]
    wide = lambda v: jnp.broadcast_to(
        jnp.max(v, axis=-1, keepdims=True), (bt, STATS)
    )
    pri_s = wide(jnp.abs(X - Vnew))
    dua_s = rho * wide(jnp.abs(V - Vnew))
    pri_u = wide(jnp.abs(U - Znew))
    dua_u = rho * wide(jnp.abs(Z - Znew))
    iters = jnp.full((bt, STATS), float(max_iter), jnp.float32)
    stats_out[:] = (
        iters * _lane_onehot(0, STATS)
        + pri_s * _lane_onehot(2, STATS) + dua_s * _lane_onehot(3, STATS)
        + pri_u * _lane_onehot(4, STATS) + dua_u * _lane_onehot(5, STATS)
    )


def _max_all_lanes(x: jax.Array, interpret: bool) -> jax.Array:
    """Row max of ``x (bt, W)`` replicated into every lane of a (bt, LANES)
    result — built entirely from full-width ops (chunked maxima + log2 lane
    rotations). Mosaic cannot keep lane-1 vectors (keepdims reductions) in
    consistent layouts across while-loop carries, so the adaptive kernel does
    all per-instance bookkeeping at full lane width."""
    w = x.shape[-1]
    m = x[:, :LANES]
    for i in range(1, w // LANES):
        m = jnp.maximum(m, x[:, i * LANES:(i + 1) * LANES])
    if interpret:
        # pltpu.roll is TPU-only; the interpreter path uses the plain
        # reduction (layouts are irrelevant there).
        return jnp.broadcast_to(jnp.max(m, axis=-1, keepdims=True), m.shape)
    shift = 1
    while shift < LANES:
        m = jnp.maximum(m, pltpu.roll(m, shift, axis=1))
        shift *= 2
    return m


def _kernel_adaptive(
    rho_ref, tol_ref,
    x0_ref, D0_ref, Y0_ref, G0_ref, Z0_ref, V0_ref,
    xref_q_ref, pterm_c_ref, mask_term_ref,
    u_min_ref, u_max_ref, x_min_ref, x_max_ref,
    w_fx_ref, w_fd_ref, w_gx_ref, w_gd_ref, w_eq_ref, w_er_ref, w_ep_ref,
    U_out, X_out, D_out, Y_out, G_out, Z_out, V_out, stats_out,
    *, max_iter: int, check_every: int, warmup: int = 0,
    interpret: bool = False,
):
    """Adaptive fused solve with per-instance convergence freezing.

    ``warmup > 0`` runs that many iterations in the cheap fixed-mode body
    (no residuals, no freeze bookkeeping) before the adaptive loop — an
    opt-in throughput knob equivalent to plain adaptive whenever no instance
    could converge within the warmup window.

    A converged instance's iterates stop advancing — including skipping the
    slack save and backward pass, exactly like the reference's early return
    (reference: src/tinympc/admm.cpp:135-144) — and the tile exits when all
    instances are done or ``max_iter`` is reached.

    Layout discipline (hard-won, see CLAUDE.md): every per-instance scalar
    (done flag, iteration count, residuals) is carried as a full-width
    (bt, LANES) array with the value replicated across lanes; freezes use
    exact 0/1-mask arithmetic instead of select_n. Lane-1 vectors and
    replicated constants in while-loop carries are unlowerable in Mosaic.
    """
    dot_hi = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    Xb = dot_hi(x0_ref[:], w_fx_ref[:])
    Ub = dot_hi(x0_ref[:], w_gx_ref[:])
    consts = (
        Xb, Ub, xref_q_ref[:], pterm_c_ref[:], mask_term_ref[:],
        u_min_ref[:], u_max_ref[:], x_min_ref[:], x_max_ref[:], rho_ref[0, 0],
    )
    W = _W(
        w_fx_ref[:], w_fd_ref[:], w_gx_ref[:], w_gd_ref[:],
        w_eq_ref[:], w_er_ref[:], w_ep_ref[:],
    )
    rho = rho_ref[0, 0]
    pri_tol = tol_ref[0, 0]
    dua_tol = tol_ref[0, 1]
    Dup = D0_ref.shape[-1]
    Dxp = G0_ref.shape[-1]

    def widen(m, w):
        if w == LANES:
            return m
        return jnp.concatenate([m] * (w // LANES), axis=1)

    lane_max = functools.partial(_max_all_lanes, interpret=interpret)

    def warm_body(_, c):
        D, Y, G, Z, V = c
        Dn, Yn, Gn, Znew, Vnew, _U, _X = _iteration(D, Y, G, W, consts)
        return (Dn, Yn, Gn, Znew, Vnew)

    def cond(state):
        k, done = state[0], state[1]
        return jnp.logical_and(k < max_iter, jnp.logical_not(jnp.all(done > 0.5)))

    def body(state):
        k, done, D, Y, G, Z, V, Uf, Xf, itf, r0, r1, r2, r3 = state
        Dn, Yn, Gn, Znew, Vnew, U, X = _iteration(D, Y, G, W, consts)
        # Residuals (admm.cpp:95-98): pre-projection iterates vs new slacks;
        # old-vs-new slacks scaled by rho. (bt, LANES), lane-replicated.
        pri_s = lane_max(jnp.abs(X - Vnew))
        dua_s = rho * lane_max(jnp.abs(V - Vnew))
        pri_u = lane_max(jnp.abs(U - Znew))
        dua_u = rho * lane_max(jnp.abs(Z - Znew))
        checking = (k + 1) % check_every == 0  # traced scalar: splats fine
        conv_now = jnp.logical_and(
            checking,
            (pri_s < pri_tol) & (pri_u < pri_tol)
            & (dua_s < dua_tol) & (dua_u < dua_tol),
        ).astype(jnp.float32)
        frozen = done                   # 1.0 where done before this iteration
        m_adv = 1.0 - frozen            # executed this iteration
        m_newly = m_adv * conv_now
        m_live = m_adv * (1.0 - conv_now)

        # Freeze/advance via EXACT 0/1-mask arithmetic: a*m + b*(1-m) is
        # exact for binary masks and avoids select_n entirely.
        def pick(m, a, b):
            return a * m + b * (1.0 - m)

        mu_live, mx_live = widen(m_live, Dup), widen(m_live, Dxp)
        mu_adv, mx_adv = widen(m_adv, Dup), widen(m_adv, Dxp)
        # Newly-converged keep pre-backward state: D/Z/V stay, Y/G advance.
        D = pick(mu_live, Dn, D)
        Y = pick(mu_adv, Yn, Y)
        G = pick(mx_adv, Gn, G)
        Z = pick(mu_live, Znew, Z)
        V = pick(mx_live, Vnew, V)
        Uf = pick(mu_adv, U, Uf)
        Xf = pick(mx_adv, X, Xf)
        # Iteration count = number of iterations this instance advanced
        # (instances advance every iteration until frozen).
        itf = itf + m_adv
        # Residual fields persist between checks (reference stores them only
        # at check iterations — admm.cpp:93-98).
        m_upd = m_adv * jnp.float32(1.0) * checking.astype(jnp.float32)
        r0 = pick(m_upd, pri_s, r0)
        r1 = pick(m_upd, dua_s, r1)
        r2 = pick(m_upd, pri_u, r2)
        r3 = pick(m_upd, dua_u, r3)
        return (k + 1, jnp.maximum(done, m_newly),
                D, Y, G, Z, V, Uf, Xf, itf, r0, r1, r2, r3)

    # Carry inits derive from real data (pure constants materialize in a
    # replicated layout that poisons the whole carry chain).
    bl = _max_all_lanes(D0_ref[:] * 0.0, interpret=interpret)  # (bt, LANES) zeros
    D0, Y0, G0, Z0, V0 = (
        D0_ref[:], Y0_ref[:], G0_ref[:], Z0_ref[:], V0_ref[:]
    )
    if warmup > 0:
        D0, Y0, G0, Z0, V0 = jax.lax.fori_loop(
            0, warmup, warm_body, (D0, Y0, G0, Z0, V0)
        )
    init = (
        jnp.full((), warmup, jnp.int32),
        bl,
        D0, Y0, G0, Z0, V0,
        D0_ref[:] * 0.0, G0_ref[:] * 0.0,
        bl + float(warmup), bl, bl, bl, bl,
    )
    (_k, done, D, Y, G, Z, V, Uf, Xf, itf, r0, r1, r2, r3) = (
        jax.lax.while_loop(cond, body, init)
    )
    U_out[:] = Uf
    X_out[:] = Xf
    D_out[:] = D
    Y_out[:] = Y
    G_out[:] = G
    Z_out[:] = Z
    V_out[:] = V
    stats_out[:] = (
        itf * _lane_onehot(0, STATS)
        + done * _lane_onehot(1, STATS)
        + r0 * _lane_onehot(2, STATS) + r1 * _lane_onehot(3, STATS)
        + r2 * _lane_onehot(4, STATS) + r3 * _lane_onehot(5, STATS)
    )


def fused_solve(
    x0: jax.Array,
    carry: FusedCarry,
    pp: PaddedProblem,
    *,
    max_iter: int = 100,
    check_termination: int = 0,
    abs_pri_tol: float = 1e-3,
    abs_dua_tol: float = 1e-3,
    batch_tile: int = 256,
    warmup_iters: int = 0,
    interpret: bool = False,
    xref_q: jax.Array | None = None,
    pterm_c: jax.Array | None = None,
) -> FusedResult:
    """Run the fused whole-solve kernel over a batch.

    ``x0`` is ``(B, nx)`` (un-padded); carries are flat-padded
    (:class:`FusedCarry`); batches that are not tile multiples are padded
    internally and sliced back. ``check_termination == 0`` selects
    the fixed-iteration kernel, otherwise the adaptive freezing kernel with
    checks every ``check_termination`` iterations.

    ``xref_q``/``pterm_c`` override the baked reference vectors (tracking
    mode — build them with :func:`ref_vectors`). ``warmup_iters`` (adaptive
    mode only) runs that many iterations without convergence checks first —
    cheaper per iteration; results are identical to plain adaptive whenever
    no instance converges within the warmup window.

    ``interpret=True`` runs the Pallas interpreter (CPU-testable).
    """
    if xref_q is not None or pterm_c is not None:
        pp = pp._replace(
            xref_q=xref_q if xref_q is not None else pp.xref_q,
            pterm_c=pterm_c if pterm_c is not None else pp.pterm_c,
        )
    if max_iter < 1:
        raise ValueError("the fused tier runs at least one iteration; "
                         "use the scan tier for max_iter=0")
    B, nx = x0.shape
    # Cap the batch tile so the kernel's VMEM footprint (state blocks,
    # double-buffered in/out, elementwise temps, operators) stays inside the
    # ~16 MB budget — wide horizons (large Dxp) otherwise OOM at compile time.
    per_row_bytes = 34 * max(pp.Dxp, pp.Dup) * 4  # empirical buffer count
    w_bytes = sum(int(np.prod(w.shape)) * 4 for w in
                  (pp.W_fx, pp.W_fd, pp.W_gx, pp.W_gd,
                   pp.W_eq, pp.W_er, pp.W_ep))
    budget = 12 * 1024 * 1024 - w_bytes
    bt_cap = max(8, budget // per_row_bytes)
    bt = min(batch_tile, B, int(bt_cap))
    bt = max(8, (bt // 8) * 8)  # sublane multiple
    # Pad the batch up to a tile multiple (padded instances solve zeros and
    # are sliced off below — the kernel is oblivious).
    B_pad = ((B + bt - 1) // bt) * bt
    if B_pad != B:
        extra = B_pad - B
        x0 = jnp.concatenate(
            [x0, jnp.zeros((extra, nx), x0.dtype)], axis=0
        )
        carry = FusedCarry(*(
            jnp.concatenate(
                [a, jnp.zeros((extra, a.shape[1]), a.dtype)], axis=0
            ) for a in carry
        ))
    orig_B, B = B, B_pad
    grid = (B // bt,)
    Dxp, Dup, nxp = pp.Dxp, pp.Dup, pp.nx_pad
    dtype = x0.dtype

    x0p = jnp.zeros((B, nxp), dtype).at[:, :nx].set(x0)

    def batch_spec(width):
        return pl.BlockSpec((bt, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    vec_specs = [
        const_spec((1, Dxp)),  # xref_q
        const_spec((1, Dxp)),  # pterm_c
        const_spec((1, Dxp)),  # mask_term
        const_spec((1, Dup)),  # u_min
        const_spec((1, Dup)),  # u_max
        const_spec((1, Dxp)),  # x_min
        const_spec((1, Dxp)),  # x_max
    ]
    w_specs = [
        const_spec(pp.W_fx.shape), const_spec(pp.W_fd.shape),
        const_spec(pp.W_gx.shape), const_spec(pp.W_gd.shape),
        const_spec(pp.W_eq.shape), const_spec(pp.W_er.shape),
        const_spec(pp.W_ep.shape),
    ]
    state_specs = [
        batch_spec(nxp),  # x0
        batch_spec(Dup),  # D
        batch_spec(Dup),  # Y
        batch_spec(Dxp),  # G
        batch_spec(Dup),  # Z
        batch_spec(Dxp),  # V
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, Dup), dtype),  # U
        jax.ShapeDtypeStruct((B, Dxp), dtype),  # X
        jax.ShapeDtypeStruct((B, Dup), dtype),  # D
        jax.ShapeDtypeStruct((B, Dup), dtype),  # Y
        jax.ShapeDtypeStruct((B, Dxp), dtype),  # G
        jax.ShapeDtypeStruct((B, Dup), dtype),  # Z
        jax.ShapeDtypeStruct((B, Dxp), dtype),  # V
        jax.ShapeDtypeStruct((B, STATS), jnp.float32),
    ]
    out_specs = [
        batch_spec(Dup), batch_spec(Dxp), batch_spec(Dup), batch_spec(Dup),
        batch_spec(Dxp), batch_spec(Dup), batch_spec(Dxp), batch_spec(STATS),
    ]
    vec_args = (pp.xref_q, pp.pterm_c, pp.mask_term,
                pp.u_min, pp.u_max, pp.x_min, pp.x_max)
    w_args = (pp.W_fx, pp.W_fd, pp.W_gx, pp.W_gd, pp.W_eq, pp.W_er, pp.W_ep)
    state_args = (x0p, carry.D, carry.Y, carry.G, carry.Z, carry.V)

    # FLOPs: 5 in-loop padded matmuls per iteration per instance plus the
    # two hoisted x0 contractions (see _iteration); the x0 terms are counted
    # per iteration here as a conservative upper bound.
    flops_iter = 2 * B * (
        nxp * Dxp + Dup * Dxp + nxp * Dup + Dup * Dup
        + Dxp * Dup + Dup * Dup + Dxp * Dup
    )
    cost = pl.CostEstimate(
        flops=flops_iter * max_iter,
        bytes_accessed=sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a in state_args + vec_args + w_args
        ),
        transcendentals=0,
    )

    if check_termination <= 0:
        kernel = functools.partial(_kernel_fixed, max_iter=max_iter)
        scalar_args = (pp.rho,)
        scalar_specs = [smem_spec]
    else:
        kernel = functools.partial(
            _kernel_adaptive, max_iter=max_iter,
            check_every=check_termination,
            warmup=min(warmup_iters, max_iter - 1), interpret=interpret,
        )
        tols = jnp.asarray(
            [[abs_pri_tol, abs_dua_tol]], jnp.float32
        )
        scalar_args = (pp.rho, tols)
        scalar_specs = [
            smem_spec,
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=scalar_specs + state_specs + vec_specs + w_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(*scalar_args, *state_args, *vec_args, *w_args)

    U, X, D, Y, G, Z, V, stats = outs
    if orig_B != B:
        U, X, D, Y, G, Z, V, stats = (
            a[:orig_B] for a in (U, X, D, Y, G, Z, V, stats)
        )
    return FusedResult(
        U=U, X=X, carry=FusedCarry(D=D, Y=Y, G=G, Z=Z, V=V), stats=stats
    )


def unpad_controls(result: FusedResult, pp: PaddedProblem) -> jax.Array:
    """First-knot controls ``(B, nu)`` from the padded flat U."""
    nx, nu, _N = pp.dims
    return result.U[:, :nu]


def unpad_states(result: FusedResult, pp: PaddedProblem) -> jax.Array:
    """Full state trajectories ``(B, N, nx)`` from the padded flat X."""
    nx, nu, N = pp.dims
    return result.X[:, : N * nx].reshape(result.X.shape[0], N, nx)
