"""Streaming Pallas TPU kernel: long-horizon fused ADMM solves.

The VMEM-resident condensed kernel (:mod:`.fused_admm`) needs the whole
``O((N nx)^2)`` condensed operator set plus every iterate in VMEM — past
N~64 the operators alone blow the ~16 MB budget. This tier covers the
long-horizon regime (N in the hundreds to thousands) the XLA associative-scan
tier (:mod:`..solver.assoc_scan`) serves, but fused: the two horizon sweeps of
each ADMM iteration (reference: src/tinympc/admm.cpp:27-37 forward rollout,
:15-22 backward gradient recursion) run as *sequential* in-kernel recurrences
over knot blocks streamed HBM<->VMEM with double-buffered async DMA, and every
elementwise stage (slack projection admm.cpp:45-61, dual ascent :67-71,
linear-cost refresh :77-85) is fused into the sweep that produces its inputs.

Layout: **batch on lanes.** Iterate arrays live in HBM as
``(NT, N, S, LANES)`` — NT batch tiles of 128 instances each, S the
sublane-padded state (``SX = pad8(nx)``) or input (``SU = pad8(nu)``) width.
Every per-knot op is a ``(S, 128)`` block: the small cached matrices
(12x12 and smaller at the flagship shape) contract on the MXU against 128
instances at once, and the sequential sweep advances knot by knot inside
VMEM.

HBM traffic is the design driver (the sweeps are bandwidth-bound):

* ``q``/``r`` are never materialized. The backward sweep needs
  ``r_i = -rho (z_i - y_i)`` and ``q_i = qc_i - rho (v_i - g_i)`` (reference
  admm.cpp:80-82 with the *post-dual-update* y/g — admm.cpp:129 runs before
  :132); all four operands are already streamed for other reasons, so both
  are recomputed on the fly — two whole arrays of per-iteration HBM traffic
  eliminated.
* ``x``/``u``/``p`` never touch HBM at all during iteration: ``x`` and ``p``
  are sweep carries, ``u`` is consumed by the slack stage in the same block.
  Trajectories are written out only on the final iteration.
* Per iteration the streamed set is: forward reads ``d, y, g``, writes
  ``y, g, z, v``; backward reads ``y, z, g, v, qc``, writes ``d``.

Double-buffering uses separate in/out VMEM buffers per array (an in-flight
write-back never blocks the next block's prefetch); each phase drains its
outstanding stores before returning, which also serializes the cross-phase
RAW hazards through HBM.

``check_termination == 0`` is the deterministic fixed-iteration
golden/benchmark mode (the reference with termination checks disabled);
``> 0`` runs :func:`_kernel_adaptive` — in-kernel per-instance convergence
freezing with the reference's exact early-exit semantics
(admm.cpp:135-144) and per-128-lane-tile early exit. Residual stats are
computed exactly as the reference defines them (admm.cpp:95-98).

Mosaic discipline (CLAUDE.md): no lane-1 vectors anywhere — per-instance
residual accumulators are full ``(S, LANES)`` arrays reduced over sublanes
once at the end; scalar masks (terminal-knot, first-block) are applied as
0/1 float multiplies.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Cache, Problem
from .hetero_admm import _project_soc_seg

LANES = 128
_HI = jax.lax.Precision.HIGHEST


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _padm(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), np.float64)
    out[: a.shape[0], : a.shape[1]] = a
    return out


@struct.dataclass
class StreamProblem:
    """Kernel-ready operands for the streaming tier.

    Matrices are sublane-padded with zero rows/cols so padded dims stay
    identically zero through every stage; bounds are pre-broadcast to
    ``(S, LANES)`` with padded rows clamped to 0. ``qc`` / ``pterm`` fold the
    reference terms of the linear-cost stage (reference admm.cpp:81-84):
    ``qc_i = -(Q o Xref_i)`` streamed per knot block, ``pterm = -Pinf^T
    Xref_{N-1}`` resident. ``dims`` is static metadata."""

    A: jax.Array        # (SX, SX)
    B: jax.Array        # (SX, SU)
    Kinf: jax.Array     # (SU, SX)
    KinfT: jax.Array    # (SX, SU)
    Quu_inv: jax.Array  # (SU, SU)
    AmBKt: jax.Array    # (SX, SX)
    Bt: jax.Array       # (SU, SX)
    u_min: jax.Array    # (SU, LANES)
    u_max: jax.Array
    x_min: jax.Array    # (SX, LANES)
    x_max: jax.Array
    qc: jax.Array       # (N, SX, LANES)
    pterm: jax.Array    # (SX, LANES)
    rho: jax.Array      # (1, 1)
    dims: tuple = struct.field(pytree_node=False)  # (nx, nu, N)
    # Per-knot bound schedules (reference workspace x_min/x_max/u_min/u_max
    # are full-horizon matrices, settable per knot — types.hpp / tiny_api
    # set_bound_constraints). None = time-uniform (the resident rows above
    # apply); otherwise streamed per knot block alongside qc. Iteration-
    # constant, read-only traffic — measured free on this deployment
    # (BASELINE.md streaming freeze-traffic measurement).
    u_min_k: jax.Array | None = None   # (N, SU, LANES)
    u_max_k: jax.Array | None = None
    x_min_k: jax.Array | None = None   # (N, SX, LANES)
    x_max_k: jax.Array | None = None

    @property
    def SX(self) -> int:
        return self.A.shape[0]

    @property
    def SU(self) -> int:
        return self.Quu_inv.shape[0]

    @property
    def has_knot_bounds(self) -> bool:
        return self.u_min_k is not None


def pad_stream_problem(
    problem: Problem, cache: Cache, dtype: Any = jnp.float32
) -> StreamProblem:
    """Build the streaming-kernel operands (host-side, float64 until the
    final cast)."""
    nx, nu, N = problem.nx, problem.nu, problem.horizon
    SX, SU = _pad8(nx), _pad8(nu)
    f64 = np.float64
    A = np.asarray(problem.A, f64)
    B = np.asarray(problem.B, f64)
    Kinf = np.asarray(cache.Kinf, f64)
    AmBKt = np.asarray(cache.AmBKt, f64)
    Quu = np.asarray(cache.Quu_inv, f64)

    def bcast(v: np.ndarray, S: int) -> jax.Array:
        out = np.zeros((S, LANES), f64)
        out[: v.size, :] = np.asarray(v, f64).reshape(-1, 1)
        return jnp.asarray(out, dtype)

    # Time-uniform bounds ride resident; per-knot schedules (reference
    # workspace full-horizon bound matrices) are packed into streamed
    # (N, S, LANES) arrays like qc.
    knot_bounds = any(
        not np.all(np.asarray(b, f64) == np.asarray(b, f64)[0])
        for b in (problem.u_min, problem.u_max, problem.x_min, problem.x_max)
    )

    def uniform(b: np.ndarray, name: str) -> np.ndarray:
        return np.asarray(b, f64)[0]

    def pk(b: np.ndarray, knots: int, k: int, S: int) -> jax.Array | None:
        if not knot_bounds:
            return None
        out = np.zeros((N, S, LANES), f64)
        out[:knots, :k, :] = np.asarray(b, f64)[:, :, None]
        return jnp.asarray(out, dtype)

    qc = -(np.asarray(problem.Xref, f64) * np.asarray(problem.Q, f64))
    qc_b = np.zeros((N, SX, LANES), f64)
    qc_b[:, :nx, :] = qc[:, :, None]
    pterm = -np.asarray(problem.Xref[-1], f64) @ np.asarray(cache.Pinf, f64)

    return StreamProblem(
        u_min_k=pk(problem.u_min, N - 1, nu, SU),
        u_max_k=pk(problem.u_max, N - 1, nu, SU),
        x_min_k=pk(problem.x_min, N, nx, SX),
        x_max_k=pk(problem.x_max, N, nx, SX),
        A=jnp.asarray(_padm(A, SX, SX), dtype),
        B=jnp.asarray(_padm(B, SX, SU), dtype),
        Kinf=jnp.asarray(_padm(Kinf, SU, SX), dtype),
        KinfT=jnp.asarray(_padm(Kinf.T, SX, SU), dtype),
        Quu_inv=jnp.asarray(_padm(Quu, SU, SU), dtype),
        AmBKt=jnp.asarray(_padm(AmBKt, SX, SX), dtype),
        Bt=jnp.asarray(_padm(B.T, SU, SX), dtype),
        u_min=bcast(uniform(problem.u_min, "u_min"), SU),
        u_max=bcast(uniform(problem.u_max, "u_max"), SU),
        x_min=bcast(uniform(problem.x_min, "x_min"), SX),
        x_max=bcast(uniform(problem.x_max, "x_max"), SX),
        qc=jnp.asarray(qc_b, dtype),
        pterm=bcast(pterm, SX),
        rho=jnp.asarray(
            np.asarray(float(np.asarray(cache.rho, f64))).reshape(1, 1), dtype
        ),
        dims=(nx, nu, N),
    )


def stream_ref_vectors(
    sp: StreamProblem, Q: jax.Array, Pinf: jax.Array, Xref: jax.Array
) -> StreamProblem:
    """Device-side rebuild of the reference-dependent operands for a new
    horizon window (tracking mode — the streaming analogue of
    :func:`.fused_admm.ref_vectors`; reference: quadrotor_tracking.cpp:101
    slides the window each tick). ``Q (nx,)`` raw cost diagonal, ``Pinf
    (nx, nx)``, ``Xref (N, nx)``. Returns ``sp`` with ``qc``/``pterm``
    replaced; jittable, nothing else is re-packed."""
    nx, _nu, N = sp.dims
    dtype = sp.qc.dtype
    qc = jnp.zeros((N, sp.SX), dtype).at[:, :nx].set(
        -(Xref * Q).astype(dtype)
    )
    pt = jnp.zeros((sp.SX,), dtype).at[:nx].set(
        -jnp.matmul(Xref[-1], Pinf, precision=_HI).astype(dtype)
    )
    return sp.replace(
        qc=jnp.broadcast_to(qc[:, :, None], (N, sp.SX, LANES)),
        pterm=jnp.broadcast_to(pt[:, None], (sp.SX, LANES)),
    )


# Buffer ids inside the shared scratch pools (phases reuse slots that are
# never live at the same time).
_SU_D_IN, _SU_Y_IN, _SU_Y_OUT, _SU_Z_OUT, _SU_D_OUT, _SU_Z_IN = range(6)
_SU_U_OUT = _SU_D_OUT  # final forward reuses the backward d-out pool
_SX_G_IN, _SX_G_OUT, _SX_V_OUT, _SX_QC_IN, _SX_V_IN = range(5)
_SX_X_OUT = _SX_QC_IN  # final forward reuses the backward qc pool
# DMA channels (one semaphore per channel x slot).
_IN_D, _IN_Y, _IN_G, _IN_Z, _IN_V, _IN_QC = range(6)
_OUT_Y, _OUT_G, _OUT_Z, _OUT_V, _OUT_D, _OUT_U, _OUT_X = range(7)
# Per-knot bound streams (optional; forward-phase read-only).
_SU_UMIN, _SU_UMAX = 6, 7
_SX_XMIN, _SX_XMAX = 5, 6
_IN_UMIN, _IN_UMAX, _IN_XMIN, _IN_XMAX = 6, 7, 8, 9

# Adaptive-kernel pools (its phase set differs: the slack save moves into the
# backward phase behind the freeze mask, and check iterations stream the old
# trajectories for masked writes). Slots are reused across phases — within any
# single phase every logical stream has a distinct slot.
(_A_SU_D_IN, _A_SU_Y_IN, _A_SU_Z_IN, _A_SU_U_IN,
 _A_SU_Y_OUT, _A_SU_ZS, _A_SU_MISC) = range(7)
_A_SU_Z_OUT = _A_SU_Y_OUT   # backward: z save (fwd's y-out slot)
_A_SU_D_OUT = _A_SU_MISC    # backward: d out (check-fwd's u-out slot)
(_A_SX_G_IN, _A_SX_V_IN, _A_SX_X_IN,
 _A_SX_G_OUT, _A_SX_VS, _A_SX_X_OUT, _A_SX_QC_IN) = range(7)
_A_SX_V_OUT = _A_SX_G_OUT   # backward: v save (fwd's g-out slot)
(_A_IN_D, _A_IN_Y, _A_IN_G, _A_IN_Z, _A_IN_V, _A_IN_QC,
 _A_IN_U, _A_IN_X, _A_IN_ZS, _A_IN_VS) = range(10)
_A_SU_UMIN, _A_SU_UMAX = 7, 8
_A_SX_XMIN, _A_SX_XMAX = 7, 8
_A_IN_UMIN, _A_IN_UMAX, _A_IN_XMIN, _A_IN_XMAX = 10, 11, 12, 13
(_A_OUT_Y, _A_OUT_G, _A_OUT_ZS, _A_OUT_VS, _A_OUT_D,
 _A_OUT_Z, _A_OUT_V, _A_OUT_U, _A_OUT_X) = range(9)


def _make_streamer(t, Kb, NBL, shared, su_buf, sx_buf, sems_in, sems_out):
    """Close the double-buffered block-streaming machinery over one tile's
    scratch pools (shared by the fixed and adaptive kernels). ``shared`` is
    a tuple of batch-broadcast refs indexed ``[block]`` instead of
    ``[tile, block]`` (qc and the per-knot bound schedules)."""

    def is_shared(hbm):
        return any(hbm is r for r in shared)

    def dma_su(buf, ch, hbm, b, s, out: bool):
        sem = (sems_out if out else sems_in).at[ch, s]
        blk = (hbm.at[pl.ds(b * Kb, Kb)] if is_shared(hbm)
               else hbm.at[t, pl.ds(b * Kb, Kb)])
        v = su_buf.at[buf, s]
        return pltpu.make_async_copy(*((v, blk) if out else (blk, v)), sem)

    def dma_sx(buf, ch, hbm, b, s, out: bool):
        sem = (sems_out if out else sems_in).at[ch, s]
        blk = (hbm.at[pl.ds(b * Kb, Kb)] if is_shared(hbm)
               else hbm.at[t, pl.ds(b * Kb, Kb)])
        v = sx_buf.at[buf, s]
        return pltpu.make_async_copy(*((v, blk) if out else (blk, v)), sem)

    def phase(ins, outs, compute, carry0, reverse: bool):
        """Stream all NBL blocks through `compute`, double-buffered.

        ``ins``/``outs``: lists of (pool, buf, ch, hbm) with pool in
        {dma_su, dma_sx}; ``compute(b, slot, carry) -> carry`` runs with the
        block's in-buffers filled and must fill the out-buffers."""

        def blk_of(j):
            return NBL - 1 - j if reverse else j

        def start_in(j, s):
            for pool, buf, ch, hbm in ins:
                pool(buf, ch, hbm, blk_of(j), s, out=False).start()

        def wait_in(j, s):
            for pool, buf, ch, hbm in ins:
                pool(buf, ch, hbm, blk_of(j), s, out=False).wait()

        def start_out(j, s):
            for pool, buf, ch, hbm in outs:
                pool(buf, ch, hbm, blk_of(j), s, out=True).start()

        def wait_out(j, s):
            for pool, buf, ch, hbm in outs:
                pool(buf, ch, hbm, blk_of(j), s, out=True).wait()

        start_in(0, 0)

        def body(j, carry):
            s = jax.lax.rem(j, 2)

            @pl.when(j + 1 < NBL)
            def _():
                start_in(j + 1, 1 - s)

            wait_in(j, s)

            @pl.when(j >= 2)
            def _():
                wait_out(j - 2, s)

            carry = compute(blk_of(j), s, carry)
            start_out(j, s)
            return carry

        carry = jax.lax.fori_loop(0, NBL, body, carry0)
        # Drain the tail stores: cross-phase data hazards go through HBM.
        for j in (NBL - 2, NBL - 1):
            if j >= 0:
                wait_out(j, j % 2)
        return carry

    return dma_su, dma_sx, phase


class StreamCarry(NamedTuple):
    """Warm-start iterates in the packed ``(NT, N, S, LANES)`` layout (the
    reference keeps these in its workspace between tiny_solve calls;
    examples/quadrotor_hovering.cpp:99-104 resets only the duals). ``z``/``v``
    hold N knot slots with the terminal input-knot slot identically zero."""

    d: jax.Array  # (NT, N, SU, LANES)
    y: jax.Array
    g: jax.Array  # (NT, N, SX, LANES)
    z: jax.Array
    v: jax.Array

    @staticmethod
    def zeros(batch: int, sp: StreamProblem, dtype=jnp.float32) -> "StreamCarry":
        _nx, _nu, N = sp.dims
        nt = -(-batch // LANES)
        fu = jnp.zeros((nt, N, sp.SU, LANES), dtype)
        fx = jnp.zeros((nt, N, sp.SX, LANES), dtype)
        return StreamCarry(d=fu, y=fu, g=fx, z=fu, v=fx)

    def reset_duals(self) -> "StreamCarry":
        """Zero y/g between MPC ticks (reference: tiny_wrapper.cpp:131-140)."""
        return self._replace(y=jnp.zeros_like(self.y), g=jnp.zeros_like(self.g))


class StreamResult(NamedTuple):
    """``U (B, N-1, nu)`` / ``X (B, N, nx)`` are the final pre-projection
    iterates (the reference applies pre-projection u). ``stats (B, 8)``:
    lane 0 iterations, 2-5 residuals [pri_state, dua_state, pri_input,
    dua_input] (lane 1, the solved flag, stays 0 in fixed mode)."""

    U: jax.Array
    X: jax.Array
    carry: StreamCarry
    stats: jax.Array


def _kernel(
    rho_ref, x0_ref, qc_ref, pterm_ref,
    A_ref, B_ref, K_ref, Kt_ref, Quu_ref, Mt_ref, Bt_ref,
    umin_ref, umax_ref, xmin_ref, xmax_ref,
    *rest,
    max_iter: int, Kb: int, N: int, en_ib: bool, en_sb: bool,
    ucones: tuple = (), xcones: tuple = (), kb_bounds: bool = False,
):
    """One batch tile's full fixed-iteration solve. See module docstring for
    the phase structure; the aliased input refs are unused (all traffic goes
    through the identical ``*_hbm`` output refs). ``kb_bounds`` adds four
    read-only per-knot bound streams to every forward phase (shared across
    the batch, qc-style indexing)."""
    if kb_bounds:
        uminK, umaxK, xminK, xmaxK = rest[:4]
        rest = rest[4:]
    else:
        uminK = umaxK = xminK = xmaxK = None
    (_d_in, _y_in, _g_in, _z_in, _v_in,
     d_hbm, y_hbm, g_hbm, z_hbm, v_hbm, U_hbm, X_hbm, stats_ref,
     su_buf, sx_buf, sems_in, sems_out) = rest
    t = pl.program_id(0)
    NBL = N // Kb
    f32 = jnp.float32
    dot = functools.partial(
        jnp.dot, preferred_element_type=A_ref.dtype, precision=_HI
    )
    rho = rho_ref[0, 0]
    A, Bm, K = A_ref[:], B_ref[:], K_ref[:]
    Kt, Quu, Mt, Bt = Kt_ref[:], Quu_ref[:], Mt_ref[:], Bt_ref[:]
    dma_su, dma_sx, phase = _make_streamer(
        t, Kb, NBL, (qc_ref, uminK, umaxK, xminK, xmaxK),
        su_buf, sx_buf, sems_in, sems_out
    )

    def clip_u(a, lo=None, hi=None):
        if en_ib:
            a = jnp.clip(a, umin_ref[:] if lo is None else lo,
                         umax_ref[:] if hi is None else hi)
        # SOC projection after the box clip (solver/cones.py composition);
        # the (SU, LANES) knot block is the hetero kernel's layout, so the
        # same full-width VPU projection applies.
        for cone in ucones:
            a = _project_soc_seg(a, a.shape[0], a.shape[0], cone)
        return a

    def clip_x(a, lo=None, hi=None):
        if en_sb:
            a = jnp.clip(a, xmin_ref[:] if lo is None else lo,
                         xmax_ref[:] if hi is None else hi)
        for cone in xcones:
            a = _project_soc_seg(a, a.shape[0], a.shape[0], cone)
        return a

    fwd_ins = [
        (dma_su, _SU_D_IN, _IN_D, d_hbm),
        (dma_su, _SU_Y_IN, _IN_Y, y_hbm),
        (dma_sx, _SX_G_IN, _IN_G, g_hbm),
    ]
    if kb_bounds:
        fwd_ins += [
            (dma_su, _SU_UMIN, _IN_UMIN, uminK),
            (dma_su, _SU_UMAX, _IN_UMAX, umaxK),
            (dma_sx, _SX_XMIN, _IN_XMIN, xminK),
            (dma_sx, _SX_XMAX, _IN_XMAX, xmaxK),
        ]
    fwd_outs = [
        (dma_su, _SU_Y_OUT, _OUT_Y, y_hbm),
        (dma_sx, _SX_G_OUT, _OUT_G, g_hbm),
        (dma_su, _SU_Z_OUT, _OUT_Z, z_hbm),
        (dma_sx, _SX_V_OUT, _OUT_V, v_hbm),
    ]

    def make_fwd(final: bool):
        """Forward rollout (reference admm.cpp:27-37) fused with slack
        projection (:45-61), dual ascent (:67-71) and the slack save
        (:141-142); the final variant also emits trajectories and the
        residual maxima (:95-98, using the pre-update v/z)."""

        def compute(b, s, carry):
            if final:
                x, ax, av, au, az = carry
            else:
                x = carry
            for i in range(Kb):
                gi = b * Kb + i
                w = (gi < N - 1).astype(f32)  # u-knot exists at this slot
                d_i = su_buf[_SU_D_IN, s, i]
                u_i = -dot(K, x) - d_i
                su = u_i + su_buf[_SU_Y_IN, s, i]
                if kb_bounds:
                    zn = clip_u(su, su_buf[_SU_UMIN, s, i],
                                su_buf[_SU_UMAX, s, i])
                else:
                    zn = clip_u(su)
                su_buf[_SU_Y_OUT, s, i] = (su - zn) * w
                su_buf[_SU_Z_OUT, s, i] = zn * w
                tx = x + sx_buf[_SX_G_IN, s, i]
                if kb_bounds:
                    vn = clip_x(tx, sx_buf[_SX_XMIN, s, i],
                                sx_buf[_SX_XMAX, s, i])
                else:
                    vn = clip_x(tx)
                sx_buf[_SX_G_OUT, s, i] = tx - vn
                sx_buf[_SX_V_OUT, s, i] = vn
                if final:
                    su_buf[_SU_U_OUT, s, i] = u_i * w
                    sx_buf[_SX_X_OUT, s, i] = x
                    ax = jnp.maximum(ax, jnp.abs(x - vn))
                    av = jnp.maximum(av, jnp.abs(sx_buf[_SX_V_IN, s, i] - vn))
                    au = jnp.maximum(au, jnp.abs(u_i - zn) * w)
                    az = jnp.maximum(
                        az, jnp.abs(su_buf[_SU_Z_IN, s, i] - zn * w)
                    )
                x = dot(A, x) + dot(Bm, u_i)
            if final:
                return x, ax, av, au, az
            return x

        return compute

    def bwd_compute(b, s, p):
        """Backward gradient recursion (reference admm.cpp:15-22; the always-
        zero coeff_d2p term dropped as there), with r/q recomputed from the
        streamed iterates (admm.cpp:80-82) and the terminal costate refresh
        (admm.cpp:83-84) applied on the first processed block."""
        is_last_block = (b == NBL - 1).astype(f32)
        p_term = pterm_ref[:] - rho * (
            sx_buf[_SX_V_IN, s, Kb - 1] - sx_buf[_SX_G_IN, s, Kb - 1]
        )
        p = is_last_block * p_term + (1.0 - is_last_block) * p
        for i in reversed(range(Kb)):
            gi = b * Kb + i
            w = (gi < N - 1).astype(f32)
            r_i = -rho * (su_buf[_SU_Z_IN, s, i] - su_buf[_SU_Y_IN, s, i])
            q_i = sx_buf[_SX_QC_IN, s, i] - rho * (
                sx_buf[_SX_V_IN, s, i] - sx_buf[_SX_G_IN, s, i]
            )
            su_buf[_SU_D_OUT, s, i] = dot(Quu, dot(Bt, p) + r_i) * w
            p_new = q_i + dot(Mt, p) - dot(Kt, r_i)
            p = w * p_new + (1.0 - w) * p
        return p

    bwd_ins = [
        (dma_su, _SU_Y_IN, _IN_Y, y_hbm),
        (dma_su, _SU_Z_IN, _IN_Z, z_hbm),
        (dma_sx, _SX_G_IN, _IN_G, g_hbm),
        (dma_sx, _SX_V_IN, _IN_V, v_hbm),
        (dma_sx, _SX_QC_IN, _IN_QC, qc_ref),
    ]
    bwd_outs = [(dma_su, _SU_D_OUT, _OUT_D, d_hbm)]

    x0 = x0_ref[0]
    zx = x0 * 0.0

    def iter_body(_, k):
        phase(fwd_ins, fwd_outs, make_fwd(final=False), x0, reverse=False)
        phase(bwd_ins, bwd_outs, bwd_compute, zx, reverse=True)
        return k

    jax.lax.fori_loop(0, max_iter - 1, iter_body, 0)

    # Final iteration: trajectories out + residuals (needs pre-update v/z).
    fin_ins = fwd_ins + [
        (dma_su, _SU_Z_IN, _IN_Z, z_hbm),
        (dma_sx, _SX_V_IN, _IN_V, v_hbm),
    ]
    fin_outs = fwd_outs + [
        (dma_su, _SU_U_OUT, _OUT_U, U_hbm),
        (dma_sx, _SX_X_OUT, _OUT_X, X_hbm),
    ]
    zu = su_buf[_SU_D_IN, 0, 0] * 0.0
    _x, ax, av, au, az = phase(
        fin_ins, fin_outs, make_fwd(final=True),
        (x0, zx, zx, zu, zu), reverse=False,
    )
    phase(bwd_ins, bwd_outs, bwd_compute, zx, reverse=True)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    p_s = jnp.max(ax, axis=0, keepdims=True)
    d_s = rho * jnp.max(av, axis=0, keepdims=True)
    p_u = jnp.max(au, axis=0, keepdims=True)
    d_u = rho * jnp.max(az, axis=0, keepdims=True)
    stats_ref[0] = (
        (lane == 0).astype(f32) * float(max_iter)
        + (lane == 2) * p_s + (lane == 3) * d_s
        + (lane == 4) * p_u + (lane == 5) * d_u
    ).astype(f32)


def _kernel_adaptive(
    tol_ref, rho_ref, x0_ref, qc_ref, pterm_ref,
    A_ref, B_ref, K_ref, Kt_ref, Quu_ref, Mt_ref, Bt_ref,
    umin_ref, umax_ref, xmin_ref, xmax_ref,
    *rest,
    max_iter: int, check_every: int, Kb: int, N: int,
    en_ib: bool, en_sb: bool, ucones: tuple = (), xcones: tuple = (),
    kb_bounds: bool = False,
):
    """Adaptive (per-instance early-termination) streaming solve.

    Freeze semantics identical to the scan tier / hetero adaptive kernel
    (reference early-exit dataflow admm.cpp:91-109,135-144): a converged
    instance keeps its pre-backward d, pre-save z/v, post-dual-update y/g
    and the check iteration's trajectories; lanes keep iterating until the
    whole 128-lane tile converges (then the tile's while_loop exits early).

    The streamed state lives in HBM, so the freeze is realized as masked
    write-back (``new*act + old*(1-act)``, exact for 0/1 masks) instead of
    the VMEM-resident kernels' output selects. The one structural change vs
    the fixed kernel: the forward phase writes new slacks to the ``zs/vs``
    HBM scratch arrays and the *backward* phase performs the slack save
    (``z/v <- zs/vs`` masked by the post-check active set) — convergence at
    a check is only known after the full forward sweep, by which point an
    eager save would already have clobbered the pre-save slacks the
    reference's early exit keeps (admm.cpp:135-144 breaks before the save).
    Traffic cost measured free on this deployment (latency-bound phases —
    docs/DESIGN.md "Streaming-tier per-iteration freeze").

    Per-instance bookkeeping is full (8, LANES) rows (Mosaic lane-1 carry
    pathology — CLAUDE.md); sublane maxima are keepdims-reduced then
    immediately re-broadcast, never carried at row-1 width.
    """
    if kb_bounds:
        uminK, umaxK, xminK, xmaxK = rest[:4]
        rest = rest[4:]
    else:
        uminK = umaxK = xminK = xmaxK = None
    (_d_in, _y_in, _g_in, _z_in, _v_in, _U_in, _X_in,
     d_hbm, y_hbm, g_hbm, z_hbm, v_hbm, U_hbm, X_hbm, zs_hbm, vs_hbm,
     stats_ref, su_buf, sx_buf, sems_in, sems_out) = rest
    t = pl.program_id(0)
    NBL = N // Kb
    f32 = jnp.float32
    dot = functools.partial(
        jnp.dot, preferred_element_type=A_ref.dtype, precision=_HI
    )
    rho = rho_ref[0, 0]
    pri_tol = tol_ref[0, 0]
    dua_tol = tol_ref[0, 1]
    A, Bm, K = A_ref[:], B_ref[:], K_ref[:]
    Kt, Quu, Mt, Bt = Kt_ref[:], Quu_ref[:], Mt_ref[:], Bt_ref[:]
    dma_su, dma_sx, phase = _make_streamer(
        t, Kb, NBL, (qc_ref, uminK, umaxK, xminK, xmaxK),
        su_buf, sx_buf, sems_in, sems_out
    )
    SU = umin_ref.shape[0]
    SX = xmin_ref.shape[0]

    def clip_u(a, lo=None, hi=None):
        if en_ib:
            a = jnp.clip(a, umin_ref[:] if lo is None else lo,
                         umax_ref[:] if hi is None else hi)
        for cone in ucones:
            a = _project_soc_seg(a, a.shape[0], a.shape[0], cone)
        return a

    def clip_x(a, lo=None, hi=None):
        if en_sb:
            a = jnp.clip(a, xmin_ref[:] if lo is None else lo,
                         xmax_ref[:] if hi is None else hi)
        for cone in xcones:
            a = _project_soc_seg(a, a.shape[0], a.shape[0], cone)
        return a

    def exp_u(m8):
        return jnp.concatenate([m8] * (SU // 8), axis=0)

    def exp_x(m8):
        return jnp.concatenate([m8] * (SX // 8), axis=0)

    def red8(a):
        r = jnp.max(a, axis=0, keepdims=True)
        return jnp.concatenate([r] * 8, axis=0)

    def pick(m, a, b):
        # Exact for 0/1 masks; avoids select_n (unlowerable layouts).
        return a * m + b * (1.0 - m)

    x0 = x0_ref[0]
    zx = x0 * 0.0                 # (SX, L) zero derived from real data
    zu = umin_ref[:] * 0.0        # (SU, L)
    z8 = zx[:8]                   # (8, L)

    fwd_ins_plain = [
        (dma_su, _A_SU_D_IN, _A_IN_D, d_hbm),
        (dma_su, _A_SU_Y_IN, _A_IN_Y, y_hbm),
        (dma_sx, _A_SX_G_IN, _A_IN_G, g_hbm),
    ]
    if kb_bounds:
        fwd_ins_plain = fwd_ins_plain + [
            (dma_su, _A_SU_UMIN, _A_IN_UMIN, uminK),
            (dma_su, _A_SU_UMAX, _A_IN_UMAX, umaxK),
            (dma_sx, _A_SX_XMIN, _A_IN_XMIN, xminK),
            (dma_sx, _A_SX_XMAX, _A_IN_XMAX, xmaxK),
        ]
    fwd_outs_plain = [
        (dma_su, _A_SU_Y_OUT, _A_OUT_Y, y_hbm),
        (dma_sx, _A_SX_G_OUT, _A_OUT_G, g_hbm),
        (dma_su, _A_SU_ZS, _A_OUT_ZS, zs_hbm),
        (dma_sx, _A_SX_VS, _A_OUT_VS, vs_hbm),
    ]
    fwd_ins_check = fwd_ins_plain + [
        (dma_su, _A_SU_Z_IN, _A_IN_Z, z_hbm),
        (dma_sx, _A_SX_V_IN, _A_IN_V, v_hbm),
        (dma_su, _A_SU_U_IN, _A_IN_U, U_hbm),
        (dma_sx, _A_SX_X_IN, _A_IN_X, X_hbm),
    ]
    fwd_outs_check = fwd_outs_plain + [
        (dma_su, _A_SU_MISC, _A_OUT_U, U_hbm),
        (dma_sx, _A_SX_X_OUT, _A_OUT_X, X_hbm),
    ]
    bwd_ins = [
        (dma_su, _A_SU_D_IN, _A_IN_D, d_hbm),
        (dma_su, _A_SU_Y_IN, _A_IN_Y, y_hbm),
        (dma_su, _A_SU_Z_IN, _A_IN_Z, z_hbm),
        (dma_su, _A_SU_ZS, _A_IN_ZS, zs_hbm),
        (dma_sx, _A_SX_G_IN, _A_IN_G, g_hbm),
        (dma_sx, _A_SX_V_IN, _A_IN_V, v_hbm),
        (dma_sx, _A_SX_VS, _A_IN_VS, vs_hbm),
        (dma_sx, _A_SX_QC_IN, _A_IN_QC, qc_ref),
    ]
    bwd_outs = [
        (dma_su, _A_SU_D_OUT, _A_OUT_D, d_hbm),
        (dma_su, _A_SU_Z_OUT, _A_OUT_Z, z_hbm),
        (dma_sx, _A_SX_V_OUT, _A_OUT_V, v_hbm),
    ]

    def make_fwd(act8, check: bool):
        """Forward rollout + slack projection + dual ascent (reference
        admm.cpp:27-37,45-61,67-71), y/g writes masked by the pre-check
        active set (frozen lanes' duals must not re-advance). The check
        variant additionally accumulates the residual maxima (admm.cpp:95-98,
        pre-save z/v streamed in) and writes the trajectories masked."""
        au_m = exp_u(act8)
        ax_m = exp_x(act8)

        def compute(b, s, carry):
            if check:
                x, ax, av, au, az = carry
            else:
                x = carry
            for i in range(Kb):
                gi = b * Kb + i
                w = (gi < N - 1).astype(f32)
                d_i = su_buf[_A_SU_D_IN, s, i]
                y_i = su_buf[_A_SU_Y_IN, s, i]
                g_i = sx_buf[_A_SX_G_IN, s, i]
                u_i = -dot(K, x) - d_i
                su = u_i + y_i
                if kb_bounds:
                    zn = clip_u(su, su_buf[_A_SU_UMIN, s, i],
                                su_buf[_A_SU_UMAX, s, i])
                else:
                    zn = clip_u(su)
                su_buf[_A_SU_Y_OUT, s, i] = pick(au_m, (su - zn) * w, y_i)
                su_buf[_A_SU_ZS, s, i] = zn * w
                tx = x + g_i
                if kb_bounds:
                    vn = clip_x(tx, sx_buf[_A_SX_XMIN, s, i],
                                sx_buf[_A_SX_XMAX, s, i])
                else:
                    vn = clip_x(tx)
                sx_buf[_A_SX_G_OUT, s, i] = pick(ax_m, tx - vn, g_i)
                sx_buf[_A_SX_VS, s, i] = vn
                if check:
                    su_buf[_A_SU_MISC, s, i] = pick(
                        au_m, u_i * w, su_buf[_A_SU_U_IN, s, i]
                    )
                    sx_buf[_A_SX_X_OUT, s, i] = pick(
                        ax_m, x, sx_buf[_A_SX_X_IN, s, i]
                    )
                    ax = jnp.maximum(ax, jnp.abs(x - vn))
                    av = jnp.maximum(av, jnp.abs(sx_buf[_A_SX_V_IN, s, i] - vn))
                    au = jnp.maximum(au, jnp.abs(u_i - zn) * w)
                    az = jnp.maximum(
                        az, jnp.abs(su_buf[_A_SU_Z_IN, s, i] - zn * w)
                    )
                x = dot(A, x) + dot(Bm, u_i)
            if check:
                return x, ax, av, au, az
            return x

        return compute

    def make_bwd(act8):
        """Backward gradient recursion (admm.cpp:15-22) reading the new
        slacks from zs/vs, plus the deferred masked slack save: d/z/v writes
        select old values for lanes outside the post-check active set
        (backward pass + slack save skipped — admm.cpp:135-144)."""
        au_m = exp_u(act8)
        ax_m = exp_x(act8)

        def compute(b, s, p):
            is_last_block = (b == NBL - 1).astype(f32)
            p_term = pterm_ref[:] - rho * (
                sx_buf[_A_SX_VS, s, Kb - 1] - sx_buf[_A_SX_G_IN, s, Kb - 1]
            )
            p = is_last_block * p_term + (1.0 - is_last_block) * p
            for i in reversed(range(Kb)):
                gi = b * Kb + i
                w = (gi < N - 1).astype(f32)
                zs_i = su_buf[_A_SU_ZS, s, i]
                vs_i = sx_buf[_A_SX_VS, s, i]
                r_i = -rho * (zs_i - su_buf[_A_SU_Y_IN, s, i])
                q_i = sx_buf[_A_SX_QC_IN, s, i] - rho * (
                    vs_i - sx_buf[_A_SX_G_IN, s, i]
                )
                d_new = dot(Quu, dot(Bt, p) + r_i) * w
                su_buf[_A_SU_D_OUT, s, i] = pick(
                    au_m, d_new, su_buf[_A_SU_D_IN, s, i]
                )
                su_buf[_A_SU_Z_OUT, s, i] = pick(
                    au_m, zs_i, su_buf[_A_SU_Z_IN, s, i]
                )
                sx_buf[_A_SX_V_OUT, s, i] = pick(
                    ax_m, vs_i, sx_buf[_A_SX_V_IN, s, i]
                )
                p_new = q_i + dot(Mt, p) - dot(Kt, r_i)
                p = w * p_new + (1.0 - w) * p
            return p

        return compute

    def cond(st):
        k, done8 = st[0], st[1]
        return jnp.logical_and(
            k < max_iter, jnp.logical_not(jnp.all(done8 > 0.5))
        )

    def body(st):
        k, done8, itf, r0, r1, r2, r3 = st
        act8 = 1.0 - done8
        # Plain iterations up to the next check (or max_iter truncation).
        n_plain = jnp.minimum(
            check_every - jnp.remainder(k, check_every), max_iter - k
        ) - 1
        fwd_plain = make_fwd(act8, check=False)
        bwd_pre = make_bwd(act8)

        def plain_body(_, c):
            phase(fwd_ins_plain, fwd_outs_plain, fwd_plain, x0, reverse=False)
            phase(bwd_ins, bwd_outs, bwd_pre, zx, reverse=True)
            return c

        jax.lax.fori_loop(0, n_plain, plain_body, 0)
        kc = k + n_plain + 1
        # The check iteration's forward sweep.
        _x, ax, av, au, az = phase(
            fwd_ins_check, fwd_outs_check, make_fwd(act8, check=True),
            (x0, zx, zx, zu, zu), reverse=False,
        )
        is_check = (jnp.remainder(kc, check_every) == 0).astype(f32)
        ps8 = red8(ax)
        ds8 = rho * red8(av)
        pu8 = red8(au)
        du8 = rho * red8(az)
        conv8 = (
            (ps8 < pri_tol) & (pu8 < pri_tol)
            & (ds8 < dua_tol) & (du8 < dua_tol)
        ).astype(f32) * is_check
        newly8 = act8 * conv8
        itf = pick(newly8, itf * 0.0 + kc.astype(f32), itf)
        m_rec = act8 * is_check
        r0 = pick(m_rec, ps8, r0)
        r1 = pick(m_rec, ds8, r1)
        r2 = pick(m_rec, pu8, r2)
        r3 = pick(m_rec, du8, r3)
        done8 = jnp.maximum(done8, newly8)
        # Backward with the post-check mask: newly-converged lanes skip the
        # backward pass and the slack save (admm.cpp:135-144).
        phase(bwd_ins, bwd_outs, make_bwd(1.0 - done8), zx, reverse=True)
        return (kc, done8, itf, r0, r1, r2, r3)

    init = (jnp.zeros((), jnp.int32), z8, z8, z8, z8, z8, z8)
    _k, done8, itf, r0, r1, r2, r3 = jax.lax.while_loop(cond, body, init)

    itf = pick(done8, itf, itf * 0.0 + float(max_iter))
    row = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    stats_ref[0] = (
        (row == 0).astype(f32) * itf + (row == 1).astype(f32) * done8
        + (row == 2).astype(f32) * r0 + (row == 3).astype(f32) * r1
        + (row == 4).astype(f32) * r2 + (row == 5).astype(f32) * r3
    ).astype(f32)


def _pack(a: jax.Array, B: int, S: int) -> jax.Array:
    """(B, N, k) -> (NT, N, S, LANES)."""
    _, N, k = a.shape
    nt = -(-B // LANES)
    out = jnp.zeros((nt * LANES, N, S), a.dtype)
    out = out.at[:B, :, :k].set(a)
    return out.reshape(nt, LANES, N, S).transpose(0, 2, 3, 1)


def _unpack(p: jax.Array, B: int, k: int) -> jax.Array:
    """(NT, N, S, LANES) -> (B, N, k)."""
    nt, N, S, _ = p.shape
    return p.transpose(0, 3, 1, 2).reshape(nt * LANES, N, S)[:B, :, :k]


def stream_solve(
    x0: jax.Array,
    carry: StreamCarry,
    sp: StreamProblem,
    *,
    max_iter: int = 100,
    knot_block: int = 32,
    check_termination: int = 0,
    abs_pri_tol: float | jax.Array = 1e-3,
    abs_dua_tol: float | jax.Array = 1e-3,
    en_state_bound: bool = True,
    en_input_bound: bool = True,
    interpret: bool = False,
    cones=None,
) -> StreamResult:
    """Run the streaming solve over a batch.

    ``x0`` is ``(B, nx)``; ``carry`` the packed warm-start iterates
    (:class:`StreamCarry`). ``knot_block`` is the streaming block size in
    knots (clamped to a divisor of N). ``interpret=True`` runs the Pallas
    interpreter (CPU-testable).

    ``check_termination == 0`` runs the deterministic fixed-iteration kernel;
    ``> 0`` the adaptive kernel (:func:`_kernel_adaptive`) with per-instance
    convergence freezing every that many iterations — per-instance semantics
    match the scan tier's freeze (reference early exit admm.cpp:135-144);
    stats row 0 = per-instance iteration count, row 1 = solved flag. A tile
    whose 128 lanes all converge exits its iteration loop early; combine with
    :func:`..solver.cascade.stream_cascade_solve` for cross-tile compaction.
    Tolerances are traced SMEM operands — changing them never recompiles."""
    nx, nu, N = sp.dims
    SX, SU = sp.SX, sp.SU
    B = x0.shape[0]
    NT = carry.d.shape[0]
    if NT * LANES < B:
        raise ValueError(f"carry holds {NT * LANES} instances < batch {B}")
    Kb = max(1, min(knot_block, N))
    while N % Kb:
        Kb -= 1

    x0p = _pack(x0[:, None, :], B, SX)[:, 0]  # (NT, SX, LANES)

    grid = (NT,)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    def vmem(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    cmap2 = lambda i: (0, 0)
    ucones = tuple(cones.input_cones) if cones is not None else ()
    xcones = tuple(cones.state_cones) if cones is not None else ()

    if check_termination > 0:
        if max_iter < 1:
            raise ValueError("adaptive stream solve needs max_iter >= 1")
        return _stream_solve_adaptive(
            x0p, carry, sp, B=B, NT=NT, Kb=Kb, max_iter=max_iter,
            check_every=check_termination,
            abs_pri_tol=abs_pri_tol, abs_dua_tol=abs_dua_tol,
            en_ib=en_input_bound, en_sb=en_state_bound,
            ucones=ucones, xcones=xcones, interpret=interpret,
        )

    kb_bounds = sp.has_knot_bounds
    bound_args = (
        (sp.u_min_k, sp.u_max_k, sp.x_min_k, sp.x_max_k) if kb_bounds else ()
    )
    in_specs = [
        pl.BlockSpec((1, 1), cmap2, memory_space=pltpu.SMEM),   # rho
        vmem((1, SX, LANES), lambda i: (i, 0, 0)),              # x0
        any_spec,                                               # qc
        vmem((SX, LANES), cmap2),                               # pterm
        vmem((SX, SX), cmap2), vmem((SX, SU), cmap2),           # A, B
        vmem((SU, SX), cmap2), vmem((SX, SU), cmap2),           # K, Kt
        vmem((SU, SU), cmap2), vmem((SX, SX), cmap2),           # Quu, Mt
        vmem((SU, SX), cmap2),                                  # Bt
        vmem((SU, LANES), cmap2), vmem((SU, LANES), cmap2),     # u bounds
        vmem((SX, LANES), cmap2), vmem((SX, LANES), cmap2),     # x bounds
    ] + [any_spec] * len(bound_args) + [any_spec] * 5           # d y g z v
    out_specs = [any_spec] * 7 + [vmem((1, 8, LANES), lambda i: (i, 0, 0))]
    cdtype = carry.d.dtype
    out_shape = [
        jax.ShapeDtypeStruct(carry.d.shape, carry.d.dtype),
        jax.ShapeDtypeStruct(carry.y.shape, carry.y.dtype),
        jax.ShapeDtypeStruct(carry.g.shape, carry.g.dtype),
        jax.ShapeDtypeStruct(carry.z.shape, carry.z.dtype),
        jax.ShapeDtypeStruct(carry.v.shape, carry.v.dtype),
        jax.ShapeDtypeStruct((NT, N, SU, LANES), cdtype),       # U
        jax.ShapeDtypeStruct((NT, N, SX, LANES), cdtype),       # X
        jax.ShapeDtypeStruct((NT, 8, LANES), jnp.float32),      # stats
    ]
    scratch = [
        pltpu.VMEM((8 if kb_bounds else 6, 2, Kb, SU, LANES), cdtype),
        pltpu.VMEM((7 if kb_bounds else 5, 2, Kb, SX, LANES), cdtype),
        pltpu.SemaphoreType.DMA((10 if kb_bounds else 6, 2)),
        pltpu.SemaphoreType.DMA((7, 2)),
    ]
    kernel = functools.partial(
        _kernel, max_iter=max_iter, Kb=Kb, N=N,
        en_ib=en_input_bound, en_sb=en_state_bound,
        ucones=tuple(cones.input_cones) if cones is not None else (),
        xcones=tuple(cones.state_cones) if cones is not None else (),
        kb_bounds=kb_bounds,
    )
    # Per-iteration streamed bytes (see module docstring traffic table).
    su_b, sx_b = N * SU * LANES * 4, N * SX * LANES * 4
    per_iter = NT * (4 * su_b + 2 * sx_b + 3 * sx_b + 2 * su_b)
    flops_knot = 2 * (SU * SX * 3 + SX * SX * 2 + SU * SU + SU * SX)
    cost = pl.CostEstimate(
        flops=2 * N * LANES * NT * max_iter * flops_knot,
        bytes_accessed=per_iter * max_iter,
        transcendentals=0,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases={
            15 + len(bound_args) + k: k for k in range(5)
        },
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True,
        ),
        interpret=interpret,
    )(
        sp.rho, x0p, sp.qc, sp.pterm,
        sp.A, sp.B, sp.Kinf, sp.KinfT, sp.Quu_inv, sp.AmBKt, sp.Bt,
        sp.u_min, sp.u_max, sp.x_min, sp.x_max, *bound_args,
        carry.d, carry.y, carry.g, carry.z, carry.v,
    )
    d, y, g, z, v, Up, Xp, stats_p = outs
    return StreamResult(
        U=_unpack(Up, B, nu)[:, : N - 1],
        X=_unpack(Xp, B, nx),
        carry=StreamCarry(d=d, y=y, g=g, z=z, v=v),
        stats=stats_p.transpose(0, 2, 1).reshape(NT * LANES, 8)[:B],
    )


def _stream_solve_adaptive(
    x0p, carry, sp, *, B, NT, Kb, max_iter, check_every,
    abs_pri_tol, abs_dua_tol, en_ib, en_sb, ucones, xcones, interpret,
):
    """Adaptive-kernel dispatch for :func:`stream_solve` (check_termination
    > 0). U/X ride as zero-initialized aliased operands: check iterations
    write them masked (old values re-written for frozen lanes), so their
    storage must be defined before the first read."""
    nx, nu, N = sp.dims
    SX, SU = sp.SX, sp.SU
    cdtype = carry.d.dtype
    grid = (NT,)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    def vmem(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    cmap2 = lambda i: (0, 0)
    kb_bounds = sp.has_knot_bounds
    bound_args = (
        (sp.u_min_k, sp.u_max_k, sp.x_min_k, sp.x_max_k) if kb_bounds else ()
    )
    tols = jnp.stack([
        jnp.asarray(abs_pri_tol, jnp.float32).reshape(()),
        jnp.asarray(abs_dua_tol, jnp.float32).reshape(()),
    ]).reshape(1, 2)
    U0 = jnp.zeros((NT, N, SU, LANES), cdtype)
    X0 = jnp.zeros((NT, N, SX, LANES), cdtype)
    in_specs = [
        pl.BlockSpec((1, 2), cmap2, memory_space=pltpu.SMEM),   # tols
        pl.BlockSpec((1, 1), cmap2, memory_space=pltpu.SMEM),   # rho
        vmem((1, SX, LANES), lambda i: (i, 0, 0)),              # x0
        any_spec,                                               # qc
        vmem((SX, LANES), cmap2),                               # pterm
        vmem((SX, SX), cmap2), vmem((SX, SU), cmap2),           # A, B
        vmem((SU, SX), cmap2), vmem((SX, SU), cmap2),           # K, Kt
        vmem((SU, SU), cmap2), vmem((SX, SX), cmap2),           # Quu, Mt
        vmem((SU, SX), cmap2),                                  # Bt
        vmem((SU, LANES), cmap2), vmem((SU, LANES), cmap2),     # u bounds
        vmem((SX, LANES), cmap2), vmem((SX, LANES), cmap2),     # x bounds
    ] + [any_spec] * len(bound_args) + [any_spec] * 7           # d y g z v U X
    out_specs = [any_spec] * 9 + [vmem((1, 8, LANES), lambda i: (i, 0, 0))]
    out_shape = [
        jax.ShapeDtypeStruct(carry.d.shape, carry.d.dtype),
        jax.ShapeDtypeStruct(carry.y.shape, carry.y.dtype),
        jax.ShapeDtypeStruct(carry.g.shape, carry.g.dtype),
        jax.ShapeDtypeStruct(carry.z.shape, carry.z.dtype),
        jax.ShapeDtypeStruct(carry.v.shape, carry.v.dtype),
        jax.ShapeDtypeStruct((NT, N, SU, LANES), cdtype),       # U
        jax.ShapeDtypeStruct((NT, N, SX, LANES), cdtype),       # X
        jax.ShapeDtypeStruct((NT, N, SU, LANES), cdtype),       # zs scratch
        jax.ShapeDtypeStruct((NT, N, SX, LANES), cdtype),       # vs scratch
        jax.ShapeDtypeStruct((NT, 8, LANES), jnp.float32),      # stats
    ]
    scratch = [
        pltpu.VMEM((9 if kb_bounds else 7, 2, Kb, SU, LANES), cdtype),
        pltpu.VMEM((9 if kb_bounds else 7, 2, Kb, SX, LANES), cdtype),
        pltpu.SemaphoreType.DMA((14 if kb_bounds else 10, 2)),
        pltpu.SemaphoreType.DMA((9, 2)),
    ]
    kernel = functools.partial(
        _kernel_adaptive, max_iter=max_iter, check_every=check_every,
        Kb=Kb, N=N, en_ib=en_ib, en_sb=en_sb,
        ucones=ucones, xcones=xcones, kb_bounds=kb_bounds,
    )
    # Worst-case traffic (all tiles run to max_iter); the while_loop makes
    # the true figure data-dependent.
    su_b, sx_b = N * SU * LANES * 4, N * SX * LANES * 4
    per_iter = NT * (6 * su_b + 5 * sx_b + 6 * su_b + 5 * sx_b)
    flops_knot = 2 * (SU * SX * 3 + SX * SX * 2 + SU * SU + SU * SX)
    cost = pl.CostEstimate(
        flops=2 * N * LANES * NT * max_iter * flops_knot,
        bytes_accessed=per_iter * max_iter,
        transcendentals=0,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases={
            16 + len(bound_args) + k: k for k in range(7)
        },
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True,
        ),
        interpret=interpret,
    )(
        tols, sp.rho, x0p, sp.qc, sp.pterm,
        sp.A, sp.B, sp.Kinf, sp.KinfT, sp.Quu_inv, sp.AmBKt, sp.Bt,
        sp.u_min, sp.u_max, sp.x_min, sp.x_max, *bound_args,
        carry.d, carry.y, carry.g, carry.z, carry.v, U0, X0,
    )
    d, y, g, z, v, Up, Xp, _zs, _vs, stats_p = outs
    return StreamResult(
        U=_unpack(Up, B, nu)[:, : N - 1],
        X=_unpack(Xp, B, nx),
        carry=StreamCarry(d=d, y=y, g=g, z=z, v=v),
        stats=stats_p.transpose(0, 2, 1).reshape(NT * LANES, 8)[:B],
    )
