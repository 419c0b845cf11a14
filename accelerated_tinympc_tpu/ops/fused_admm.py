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

Semantics: stage-for-stage identical to the reference iteration (reference:
src/tinympc/admm.cpp:111-152): a fixed-iteration mode (the reference with
termination checks disabled — deterministic benchmarking/golden tier) and an
adaptive mode with per-instance convergence freezing replicating the early
exit (residual definitions per reference src/tinympc/admm.cpp:91-109; exit
skips the slack save + backward pass, admm.cpp:135-144).

Kernel-layout design (v2 — multi-instance lane packing):

* **Folded iteration.** The reference's linear-cost stage
  (admm.cpp:77-85) and backward sweep (admm.cpp:15-22) algebraically
  collapse: with ``Q = xref_q − ρ(Vnew−Gn)``, ``R = −ρ(Znew−Yn)`` and the
  terminal costate refresh, the condensed backward output is
  ``Dn = (Vnew−Gn) @ W_q + (Znew−Yn) @ W_r + const_d`` where
  ``W_q = −ρ·[Eqᵀ; Epᵀ]``, ``W_r = −ρ·Erᵀ`` are baked offline (float64) and
  ``const_d = xref_q@W_eq + pterm_c@W_ep`` is reference-dependent but
  iteration-invariant — hoisted out of the loop entirely. Four in-loop
  matmuls instead of five, and the Q/R/ptermv vectors never materialize.

* **Instance packing.** At the flagship shape (nx=12, nu=4, N=10) the
  input-side flat vector is Du = 36 lanes — 3 instances fit in one 128-lane
  row. All Du-space iterates (D/Y/Z/U and the W_r contraction) pack ``g``
  instances per sublane row at stride ``Du`` with block-diagonal operators
  (g identical blocks), cutting the Du-side matmul and VPU cost by ``g``.
  Dx-space arrays pack at stride ``Dxp`` (one 128-multiple slab per
  instance), which makes the host-side pack/unpack of state-space arrays a
  pure reshape. The cross-space operators (``W_fd``: packed-D → g state
  slabs; ``W_q``: g state slabs → packed-D) carry the per-instance blocks on
  their (row, col) diagonal. ``g = 1`` degenerates to the unpacked layout
  (used automatically when Du > 64).

* **Check-block adaptive loop.** Convergence can only trigger at check
  iterations (reference: admm.cpp:93 ``iter % check_termination``), so the
  adaptive loop runs ``check_every`` *unmasked* fixed-mode iterations per
  outer step and does residuals/freeze bookkeeping once per block: a frozen
  instance's result set is *snapshotted* at its freezing check (duals
  advanced, slack save + backward skipped — exactly the reference early
  return) while the live SIMD lanes keep iterating harmlessly. Per-iteration
  adaptive overhead is thereby ~zero for ``check_every > 1``.

All padding is arranged so padded lanes stay identically zero through every
stage (zero operator rows/cols, zero bounds, zero reference terms), so no
masking is needed anywhere in the fixed path.

Mosaic layout discipline (hard-won, see CLAUDE.md): every per-instance scalar
(done flag, iteration count, residuals) lives in full-width (rows, 128)
arrays; freezes use exact 0/1-mask arithmetic ``a*m + b*(1-m)``; row maxima
use chunked ``jnp.maximum`` + log2 ``pltpu.roll`` rotations; zero inits derive
from real ref data. Lane-1 vectors in while-loop carries are unlowerable.
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

from ..precompute import CondensedOperators
from ..types import Cache, Problem

LANES = 128
# Stats output is a full 128-lane row per instance (lane-1 vectors trip Mosaic
# relayout); only the first 6 lanes carry data: iters, solved, 4 residuals.
STATS = 128
# One documented tile default for every caller (API, bench, rollouts): 512
# instance rows is the largest tile that fits VMEM across modes at the
# flagship shape; huge-batch fixed-mode benches may pass 768 explicitly
# (measured ~2% faster at batch >= 256k, BASELINE.md).
DEFAULT_BATCH_TILE = 512
# Packing cap: beyond 8 instances/row the per-check segmented-max cost and
# generated-code size grow linearly for marginal matmul savings.
MAX_PACK = 8
_HI = jax.lax.Precision.HIGHEST


def _lane_onehot(i: int, width: int = LANES) -> "jax.Array":
    return (
        jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) == i
    ).astype(jnp.float32)


def _pad_to(n: int, m: int = LANES) -> int:
    return ((n + m - 1) // m) * m


@struct.dataclass
class PaddedProblem:
    """Lane-packed condensed operators + problem vectors, kernel-ready.

    All ``W_*`` are stored transposed, ``(in, out)``, so every kernel
    contraction is ``Y = X @ W``; ``g`` instances are packed per row with
    per-instance blocks at stride ``Du`` (input space) / ``Dxp`` (state
    space) — see the module docstring. ``W_eq_u``/``W_ep_u`` are *unpacked*
    single-instance operators used only outside the kernel to fold the
    reference vectors into ``const_d``.

    ``dims``/``g`` are static pytree metadata: they stay Python ints under
    ``jit`` (shape-deriving code depends on it).
    """

    W_fx: jax.Array    # (nxg, g*Dxp)   packed x0 -> X slabs
    W_fd: jax.Array    # (Dug, g*Dxp)   packed D  -> X slabs
    W_gx: jax.Array    # (nxg, Dug)     packed x0 -> packed U
    W_gd: jax.Array    # (Dug, Dug)     packed D  -> packed U
    W_q: jax.Array     # (g*Dxp, Dug)   packed (Vnew-Gn) -> packed D  [-rho folded]
    W_r: jax.Array     # (Dug, Dug)     packed (Znew-Yn) -> packed D  [-rho folded]
    W_eq_u: jax.Array  # (Dxp, Dup)     unpacked Eq^T (zero terminal rows)
    W_ep_u: jax.Array  # (Dxp, Dup)     unpacked Ep^T at terminal rows
    xref_q: jax.Array  # (1, Dxp)  = -(Xref * Qdiag), padded, per instance
    pterm_c: jax.Array  # (1, Dxp) = -Xref[-1] @ Pinf in terminal lanes
    u_min: jax.Array   # (1, Dug)   g-tiled
    u_max: jax.Array
    x_min: jax.Array   # (1, g*Dxp) g-tiled
    x_max: jax.Array
    seg: jax.Array     # (pad8(g), Dug) row j: 1.0 on instance-j lanes
    rho: jax.Array     # (1, 1)
    dims: tuple = struct.field(pytree_node=False)  # (nx, nu, horizon)
    g: int = struct.field(pytree_node=False)       # instances packed per row

    # NamedTuple-compat alias (call sites predate the struct form).
    def _replace(self, **kw) -> "PaddedProblem":
        return self.replace(**kw)

    @property
    def nx_pad(self) -> int:
        return _pad_to(self.dims[0])

    @property
    def Dxp(self) -> int:
        """Per-instance padded state-space width (external carry layout)."""
        nx, _nu, N = self.dims
        return _pad_to(N * nx)

    @property
    def Dup(self) -> int:
        """Per-instance padded input-space width (external carry layout)."""
        _nx, nu, N = self.dims
        return _pad_to((N - 1) * nu)


def _place(v: np.ndarray, size: int, at: int) -> np.ndarray:
    out = np.zeros(size, np.float64)
    out[at:at + v.size] = v
    return out


def _pad_vec(v: np.ndarray, width: int, dtype) -> jax.Array:
    out = np.zeros((1, width), np.float64)
    out[0, : v.size] = v
    return jnp.asarray(out, dtype)


def auto_pack(nu: int, horizon: int) -> int:
    """Packing factor: as many instances as fit a 128-lane row (capped)."""
    Du = (horizon - 1) * nu
    if 2 * Du > LANES:
        return 1
    return max(1, min(MAX_PACK, LANES // Du))


def pad_problem(
    problem: Problem, cache: Cache, ops: CondensedOperators,
    dtype: Any = jnp.float32, pack: int | None = None,
) -> PaddedProblem:
    """Build the packed kernel layout (host-side, float64 until the final
    cast). ``pack`` overrides the automatic instance-packing factor."""
    nx, nu, N = problem.nx, problem.nu, problem.horizon
    m = N - 1
    Dx, Du = N * nx, m * nu
    Dxp, Dup = _pad_to(Dx), _pad_to(Du)
    g = auto_pack(nu, N) if pack is None else max(1, int(pack))
    if g * Du > LANES and g > 1:
        raise ValueError(f"pack={g} needs {g * Du} input lanes > {LANES}")
    Dug = _pad_to(g * Du)
    gDxp = g * Dxp
    nxg = _pad_to(g * nx)
    t0 = Dx - nx  # first terminal-knot lane

    o = {k: np.asarray(getattr(ops, k), np.float64) for k in ops._fields}
    rho_f = float(np.asarray(cache.rho, np.float64))

    def packW(core: np.ndarray, rows: int, cols: int,
              rstride: int, cstride: int) -> jax.Array:
        out = np.zeros((rows, cols), np.float64)
        for j in range(g):
            out[j * rstride: j * rstride + core.shape[0],
                j * cstride: j * cstride + core.shape[1]] = core
        return jnp.asarray(out, dtype)

    def padW(core: np.ndarray, rows: int, cols: int, row0: int = 0) -> jax.Array:
        out = np.zeros((rows, cols), np.float64)
        out[row0:row0 + core.shape[0], : core.shape[1]] = core
        return jnp.asarray(out, dtype)

    # Backward operator with the terminal-costate rows folded in
    # (reference: admm.cpp:15-22 backward sweep + admm.cpp:83-84 terminal
    # costate refresh — both rho-scaled linear-cost contractions).
    Eqp_core = np.vstack([o["Eq"].T, o["Ep"].T])  # (Dx, Du)

    def tile_vec(core: np.ndarray, stride: int, width: int) -> jax.Array:
        out = np.zeros((1, width), np.float64)
        for j in range(g):
            out[0, j * stride: j * stride + core.size] = core
        return jnp.asarray(out, dtype)

    seg = np.zeros((_pad_to(max(g, 1), 8), Dug), np.float64)
    for j in range(g):
        seg[j, j * Du: (j + 1) * Du] = 1.0

    f64 = np.float64
    return PaddedProblem(
        W_fx=packW(o["Fx0"].T, nxg, gDxp, nx, Dxp),
        W_fd=packW(o["Fd"].T, Dug, gDxp, Du, Dxp),
        W_gx=packW(o["Gx0"].T, nxg, Dug, nx, Du),
        W_gd=packW(o["Gd"].T, Dug, Dug, Du, Du),
        W_q=packW(-rho_f * Eqp_core, gDxp, Dug, Dxp, Du),
        W_r=packW(-rho_f * o["Er"].T, Dug, Dug, Du, Du),
        W_eq_u=padW(o["Eq"].T, Dxp, Dup),
        W_ep_u=padW(o["Ep"].T, Dxp, Dup, row0=t0),
        xref_q=_pad_vec(
            -(np.asarray(problem.Xref, f64)
              * np.asarray(problem.Q, f64)).reshape(-1), Dxp, dtype),
        pterm_c=_pad_vec(
            _place(-np.asarray(problem.Xref[-1], f64)
                   @ np.asarray(cache.Pinf, f64), Dx, t0), Dxp, dtype),
        u_min=tile_vec(np.asarray(problem.u_min, f64).reshape(-1), Du, Dug),
        u_max=tile_vec(np.asarray(problem.u_max, f64).reshape(-1), Du, Dug),
        x_min=tile_vec(np.asarray(problem.x_min, f64).reshape(-1), Dxp, gDxp),
        x_max=tile_vec(np.asarray(problem.x_max, f64).reshape(-1), Dxp, gDxp),
        seg=jnp.asarray(seg, jnp.float32),
        rho=jnp.asarray(np.asarray(rho_f).reshape(1, 1), dtype),
        dims=(nx, nu, N),
        g=g,
    )


@struct.dataclass
class FusedConeOps:
    """Lane-layout second-order-cone operands for the fused kernel
    (built by :func:`pad_cones`; see :mod:`..solver.cones` for the cone
    model and the closed-form projection being realized).

    Per cone the kernel needs a gather matmul (ball-lane squares summed
    into the axis lane), a scatter matmul (the per-cone scale broadcast
    from the axis lane back onto its ball lanes), and a vector block of
    masks: row 0 = axis mask, row 1 = ball mask, row 2 = shift at axis
    lanes, row 3 = mu replicated (rows 4-7 pad the 8-sublane tile).
    Cones repeat at every knot of every packed instance, so the matrices
    are knot-block-diagonal in the packed layout.  The counts are static
    pytree metadata (kernel arity derives from them)."""

    cu_gather: Any = None   # (nc_u*Dug, Dug)
    cu_scatter: Any = None  # (nc_u*Dug, Dug)
    cu_vec: Any = None      # (nc_u*8, Dug)
    cx_gather: Any = None   # (nc_x*gDxp, gDxp)
    cx_scatter: Any = None  # (nc_x*gDxp, gDxp)
    cx_vec: Any = None      # (nc_x*8, gDxp)
    nc_u: int = struct.field(pytree_node=False, default=0)
    nc_x: int = struct.field(pytree_node=False, default=0)


def pad_cones(pp: PaddedProblem, cones) -> FusedConeOps:
    """Build :class:`FusedConeOps` for a :class:`..solver.cones.ConeSet` on
    ``pp``'s packed lane layout (host-side, float64 -> f32)."""
    nx, nu, N = pp.dims
    m = N - 1
    Du = m * nu
    g = pp.g
    Dug = pp.u_min.shape[1]
    Dxp = pp.Dxp
    gDxp = pp.x_min.shape[1]

    def build(cone_list, dim, knots, stride_inst, width):
        nc = len(cone_list)
        G = np.zeros((nc * width, width), np.float64)
        S = np.zeros((nc * width, width), np.float64)
        V = np.zeros((nc * 8, width), np.float64)
        for ci, cone in enumerate(cone_list):
            for j in range(g):
                for k in range(knots):
                    b0 = j * stride_inst + k * dim
                    ax = b0 + cone.axis
                    V[ci * 8 + 0, ax] = 1.0
                    V[ci * 8 + 2, ax] = cone.shift
                    for bi in cone.ball:
                        p = b0 + bi
                        V[ci * 8 + 1, p] = 1.0
                        G[ci * width + p, ax] = 1.0
                        S[ci * width + ax, p] = 1.0
            V[ci * 8 + 3, :] = cone.mu
        f32 = jnp.float32
        return jnp.asarray(G, f32), jnp.asarray(S, f32), jnp.asarray(V, f32)

    out = {}
    nc_u = len(cones.input_cones)
    nc_x = len(cones.state_cones)
    if nc_u:
        out["cu_gather"], out["cu_scatter"], out["cu_vec"] = build(
            cones.input_cones, nu, m, Du, Dug
        )
    if nc_x:
        out["cx_gather"], out["cx_scatter"], out["cx_vec"] = build(
            cones.state_cones, nx, N, Dxp, gDxp
        )
    return FusedConeOps(nc_u=nc_u, nc_x=nc_x, **out)


def _cone_apply(w, gather_ref, scatter_ref, vec_ref, nc: int, width: int,
                pvec_ref=None):
    """Apply ``nc`` stacked cone projections to slack rows ``w`` in-kernel.

    Exact closed-form SOC projection (see solver/cones.py:project_cone) in
    full-lane-width arithmetic: per-cone subvector norms arrive at the axis
    lanes through the gather matmul, the three projection cases resolve via
    exact 0/1-mask arithmetic (Mosaic cannot lower select_n/keepdims here —
    see _kernel_adaptive), and the boundary-case scale returns to the ball
    lanes through the scatter matmul.

    ``pvec_ref`` (optional) holds *per-instance* mu/shift as batch-tiled
    ``(bt, nc*2*width)`` lane blocks ([mu block, shift block] per cone,
    every lane of an instance's stride carrying its value) — same
    elementwise broadcasts as the static ``(1, width)`` rows, so enabling
    it changes nothing when the values match the static scalars."""
    for c in range(nc):
        Gm = gather_ref[c * width:(c + 1) * width, :]
        Sm = scatter_ref[c * width:(c + 1) * width, :]
        m_ax = vec_ref[c * 8 + 0:c * 8 + 1, :]
        m_ball = vec_ref[c * 8 + 1:c * 8 + 2, :]
        if pvec_ref is not None:
            mu = pvec_ref[:, (2 * c) * width:(2 * c + 1) * width]
            shift = pvec_ref[:, (2 * c + 1) * width:(2 * c + 2) * width]
        else:
            shift = vec_ref[c * 8 + 2:c * 8 + 3, :]
            mu = vec_ref[c * 8 + 3:c * 8 + 4, :]
        wb = w * m_ball
        a2 = jnp.dot(
            wb * wb, Gm,
            preferred_element_type=jnp.float32, precision=_HI,
        )
        s = w * m_ax + shift
        a = jnp.sqrt(a2)
        inside = (a <= mu * s).astype(jnp.float32)
        polar = (mu * a <= -s).astype(jnp.float32)
        boundary = (1.0 - inside) * (1.0 - polar)
        cc = (mu * a + s) / (mu * mu + 1.0)
        safe_a = a + (a2 == 0.0).astype(jnp.float32)
        scale_ax = inside + boundary * (mu * cc / safe_a)
        s_new = inside * s + boundary * cc - shift
        ball_scale = jnp.dot(
            scale_ax * m_ax, Sm,
            preferred_element_type=jnp.float32, precision=_HI,
        )
        w = w * (1.0 - m_ax - m_ball) + s_new * m_ax + w * ball_scale * m_ball
    return w


def ref_vectors(
    pp: PaddedProblem,
    Q: jax.Array,
    Pinf: jax.Array,
    Xref: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Device-side recomputation of the reference-dependent operands for a new
    horizon window (tracking mode, reference: quadrotor_tracking.cpp:101
    sliding the window each tick): the baked ``xref_q``/``pterm_c`` in
    :func:`pad_problem` are just these two vectors, so updating the reference
    costs two tiny jnp ops — no re-packing of operators (``const_d`` is folded
    from them inside :func:`fused_solve` each call).

    ``Q`` is the (nx,) workspace cost diagonal, ``Pinf`` the (nx, nx) cache
    matrix, ``Xref`` the (N, nx) window. Returns ``(xref_q, pterm_c)`` shaped
    ``(1, Dxp)``.
    """
    nx, _nu, N = pp.dims
    Dx = N * nx
    t0 = Dx - nx
    dtype = pp.xref_q.dtype
    xref_q = jnp.zeros((1, pp.Dxp), dtype).at[0, :Dx].set(
        -(Xref * Q).reshape(-1).astype(dtype)
    )
    pterm = -jnp.matmul(Xref[-1], Pinf, precision=_HI).astype(dtype)
    pterm_c = jnp.zeros((1, pp.Dxp), dtype).at[0, t0:Dx].set(pterm)
    return xref_q, pterm_c


class FusedCarry(NamedTuple):
    """Warm-start carries persisting across MPC ticks, flat-padded ``(B, .)``
    in the *unpacked* per-instance layout (packing is kernel-internal).
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


def _split_bf16(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Two-term bf16 decomposition of an f32 array: ``w ~= hi + lo`` with
    ``hi = bf16(w)`` carrying the top 8 mantissa bits and ``lo`` the next 8."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(x: jax.Array, w: tuple[jax.Array, jax.Array]) -> jax.Array:
    """3-pass bf16 matmul with f32 accumulation: the manual equivalent of
    XLA's ``BF16_BF16_F32_X3`` dot algorithm (which Mosaic cannot lower as a
    ``precision=`` request). Splitting both operands to (hi, lo) bf16 pairs
    and summing the three dominant cross terms keeps ~2^-17 relative error —
    the dropped ``lo@lo`` term is O(2^-18) — at half the MXU passes of
    ``Precision.HIGHEST`` (3 vs 6)."""
    wh, wl = w
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    dotb = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return dotb(xh, wh) + (dotb(xh, wl) + dotb(xl, wh))


def _dot_op(x: jax.Array, w) -> jax.Array:
    """Contraction dispatch: f32 operators use 6-pass HIGHEST; (hi, lo) bf16
    operator pairs use the 3-pass decomposition."""
    if isinstance(w, tuple):
        return _dot3(x, w)
    return jnp.dot(x, w, preferred_element_type=jnp.float32, precision=_HI)


def _make_ws(w_refs, algo: str) -> tuple["_W", "_W"]:
    """Build the in-loop operator sets from the four f32 refs: ``(W3, Wf)``
    where ``Wf`` is the f32 set and ``W3`` the (hi, lo) bf16 split set
    (``algo == "bf16x3"``; the split runs once per kernel launch, before the
    iteration loop) or ``Wf`` again (``algo == "f32"``)."""
    ws = [r[:] for r in w_refs]
    Wf = _W(*ws)
    if algo == "bf16x3":
        return _W(*(_split_bf16(w) for w in ws)), Wf
    return Wf, Wf


def _iteration(D, Y, G, W, consts, cone_u=None, cone_x=None,
               alpha: float = 1.0, Z=None, V=None):
    """One folded condensed ADMM iteration on VMEM-resident packed values.

    Stage order is the reference's (src/tinympc/admm.cpp:117-150): forward
    pass (admm.cpp:27-37, x0 terms hoisted into ``Xb``/``Ub``), slack
    projection (admm.cpp:45-61), dual ascent (admm.cpp:67-71), then the
    linear-cost + backward stages folded into the single ``W_q``/``W_r``
    contraction (see module docstring; admm.cpp:77-85 + 15-22).

    ``alpha != 1`` applies OSQP-style over-relaxation (beyond-reference,
    static opt-in — see ``Settings.alpha``): the slack/dual stages see
    ``alpha * U + (1 - alpha) * Z`` (previous slacks ``Z``/``V`` supplied
    by the loop carries); the returned true iterates ``U``/``X`` — and so
    the residual definitions downstream — are untouched.

    Matmul arithmetic is either 6-pass f32 (``precision=HIGHEST`` — the
    default single-pass bf16 loses ~3 decimal digits per iteration and
    drifts the 100-iteration solve by ~1e-2, blowing the 1e-4 parity bar;
    ``preferred_element_type`` alone only pins the accumulator dtype) or the
    3-pass bf16 decomposition (:func:`_dot3`) when the operators arrive as
    (hi, lo) pairs.
    """
    (Xb, Ub, const_d, u_min, u_max, x_min, x_max) = consts
    X = Xb + _dot_op(D, W.W_fd)
    U = Ub + _dot_op(D, W.W_gd)
    if alpha != 1.0:
        Ur = alpha * U + (1.0 - alpha) * Z
        Xr = alpha * X + (1.0 - alpha) * V
    else:
        Ur, Xr = U, X
    S = Ur + Y
    Znew = jnp.clip(S, u_min, u_max)
    if cone_u is not None:
        # SOC projection composes after the box clip, exactly as the scan
        # tier's cone_slack_update (solver/cones.py).
        Znew = cone_u(Znew)
    Yn = S - Znew
    T = Xr + G
    Vnew = jnp.clip(T, x_min, x_max)
    if cone_x is not None:
        Vnew = cone_x(Vnew)
    Gn = T - Vnew
    Dn = _dot_op(Vnew - Gn, W.W_q) + _dot_op(Znew - Yn, W.W_r) + const_d
    return Dn, Yn, Gn, Znew, Vnew, U, X


class _W(NamedTuple):
    """In-loop condensed operators; each field is an f32 array ("f32" algo)
    or an (hi, lo) bf16 pair ("bf16x3")."""

    W_fd: Any
    W_gd: Any
    W_q: Any
    W_r: Any


def _max_all_lanes(x: jax.Array, interpret: bool) -> jax.Array:
    """Row max of ``x (rows, W)`` replicated into every lane of a
    (rows, LANES) result — built entirely from full-width ops (chunked maxima
    + log2 lane rotations). Mosaic cannot keep lane-1 vectors (keepdims
    reductions) in consistent layouts across while-loop carries, so all
    per-instance bookkeeping stays at full lane width."""
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


def _seg_tools(g: int, Dug: int, Dxp: int, seg_ref, interpret: bool):
    """Per-instance segment helpers for the packed layout.

    Returns (seg_max_du, seg_max_dx, to_du, to_dx, cat, uncat):
    ``seg_max_*(arr, j)`` -> (rows, LANES) instance-j max replicated;
    ``to_du/to_dx(flags)`` broadcast per-instance (rows, LANES) flags into the
    packed Du/Dx mask layouts; ``cat``/``uncat`` move between a list of g
    per-instance lane blocks and the (rows, g*LANES) concatenated carry form.
    """
    lane_max = functools.partial(_max_all_lanes, interpret=interpret)
    cx = Dxp // LANES
    segs = [seg_ref[j:j + 1, :] for j in range(g)]

    def seg_max_du(x, j):
        return lane_max(x if g == 1 else x * segs[j])

    def seg_max_dx(x, j):
        return lane_max(x[:, j * Dxp:(j + 1) * Dxp])

    def tile_dx(f):
        return f if cx == 1 else jnp.concatenate([f] * cx, axis=1)

    def to_du(fs):
        if g == 1:
            f = fs[0]
            return f if Dug == LANES else jnp.concatenate(
                [f] * (Dug // LANES), axis=1)
        out = fs[0] * segs[0]
        for j in range(1, g):
            out = out + fs[j] * segs[j]
        return out

    def to_dx(fs):
        ws = [tile_dx(f) for f in fs]
        return ws[0] if g == 1 else jnp.concatenate(ws, axis=1)

    def cat(fs):
        return fs[0] if g == 1 else jnp.concatenate(fs, axis=1)

    def uncat(c, j):
        return c[:, j * LANES:(j + 1) * LANES]

    return seg_max_du, seg_max_dx, to_du, to_dx, cat, uncat


def _stats_onehot(i: int, g: int) -> jax.Array:
    oh = _lane_onehot(i, STATS)
    return oh if g == 1 else jnp.concatenate([oh] * g, axis=1)


def _cone_fns(rest, nc_u: int, nc_x: int, g: int, Dug: int, Dxp: int,
              has_pu: bool = False, has_px: bool = False):
    """Split the optional cone operand refs off ``rest`` and close
    :func:`_cone_apply` over them. Returns (cone_u, cone_x, outs).
    ``has_pu``/``has_px`` pull one extra batch-tiled per-instance
    mu/shift operand per group (see ``_cone_apply``'s ``pvec_ref``)."""
    i = 0
    cone_u = cone_x = None
    if nc_u:
        pu = None
        j = i + 3
        if has_pu:
            pu = rest[j]
            j += 1
        cone_u = functools.partial(
            _cone_apply, gather_ref=rest[i], scatter_ref=rest[i + 1],
            vec_ref=rest[i + 2], nc=nc_u, width=Dug, pvec_ref=pu,
        )
        i = j
    if nc_x:
        px = None
        j = i + 3
        if has_px:
            px = rest[j]
            j += 1
        cone_x = functools.partial(
            _cone_apply, gather_ref=rest[i], scatter_ref=rest[i + 1],
            vec_ref=rest[i + 2], nc=nc_x, width=g * Dxp, pvec_ref=px,
        )
        i = j
    return cone_u, cone_x, rest[i:]


def _fixed_core(iterate, W3, Wf, carry0, consts, max_iter: int,
                algo: str, polish: int):
    """The fixed-iteration loop on VMEM-resident values: ``max_iter - 1``
    iterations carrying only (D, Y, G, Z, V), then a final f32 iteration
    keeping the full iterate set. Returns
    ``(Dn, Yn, Gn, Znew, Vnew, U, X, Zprev, Vprev)`` — the pre-final slacks
    ``Zprev``/``Vprev`` feed the dual-residual definitions
    (reference admm.cpp:95-98). Shared by the one-solve kernel and the
    in-kernel rollout (:mod:`.fused_rollout`)."""

    def make_body(W):
        def body(_, carry):
            D, Y, G, Z, V = carry
            Dn, Yn, Gn, Znew, Vnew, _U, _X = iterate(
                D, Y, G, W, consts, Z=Z, V=V
            )
            return (Dn, Yn, Gn, Znew, Vnew)
        return body

    n3 = max(0, max_iter - max(1, polish)) if algo == "bf16x3" else 0
    carry = carry0
    if n3 > 0:
        carry = jax.lax.fori_loop(0, n3, make_body(W3), carry)
    D, Y, G, Z, V = jax.lax.fori_loop(
        n3, max_iter - 1, make_body(Wf), carry
    )
    Dn, Yn, Gn, Znew, Vnew, U, X = iterate(D, Y, G, Wf, consts, Z=Z, V=V)
    return Dn, Yn, Gn, Znew, Vnew, U, X, Z, V


def _kernel_fixed(
    rho_ref,
    x0_ref, D0_ref, Y0_ref, G0_ref, Z0_ref, V0_ref,
    const_ref, u_min_ref, u_max_ref, x_min_ref, x_max_ref, seg_ref,
    w_fx_ref, w_fd_ref, w_gx_ref, w_gd_ref, w_q_ref, w_r_ref,
    *rest,
    max_iter: int, g: int, interpret: bool,
    algo: str = "f32", polish: int = 8, nc_u: int = 0, nc_x: int = 0,
    has_pu: bool = False, has_px: bool = False, alpha: float = 1.0,
):
    """Fixed-iteration fused solve (deterministic tier; reference with
    termination checks disabled). Residual stats lanes are still filled from
    the final iteration (the solved flag, lane 1, stays 0 — untracked).

    With ``algo == "bf16x3"`` the first ``max_iter - polish`` iterations run
    the 3-pass bf16 matmuls and the last ``polish`` run full f32: ADMM's
    contraction pulls the iterate from the bf16x3 fixed point to the f32 one,
    so the result lands at f32 accuracy (~2e-5 observed vs the scan tier at
    polish=8) at roughly half the MXU passes."""
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=_HI
    )
    Dug = D0_ref.shape[-1]
    Dxp = G0_ref.shape[-1] // g
    cone_u, cone_x, outs = _cone_fns(rest, nc_u, nc_x, g, Dug, Dxp,
                                     has_pu=has_pu, has_px=has_px)
    U_out, X_out, D_out, Y_out, G_out, Z_out, V_out, stats_out = outs
    iterate = functools.partial(_iteration, cone_u=cone_u, cone_x=cone_x,
                                alpha=alpha)
    Xb = dot(x0_ref[:], w_fx_ref[:])
    Ub = dot(x0_ref[:], w_gx_ref[:])
    consts = (
        Xb, Ub, const_ref[:],
        u_min_ref[:], u_max_ref[:], x_min_ref[:], x_max_ref[:],
    )
    W3, Wf = _make_ws((w_fd_ref, w_gd_ref, w_q_ref, w_r_ref), algo)
    rho = rho_ref[0, 0]
    smd, smx, _to_du, _to_dx, cat, _uncat = _seg_tools(
        g, Dug, Dxp, seg_ref, interpret
    )

    carry0 = (D0_ref[:], Y0_ref[:], G0_ref[:], Z0_ref[:], V0_ref[:])
    Dn, Yn, Gn, Znew, Vnew, U, X, Z, V = _fixed_core(
        iterate, W3, Wf, carry0, consts, max_iter, algo, polish
    )
    U_out[:] = U
    X_out[:] = X
    D_out[:] = Dn
    Y_out[:] = Yn
    G_out[:] = Gn
    Z_out[:] = Znew
    V_out[:] = Vnew
    # Residual definitions per reference admm.cpp:95-98: pre-projection
    # iterates vs new slacks; old-vs-new slacks scaled by rho.
    aX, aV = jnp.abs(X - Vnew), jnp.abs(V - Vnew)
    aU, aZ = jnp.abs(U - Znew), jnp.abs(Z - Znew)
    p_s = cat([smx(aX, j) for j in range(g)])
    d_s = rho * cat([smx(aV, j) for j in range(g)])
    p_u = cat([smd(aU, j) for j in range(g)])
    d_u = rho * cat([smd(aZ, j) for j in range(g)])
    iters = p_s * 0.0 + float(max_iter)
    stats_out[:] = (
        iters * _stats_onehot(0, g)
        + p_s * _stats_onehot(2, g) + d_s * _stats_onehot(3, g)
        + p_u * _stats_onehot(4, g) + d_u * _stats_onehot(5, g)
    )


def _kernel_adaptive(
    rho_ref, tol_ref,
    x0_ref, D0_ref, Y0_ref, G0_ref, Z0_ref, V0_ref,
    const_ref, u_min_ref, u_max_ref, x_min_ref, x_max_ref, seg_ref,
    w_fx_ref, w_fd_ref, w_gx_ref, w_gd_ref, w_q_ref, w_r_ref,
    *rest,
    max_iter: int, check_every: int, warmup: int, g: int, interpret: bool,
    algo: str = "f32", nc_u: int = 0, nc_x: int = 0,
    has_pu: bool = False, has_px: bool = False, alpha: float = 1.0,
):
    """Adaptive fused solve with per-instance convergence freezing.

    Check-block structure: between termination checks the loop runs plain
    fixed-mode iterations (no masks, no residuals — convergence can only
    trigger at check iterations, reference admm.cpp:93). At each check the
    newly-converged instances' result set is *snapshotted* with the exact
    early-exit semantics (duals advanced, slack save + backward pass skipped
    — reference admm.cpp:135-144) and their SIMD lanes simply keep iterating;
    outputs select snapshot-vs-live by the frozen flag at the end. Iterates
    of a converged ADMM instance stay in the fixed-point basin, so the dead
    lanes cannot overflow.

    ``warmup > 0`` runs that many iterations before the first possible check
    — an opt-in throughput knob; results are identical to plain adaptive
    whenever no instance converges within the warmup window (recorded
    residual lanes always come from actual check iterations).

    ``algo == "bf16x3"`` runs the *between-check* plain iterations (and the
    warmup window) with the 3-pass split-operand bf16 matmuls; every check
    iteration stays full f32, so the residuals driving the freeze decision —
    and the recorded residual lanes — are exact f32 residuals of the
    returned iterates. The tolerance guarantee is therefore unchanged;
    what is traded away is the bit-exact iteration-schedule parity with the
    scan tier (counts can shift near the threshold). f32 remains the
    default for that reason.
    """
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=_HI
    )
    Dug = D0_ref.shape[-1]
    Dxp = G0_ref.shape[-1] // g
    cone_u, cone_x, outs = _cone_fns(rest, nc_u, nc_x, g, Dug, Dxp,
                                     has_pu=has_pu, has_px=has_px)
    U_out, X_out, D_out, Y_out, G_out, Z_out, V_out, stats_out = outs
    iterate = functools.partial(_iteration, cone_u=cone_u, cone_x=cone_x,
                                alpha=alpha)
    Xb = dot(x0_ref[:], w_fx_ref[:])
    Ub = dot(x0_ref[:], w_gx_ref[:])
    consts = (
        Xb, Ub, const_ref[:],
        u_min_ref[:], u_max_ref[:], x_min_ref[:], x_max_ref[:],
    )
    W3, W = _make_ws((w_fd_ref, w_gd_ref, w_q_ref, w_r_ref), algo)
    segt = _seg_tools(g, Dug, Dxp, seg_ref, interpret)
    carry0 = (D0_ref[:], Y0_ref[:], G0_ref[:], Z0_ref[:], V0_ref[:])
    U, X, D, Y, G, Z, V, itf, done, r0, r1, r2, r3 = _adaptive_core(
        iterate, W3, W, carry0, consts, rho_ref[0, 0],
        tol_ref[0, 0], tol_ref[0, 1], segt, g,
        max_iter=max_iter, check_every=check_every, warmup=warmup,
    )
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


def _adaptive_core(iterate, W3, W, carry0, consts, rho, pri_tol, dua_tol,
                   segt, g: int, *, max_iter: int, check_every: int,
                   warmup: int):
    """The check-block adaptive while-loop on VMEM-resident values (see
    :func:`_kernel_adaptive` for the semantics). Returns the frozen-picked
    result set ``(U, X, D, Y, G, Z, V, itf, done, r0, r1, r2, r3)`` where
    the per-instance bookkeeping arrays are in the concatenated
    ``(rows, g*LANES)`` layout. Shared by the one-solve kernel and the
    in-kernel rollout (:mod:`.fused_rollout`)."""
    smd, smx, to_du, to_dx, cat, uncat = segt

    def pick(m, a, b):
        # Exact for binary masks; avoids select_n (unlowerable layouts).
        return a * m + b * (1.0 - m)

    def plain_body(_, c):
        # Between-check iterations use W3 (== W unless algo="bf16x3"); the
        # check iteration below always contracts in f32 so the residuals
        # that gate freezing are exact for the snapshotted iterates.
        D, Y, G, Z, V = c
        Dn, Yn, Gn, Znew, Vnew, _U, _X = iterate(
            D, Y, G, W3, consts, Z=Z, V=V
        )
        return (Dn, Yn, Gn, Znew, Vnew)

    def cond(st):
        k, done = st[0], st[1]
        return jnp.logical_and(
            k < max_iter, jnp.logical_not(jnp.all(done > 0.5))
        )

    def body(st):
        (k, done, D, Y, G, Z, V, lU, lX,
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
        Dn, Yn, Gn, Znew, Vnew, U, X = iterate(D, Y, G, W, consts, Z=Z, V=V)
        is_check = jnp.remainder(kc, check_every) == 0
        chk = is_check.astype(jnp.float32)
        aX, aV = jnp.abs(X - Vnew), jnp.abs(V - Vnew)
        aU, aZ = jnp.abs(U - Znew), jnp.abs(Z - Znew)
        newly, advs, p_s, d_s, p_u, d_u = [], [], [], [], [], []
        for j in range(g):
            ps = smx(aX, j)
            ds = rho * smx(aV, j)
            pu = smd(aU, j)
            du_ = rho * smd(aZ, j)
            adv = 1.0 - uncat(done, j)
            conv = (
                (ps < pri_tol) & (pu < pri_tol)
                & (ds < dua_tol) & (du_ < dua_tol)
            ).astype(jnp.float32) * chk
            newly.append(adv * conv)
            advs.append(adv)
            p_s.append(ps); d_s.append(ds); p_u.append(pu); d_u.append(du_)
        m_new_cat = cat(newly)
        m_new_du = to_du(newly)
        m_new_dx = to_dx(newly)
        # (Scalar-gating this snapshot block behind "any newly frozen" via
        # lax.cond was tried and measured SLOWER — the scf.if costs ~0.4%
        # per check even when never taken; unconditional masked picks win.)
        sD = pick(m_new_du, D, sD)       # backward pass skipped
        sZ = pick(m_new_du, Z, sZ)       # slack save skipped
        sV = pick(m_new_dx, V, sV)
        sY = pick(m_new_du, Yn, sY)      # duals advanced before the check
        sG = pick(m_new_dx, Gn, sG)
        sU = pick(m_new_du, U, sU)
        sX = pick(m_new_dx, X, sX)
        itf = pick(m_new_cat, itf * 0.0 + kc.astype(jnp.float32), itf)
        # Residual fields persist between checks for every still-advancing
        # instance (reference stores them only at check iterations,
        # admm.cpp:93-98).
        m_rec = cat(advs) * chk
        r0 = pick(m_rec, cat(p_s), r0)
        r1 = pick(m_rec, cat(d_s), r1)
        r2 = pick(m_rec, cat(p_u), r2)
        r3 = pick(m_rec, cat(d_u), r3)
        done = jnp.maximum(done, m_new_cat)
        return (kc, done, Dn, Yn, Gn, Znew, Vnew, U, X,
                sD, sY, sG, sZ, sV, sU, sX, itf, r0, r1, r2, r3)

    # Carry inits derive from real ref data (pure constants materialize in a
    # replicated layout that poisons the whole carry chain).
    D0, Y0, G0, Z0, V0 = carry0
    zdu = D0 * 0.0
    zdx = G0 * 0.0
    z128 = zdu[:, :LANES]
    zcat = z128 if g == 1 else jnp.concatenate([z128] * g, axis=1)
    if warmup > 0:
        D0, Y0, G0, Z0, V0 = jax.lax.fori_loop(
            0, warmup, plain_body, (D0, Y0, G0, Z0, V0)
        )
    init = (
        jnp.full((), warmup, jnp.int32), zcat,
        D0, Y0, G0, Z0, V0, zdu, zdx,
        zdu, zdu, zdx, zdu, zdx, zdu, zdx,
        zcat, zcat, zcat, zcat, zcat,
    )
    (_k, done, D, Y, G, Z, V, lU, lX,
     sD, sY, sG, sZ, sV, sU, sX, itf, r0, r1, r2, r3) = (
        jax.lax.while_loop(cond, body, init)
    )
    dones = [uncat(done, j) for j in range(g)]
    d_du = to_du(dones)
    d_dx = to_dx(dones)
    itf = pick(done, itf, itf * 0.0 + float(max_iter))
    return (
        pick(d_du, sU, lU), pick(d_dx, sX, lX),
        pick(d_du, sD, D), pick(d_du, sY, Y), pick(d_dx, sG, G),
        pick(d_du, sZ, Z), pick(d_dx, sV, V),
        itf, done, r0, r1, r2, r3,
    )


# ------------------------------------------------------------------ pack ----

def _pack_du(a: jax.Array, g: int, Du: int, Dug: int) -> jax.Array:
    """(B, Dup) unpacked -> (B/g, Dug) packed at stride Du."""
    if g == 1:
        return a
    R = a.shape[0] // g
    core = a[:, :Du].reshape(R, g * Du)
    if Dug == g * Du:
        return core
    return jnp.pad(core, ((0, 0), (0, Dug - g * Du)))


def _unpack_du(p: jax.Array, g: int, Du: int, Dup: int) -> jax.Array:
    if g == 1:
        return p
    B = p.shape[0] * g
    core = p[:, : g * Du].reshape(B, Du)
    if Dup == Du:
        return core
    return jnp.pad(core, ((0, 0), (0, Dup - Du)))


def _pack_dx(a: jax.Array, g: int) -> jax.Array:
    """(B, Dxp) -> (B/g, g*Dxp): pure reshape (instances at stride Dxp)."""
    if g == 1:
        return a
    return a.reshape(a.shape[0] // g, g * a.shape[1])


def _unpack_dx(p: jax.Array, g: int) -> jax.Array:
    if g == 1:
        return p
    return p.reshape(p.shape[0] * g, p.shape[1] // g)


def fused_solve(
    x0: jax.Array,
    carry: FusedCarry,
    pp: PaddedProblem,
    *,
    max_iter: int = 100,
    check_termination: int = 0,
    abs_pri_tol: float | jax.Array = 1e-3,
    abs_dua_tol: float | jax.Array = 1e-3,
    batch_tile: int = DEFAULT_BATCH_TILE,
    warmup_iters: int = 0,
    interpret: bool = False,
    xref_q: jax.Array | None = None,
    pterm_c: jax.Array | None = None,
    algo: str = "f32",
    polish: int = 8,
    cone_ops: FusedConeOps | None = None,
    cone_mu_u: jax.Array | None = None,
    cone_shift_u: jax.Array | None = None,
    cone_mu_x: jax.Array | None = None,
    cone_shift_x: jax.Array | None = None,
    alpha: float = 1.0,
) -> FusedResult:
    """Run the fused whole-solve kernel over a batch.

    ``cone_ops`` (from :func:`pad_cones`) appends exact second-order-cone
    projections to the slack stage — the beyond-reference SOC capability
    (solver/cones.py) in the fast path; composition after the box clip
    matches the scan tier's ``cone_slack_update`` exactly. NB: batch-padding
    instances (zero data) sit at the cone apex; with a *negative* ``shift``
    the apex is infeasible from zero, so such padding lanes never converge
    and would pin their tile at ``max_iter`` in adaptive mode — pad the
    batch to a tile multiple yourself (with feasible x0 copies) if you use
    negative shifts.

    ``cone_mu_u``/``cone_shift_u`` (``(n_input_cones, B)``; likewise
    ``*_x`` for state cones) override the cones' scalar parameters *per
    instance* — constraint-parameter sweeps (e.g. per-lander tilt limits)
    at fused-kernel speed over one shared plant; per-instance *geometry*
    (ball/axis) needs the hetero tier. Values are packed to batch-tiled
    lane blocks streamed with the carries; where they equal the static
    scalars the arithmetic is value-identical to the static path. Requires
    ``cone_ops``. Padding instances get mu = shift = 0 (the projection
    fixes their zero iterates, harmless).

    ``x0`` is ``(B, nx)`` (un-padded); carries are flat-padded per instance
    (:class:`FusedCarry`); batches that are not tile multiples are padded
    internally and sliced back. ``check_termination == 0`` selects
    the fixed-iteration kernel, otherwise the adaptive freezing kernel with
    checks every ``check_termination`` iterations. Tolerances are *traced*
    operands (SMEM) — changing them does not recompile.

    ``xref_q``/``pterm_c`` override the baked reference vectors (tracking
    mode — build them with :func:`ref_vectors`). ``warmup_iters`` (adaptive
    mode only) runs that many iterations without convergence checks first —
    results are identical to plain adaptive whenever no instance converges
    within the warmup window (iterates/controls exactly; recorded residual
    lanes always reflect the freezing check iteration).

    ``algo`` selects the in-loop matmul arithmetic: ``"f32"`` (6-pass
    ``Precision.HIGHEST`` — golden-parity default) or ``"bf16x3"`` (3-pass
    split-operand bf16, :func:`_dot3` — ~2x the MXU rate at ~2^-17 relative
    matmul error; validated on-chip to stay inside the 1e-4 control-parity
    bar on the shipped quadrotor problems, see tests/test_fused.py and
    tools/tpu_check_bf16x3.py). In fixed mode the last ``polish`` iterations
    run full f32. In adaptive mode only the *between-check* iterations use
    bf16x3 — checks (and the residuals/snapshots they record) stay f32, so
    converged instances genuinely satisfy the tolerances; the trade-off is
    that iteration counts are no longer bit-matched to the scan tier's
    schedule (keep ``algo="f32"`` where that contract matters).

    ``interpret=True`` runs the Pallas interpreter (CPU-testable).
    """
    if algo not in ("f32", "bf16x3"):
        raise ValueError(f"unknown algo {algo!r}; use 'f32' or 'bf16x3'")
    if max_iter < 1:
        raise ValueError("the fused tier runs at least one iteration; "
                         "use the scan tier for max_iter=0")
    nx, nu, N = pp.dims
    g = pp.g
    Du, Dx = (N - 1) * nu, N * nx
    Dxp, Dup = pp.Dxp, pp.Dup
    Dug = pp.u_min.shape[1]
    gDxp = pp.x_min.shape[1]
    nxg = pp.W_fx.shape[0]
    B, _ = x0.shape
    dtype = x0.dtype

    # Reference-dependent loop constant: const_d = xref_q@Eq^T + pterm_c@Ep^T
    # (the iteration-invariant part of the folded linear-cost/backward stage).
    xq = xref_q if xref_q is not None else pp.xref_q
    pc = pterm_c if pterm_c is not None else pp.pterm_c
    const_core = (
        jnp.matmul(xq, pp.W_eq_u, precision=_HI)
        + jnp.matmul(pc, pp.W_ep_u, precision=_HI)
    )[:, :Du]
    const_d = jnp.tile(const_core, (1, g))
    if Dug != g * Du:
        const_d = jnp.pad(const_d, ((0, 0), (0, Dug - g * Du)))

    nc_u = cone_ops.nc_u if cone_ops is not None else 0
    nc_x = cone_ops.nc_x if cone_ops is not None else 0
    has_pu = cone_mu_u is not None or cone_shift_u is not None
    has_px = cone_mu_x is not None or cone_shift_x is not None
    if (has_pu and not nc_u) or (has_px and not nc_x):
        raise ValueError("per-instance cone parameters without the "
                         "matching cones in cone_ops")
    cone_args: tuple = ()
    if nc_u:
        cone_args += (cone_ops.cu_gather, cone_ops.cu_scatter,
                      cone_ops.cu_vec)
    if nc_x:
        cone_args += (cone_ops.cx_gather, cone_ops.cx_scatter,
                      cone_ops.cx_vec)

    # Tile sizing: cap rows so the kernel's VMEM footprint (state blocks,
    # double-buffered in/out, elementwise temps, operators) stays inside the
    # ~16 MB budget. Widths here are the packed ones.
    w_bytes = sum(int(np.prod(w.shape)) * 4 for w in
                  (pp.W_fx, pp.W_fd, pp.W_gx, pp.W_gd, pp.W_q, pp.W_r)
                  + cone_args)
    per_row = 4 * (
        2 * (nxg + 3 * Dug + 2 * gDxp)        # input blocks (double-buffered)
        + 2 * (4 * Dug + 3 * gDxp + g * STATS)  # output blocks
        + 10 * gDxp + 6 * Dug                 # loop temporaries (estimate)
    )
    if check_termination > 0:
        per_row += 4 * (6 * g * LANES + 5 * Dug + 5 * gDxp)
    # Cone projection temporaries (a2/s/masks/c/scale/ball_scale and the
    # products feeding them, ~10 live arrays per cone at the slack width) —
    # without this term the adaptive+state-cone configuration OOMs VMEM at
    # the default tile (observed as a Mosaic compile crash).
    per_row += 4 * 10 * (nc_u * Dug + nc_x * gDxp)
    # Per-instance cone mu/shift streams (double-buffered input blocks).
    per_row += 4 * 2 * (
        (nc_u * 2 * Dug if has_pu else 0)
        + (nc_x * 2 * gDxp if has_px else 0)
    )
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
    grid = (R // bt_rows,)

    x0p = x0.reshape(R, g * nx)
    if nxg != g * nx:
        x0p = jnp.pad(x0p, ((0, 0), (0, nxg - g * nx)))

    def _pack_pvec(mu_arr, shift_arr, vec, nc, stride, width):
        """(nc, B) per-instance mu/shift -> (R, nc*2*width): per cone a mu
        block then a shift block, every lane of an instance's ``stride``
        carrying its value. A defaulted entry (None) broadcasts the static
        row baked in ``vec`` (mu at row c*8+3, shift at c*8+2) — the
        non-axis lanes of the shift row are zero, which the projection
        masks off identically. Padding instances get zero (the projection
        fixes their zero iterates)."""
        cols = []
        for c in range(nc):
            for arr, row in ((mu_arr, vec[c * 8 + 3:c * 8 + 4, :]),
                             (shift_arr, vec[c * 8 + 2:c * 8 + 3, :])):
                if arr is None:
                    cols.append(jnp.broadcast_to(row, (R, width)))
                    continue
                v = jnp.asarray(arr[c], jnp.float32)
                if B_pad != B:
                    v = jnp.concatenate(
                        [v, jnp.zeros((B_pad - B,), jnp.float32)]
                    )
                blk = jnp.repeat(
                    v.reshape(R, g), stride, axis=1
                )  # (R, g*stride)
                if width != g * stride:
                    blk = jnp.pad(blk, ((0, 0), (0, width - g * stride)))
                cols.append(blk)
        return jnp.concatenate(cols, axis=1)

    pvec_u = pvec_x = None
    if has_pu:
        pvec_u = _pack_pvec(cone_mu_u, cone_shift_u, cone_ops.cu_vec,
                            nc_u, Du, Dug)
    if has_px:
        pvec_x = _pack_pvec(cone_mu_x, cone_shift_x, cone_ops.cx_vec,
                            nc_x, Dxp, gDxp)
    Dp = _pack_du(carry.D, g, Du, Dug)
    Yp = _pack_du(carry.Y, g, Du, Dug)
    Zp = _pack_du(carry.Z, g, Du, Dug)
    Gp = _pack_dx(carry.G, g)
    Vp = _pack_dx(carry.V, g)

    def batch_spec(width):
        return pl.BlockSpec((bt_rows, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    state_specs = [
        batch_spec(nxg), batch_spec(Dug), batch_spec(Dug),
        batch_spec(gDxp), batch_spec(Dug), batch_spec(gDxp),
    ]
    vec_specs = [
        const_spec((1, Dug)),   # const_d
        const_spec((1, Dug)),   # u_min
        const_spec((1, Dug)),   # u_max
        const_spec((1, gDxp)),  # x_min
        const_spec((1, gDxp)),  # x_max
        const_spec(pp.seg.shape),
    ]
    w_specs = [
        const_spec(pp.W_fx.shape), const_spec(pp.W_fd.shape),
        const_spec(pp.W_gx.shape), const_spec(pp.W_gd.shape),
        const_spec(pp.W_q.shape), const_spec(pp.W_r.shape),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((R, Dug), dtype),   # U
        jax.ShapeDtypeStruct((R, gDxp), dtype),  # X
        jax.ShapeDtypeStruct((R, Dug), dtype),   # D
        jax.ShapeDtypeStruct((R, Dug), dtype),   # Y
        jax.ShapeDtypeStruct((R, gDxp), dtype),  # G
        jax.ShapeDtypeStruct((R, Dug), dtype),   # Z
        jax.ShapeDtypeStruct((R, gDxp), dtype),  # V
        jax.ShapeDtypeStruct((R, g * STATS), jnp.float32),
    ]
    out_specs = [
        batch_spec(Dug), batch_spec(gDxp), batch_spec(Dug), batch_spec(Dug),
        batch_spec(gDxp), batch_spec(Dug), batch_spec(gDxp),
        batch_spec(g * STATS),
    ]
    vec_args = (const_d, pp.u_min, pp.u_max, pp.x_min, pp.x_max, pp.seg)
    w_args = (pp.W_fx, pp.W_fd, pp.W_gx, pp.W_gd, pp.W_q, pp.W_r)
    state_args = (x0p, Dp, Yp, Gp, Zp, Vp)
    # Interleave the per-instance mu/shift streams after each group's
    # const operands (matching _cone_fns' unpack order); they tile over
    # the batch like the carries.
    cone_args = ()
    cone_specs = []
    if nc_u:
        cone_args += (cone_ops.cu_gather, cone_ops.cu_scatter,
                      cone_ops.cu_vec)
        cone_specs += [const_spec(a.shape) for a in cone_args[-3:]]
        if has_pu:
            cone_args += (pvec_u,)
            cone_specs += [batch_spec(nc_u * 2 * Dug)]
    if nc_x:
        cone_args += (cone_ops.cx_gather, cone_ops.cx_scatter,
                      cone_ops.cx_vec)
        cone_specs += [const_spec(a.shape) for a in cone_args[-3:]]
        if has_px:
            cone_args += (pvec_x,)
            cone_specs += [batch_spec(nc_x * 2 * gDxp)]
    cone_args = tuple(cone_args)

    # FLOPs: 4 in-loop packed matmuls per iteration per row plus the two
    # hoisted x0 contractions (counted per iteration as an upper bound).
    flops_iter = 2 * R * (
        Dug * gDxp + Dug * Dug + gDxp * Dug + Dug * Dug
        + nxg * gDxp + nxg * Dug
        + nc_u * 2 * Dug * Dug + nc_x * 2 * gDxp * gDxp
    )
    io_args = state_args + vec_args + w_args + cone_args
    cost = pl.CostEstimate(
        flops=flops_iter * max_iter,
        bytes_accessed=(
            sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in io_args)
            + sum(int(np.prod(s.shape)) * s.dtype.itemsize for s in out_shape)
        ),
        transcendentals=0,
    )

    if check_termination <= 0:
        kernel = functools.partial(
            _kernel_fixed, max_iter=max_iter, g=g, interpret=interpret,
            algo=algo, polish=polish, nc_u=nc_u, nc_x=nc_x,
            has_pu=has_pu, has_px=has_px, alpha=alpha,
        )
        scalar_args = (pp.rho,)
        scalar_specs = [smem_spec]
    else:
        kernel = functools.partial(
            _kernel_adaptive, max_iter=max_iter,
            check_every=check_termination,
            warmup=min(warmup_iters, max_iter - 1), g=g, interpret=interpret,
            algo=algo, nc_u=nc_u, nc_x=nc_x, has_pu=has_pu, has_px=has_px,
            alpha=alpha,
        )
        tols = jnp.stack([
            jnp.asarray(abs_pri_tol, jnp.float32).reshape(()),
            jnp.asarray(abs_dua_tol, jnp.float32).reshape(()),
        ]).reshape(1, 2)
        scalar_args = (pp.rho, tols)
        scalar_specs = [
            smem_spec,
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=scalar_specs + state_specs + vec_specs + w_specs
        + cone_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(*scalar_args, *state_args, *vec_args, *w_args, *cone_args)

    Up, Xp, Dp, Yp, Gp, Zp, Vp, stats_p = outs
    U = _unpack_du(Up, g, Du, Dup)
    D = _unpack_du(Dp, g, Du, Dup)
    Y = _unpack_du(Yp, g, Du, Dup)
    Z = _unpack_du(Zp, g, Du, Dup)
    X = _unpack_dx(Xp, g)
    G = _unpack_dx(Gp, g)
    V = _unpack_dx(Vp, g)
    stats = stats_p.reshape(B_pad, STATS)
    if B_pad != B:
        U, X, D, Y, G, Z, V, stats = (
            a[:B] for a in (U, X, D, Y, G, Z, V, stats)
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
