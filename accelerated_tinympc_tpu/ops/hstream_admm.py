"""Heterogeneous streaming Pallas kernel: per-instance plants at long horizons.

Fills the one empty cell in the kernel-family matrix: :mod:`.hetero_admm`
holds every knot in VMEM (distinct plants, short horizons) and
:mod:`.stream_admm` streams long horizons for one shared plant (MXU matmuls
shared across lanes). Fleets of *distinct* plants over long horizons get
neither. This kernel combines the two designs:

* **Plants resident, knots streamed.** The per-lane plant/cache tensors are
  tiny (~1.8 KB/instance — A, B, Kinf, Quu_inv, AmBKt and friends in the
  hetero tier's transposed-3D ``(r_in, r_out, LANES)`` packing) and load into
  VMEM once per batch tile; the O(N) iterate arrays live in HBM in the
  streaming tier's ``(NT, N, S, LANES)`` layout and flow through the same
  double-buffered async-DMA phase machinery as :mod:`.stream_admm` (which
  see for the traffic table — identical here, plus nothing: the plant adds
  no per-iteration traffic).
* **Sweeps on the VPU.** With a different matrix in every lane there is
  nothing for the MXU's systolic array to share, so the two horizon
  recurrences of each iteration (reference: src/tinympc/admm.cpp:27-37
  forward rollout, :15-22 backward gradient recursion) advance knot by knot
  as per-lane matvecs (:func:`.hetero_admm._dotb` full-width FMA trees),
  fused with the slack projection (admm.cpp:45-61), dual ascent (:67-71)
  and linear-cost refresh (:77-85) exactly as in both parents.
* **Per-instance rho** rides as resident ``(S, LANES)`` rows (each lane its
  own penalty — the hetero tier's convention), used by the dual-residual
  stats and the r/q rebuilds.

The reference anchors: the sequential horizon recurrences admm.cpp:17,29
crossed with one-problem-per-process tiny_wrapper.hpp:6 — this kernel runs
a *fleet* of those processes per chip at horizons the VMEM-resident tier
cannot hold.

Early termination: ``check_termination > 0`` runs the in-kernel
per-instance freeze (the streaming parent's adaptive design, per-lane
exact reference early-exit semantics, per-tile while_loop exit);
:func:`..solver.cascade.hstream_cascade_solve` composes it with
cross-tile survivor compaction (bit-exact vs one long adaptive call).
Bounds are per-instance; time-uniform schedules ride resident ``(S,
LANES)`` rows, per-knot schedules stream alongside qc (iteration-constant
read-only traffic — measured free on this deployment).

Mosaic discipline (CLAUDE.md): batch on lanes, no lane-1 vectors, residual
accumulators full ``(S, LANES)`` reduced once at the end, scalar masks as
0/1 float multiplies.
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
from .hetero_admm import (
    LANES,
    _dotb,
    _lane_pack_mat,
    _lane_pack_vec,
    _pad8,
    _project_soc_seg,
    _project_soc_seg_masked,
    _repack_mat3,
    _repack_rows,
    _unpack_mat3,
    _unpack_rows,
)
from .stream_admm import (
    _A_IN_D, _A_IN_G, _A_IN_QC, _A_IN_U, _A_IN_V, _A_IN_VS, _A_IN_X,
    _A_IN_Y, _A_IN_Z, _A_IN_ZS,
    _A_OUT_D, _A_OUT_G, _A_OUT_U, _A_OUT_V, _A_OUT_VS, _A_OUT_X, _A_OUT_Y,
    _A_OUT_Z, _A_OUT_ZS,
    _A_SU_D_IN, _A_SU_D_OUT, _A_SU_MISC, _A_SU_U_IN, _A_SU_Y_IN,
    _A_SU_Y_OUT, _A_SU_Z_IN, _A_SU_Z_OUT, _A_SU_ZS,
    _A_SX_G_IN, _A_SX_G_OUT, _A_SX_QC_IN, _A_SX_V_IN, _A_SX_V_OUT,
    _A_SX_VS, _A_SX_X_IN, _A_SX_X_OUT,
    _A_SU_UMIN, _A_SU_UMAX, _A_SX_XMIN, _A_SX_XMAX,
    _A_IN_UMIN, _A_IN_UMAX, _A_IN_XMIN, _A_IN_XMAX,
    StreamCarry,
    StreamResult,
    _make_streamer,
    _pack,
    _unpack,
)

_HI = jax.lax.Precision.HIGHEST

# Max sublanes per streamed VMEM block (see the cap comment in
# hstream_solve; tools/tpu_check_hstream.py probes above it on chip).
KB_SUBLANE_CAP = 256

# Buffer/channel ids — same pools as the streaming parent.
_SU_D_IN, _SU_Y_IN, _SU_Y_OUT, _SU_Z_OUT, _SU_D_OUT, _SU_Z_IN = range(6)
_SU_U_OUT = _SU_D_OUT
_SX_G_IN, _SX_G_OUT, _SX_V_OUT, _SX_QC_IN, _SX_V_IN = range(5)
_SX_X_OUT = _SX_QC_IN
_IN_D, _IN_Y, _IN_G, _IN_Z, _IN_V, _IN_QC = range(6)
_OUT_Y, _OUT_G, _OUT_Z, _OUT_V, _OUT_D, _OUT_U, _OUT_X = range(7)
# Optional per-knot bound streams (same ids as the streaming parent).
_SU_UMIN, _SU_UMAX = 6, 7
_SX_XMIN, _SX_XMAX = 5, 6
_IN_UMIN, _IN_UMAX, _IN_XMIN, _IN_XMAX = 6, 7, 8, 9


@struct.dataclass
class HStreamProblem:
    """Kernel-ready operands: plants lane-packed (hetero layout), per-knot
    reference costs in the streaming layout. ``dims = (nx, nu, N)``."""

    A3: jax.Array        # (NT*SX, SX, L)
    B3: jax.Array        # (NT*SU, SX, L)
    K3: jax.Array        # (NT*SX, SU, L)
    Kt3: jax.Array       # (NT*SU, SX, L)
    Quu3: jax.Array      # (NT*SU, SU, L)
    Bt3: jax.Array       # (NT*SX, SU, L)
    M3: jax.Array        # (NT*SX, SX, L)
    u_min: jax.Array     # (NT*SU, L)  per-instance, time-uniform
    u_max: jax.Array
    x_min: jax.Array     # (NT*SX, L)
    x_max: jax.Array
    qc: jax.Array        # (NT, N, SX, L)  -(Q o Xref_i), streamed
    pterm: jax.Array     # (NT*SX, L)      -Pinf^T Xref_{N-1}
    rho_u: jax.Array     # (NT*SU, L)
    rho_x: jax.Array     # (NT*SX, L)
    dims: tuple = struct.field(pytree_node=False)  # (nx, nu, N)
    batch: int = struct.field(pytree_node=False)
    # Per-instance per-knot bound schedules (None = time-uniform resident
    # rows above apply). Streamed alongside qc — iteration-constant
    # read-only traffic, measured free on this deployment (the hetero tier
    # covers per-knot bounds at VMEM-resident horizons; this extends them
    # to streaming horizons).
    u_min_k: jax.Array | None = None   # (NT, N, SU, L)
    u_max_k: jax.Array | None = None
    x_min_k: jax.Array | None = None   # (NT, N, SX, L)
    x_max_k: jax.Array | None = None

    @property
    def SX(self) -> int:
        return self.A3.shape[1]

    @property
    def SU(self) -> int:
        return self.Quu3.shape[1]

    @property
    def tiles(self) -> int:
        return self.qc.shape[0]

    @property
    def has_knot_bounds(self) -> bool:
        return self.u_min_k is not None


def _uniform_bound(b: jax.Array, knots: int, k: int, name: str):
    """Accept ``(B, k)`` or ``(B, knots, k)``; return ``(resident,
    time_varying)``: the (B, k) resident rows, and whether a concrete 3-D
    schedule actually varies over knots (→ per-knot streaming mode; a 3-D
    tracer is assumed time-uniform, matching the jittable contract)."""
    b = jnp.asarray(b)
    if b.ndim == 2:
        return b, False
    if b.ndim != 3:
        raise ValueError(f"{name}: expected (B, {k}) or (B, {knots}, {k})")
    if not isinstance(b, jax.core.Tracer):
        bh = np.asarray(b)
        if not np.all(bh == bh[:, :1]):
            return b[:, 0], True
    return b[:, 0], False


def pad_hstream_problem(
    problem: Problem, cache: Cache, dtype: Any = jnp.float32
) -> HStreamProblem:
    """Lane-pack batch-leading ``Problem``/``Cache`` pytrees (every leaf with
    a leading batch axis) into hetero-streaming operands. Jittable (the
    time-uniform bound validation only runs on concrete inputs)."""
    Bn = problem.A.shape[0]
    nx = problem.A.shape[-1]
    nu = problem.B.shape[-1]
    N = problem.Xref.shape[-2]
    SX, SU = _pad8(nx), _pad8(nu)
    nt = -(-Bn // LANES)
    f = lambda a: jnp.asarray(a, dtype)

    qc = -(f(problem.Xref) * f(problem.Q)[:, None, :])          # (B, N, nx)
    pterm = -jnp.einsum(
        "bi,bij->bj", f(problem.Xref[:, -1]), f(cache.Pinf), precision=_HI,
    )
    rho = f(cache.rho).reshape(Bn)[:, None]

    bounds = {}
    knot_bounds = False
    for name, b, knots, k in (
        ("u_min", problem.u_min, N - 1, nu),
        ("u_max", problem.u_max, N - 1, nu),
        ("x_min", problem.x_min, N, nx),
        ("x_max", problem.x_max, N, nx),
    ):
        resident, varying = _uniform_bound(b, knots, k, name)
        bounds[name] = (resident, b, knots, k)
        knot_bounds |= varying

    def pkb(name, S):
        return _lane_pack_vec(f(bounds[name][0]), S, nt)

    def pk_stream(name, S):
        if not knot_bounds:
            return None
        resident, b, knots, k = bounds[name]
        b3 = jnp.asarray(b)
        if b3.ndim == 2:
            b3 = jnp.broadcast_to(b3[:, None, :], (Bn, knots, k))
        full = jnp.zeros((Bn, N, k), dtype).at[:, :knots].set(f(b3))
        return _pack(full, Bn, S)

    return HStreamProblem(
        u_min_k=pk_stream("u_min", SU),
        u_max_k=pk_stream("u_max", SU),
        x_min_k=pk_stream("x_min", SX),
        x_max_k=pk_stream("x_max", SX),
        A3=_lane_pack_mat(f(problem.A), SX, SX, nt),
        B3=_lane_pack_mat(f(problem.B), SU, SX, nt),
        K3=_lane_pack_mat(f(cache.Kinf), SX, SU, nt),
        Kt3=_lane_pack_mat(jnp.swapaxes(f(cache.Kinf), -1, -2), SU, SX, nt),
        Quu3=_lane_pack_mat(f(cache.Quu_inv), SU, SU, nt),
        Bt3=_lane_pack_mat(jnp.swapaxes(f(problem.B), -1, -2), SX, SU, nt),
        M3=_lane_pack_mat(f(cache.AmBKt), SX, SX, nt),
        u_min=pkb("u_min", SU),
        u_max=pkb("u_max", SU),
        x_min=pkb("x_min", SX),
        x_max=pkb("x_max", SX),
        qc=_pack(qc, Bn, SX),
        pterm=_lane_pack_vec(pterm, SX, nt),
        rho_u=_lane_pack_vec(jnp.broadcast_to(rho, (Bn, nu)), SU, nt),
        rho_x=_lane_pack_vec(jnp.broadcast_to(rho, (Bn, nx)), SX, nt),
        dims=(nx, nu, N),
        batch=Bn,
    )


def hstream_ref_vectors(
    hsp: HStreamProblem, Q: jax.Array, Pinf: jax.Array, Xref: jax.Array,
) -> HStreamProblem:
    """Device-side rebuild of the reference-dependent operands for a new
    horizon window — per-instance tracking at long horizons (the hstream
    analogue of :func:`.stream_admm.stream_ref_vectors`; reference:
    quadrotor_tracking.cpp:101 slides the window each tick). ``Q (B, nx)``
    raw cost diagonals, ``Pinf (B, nx, nx)``, ``Xref (B, N, nx)`` the new
    windows. Returns ``hsp`` with ``qc``/``pterm`` replaced; jittable,
    nothing else is re-packed."""
    nx, _nu, N = hsp.dims
    Bn = hsp.batch
    nt = hsp.tiles
    dtype = hsp.qc.dtype
    f = lambda a: jnp.asarray(a, dtype)
    qc = -(f(Xref) * f(Q)[:, None, :])
    pterm = -jnp.einsum(
        "bi,bij->bj", f(Xref[:, -1]), f(Pinf), precision=_HI,
    )
    return hsp.replace(
        qc=_pack(qc, Bn, hsp.SX),
        pterm=_lane_pack_vec(pterm, hsp.SX, nt),
    )


def pad_hstream_from_plants(
    A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array, rho: jax.Array,
    problem: Problem, dtype: Any = jnp.float32, riccati: str = "auto",
) -> tuple[HStreamProblem, Cache]:
    """On-device build from raw plants: batched Riccati caches (reference
    math: src/tinympc/codegen.cpp:268-292) + lane packing. Jittable."""
    nx = A.shape[-1]
    use_kernel = riccati == "kernel" or (
        riccati == "auto" and nx <= 16 and jax.default_backend() == "tpu"
    )
    if use_kernel:
        from .riccati_kernel import riccati_cache_kernel

        caches = riccati_cache_kernel(A, B, Q, R, rho)
    else:
        from ..precompute import riccati_cache_jax

        caches = jax.vmap(riccati_cache_jax)(A, B, Q, R, rho)
    prob_b = problem.replace(A=A, B=B, Q=Q, R=R)
    return pad_hstream_problem(prob_b, caches, dtype), caches


def hstream_carry_zeros(
    batch: int, hsp: HStreamProblem, dtype=jnp.float32
) -> StreamCarry:
    """Cold-start carry in the streaming ``(NT, N, S, LANES)`` layout."""
    return StreamCarry.zeros(batch, hsp, dtype)


def gather_hstream(
    hsp: HStreamProblem, carry: StreamCarry, x0: jax.Array, idx: jax.Array,
) -> tuple[HStreamProblem, StreamCarry, jax.Array]:
    """Gather instances ``idx`` into a fresh (smaller) packing — the
    compaction primitive for :func:`..solver.cascade.hstream_cascade_solve`.
    ``idx`` length must be a multiple of LANES. Jittable."""
    SX, SU = hsp.SX, hsp.SU

    def g_rows(p, S):
        return _repack_rows(_unpack_rows(p, S)[idx], S)

    def g_mat(p, R_in):
        return _repack_mat3(_unpack_mat3(p, R_in)[idx])

    def g4(p):
        nt, N, S, L = p.shape
        flat = p.transpose(0, 3, 1, 2).reshape(nt * L, N, S)[idx]
        nt2 = idx.shape[0] // LANES
        return flat.reshape(nt2, LANES, N, S).transpose(0, 2, 3, 1)

    hsp2 = HStreamProblem(
        A3=g_mat(hsp.A3, SX), B3=g_mat(hsp.B3, SU), K3=g_mat(hsp.K3, SX),
        Kt3=g_mat(hsp.Kt3, SU), Quu3=g_mat(hsp.Quu3, SU),
        Bt3=g_mat(hsp.Bt3, SX), M3=g_mat(hsp.M3, SX),
        u_min=g_rows(hsp.u_min, SU), u_max=g_rows(hsp.u_max, SU),
        x_min=g_rows(hsp.x_min, SX), x_max=g_rows(hsp.x_max, SX),
        qc=g4(hsp.qc), pterm=g_rows(hsp.pterm, SX),
        rho_u=g_rows(hsp.rho_u, SU), rho_x=g_rows(hsp.rho_x, SX),
        dims=hsp.dims, batch=int(idx.shape[0]),
        u_min_k=None if hsp.u_min_k is None else g4(hsp.u_min_k),
        u_max_k=None if hsp.u_max_k is None else g4(hsp.u_max_k),
        x_min_k=None if hsp.x_min_k is None else g4(hsp.x_min_k),
        x_max_k=None if hsp.x_max_k is None else g4(hsp.x_max_k),
    )
    carry2 = jax.tree.map(g4, carry)
    return hsp2, carry2, x0[idx]


def _kernel(
    x0_ref,
    a3, b3, k3, kt3, quu3, bt3, m3,
    umin_ref, umax_ref, xmin_ref, xmax_ref,
    pterm_ref, rhou_ref, rhox_ref,
    qc_ref, *rest,
    max_iter: int, Kb: int, N: int, en_ib: bool, en_sb: bool,
    ucones: tuple = (), xcones: tuple = (), has_cparams: bool = False,
    has_cmasks: bool = False, SX: int = 0, SU: int = 0,
    kb_bounds: bool = False,
):
    """One batch tile's full fixed-iteration solve: the streaming parent's
    phase machinery (see stream_admm._kernel) with the hetero parent's
    per-lane VPU recurrences and resident per-instance operands (including
    optional per-instance cone parameters/geometry — the hetero kernel's
    lane-packed cone operands, resident per tile)."""
    i = 0
    cp_ref = rest[i] if has_cparams else None
    i += 1 if has_cparams else 0
    cm_ref = rest[i] if has_cmasks else None
    i += 1 if has_cmasks else 0
    if kb_bounds:
        uminK, umaxK, xminK, xmaxK = rest[i:i + 4]
        i += 4
    else:
        uminK = umaxK = xminK = xmaxK = None
    (d_in, y_in, g_in, z_in, v_in,
     d_hbm, y_hbm, g_hbm, z_hbm, v_hbm, U_hbm, X_hbm, stats_ref,
     su_buf, sx_buf, sems_in, sems_out) = rest[i:]
    del d_in, y_in, g_in, z_in, v_in
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
    t = pl.program_id(0)
    NBL = N // Kb
    f32 = jnp.float32
    A3v, B3v, K3v = a3[:], b3[:], k3[:]
    Kt3v, Quu3v, Bt3v, M3v = kt3[:], quu3[:], bt3[:], m3[:]
    rho_u = rhou_ref[:]      # (SU, L) per-instance penalties
    rho_x = rhox_ref[:]      # (SX, L)

    # qc is per-tile here (no shared operands): every array indexes
    # [t, block].
    dma_su, dma_sx, phase = _make_streamer(
        t, Kb, NBL, (), su_buf, sx_buf, sems_in, sems_out
    )

    def apply_cones(a, cone_list, params, masks):
        for c, cone in enumerate(cone_list):
            mu = sh = None
            if params is not None:
                mu, sh = params[c]
            if masks is not None:
                bm, am = masks[c]
                a = _project_soc_seg_masked(
                    a, a.shape[0], bm, am,
                    float(cone.mu) if mu is None else mu,
                    float(cone.shift) if sh is None else sh,
                )
            else:
                a = _project_soc_seg(a, a.shape[0], a.shape[0], cone,
                                     mu=mu, shift=sh)
        return a

    def clip_u(a, lo=None, hi=None):
        if en_ib:
            a = jnp.clip(a, umin_ref[:] if lo is None else lo,
                         umax_ref[:] if hi is None else hi)
        return apply_cones(a, ucones, uparams, umasks)

    def clip_x(a, lo=None, hi=None):
        if en_sb:
            a = jnp.clip(a, xmin_ref[:] if lo is None else lo,
                         xmax_ref[:] if hi is None else hi)
        return apply_cones(a, xcones, xparams, xmasks)

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
        """Forward rollout (admm.cpp:27-37) fused with slack projection
        (:45-61), dual ascent (:67-71) and slack save (:141-142); per-lane
        plant matvecs instead of the parent's shared-plant matmuls.

        Block-level IO: each streamed array is read/written as ONE
        ``(Kb, S, L)`` ref access per block, with the per-knot loop running
        on values (per-knot dynamic-slot ref ops measured ~15x whole-kernel
        on chip — Mosaic serializes them; hetero-kernel-style value code
        vectorizes)."""

        def compute(b, s, carry):
            if final:
                x, ax, av, au, az = carry
            else:
                x = carry
            d_blk = su_buf[_SU_D_IN, s]
            yin_blk = su_buf[_SU_Y_IN, s]
            gin_blk = sx_buf[_SX_G_IN, s]
            if kb_bounds:
                uminB, umaxB = su_buf[_SU_UMIN, s], su_buf[_SU_UMAX, s]
                xminB, xmaxB = sx_buf[_SX_XMIN, s], sx_buf[_SX_XMAX, s]
            if final:
                zin_blk = su_buf[_SU_Z_IN, s]
                vin_blk = sx_buf[_SX_V_IN, s]
            ys, zs, gs, vs, us, xs = [], [], [], [], [], []
            for i in range(Kb):
                gi = b * Kb + i
                w = (gi < N - 1).astype(f32)
                u_i = -_dotb(K3v, x) - d_blk[i]
                su = u_i + yin_blk[i]
                zn = (clip_u(su, uminB[i], umaxB[i]) if kb_bounds
                      else clip_u(su))
                ys.append((su - zn) * w)
                zs.append(zn * w)
                tx = x + gin_blk[i]
                vn = (clip_x(tx, xminB[i], xmaxB[i]) if kb_bounds
                      else clip_x(tx))
                gs.append(tx - vn)
                vs.append(vn)
                if final:
                    us.append(u_i * w)
                    xs.append(x)
                    ax = jnp.maximum(ax, jnp.abs(x - vn))
                    av = jnp.maximum(av, jnp.abs(vin_blk[i] - vn))
                    au = jnp.maximum(au, jnp.abs(u_i - zn) * w)
                    az = jnp.maximum(az, jnp.abs(zin_blk[i] - zn * w))
                x = _dotb(A3v, x) + _dotb(B3v, u_i)
            su_buf[_SU_Y_OUT, s] = jnp.stack(ys)
            su_buf[_SU_Z_OUT, s] = jnp.stack(zs)
            sx_buf[_SX_G_OUT, s] = jnp.stack(gs)
            sx_buf[_SX_V_OUT, s] = jnp.stack(vs)
            if final:
                su_buf[_SU_U_OUT, s] = jnp.stack(us)
                sx_buf[_SX_X_OUT, s] = jnp.stack(xs)
                return x, ax, av, au, az
            return x

        return compute

    def bwd_compute(b, s, p):
        """Backward gradient recursion (admm.cpp:15-22, coeff_d2p dropped as
        there) with r/q rebuilt from the streamed post-dual-update iterates
        (admm.cpp:80-82) and the terminal costate refresh (:83-84) on the
        first processed block; per-instance rho rows. Block-level IO as in
        make_fwd."""
        yin_blk = su_buf[_SU_Y_IN, s]
        zin_blk = su_buf[_SU_Z_IN, s]
        gin_blk = sx_buf[_SX_G_IN, s]
        vin_blk = sx_buf[_SX_V_IN, s]
        qc_blk = sx_buf[_SX_QC_IN, s]
        is_last_block = (b == NBL - 1).astype(f32)
        p_term = pterm_ref[:] - rho_x * (vin_blk[Kb - 1] - gin_blk[Kb - 1])
        p = is_last_block * p_term + (1.0 - is_last_block) * p
        ds = [None] * Kb
        for i in reversed(range(Kb)):
            gi = b * Kb + i
            w = (gi < N - 1).astype(f32)
            r_i = -rho_u * (zin_blk[i] - yin_blk[i])
            q_i = qc_blk[i] - rho_x * (vin_blk[i] - gin_blk[i])
            ds[i] = _dotb(Quu3v, _dotb(Bt3v, p) + r_i) * w
            p_new = q_i + _dotb(M3v, p) - _dotb(Kt3v, r_i)
            p = w * p_new + (1.0 - w) * p
        su_buf[_SU_D_OUT, s] = jnp.stack(ds)
        return p

    bwd_ins = [
        (dma_su, _SU_Y_IN, _IN_Y, y_hbm),
        (dma_su, _SU_Z_IN, _IN_Z, z_hbm),
        (dma_sx, _SX_G_IN, _IN_G, g_hbm),
        (dma_sx, _SX_V_IN, _IN_V, v_hbm),
        (dma_sx, _SX_QC_IN, _IN_QC, qc_ref),
    ]
    bwd_outs = [(dma_su, _SU_D_OUT, _OUT_D, d_hbm)]

    x0 = x0_ref[:]
    zx = x0 * 0.0

    def iter_body(_, k):
        phase(fwd_ins, fwd_outs, make_fwd(final=False), x0, reverse=False)
        phase(bwd_ins, bwd_outs, bwd_compute, zx, reverse=True)
        return k

    jax.lax.fori_loop(0, max_iter - 1, iter_body, 0)

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

    # Final-iteration residuals (admm.cpp:95-98), per-instance rho scaling.
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    rho1 = rho_x[0:1, :]
    p_s = jnp.max(ax, axis=0, keepdims=True)
    d_s = rho1 * jnp.max(av, axis=0, keepdims=True)
    p_u = jnp.max(au, axis=0, keepdims=True)
    d_u = rho1 * jnp.max(az, axis=0, keepdims=True)
    stats_ref[0] = (
        (lane == 0).astype(f32) * float(max_iter)
        + (lane == 2) * p_s + (lane == 3) * d_s
        + (lane == 4) * p_u + (lane == 5) * d_u
    ).astype(f32)


def _kernel_adaptive(
    tol_ref, x0_ref,
    a3, b3, k3, kt3, quu3, bt3, m3,
    umin_ref, umax_ref, xmin_ref, xmax_ref,
    pterm_ref, rhou_ref, rhox_ref,
    qc_ref, *rest,
    max_iter: int, check_every: int, Kb: int, N: int,
    en_ib: bool, en_sb: bool,
    ucones: tuple = (), xcones: tuple = (), has_cparams: bool = False,
    has_cmasks: bool = False, SX: int = 0, SU: int = 0,
    kb_bounds: bool = False,
):
    """Adaptive (per-instance early-termination) heterogeneous streaming
    solve: the streaming parent's adaptive structure
    (stream_admm._kernel_adaptive — masked HBM write-back freeze, slack
    save deferred into the backward phase via zs/vs scratch, per-tile
    while_loop early exit; reference early-exit dataflow
    admm.cpp:91-109,135-144) with this kernel's per-lane VPU recurrences,
    resident per-instance operands/rho and block-level IO (per-knot value
    masking, whole-block ref accesses)."""
    i = 0
    cp_ref = rest[i] if has_cparams else None
    i += 1 if has_cparams else 0
    cm_ref = rest[i] if has_cmasks else None
    i += 1 if has_cmasks else 0
    if kb_bounds:
        uminK, umaxK, xminK, xmaxK = rest[i:i + 4]
        i += 4
    else:
        uminK = umaxK = xminK = xmaxK = None
    (d_in, y_in, g_in, z_in, v_in, U_in, X_in,
     d_hbm, y_hbm, g_hbm, z_hbm, v_hbm, U_hbm, X_hbm, zs_hbm, vs_hbm,
     stats_ref, su_buf, sx_buf, sems_in, sems_out) = rest[i:]
    del d_in, y_in, g_in, z_in, v_in, U_in, X_in
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
    t = pl.program_id(0)
    NBL = N // Kb
    f32 = jnp.float32
    pri_tol = tol_ref[0, 0]
    dua_tol = tol_ref[0, 1]
    A3v, B3v, K3v = a3[:], b3[:], k3[:]
    Kt3v, Quu3v, Bt3v, M3v = kt3[:], quu3[:], bt3[:], m3[:]
    rho_u = rhou_ref[:]
    rho_x = rhox_ref[:]
    rho8 = jnp.concatenate([rho_x[0:1, :]] * 8, axis=0)  # per-lane rho
    dma_su, dma_sx, phase = _make_streamer(
        t, Kb, NBL, (), su_buf, sx_buf, sems_in, sems_out
    )

    def apply_cones(a, cone_list, params, masks):
        for c, cone in enumerate(cone_list):
            mu = sh = None
            if params is not None:
                mu, sh = params[c]
            if masks is not None:
                bm, am = masks[c]
                a = _project_soc_seg_masked(
                    a, a.shape[0], bm, am,
                    float(cone.mu) if mu is None else mu,
                    float(cone.shift) if sh is None else sh,
                )
            else:
                a = _project_soc_seg(a, a.shape[0], a.shape[0], cone,
                                     mu=mu, shift=sh)
        return a

    def clip_u(a, lo=None, hi=None):
        if en_ib:
            a = jnp.clip(a, umin_ref[:] if lo is None else lo,
                         umax_ref[:] if hi is None else hi)
        return apply_cones(a, ucones, uparams, umasks)

    def clip_x(a, lo=None, hi=None):
        if en_sb:
            a = jnp.clip(a, xmin_ref[:] if lo is None else lo,
                         xmax_ref[:] if hi is None else hi)
        return apply_cones(a, xcones, xparams, xmasks)

    def exp_u(m8):
        return jnp.concatenate([m8] * (SU // 8), axis=0)

    def exp_x(m8):
        return jnp.concatenate([m8] * (SX // 8), axis=0)

    def red8(a):
        r = jnp.max(a, axis=0, keepdims=True)
        return jnp.concatenate([r] * 8, axis=0)

    def pick(m, a, b):
        return a * m + b * (1.0 - m)

    x0 = x0_ref[:]
    zx = x0 * 0.0
    zu = umin_ref[:] * 0.0
    z8 = zx[:8]

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
        act_u = exp_u(act8)
        act_x = exp_x(act8)

        def compute(b, s, carry):
            if check:
                x, ax, av, au, az = carry
            else:
                x = carry
            d_blk = su_buf[_A_SU_D_IN, s]
            yin_blk = su_buf[_A_SU_Y_IN, s]
            gin_blk = sx_buf[_A_SX_G_IN, s]
            if kb_bounds:
                uminB, umaxB = su_buf[_A_SU_UMIN, s], su_buf[_A_SU_UMAX, s]
                xminB, xmaxB = sx_buf[_A_SX_XMIN, s], sx_buf[_A_SX_XMAX, s]
            if check:
                zin_blk = su_buf[_A_SU_Z_IN, s]
                vin_blk = sx_buf[_A_SX_V_IN, s]
                uin_blk = su_buf[_A_SU_U_IN, s]
                xin_blk = sx_buf[_A_SX_X_IN, s]
            ys, zss, gs, vss, us, xs = [], [], [], [], [], []
            for i in range(Kb):
                gi = b * Kb + i
                w = (gi < N - 1).astype(f32)
                u_i = -_dotb(K3v, x) - d_blk[i]
                su = u_i + yin_blk[i]
                zn = (clip_u(su, uminB[i], umaxB[i]) if kb_bounds
                      else clip_u(su))
                ys.append(pick(act_u, (su - zn) * w, yin_blk[i]))
                zss.append(zn * w)
                tx = x + gin_blk[i]
                vn = (clip_x(tx, xminB[i], xmaxB[i]) if kb_bounds
                      else clip_x(tx))
                gs.append(pick(act_x, tx - vn, gin_blk[i]))
                vss.append(vn)
                if check:
                    us.append(pick(act_u, u_i * w, uin_blk[i]))
                    xs.append(pick(act_x, x, xin_blk[i]))
                    ax = jnp.maximum(ax, jnp.abs(x - vn))
                    av = jnp.maximum(av, jnp.abs(vin_blk[i] - vn))
                    au = jnp.maximum(au, jnp.abs(u_i - zn) * w)
                    az = jnp.maximum(az, jnp.abs(zin_blk[i] - zn * w))
                x = _dotb(A3v, x) + _dotb(B3v, u_i)
            su_buf[_A_SU_Y_OUT, s] = jnp.stack(ys)
            su_buf[_A_SU_ZS, s] = jnp.stack(zss)
            sx_buf[_A_SX_G_OUT, s] = jnp.stack(gs)
            sx_buf[_A_SX_VS, s] = jnp.stack(vss)
            if check:
                su_buf[_A_SU_MISC, s] = jnp.stack(us)
                sx_buf[_A_SX_X_OUT, s] = jnp.stack(xs)
                return x, ax, av, au, az
            return x

        return compute

    def make_bwd(act8):
        act_u = exp_u(act8)
        act_x = exp_x(act8)

        def compute(b, s, p):
            dold_blk = su_buf[_A_SU_D_IN, s]
            yin_blk = su_buf[_A_SU_Y_IN, s]
            zold_blk = su_buf[_A_SU_Z_IN, s]
            zs_blk = su_buf[_A_SU_ZS, s]
            gin_blk = sx_buf[_A_SX_G_IN, s]
            vold_blk = sx_buf[_A_SX_V_IN, s]
            vs_blk = sx_buf[_A_SX_VS, s]
            qc_blk = sx_buf[_A_SX_QC_IN, s]
            is_last_block = (b == NBL - 1).astype(f32)
            p_term = pterm_ref[:] - rho_x * (vs_blk[Kb - 1] - gin_blk[Kb - 1])
            p = is_last_block * p_term + (1.0 - is_last_block) * p
            ds = [None] * Kb
            zouts = [None] * Kb
            vouts = [None] * Kb
            for i in reversed(range(Kb)):
                gi = b * Kb + i
                w = (gi < N - 1).astype(f32)
                r_i = -rho_u * (zs_blk[i] - yin_blk[i])
                q_i = qc_blk[i] - rho_x * (vs_blk[i] - gin_blk[i])
                d_new = _dotb(Quu3v, _dotb(Bt3v, p) + r_i) * w
                ds[i] = pick(act_u, d_new, dold_blk[i])
                zouts[i] = pick(act_u, zs_blk[i], zold_blk[i])
                vouts[i] = pick(act_x, vs_blk[i], vold_blk[i])
                p_new = q_i + _dotb(M3v, p) - _dotb(Kt3v, r_i)
                p = w * p_new + (1.0 - w) * p
            su_buf[_A_SU_D_OUT, s] = jnp.stack(ds)
            su_buf[_A_SU_Z_OUT, s] = jnp.stack(zouts)
            sx_buf[_A_SX_V_OUT, s] = jnp.stack(vouts)
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
        n_plain = jnp.minimum(
            check_every - jnp.remainder(k, check_every), max_iter - k
        ) - 1
        fwd_plain = make_fwd(act8, check=False)
        bwd_pre = make_bwd(act8)

        def plain_body(_, c):
            phase(fwd_ins_plain, fwd_outs_plain, fwd_plain, x0,
                  reverse=False)
            phase(bwd_ins, bwd_outs, bwd_pre, zx, reverse=True)
            return c

        jax.lax.fori_loop(0, n_plain, plain_body, 0)
        kc = k + n_plain + 1
        _x, ax, av, au, az = phase(
            fwd_ins_check, fwd_outs_check, make_fwd(act8, check=True),
            (x0, zx, zx, zu, zu), reverse=False,
        )
        is_check = (jnp.remainder(kc, check_every) == 0).astype(f32)
        ps8 = red8(ax)
        ds8 = rho8 * red8(av)
        pu8 = red8(au)
        du8 = rho8 * red8(az)
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


def hstream_solve(
    x0: jax.Array,
    carry: StreamCarry,
    hsp: HStreamProblem,
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
    cone_params: jax.Array | None = None,
    cone_masks: jax.Array | None = None,
) -> StreamResult:
    """Heterogeneous-plant solve at streaming horizons.

    ``x0 (B, nx)``; ``carry`` the packed warm-start iterates
    (:class:`..ops.stream_admm.StreamCarry`, same layout). Per-instance
    semantics match :func:`..solver.admm.solve` stage for stage (reference:
    src/tinympc/admm.cpp:111-152). ``cones`` is a
    static ConeSet (the same in-kernel VPU projection as both parent
    kernels); ``cone_params`` / ``cone_masks`` override the cones'
    mu/shift and ball/axis geometry per instance — the hetero kernel's
    lane-packed operands (:func:`.hetero_admm.pad_hetero_cone_params` /
    ``pad_hetero_cone_masks``), resident per tile, so heterogeneous
    constraint geometry costs nothing per iteration.

    ``check_termination == 0`` runs the deterministic fixed-iteration
    kernel; ``> 0`` the adaptive kernel (:func:`_kernel_adaptive`) with
    per-instance convergence freezing every that many iterations (the
    streaming parent's masked-write-back design; stats row 0 = per-instance
    iteration count, row 1 = solved flag; per-tile while_loop early exit)."""
    nx, nu, N = hsp.dims
    SX, SU = hsp.SX, hsp.SU
    B = x0.shape[0]
    NT = carry.d.shape[0]
    if NT * LANES < B:
        raise ValueError(f"carry holds {NT * LANES} instances < batch {B}")
    if NT != hsp.tiles:
        raise ValueError(
            f"carry tiles ({NT}) != problem tiles ({hsp.tiles})"
        )
    # Cap the block so one streamed buffer stays <= KB_SUBLANE_CAP sublanes
    # (Kb * max(SX, SU) <= 256). Above that, interpret-mode runs of this
    # kernel show a small knot-block-dependent result drift once the
    # iteration fori_loop wraps the phases (isolated empirically: exact to
    # 1e-15 below the cap and at max_iter=1 above it; the shared-plant
    # parent kernel with identical DMA machinery is immune, so per-lane
    # operand count x giant unrolled graphs is implicated, not the phase
    # logic). tools/tpu_check_hstream.py re-checks block invariance on the
    # real chip (monkeypatch KB_SUBLANE_CAP to probe above it). Blocks this
    # size already amortize DMA latency fine.
    cap = KB_SUBLANE_CAP
    if check_termination > 0:
        # The adaptive kernel's onset of the interpret-mode reassociation
        # anomaly (see the cap comment above) is one octave earlier — its
        # graphs are larger. Measured (f64 1-iteration adaptive-vs-fixed
        # carry diffs): ulp-level 4e-14 at Kb*S=128, 1000x that (8e-11) at
        # Kb*S>=256; at f32 on hard transients the amplified noise (0.07)
        # swamps the termination tolerances. Logic is exact (f64 + on-chip
        # bit checks); cap at 128 sublanes uniformly so interpret and chip
        # run the same block structure.
        cap = KB_SUBLANE_CAP // 2
    Kb = max(1, min(knot_block, N, cap // max(SX, SU)))
    while N % Kb:
        Kb -= 1

    x0p = _lane_pack_vec(jnp.asarray(x0, hsp.A3.dtype), SX, NT)

    grid = (NT,)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)

    def spec3(r_in, r_out):
        return pl.BlockSpec((r_in, r_out, LANES), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    has_cp = cone_params is not None
    has_cm = cone_masks is not None
    if (has_cp or has_cm) and cones is None:
        raise ValueError("cone_params/cone_masks without cones")
    n_cones = (
        len(cones.input_cones) + len(cones.state_cones)
        if cones is not None else 0
    )
    cp_args: tuple = ()
    cp_specs: list = []
    if has_cp:
        cp_args += (cone_params,)
        cp_specs += [spec(n_cones * 8)]
    if has_cm:
        mr = (2 * SU * len(cones.input_cones)
              + 2 * SX * len(cones.state_cones))
        cp_args += (cone_masks,)
        cp_specs += [spec(mr)]
    adaptive = check_termination > 0
    if adaptive and max_iter < 1:
        raise ValueError("adaptive hstream solve needs max_iter >= 1")
    cdtype = carry.d.dtype
    kb_bounds = hsp.has_knot_bounds
    bound_args = (
        (hsp.u_min_k, hsp.u_max_k, hsp.x_min_k, hsp.x_max_k)
        if kb_bounds else ()
    )
    in_specs = ([
        pl.BlockSpec((1, 2), lambda t: (0, 0), memory_space=pltpu.SMEM)
    ] if adaptive else []) + [
        spec(SX),                                    # x0
        spec3(SX, SX), spec3(SU, SX), spec3(SX, SU), spec3(SU, SX),
        spec3(SU, SU), spec3(SX, SU), spec3(SX, SX),
        spec(SU), spec(SU), spec(SX), spec(SX),      # bounds
        spec(SX), spec(SU), spec(SX),                # pterm, rho_u, rho_x
        any_spec,                                    # qc
    ] + cp_specs + [any_spec] * len(bound_args) \
      + [any_spec] * (7 if adaptive else 5)          # d y g z v (U X)
    out_specs = [any_spec] * (9 if adaptive else 7) + [
        pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    out_shape = [
        jax.ShapeDtypeStruct(carry.d.shape, carry.d.dtype),
        jax.ShapeDtypeStruct(carry.y.shape, carry.y.dtype),
        jax.ShapeDtypeStruct(carry.g.shape, carry.g.dtype),
        jax.ShapeDtypeStruct(carry.z.shape, carry.z.dtype),
        jax.ShapeDtypeStruct(carry.v.shape, carry.v.dtype),
        jax.ShapeDtypeStruct((NT, N, SU, LANES), cdtype),       # U
        jax.ShapeDtypeStruct((NT, N, SX, LANES), cdtype),       # X
    ] + ([
        jax.ShapeDtypeStruct((NT, N, SU, LANES), cdtype),       # zs scratch
        jax.ShapeDtypeStruct((NT, N, SX, LANES), cdtype),       # vs scratch
    ] if adaptive else []) + [
        jax.ShapeDtypeStruct((NT, 8, LANES), jnp.float32),      # stats
    ]
    kb2 = 2 if kb_bounds else 0
    scratch = [
        pltpu.VMEM(((7 if adaptive else 6) + kb2, 2, Kb, SU, LANES), cdtype),
        pltpu.VMEM(((7 if adaptive else 5) + kb2, 2, Kb, SX, LANES), cdtype),
        pltpu.SemaphoreType.DMA(
            ((14 if adaptive else 10) if kb_bounds
             else (10 if adaptive else 6), 2)
        ),
        pltpu.SemaphoreType.DMA((9 if adaptive else 7, 2)),
    ]
    cone_kw = dict(
        ucones=tuple(cones.input_cones) if cones is not None else (),
        xcones=tuple(cones.state_cones) if cones is not None else (),
        has_cparams=has_cp, has_cmasks=has_cm, SX=SX, SU=SU,
        kb_bounds=kb_bounds,
    )
    if adaptive:
        kernel = functools.partial(
            _kernel_adaptive, max_iter=max_iter,
            check_every=check_termination, Kb=Kb, N=N,
            en_ib=en_input_bound, en_sb=en_state_bound, **cone_kw,
        )
        tols = jnp.stack([
            jnp.asarray(abs_pri_tol, jnp.float32).reshape(()),
            jnp.asarray(abs_dua_tol, jnp.float32).reshape(()),
        ]).reshape(1, 2)
        scalar_args: tuple = (tols,)
        extra_args: tuple = (
            jnp.zeros((NT, N, SU, LANES), cdtype),   # U0 (aliased)
            jnp.zeros((NT, N, SX, LANES), cdtype),   # X0 (aliased)
        )
        aliases = {
            17 + len(cp_args) + len(bound_args) + k: k for k in range(7)
        }
    else:
        kernel = functools.partial(
            _kernel, max_iter=max_iter, Kb=Kb, N=N,
            en_ib=en_input_bound, en_sb=en_state_bound, **cone_kw,
        )
        scalar_args = ()
        extra_args = ()
        aliases = {
            16 + len(cp_args) + len(bound_args) + k: k for k in range(5)
        }
    su_b, sx_b = N * SU * LANES * 4, N * SX * LANES * 4
    per_iter = NT * (4 * su_b + 2 * sx_b + 3 * sx_b + 2 * su_b)
    # Per-lane VPU matvec flops per knot (2x SX^2 for A/AmBKt, 4x SX*SU for
    # K/B/Bt/Kt, SU^2 for Quu_inv), utils/profiling.hstream_cost mirrors.
    flops_knot = 2 * (2 * SX * SX + 4 * SX * SU + SU * SU)
    cost = pl.CostEstimate(
        flops=N * LANES * NT * max_iter * flops_knot,
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
        input_output_aliases=aliases,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True,
        ),
        interpret=interpret,
    )(
        *scalar_args,
        x0p,
        hsp.A3, hsp.B3, hsp.K3, hsp.Kt3, hsp.Quu3, hsp.Bt3, hsp.M3,
        hsp.u_min, hsp.u_max, hsp.x_min, hsp.x_max,
        hsp.pterm, hsp.rho_u, hsp.rho_x,
        hsp.qc, *cp_args, *bound_args,
        carry.d, carry.y, carry.g, carry.z, carry.v,
        *extra_args,
    )
    if adaptive:
        d, y, g, z, v, Up, Xp, _zs, _vs, stats_p = outs
    else:
        d, y, g, z, v, Up, Xp, stats_p = outs
    return StreamResult(
        U=_unpack(Up, B, nu)[:, : N - 1],
        X=_unpack(Xp, B, nx),
        carry=StreamCarry(d=d, y=y, g=g, z=z, v=v),
        stats=stats_p.transpose(0, 2, 1).reshape(NT * LANES, 8)[:B],
    )
