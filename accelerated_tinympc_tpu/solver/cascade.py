"""Early-termination compaction cascade over the fused adaptive kernel.

The adaptive fused kernel freezes converged instances in place: their SIMD
lanes keep executing full iterations and the results are masked out at the
end (ops/fused_admm.py ``_kernel_adaptive``).  That is semantically exact but
means one straggler pins every lane of its dispatch at ``max_iter`` cost —
the reference has the same all-or-nothing structure per solve, just with a
batch of one (reference: src/tinympc/admm.cpp:117-152, the loop either exits
for *the* problem or runs on).

:func:`cascade_solve` reclaims that compute at the dispatch level, where TPU
static shapes allow it: run the kernel ``segment_iters`` iterations at a
time, pull converged instances out of the batch between segments, and
re-dispatch only the survivors, compacted into power-of-two buckets (each
bucket size compiles once; the pow-2 ladder bounds the number of kernel
variants at log2(B)).  Because the kernel's whole loop state is the
:class:`..ops.fused_admm.FusedCarry` (the per-iteration map consumes only
D/Y/G, with Z/V entering residuals alone) and checks fire at in-call
iteration multiples of ``check_termination``, a segment boundary at a
multiple of the check interval is invisible to the iterate sequence: the
cascade is *iteration-exact* against one long adaptive call — same iteration
counts, same convergence flags, same check schedule (tests/test_cascade.py).
Iterate values are bit-identical at ``pack=1``; with lane-packed instances
(g > 1) compaction can move an instance to a different slot within its
128-lane row, which regroups the partial sums of its own dot-product terms
and rounds differently — a few f32 ulp on the iterates.  That can only
alter scheduling if a residual sits within an ulp of the tolerance at a
check (the same knife-edge on which any reordering — retiling, resharding —
already sits).

Cost model: one long call costs ``B * max_iter`` lane-iterations; the
cascade costs ``sum_s bucket_s * segment_iters`` plus exactly three device
round-trips per segment (kernel dispatch; jitted scatter-into-output +
solved-flag readback; jitted compaction gather) and one compile per new
bucket size.  Results land in preallocated output buffers via per-segment
donated scatters — there is no final assembly pass, so the per-solve
overhead stays flat as segments accumulate.  On workloads where most
instances converge early (warm-started MPC re-solves, mixed-difficulty
sweeps) the reclaimed tail dominates; for tightly-clustered convergence use
one plain :func:`..ops.fused_admm.fused_solve` call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fused_admm import (
    DEFAULT_BATCH_TILE,
    FusedCarry,
    FusedResult,
    PaddedProblem,
    fused_solve,
)

__all__ = ["cascade_solve"]


def _next_pow2(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


@functools.lru_cache(maxsize=64)
def _jit_segment(seg_iters, check_every, batch_tile, warmup, interpret, algo):
    """One compiled cascade segment per (bucket shape enters via tracing)."""

    def fn(x0, carry, pp, pri_tol, dua_tol, xref_q, pterm_c, cone_ops,
           cone_mu_u=None, cone_shift_u=None,
           cone_mu_x=None, cone_shift_x=None):
        return fused_solve(
            x0, carry, pp, max_iter=seg_iters,
            check_termination=check_every,
            abs_pri_tol=pri_tol, abs_dua_tol=dua_tol,
            batch_tile=batch_tile, warmup_iters=warmup,
            interpret=interpret, xref_q=xref_q, pterm_c=pterm_c, algo=algo,
            cone_ops=cone_ops,
            cone_mu_u=cone_mu_u, cone_shift_u=cone_shift_u,
            cone_mu_x=cone_mu_x, cone_shift_x=cone_shift_x,
        )

    # The Pallas interpreter rejects jit-of-pallas on CPU; eager is fine
    # there (tests only) — same policy as api/solver._jit_fused.
    return fn if interpret else jax.jit(fn)


@functools.lru_cache(maxsize=2)
def _jit_compact(interpret):
    """Gather the surviving instances' x0/carry into the next bucket in one
    dispatch (jit retraces per (in-shape, out-shape) pair automatically)."""

    def fn(x0_b, carry, loc):
        return x0_b[loc], jax.tree.map(lambda a: a[loc], carry)

    return fn if interpret else jax.jit(fn)


@functools.lru_cache(maxsize=2)
def _jit_compact_cols(interpret):
    """Gather surviving instances out of per-instance column operands
    ((nc, B_local) cone parameter rows) alongside :func:`_jit_compact`."""

    def fn(arr, loc):
        return arr[:, loc]

    return fn if interpret else jax.jit(fn)


@functools.lru_cache(maxsize=2)
def _jit_scatter(interpret):
    """Scatter one segment's full result rows into the (B+1)-row output
    buffers at their original batch indices (padding rows target row B, the
    discard slot) and hand back the solved-flag column for host bucket
    sizing.  One dispatch per segment; buffers are donated so the update is
    in place on device.  Later segments overwrite the rows that kept
    iterating, so segment order gives last-write-wins assembly for free."""

    def fn(out, res, idx, off):
        rows = (res.U, res.X, res.stats.at[:, 0].add(off)) + tuple(res.carry)
        out = tuple(
            buf.at[idx].set(r) for buf, r in zip(out, rows)
        )
        return out, res.stats[:, 1]

    return fn if interpret else jax.jit(fn, donate_argnums=0)


@functools.lru_cache(maxsize=2)
def _jit_scatter_init(interpret):
    """First-segment variant of :func:`_jit_scatter`: creates the zeroed
    (B+1)-row buffers inside the same dispatch (XLA fuses the zero-fill
    into the scatter), saving the per-leaf eager allocations."""

    def fn(res, idx, B, off):
        rows = (res.U, res.X, res.stats.at[:, 0].add(off)) + tuple(res.carry)
        out = tuple(
            jnp.zeros((B + 1, r.shape[1]), r.dtype).at[idx].set(r)
            for r in rows
        )
        return out, res.stats[:, 1]

    return fn if interpret else jax.jit(fn, static_argnums=2)


@functools.lru_cache(maxsize=2)
def _jit_finalize(interpret):
    """Drop the discard row from every output buffer in one dispatch."""

    def fn(out, B):
        return tuple(a[:B] for a in out)

    return fn if interpret else jax.jit(fn, static_argnums=1)


def cascade_solve(
    x0: jax.Array,
    carry: FusedCarry,
    pp: PaddedProblem,
    *,
    max_iter: int = 100,
    check_termination: int = 1,
    segment_iters: int | None = None,
    segment_growth: float = 4.0,
    abs_pri_tol: float = 1e-3,
    abs_dua_tol: float = 1e-3,
    batch_tile: int = DEFAULT_BATCH_TILE,
    min_bucket: int | None = None,
    warmup_iters: int = 0,
    interpret: bool = False,
    xref_q: jax.Array | None = None,
    pterm_c: jax.Array | None = None,
    cone_ops=None,
    cone_mu_u=None,
    cone_shift_u=None,
    cone_mu_x=None,
    cone_shift_x=None,
    algo: str = "f32",
) -> FusedResult:
    """Adaptive fused solve with between-segment batch compaction.

    Drop-in equivalent of ``fused_solve(..., check_termination>0)`` — same
    arguments, same :class:`FusedResult` (full original batch order) — but
    converged instances stop consuming lanes at the next segment boundary.

    ``segment_iters`` (default: ~25, rounded to a multiple of
    ``check_termination``) must be a multiple of ``check_termination`` so the
    in-call check schedule composes to the single-call schedule.  Segments
    grow geometrically by ``segment_growth`` (rounded to check multiples):
    the survivors of each compaction are the hard instances, which converge
    rarely — longer late segments trade (useless) compaction opportunities
    for fewer dispatches, which matters when per-dispatch latency is
    non-trivial (a remote-attached TPU pays ~ms per dispatch; measured at
    batch 262k: growth 2 -> 696k, 4 -> 763k, 8 -> 803k solves/s — the
    default 4 is near the plateau; use lower growth on locally-attached
    chips where dispatches are cheap).
    ``warmup_iters`` applies to the first segment only.  This is a host-side
    orchestration loop (one device sync per segment) — not jittable; call it
    from the MPC outer loop, not inside one.
    ``algo`` threads through to every segment's :func:`fused_solve`
    (``"bf16x3"`` = bf16x3 between-check iterations, f32 checks — exact
    residual guarantees, iteration schedule no longer bit-matched to scan).
    """
    if check_termination <= 0:
        raise ValueError(
            "cascade_solve requires adaptive mode (check_termination > 0); "
            "fixed-iteration solves cannot converge early"
        )
    if segment_iters is None:
        segment_iters = check_termination * max(
            1, round(25 / check_termination)
        )
    if segment_iters % check_termination != 0:
        raise ValueError(
            f"segment_iters ({segment_iters}) must be a multiple of "
            f"check_termination ({check_termination}) so the check schedule "
            "matches a single adaptive call"
        )
    if warmup_iters >= segment_iters:
        raise ValueError("warmup_iters must be < segment_iters")
    if segment_growth < 1.0:
        raise ValueError("segment_growth must be >= 1.0")

    B = x0.shape[0]
    if min_bucket is None:
        min_bucket = min(batch_tile, B)

    if max_iter <= segment_iters:
        return fused_solve(
            x0, carry, pp, max_iter=max_iter,
            check_termination=check_termination,
            abs_pri_tol=abs_pri_tol, abs_dua_tol=abs_dua_tol,
            batch_tile=batch_tile, warmup_iters=warmup_iters,
            interpret=interpret, xref_q=xref_q, pterm_c=pterm_c,
            cone_ops=cone_ops, algo=algo,
            cone_mu_u=cone_mu_u, cone_shift_u=cone_shift_u,
            cone_mu_x=cone_mu_x, cone_shift_x=cone_shift_x,
        )

    pri = jnp.float32(abs_pri_tol)
    dua = jnp.float32(abs_dua_tol)

    # Current active block: device arrays of `bucket` rows whose first
    # `n_active` rows are live instances (rest are duplicate padding), plus
    # the host-side map from local row -> original batch index.  Per segment
    # the device traffic is exactly three round-trips: the kernel call, one
    # jitted scatter of the segment's rows into the (B+1)-row output buffers
    # (returning the solved column for bucket sizing — padding rows scatter
    # to the discard row B), and one jitted compaction gather.  Iteration
    # counts compose as offset + in-segment value under last-write-wins
    # (unsolved lanes report the segment's full length, so offsets
    # telescope across overwrites).
    active_idx = np.arange(B, dtype=np.int32)
    x0_b, carry_b = x0, carry
    asf32 = lambda a: (None if a is None
                       else jnp.asarray(a, jnp.float32))
    cmu_u, csh_u = asf32(cone_mu_u), asf32(cone_shift_u)
    cmu_x, csh_x = asf32(cone_mu_x), asf32(cone_shift_x)
    done_iters = 0
    cur_seg = segment_iters
    compact = _jit_compact(interpret)
    compact_cols = _jit_compact_cols(interpret)
    scatter = _jit_scatter(interpret)
    out = None

    while True:
        n_active = active_idx.size
        k = min(cur_seg, max_iter - done_iters)
        seg = _jit_segment(
            k, check_termination, batch_tile,
            warmup_iters if done_iters == 0 else 0, interpret, algo,
        )
        res = seg(x0_b, carry_b, pp, pri, dua, xref_q, pterm_c, cone_ops,
                  cmu_u, csh_u, cmu_x, csh_x)
        idx = np.full(res.stats.shape[0], B, np.int32)
        idx[:n_active] = active_idx
        if out is None:
            # Row B is the discard slot for padding rows.
            out, solved_col = _jit_scatter_init(interpret)(
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
        # Geometric segment growth, kept on the check-interval grid (any
        # multiple-of-check segmentation preserves the global schedule).
        cur_seg = max(
            check_termination,
            int(cur_seg * segment_growth)
            // check_termination * check_termination,
        )
        active_idx = active_idx[keep]
        bucket = min(B, max(min_bucket, _next_pow2(keep.size)))
        local = np.concatenate([
            keep, np.full(bucket - keep.size, keep[-1], keep.dtype),
        ])
        local_j = jnp.asarray(local)
        x0_b, carry_b = compact(x0_b, res.carry, local_j)
        cmu_u, csh_u, cmu_x, csh_x = (
            None if a is None else compact_cols(a, local_j)
            for a in (cmu_u, csh_u, cmu_x, csh_x)
        )

    # Drop the discard row; outputs are already in original batch order.
    out = _jit_finalize(interpret)(out, B)
    return FusedResult(
        U=out[0], X=out[1], carry=FusedCarry(*out[3:]), stats=out[2],
    )


# ---------------------------------------------------------------- hetero ----

@functools.lru_cache(maxsize=2)
def _jit_hetero_scatter(interpret):
    """Hetero-tier segment scatter: unpack the lane-packed carry to
    batch-leading rows and scatter carry+results into the (B+1)-row output
    buffers (row B discards padding); returns the solved column."""
    from ..ops.hetero_admm import _unpack_rows

    def fn(out, res, idx, off, dims):
        nx, nu, N = dims
        m = N - 1
        from ..ops.hetero_admm import _pad8

        SX, SU = _pad8(nx), _pad8(nu)
        rows = (
            res.U, res.X, res.stats.at[:, 0].add(off),
            _unpack_rows(res.carry.d, m * SU),
            _unpack_rows(res.carry.y, m * SU),
            _unpack_rows(res.carry.g, N * SX),
            _unpack_rows(res.carry.z, m * SU),
            _unpack_rows(res.carry.v, N * SX),
        )
        n = idx.shape[0]
        out = tuple(
            buf.at[idx].set(r[:n]) for buf, r in zip(out, rows)
        )
        return out, res.stats[:, 1]

    if interpret:
        return fn
    return jax.jit(fn, donate_argnums=0, static_argnums=4)


@functools.lru_cache(maxsize=2)
def _jit_hetero_init(interpret):
    from ..ops.hetero_admm import _pad8, _unpack_rows

    def fn(res, idx, B, off, dims):
        nx, nu, N = dims
        m = N - 1
        SX, SU = _pad8(nx), _pad8(nu)
        rows = (
            res.U, res.X, res.stats.at[:, 0].add(off),
            _unpack_rows(res.carry.d, m * SU),
            _unpack_rows(res.carry.y, m * SU),
            _unpack_rows(res.carry.g, N * SX),
            _unpack_rows(res.carry.z, m * SU),
            _unpack_rows(res.carry.v, N * SX),
        )
        n = idx.shape[0]
        out = tuple(
            jnp.zeros((B + 1,) + r.shape[1:], r.dtype).at[idx].set(r[:n])
            for r in rows
        )
        return out, res.stats[:, 1]

    return fn if interpret else jax.jit(fn, static_argnums=(2, 4))


@functools.lru_cache(maxsize=2)
def _jit_hetero_gather(interpret):
    from ..ops.hetero_admm import gather_hetero

    fn = gather_hetero
    return fn if interpret else jax.jit(fn)


@functools.lru_cache(maxsize=2)
def _jit_hetero_gather_rows(interpret):
    from ..ops.hetero_admm import gather_hetero_rows

    fn = gather_hetero_rows
    return fn if interpret else jax.jit(fn, static_argnums=(1,))


@functools.lru_cache(maxsize=2)
def _jit_hetero_finalize(interpret):
    """Drop the discard row and re-pack the carry for the full batch in one
    dispatch."""
    from ..ops.hetero_admm import _pad8, _repack_rows

    def fn(out, B, dims):
        nx, nu, N = dims
        m = N - 1
        SX, SU = _pad8(nx), _pad8(nu)
        U, X, stats, d, y, g, z, v = (a[:B] for a in out)
        return U, X, stats, (
            _repack_rows(d, m * SU), _repack_rows(y, m * SU),
            _repack_rows(g, N * SX), _repack_rows(z, m * SU),
            _repack_rows(v, N * SX),
        )

    return fn if interpret else jax.jit(fn, static_argnums=(1, 2))


def hetero_cascade_solve(
    x0: jax.Array,
    carry,
    hp,
    *,
    max_iter: int = 100,
    check_termination: int = 1,
    segment_iters: int | None = None,
    segment_growth: float = 4.0,
    abs_pri_tol: float = 1e-3,
    abs_dua_tol: float = 1e-3,
    min_bucket: int | None = None,
    interpret: bool = False,
    cones=None,
    cone_params=None,
    cone_masks=None,
    en_input_bound: bool = True,
    en_state_bound: bool = True,
):
    """Compaction cascade over the heterogeneous-plant adaptive kernel.

    Default ``segment_growth=4`` (vs the homogeneous cascade's 2): each
    hetero compaction re-packs the survivors' *plant tensors* too
    (~30 ms at 65k instances over the relay), so fewer, longer late
    segments win — measured 1.46x over one adaptive call at B=65536
    (5% stragglers), bit-exact, vs 0.97x at growth 2 (BASELINE.md).

    Same dispatch-level early-termination reclaim as :func:`cascade_solve`
    (which see for the cost model), for batches where every instance carries
    its own plant: between segments the surviving instances — plants,
    carries, x0 — are gathered into a fresh lane packing
    (:func:`..ops.hetero_admm.gather_hetero`) and re-dispatched in
    LANES-multiple pow-2 buckets.  Unlike the lane-packed homogeneous
    kernel, per-lane arithmetic is invariant to the lane an instance sits
    on, so the cascade is **bit-exact** against one long adaptive call —
    schedules and iterates both (tests/test_hetero.py).

    ``cone_params``/``cone_masks`` (the lane-packed per-instance cone
    operands from :func:`..ops.hetero_admm.pad_hetero_cone_params` /
    ``pad_hetero_cone_masks``) are gathered alongside the plant tensors at
    each compaction (:func:`..ops.hetero_admm.gather_hetero_rows`), so
    per-instance constraint geometry stays attached to its instance.

    Returns ``(U, X, stats, carry)`` with the full original batch order;
    ``carry`` is re-packed for the full batch (warm-start ready).
    """
    from ..ops.hetero_admm import (
        LANES, HeteroCarry, _pad8, cone_rows_per_tile, hetero_solve,
    )

    if check_termination <= 0:
        raise ValueError("hetero_cascade_solve requires adaptive mode")
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

    nx, nu, N = hp.dims
    m = N - 1
    SX, SU = _pad8(nx), _pad8(nu)
    B = x0.shape[0]
    if min_bucket is None:
        min_bucket = LANES
    min_bucket = max(LANES, min_bucket)

    def run(x, c, h, k, cp, cm):
        return hetero_solve(
            x, c, h, max_iter=k, check_termination=check_termination,
            abs_pri_tol=abs_pri_tol, abs_dua_tol=abs_dua_tol,
            en_input_bound=en_input_bound, en_state_bound=en_state_bound,
            interpret=interpret, cones=cones,
            cone_params=cp, cone_masks=cm,
        )

    if max_iter <= segment_iters:
        res = run(x0, carry, hp, max_iter, cone_params, cone_masks)
        return res.U, res.X, res.stats, res.carry

    active_idx = np.arange(B, dtype=np.int32)
    x0_b, carry_b, hp_b = x0, carry, hp
    done_iters = 0
    cur_seg = segment_iters
    gather = _jit_hetero_gather(interpret)
    gather_rows = _jit_hetero_gather_rows(interpret)
    scatter = _jit_hetero_scatter(interpret)
    cp_b, cm_b = cone_params, cone_masks
    cp_rows = cm_rows = 0
    if cones is not None and (cp_b is not None or cm_b is not None):
        cp_rows, cm_rows = cone_rows_per_tile(cones, nx, nu)
    out = None
    dims = (nx, nu, N)

    while True:
        n_active = active_idx.size
        k = min(cur_seg, max_iter - done_iters)
        res = run(x0_b, carry_b, hp_b, k, cp_b, cm_b)
        idx = np.full(res.stats.shape[0], B, np.int32)
        idx[:n_active] = active_idx
        if out is None:
            out, solved_col = _jit_hetero_init(interpret)(
                res, jnp.asarray(idx), B, jnp.float32(done_iters), dims
            )
        else:
            out, solved_col = scatter(
                out, res, jnp.asarray(idx), jnp.float32(done_iters), dims
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
        bucket = min(
            -(-B // LANES) * LANES,
            max(min_bucket, _next_pow2(-(-keep.size // LANES)) * LANES),
        )
        local = np.concatenate([
            keep, np.full(bucket - keep.size, keep[-1], keep.dtype),
        ])
        local_j = jnp.asarray(local)
        hp_b, carry_b, x0_b = gather(hp_b, res.carry, x0_b, local_j)
        if cp_b is not None:
            cp_b = gather_rows(cp_b, cp_rows, local_j)
        if cm_b is not None:
            cm_b = gather_rows(cm_b, cm_rows, local_j)

    U, X, stats, packed = _jit_hetero_finalize(interpret)(out, B, dims)
    return U, X, stats, HeteroCarry(
        d=packed[0], y=packed[1], g=packed[2], z=packed[3], v=packed[4],
    )


# ---------------------------------------------------------------- stream ----

def _stream_unpack4(p):
    """(NT, N, S, LANES) -> (NT*LANES, N, S) batch-leading."""
    nt, N, S, L = p.shape
    return p.transpose(0, 3, 1, 2).reshape(nt * L, N, S)


def _stream_repack4(a):
    """(B, N, S) -> (NT, N, S, LANES), batch zero-padded to a lane multiple."""
    Bn, N, S = a.shape
    from ..ops.hetero_admm import LANES

    nt = -(-Bn // LANES)
    out = jnp.zeros((nt * LANES, N, S), a.dtype).at[:Bn].set(a)
    return out.reshape(nt, LANES, N, S).transpose(0, 2, 3, 1)


@functools.lru_cache(maxsize=2)
def _jit_stream_step(interpret):
    """One segment's scatter + convergence flags in one dispatch: solved =
    all four final-iteration residuals under tolerance (the scan tier's
    check predicate, reference admm.cpp:99-105, applied at segment ends)."""

    def fn(out, res, idx, off, pri, dua):
        solved = (
            (res.stats[:, 2] < pri) & (res.stats[:, 4] < pri)
            & (res.stats[:, 3] < dua) & (res.stats[:, 5] < dua)
        )
        stats = res.stats.at[:, 0].set(off).at[:, 1].set(
            solved.astype(jnp.float32)
        )
        rows = (
            res.U, res.X, stats,
            _stream_unpack4(res.carry.d), _stream_unpack4(res.carry.y),
            _stream_unpack4(res.carry.g), _stream_unpack4(res.carry.z),
            _stream_unpack4(res.carry.v),
        )
        n = idx.shape[0]
        out = tuple(
            buf.at[idx].set(r[:n]) for buf, r in zip(out, rows)
        )
        return out, solved

    return fn if interpret else jax.jit(fn, donate_argnums=0)


@functools.lru_cache(maxsize=2)
def _jit_stream_init(interpret):
    def fn(res, idx, B, off, pri, dua):
        solved = (
            (res.stats[:, 2] < pri) & (res.stats[:, 4] < pri)
            & (res.stats[:, 3] < dua) & (res.stats[:, 5] < dua)
        )
        stats = res.stats.at[:, 0].set(off).at[:, 1].set(
            solved.astype(jnp.float32)
        )
        rows = (
            res.U, res.X, stats,
            _stream_unpack4(res.carry.d), _stream_unpack4(res.carry.y),
            _stream_unpack4(res.carry.g), _stream_unpack4(res.carry.z),
            _stream_unpack4(res.carry.v),
        )
        n = idx.shape[0]
        out = tuple(
            jnp.zeros((B + 1,) + r.shape[1:], r.dtype).at[idx].set(r[:n])
            for r in rows
        )
        return out, solved

    return fn if interpret else jax.jit(fn, static_argnums=2)


@functools.lru_cache(maxsize=64)
def _jit_stream_segment(k, knot_block, en_ib, en_sb, interpret, cones,
                        ce=0):
    """One compiled stream segment per (iteration count; bucket shapes key
    the jit cache via tracing). ``ce > 0`` runs the in-kernel adaptive
    variant (per-instance freeze inside the segment; tolerances are traced
    SMEM operands — runtime args, no recompile)."""
    from ..ops.stream_admm import stream_solve

    def fn(x, c, sp, pri, dua):
        return stream_solve(
            x, c, sp, max_iter=k, knot_block=knot_block,
            check_termination=ce, abs_pri_tol=pri, abs_dua_tol=dua,
            en_input_bound=en_ib, en_state_bound=en_sb,
            interpret=interpret, cones=cones,
        )

    return fn if interpret else jax.jit(fn)


@functools.lru_cache(maxsize=2)
def _jit_stream_step_inkernel(interpret):
    """Adaptive-segment scatter: solved flags and per-instance iteration
    counts come from the kernel itself (stats rows 1 / 0, segment-local);
    ``base`` offsets the counts to global iterations."""

    def fn(out, res, idx, base):
        solved = res.stats[:, 1] > 0.5
        stats = res.stats.at[:, 0].add(base)
        rows = (
            res.U, res.X, stats,
            _stream_unpack4(res.carry.d), _stream_unpack4(res.carry.y),
            _stream_unpack4(res.carry.g), _stream_unpack4(res.carry.z),
            _stream_unpack4(res.carry.v),
        )
        n = idx.shape[0]
        out = tuple(
            buf.at[idx].set(r[:n]) for buf, r in zip(out, rows)
        )
        return out, solved

    return fn if interpret else jax.jit(fn, donate_argnums=0)


@functools.lru_cache(maxsize=2)
def _jit_stream_init_inkernel(interpret):
    def fn(res, idx, B, base):
        solved = res.stats[:, 1] > 0.5
        stats = res.stats.at[:, 0].add(base)
        rows = (
            res.U, res.X, stats,
            _stream_unpack4(res.carry.d), _stream_unpack4(res.carry.y),
            _stream_unpack4(res.carry.g), _stream_unpack4(res.carry.z),
            _stream_unpack4(res.carry.v),
        )
        n = idx.shape[0]
        out = tuple(
            jnp.zeros((B + 1,) + r.shape[1:], r.dtype).at[idx].set(r[:n])
            for r in rows
        )
        return out, solved

    return fn if interpret else jax.jit(fn, static_argnums=2)


@functools.lru_cache(maxsize=2)
def _jit_stream_gather(interpret):
    def fn(carry, x0, loc):
        c = jax.tree.map(
            lambda p: _stream_repack4(_stream_unpack4(p)[loc]), carry
        )
        return c, x0[loc]

    return fn if interpret else jax.jit(fn)


@functools.lru_cache(maxsize=2)
def _jit_stream_finalize(interpret):
    def fn(out, B):
        U, X, stats, d, y, g, z, v = (a[:B] for a in out)
        return U, X, stats, tuple(
            _stream_repack4(a) for a in (d, y, g, z, v)
        )

    return fn if interpret else jax.jit(fn, static_argnums=1)


def stream_cascade_solve(
    x0: jax.Array,
    carry,
    sp,
    *,
    max_iter: int = 100,
    segment_iters: int = 25,
    segment_growth: float = 4.0,
    check_termination: int = 0,
    abs_pri_tol: float = 1e-3,
    abs_dua_tol: float = 1e-3,
    knot_block: int = 32,
    min_bucket: int | None = None,
    interpret: bool = False,
    cones=None,
    en_input_bound: bool = True,
    en_state_bound: bool = True,
):
    """Early-termination compaction for the streaming long-horizon tier.

    Two modes:

    * ``check_termination == 0`` (segment-granular): fixed-iteration
      segments, the scan tier's convergence predicate applied to each
      segment's final-iteration residuals (reference: admm.cpp:99-105 at a
      check cadence of ``segment_iters``), converged instances scattered
      out, survivors re-dispatched in pow-2 lane-tile buckets. A converged
      instance's controls equal the fixed-iteration solve at its recorded
      (segment-multiple) count; the returned carry is the slack-saved
      post-backward state (one stage past the reference's early-exit
      freeze — an equally valid warm start, solver/admm.py's notes).
    * ``check_termination > 0`` (in-kernel + compaction — the composition):
      each segment runs the adaptive kernel
      (:func:`..ops.stream_admm._kernel_adaptive`), so instances freeze at
      their exact per-iteration check (reference early exit
      admm.cpp:135-144) *inside* the segment, and the cascade re-packs
      survivors into dense tiles between segments (the in-kernel early
      exit is per 128-lane tile — compaction is what makes it pay when
      convergence is scattered). Semantics equal ONE long adaptive call:
      iteration counts, solved flags, frozen iterates and residual stats
      are the kernel's own. ``segment_iters`` must be a multiple of
      ``check_termination`` (segments check at segment-local cadence, so
      multiples preserve the single-call global schedule).

    Returns ``(U, X, stats, carry)`` in original batch order; stats lane 0 =
    iterations, lane 1 = solved flag, 2-5 = residuals at the exit check
    (in-kernel mode) or the exit segment's final iteration.
    """
    from ..ops.hetero_admm import LANES
    from ..ops.stream_admm import StreamCarry

    if max_iter < 1 or segment_iters < 1:
        raise ValueError("max_iter and segment_iters must be >= 1")
    if segment_growth < 1.0:
        raise ValueError("segment_growth must be >= 1.0")
    ce = int(check_termination)
    if ce > 0 and segment_iters % ce:
        raise ValueError(
            "segment_iters must be a multiple of check_termination so the "
            "segment-local check cadence matches the single-call schedule"
        )
    B = x0.shape[0]
    if min_bucket is None:
        min_bucket = LANES
    min_bucket = max(LANES, min_bucket)
    pri = jnp.float32(abs_pri_tol)
    dua = jnp.float32(abs_dua_tol)

    def run(x, c, k):
        return _jit_stream_segment(
            k, knot_block, en_input_bound, en_state_bound, interpret,
            cones, ce,
        )(x, c, sp, pri, dua)

    active_idx = np.arange(B, dtype=np.int32)
    x0_b, carry_b = x0, carry
    done_iters = 0
    cur_seg = segment_iters
    gather = _jit_stream_gather(interpret)
    step = (_jit_stream_step_inkernel if ce else _jit_stream_step)(interpret)
    init = (_jit_stream_init_inkernel if ce else _jit_stream_init)(interpret)
    out = None

    while True:
        n_active = active_idx.size
        k = min(cur_seg, max_iter - done_iters)
        res = run(x0_b, carry_b, k)
        base = done_iters
        done_iters += k
        idx = np.full(res.stats.shape[0], B, np.int32)
        idx[:n_active] = active_idx
        sargs = ((jnp.float32(base),) if ce
                 else (jnp.float32(done_iters), pri, dua))
        if out is None:
            out, solved_col = init(res, jnp.asarray(idx), B, *sargs)
        else:
            out, solved_col = step(out, res, jnp.asarray(idx), *sargs)
        if done_iters >= max_iter:
            break
        solved = np.asarray(jax.device_get(solved_col))[:n_active]
        keep = np.nonzero(~solved)[0]
        if keep.size == 0:
            break
        cur_seg = int(cur_seg * segment_growth)
        if ce:
            cur_seg = -(-cur_seg // ce) * ce
        active_idx = active_idx[keep]
        bucket = min(
            -(-B // LANES) * LANES,
            max(min_bucket, _next_pow2(-(-keep.size // LANES)) * LANES),
        )
        local = np.concatenate([
            keep, np.full(bucket - keep.size, keep[-1], keep.dtype),
        ])
        carry_b, x0_b = gather(res.carry, x0_b, jnp.asarray(local))

    U, X, stats, packed = _jit_stream_finalize(interpret)(out, B)
    return U, X, stats, StreamCarry(
        d=packed[0], y=packed[1], g=packed[2], z=packed[3], v=packed[4],
    )


# --------------------------------------------------------------- hstream ----

@functools.lru_cache(maxsize=64)
def _jit_hstream_segment(k, knot_block, en_ib, en_sb, interpret, cones,
                         ce=0):
    from ..ops.hstream_admm import hstream_solve

    def fn(x, c, hsp, pri, dua):
        return hstream_solve(
            x, c, hsp, max_iter=k, knot_block=knot_block,
            check_termination=ce, abs_pri_tol=pri, abs_dua_tol=dua,
            en_input_bound=en_ib, en_state_bound=en_sb,
            interpret=interpret, cones=cones,
        )

    return fn if interpret else jax.jit(fn)


@functools.lru_cache(maxsize=2)
def _jit_hstream_gather(interpret):
    from ..ops.hstream_admm import gather_hstream

    def fn(hsp, carry, x0, loc):
        return gather_hstream(hsp, carry, x0, loc)

    return fn if interpret else jax.jit(fn)


def hstream_cascade_solve(
    x0: jax.Array,
    carry,
    hsp,
    *,
    max_iter: int = 100,
    segment_iters: int = 25,
    segment_growth: float = 4.0,
    check_termination: int = 0,
    abs_pri_tol: float = 1e-3,
    abs_dua_tol: float = 1e-3,
    knot_block: int = 16,
    min_bucket: int | None = None,
    interpret: bool = False,
    cones=None,
    en_input_bound: bool = True,
    en_state_bound: bool = True,
):
    """Segment-level early termination for the heterogeneous streaming tier
    (per-instance plants at long horizons): :func:`stream_cascade_solve`'s
    dispatch-level cascade (which see for semantics — fixed segments, the
    scan tier's convergence predicate at segment ends, reference
    admm.cpp:99-105) with the survivors' *plant tensors* re-packed alongside
    carries and x0 at each compaction (:func:`..ops.hstream_admm.gather_hstream`),
    as in :func:`hetero_cascade_solve`. Default ``segment_growth=4`` for the
    same reason as there: compactions re-pack plants, so fewer, longer late
    segments win.

    Returns ``(U, X, stats, carry)`` in original batch order; stats lane 0 =
    iterations (segment-granular), lane 1 = solved flag, 2-5 = residuals at
    the exit segment's final iteration. Schedules are exact per recorded
    count; controls match the fixed-iteration solve at that count to f32
    segment-handoff tolerance (tests/test_hstream.py).

    ``check_termination > 0`` composes the in-kernel per-instance freeze
    with the compaction (see :func:`stream_cascade_solve`'s in-kernel mode
    for the semantics — equal to one long adaptive call; ``segment_iters``
    must be a multiple of it).
    """
    from ..ops.hetero_admm import LANES
    from ..ops.stream_admm import StreamCarry

    if max_iter < 1 or segment_iters < 1:
        raise ValueError("max_iter and segment_iters must be >= 1")
    if segment_growth < 1.0:
        raise ValueError("segment_growth must be >= 1.0")
    ce = int(check_termination)
    if ce > 0 and segment_iters % ce:
        raise ValueError(
            "segment_iters must be a multiple of check_termination so the "
            "segment-local check cadence matches the single-call schedule"
        )
    B = x0.shape[0]
    if min_bucket is None:
        min_bucket = LANES
    min_bucket = max(LANES, min_bucket)
    pri = jnp.float32(abs_pri_tol)
    dua = jnp.float32(abs_dua_tol)

    def run(x, c, hp, k):
        return _jit_hstream_segment(
            k, knot_block, en_input_bound, en_state_bound, interpret,
            cones, ce,
        )(x, c, hp, pri, dua)

    active_idx = np.arange(B, dtype=np.int32)
    x0_b, carry_b, hsp_b = x0, carry, hsp
    done_iters = 0
    cur_seg = segment_iters
    gather = _jit_hstream_gather(interpret)
    step = (_jit_stream_step_inkernel if ce else _jit_stream_step)(interpret)
    init = (_jit_stream_init_inkernel if ce else _jit_stream_init)(interpret)
    out = None

    while True:
        n_active = active_idx.size
        k = min(cur_seg, max_iter - done_iters)
        res = run(x0_b, carry_b, hsp_b, k)
        base = done_iters
        done_iters += k
        idx = np.full(res.stats.shape[0], B, np.int32)
        idx[:n_active] = active_idx
        sargs = ((jnp.float32(base),) if ce
                 else (jnp.float32(done_iters), pri, dua))
        if out is None:
            out, solved_col = init(res, jnp.asarray(idx), B, *sargs)
        else:
            out, solved_col = step(out, res, jnp.asarray(idx), *sargs)
        if done_iters >= max_iter:
            break
        solved = np.asarray(jax.device_get(solved_col))[:n_active]
        keep = np.nonzero(~solved)[0]
        if keep.size == 0:
            break
        cur_seg = int(cur_seg * segment_growth)
        if ce:
            cur_seg = -(-cur_seg // ce) * ce
        active_idx = active_idx[keep]
        bucket = min(
            -(-B // LANES) * LANES,
            max(min_bucket, _next_pow2(-(-keep.size // LANES)) * LANES),
        )
        local = np.concatenate([
            keep, np.full(bucket - keep.size, keep[-1], keep.dtype),
        ])
        hsp_b, carry_b, x0_b = gather(
            hsp_b, res.carry, x0_b, jnp.asarray(local)
        )

    U, X, stats, packed = _jit_stream_finalize(interpret)(out, B)
    return U, X, stats, StreamCarry(
        d=packed[0], y=packed[1], g=packed[2], z=packed[3], v=packed[4],
    )
