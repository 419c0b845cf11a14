"""Pallas TPU kernel: batched infinite-horizon Riccati precompute.

The reference runs its Riccati fixed point once, offline, in double on a
host (reference: src/tinympc/codegen.cpp:268-292). The TPU-native framework
runs it *per instance, on device* — fleet setup
(:func:`..api.fleet.TinyMPCFleet.setup`), on-device plant sweeps, and the
adaptive-rho exact refresh (:func:`..solver.batched_ops.solve_adaptive_rho_batched`)
all build thousands of caches at once. The vmapped XLA path
(:func:`..precompute.riccati_cache_jax`) lowers to batched 12x12-class
matmuls that leave the MXU ~idle (measured ~10 GFLOP/s at B=1024).

This kernel uses the heterogeneous-plant layout instead (see
ops/hetero_admm.py): **instances on lanes, matrix entries on sublanes** —
each matrix is a ``(rows, LANES)`` slab of row-major entries, and every
per-lane matrix product unrolls to slab FMAs: ``C[i,:] += A[i,t] * B[t,:]``
multiplies a ``(1, L)`` scalar row against the ``(m, L)`` slab holding
``B``'s t-th row, so the inner loop is full-width VPU work, not scalar
chasing. The ``R1 + B'PB`` solves use an unrolled per-lane Cholesky —
straight-line arithmetic, the same discipline as
:func:`..precompute._spd_solve_small` (jnp.linalg's LU wedges this
backend).

Semantics match :func:`..precompute.riccati_cache_jax` per instance: P0 =
rho*I, iterate Kinf/Pinf until ``max|dKinf| < tol`` (cap ``max_iters``;
reference's stopping rule, codegen.cpp:273-285), per-lane convergence
freezing (a converged lane's K/P stop updating, so the returned iterates
are the reference's, not extra-converged ones), then cache Quu_inv, AmBKt,
coeff_d2p from the frozen fixed point.

Mosaic discipline (CLAUDE.md): per-lane scalars live in full (8, L)
blocks inside the while carry; keepdims row maxima are computed in the
body but never carried at row-1 width; freezes are 0/1-mask arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..types import Cache

LANES = 128


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _tree_sum(terms):
    while len(terms) > 1:
        half = len(terms) // 2
        nxt = [terms[i] + terms[half + i] for i in range(half)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _row(M, i):
    return M[i:i + 1, :]


def _mm(A, B, n: int, k: int, m: int):
    """Per-lane matmul on entry slabs: ``A (>=n*k, L)``, ``B (>=k*m, L)``
    row-major -> ``(n*m, L)``. Slab formulation: for each output row block
    i, accumulate ``A[i,t] * B[t, :]`` over t as a pairwise tree."""
    out = []
    for i in range(n):
        terms = [
            _row(A, i * k + t) * B[t * m:(t + 1) * m, :] for t in range(k)
        ]
        out.append(_tree_sum(terms))
    return jnp.concatenate(out, axis=0)


def _mtm(A, B, n: int, k: int, m: int):
    """``A^T @ B`` with ``A (k*n, L)`` row-major (so A^T is (n, k)):
    entry (A^T)[i,t] = A[t*n + i]."""
    out = []
    for i in range(n):
        terms = [
            _row(A, t * n + i) * B[t * m:(t + 1) * m, :] for t in range(k)
        ]
        out.append(_tree_sum(terms))
    return jnp.concatenate(out, axis=0)


def _transpose_rows(M, n: int, m: int):
    """Row-major (n, m) entry slab -> (m, n) entry slab (row permutation)."""
    rows = [_row(M, i * m + j) for j in range(m) for i in range(n)]
    return jnp.concatenate(rows, axis=0)


def _chol(M, n: int):
    """Unrolled per-lane Cholesky of the (n, n) entry slab ``M`` (SPD per
    lane). Returns the lower factor as an n x n list of (1, L) rows."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = _row(M, j * n + j)
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        ljj = jnp.sqrt(s)
        L[j][j] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, n):
            s = _row(M, i * n + j)
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            L[i][j] = s * inv
    return L

def _chol_solve(L, N, n: int, m: int):
    """Solve ``(L L^T) X = N`` for the unrolled factor; ``N (n*m, L)``
    row-major. Substitutions run on whole (m, L) row slabs (vectorized over
    the m right-hand sides)."""
    y = []
    for i in range(n):
        s = N[i * m:(i + 1) * m, :]
        for t in range(i):
            s = s - L[i][t] * y[t]
        y.append(s / L[i][i])
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for t in range(i + 1, n):
            s = s - L[t][i] * x[t]
        x[i] = s / L[i][i]
    return jnp.concatenate(x, axis=0)


def _sym_add_diag(Mc, diag, n: int):
    """Symmetrize an (n, n) entry slab and add ``diag`` ((n, L) rows) to the
    diagonal entries."""
    rows = []
    for i in range(n):
        for j in range(n):
            half = 0.5 * (_row(Mc, i * n + j) + _row(Mc, j * n + i))
            rows.append(half + _row(diag, i) if i == j else half)
    return jnp.concatenate(rows, axis=0)


def _kgain(A, Bm, Bt, Ra, P, nx: int, nu: int):
    """K = (R1 + B'PB)^-1 B'PA from an entry-slab P (the reference gain
    update, codegen.cpp:273-285). Returns (K, chol factor of R1+B'PB)."""
    BtP = _mm(Bt, P, nu, nx, nx)
    M = _sym_add_diag(_mm(BtP, Bm, nu, nx, nu), Ra, nu)
    Lf = _chol(M, nu)
    BtPA = _mm(BtP, A, nu, nx, nx)
    return _chol_solve(Lf, BtPA, nu, nx), Lf


def _cache_terms(A, Bm, Ra, K, P, zx, nx: int, nu: int):
    """Quu_inv / AmBKt / coeff_d2p from the frozen fixed point
    (reference codegen.cpp:287-292)."""
    Bt = _transpose_rows(Bm, nx, nu)
    BtP = _mm(Bt, P, nu, nx, nx)
    M = _sym_add_diag(_mm(BtP, Bm, nu, nx, nu), Ra, nu)
    Lf = _chol(M, nu)
    # Quu_inv via solves against I (one-hot RHS rows derived from real data).
    one = 1.0 + zx * 0.0
    eye_rows = []
    for i in range(nu):
        for j in range(nu):
            eye_rows.append(one if i == j else zx + zx)
    Quu_inv = _chol_solve(Lf, jnp.concatenate(eye_rows, axis=0), nu, nu)
    BK = _mm(Bm, K, nx, nu, nx)
    AmBKt = _transpose_rows(A - BK, nx, nx)
    # coeff_d2p = Kinf^T R1 - AmBKt @ (Pinf @ B)   (nx, nu)
    PB = _mm(P, Bm, nx, nx, nu)
    T = _mm(AmBKt, PB, nx, nx, nu)
    Kt = _transpose_rows(K, nu, nx)
    c_rows = []
    for i in range(nx):
        for j in range(nu):
            c_rows.append(
                _row(Kt, i * nu + j) * _row(Ra, j) - _row(T, i * nu + j)
            )
    return Quu_inv, AmBKt, jnp.concatenate(c_rows, axis=0)


def _emit_out(ref, val, rows):
    pad = ref.shape[0] - rows
    if pad:
        val = jnp.concatenate([val] + [val[:1] * 0.0] * pad, axis=0)
    ref[:] = val


def _kernel(
    a_ref, b_ref, qa_ref, ra_ref, rho_ref,
    *rest,
    nx: int, nu: int, max_iters: int, tol: float, interpret: bool,
    has_warm: bool = False,
):
    f32 = jnp.float32
    nxx, nun, nuu, nxu = nx * nx, nu * nx, nu * nu, nx * nu
    if has_warm:
        p0_ref, k0_ref = rest[0], rest[1]
        rest = rest[2:]
    (k_out, p_out, quu_out, ambkt_out, coeff_out, iters_out) = rest
    A = a_ref[:][:nxx]
    Bm = b_ref[:][:nxu]          # (nx*nu, L) row-major (nx rows of nu)
    Qa = qa_ref[:][:nx]          # diagonal entries as rows
    Ra = ra_ref[:][:nu]
    rho = rho_ref[:][:1]         # (1, L)

    Bt = _transpose_rows(Bm, nx, nu)   # (nu*nx, L)

    def pick(m, a, b):
        return a * m + b * (1.0 - m)

    # P0 = rho * I (entry rows built from A-derived zeros + rho at the
    # diagonal), or the caller's warm start (e.g. the cache at a nearby rho
    # — the adaptive-rho refresh case; fixed point/stopping rule unchanged).
    zx = A[:1] * 0.0
    if has_warm:
        P0 = p0_ref[:][:nxx]
        K0 = k0_ref[:][:nun]
    else:
        p_rows = []
        for i in range(nx):
            for j in range(nx):
                p_rows.append(rho + zx if i == j else zx + zx)
        P0 = jnp.concatenate(p_rows, axis=0)
        K0 = jnp.concatenate([zx] * nun, axis=0)
    z8 = jnp.concatenate([zx] * 8, axis=0)

    def ric_step(K, P):
        """One Kinf/Pinf update (reference codegen.cpp:273-285; symmetrized
        as in precompute.riccati_cache_jax)."""
        BtP = _mm(Bt, P, nu, nx, nx)               # (nu*nx, L)
        Mc = _mm(BtP, Bm, nu, nx, nu)              # (nu*nu, L)
        # M = R1 + B'PB, symmetrized
        m_rows = []
        for i in range(nu):
            for j in range(nu):
                half = 0.5 * (_row(Mc, i * nu + j) + _row(Mc, j * nu + i))
                m_rows.append(half + _row(Ra, i) if i == j else half)
        M = jnp.concatenate(m_rows, axis=0)
        Lf = _chol(M, nu)
        BtPA = _mm(BtP, A, nu, nx, nx)             # (nu*nx, L)
        Knew = _chol_solve(Lf, BtPA, nu, nx)       # (nu*nx, L)
        BK = _mm(Bm, Knew, nx, nu, nx)             # (nx*nx, L)
        AmBK = A - BK
        T2 = _mm(P, AmBK, nx, nx, nx)
        Pn = _mtm(A, T2, nx, nx, nx)               # A^T (P (A - BK))
        p_rows = []
        for i in range(nx):
            for j in range(nx):
                half = 0.5 * (_row(Pn, i * nx + j) + _row(Pn, j * nx + i))
                p_rows.append(half + _row(Qa, i) if i == j else half)
        Pnew = jnp.concatenate(p_rows, axis=0)
        return Knew, Pnew, M

    def cond(st):
        it, done8 = st[0], st[1]
        return jnp.logical_and(
            it < max_iters, jnp.logical_not(jnp.all(done8 > 0.5))
        )

    def body(st):
        it, done8, K, P, itf = st
        Knew, Pnew, _M = ric_step(K, P)
        delta = jnp.max(jnp.abs(Knew - K), axis=0, keepdims=True)
        conv = (delta < tol).astype(f32)
        conv8 = jnp.concatenate([conv] * 8, axis=0)
        newly = (1.0 - done8) * conv8
        adv = 1.0 - done8
        mK = jnp.concatenate([adv[:1]] * nun, axis=0)
        mP = jnp.concatenate([adv[:1]] * nxx, axis=0)
        # Frozen lanes keep their converged iterate (reference stops AT the
        # first sub-tol iteration); advancing lanes take the update.
        K = pick(mK, Knew, K)
        P = pick(mP, Pnew, P)
        itf = pick(newly, itf * 0.0 + (it + 1).astype(f32), itf)
        done8 = jnp.maximum(done8, newly)
        return it + 1, done8, K, P, itf

    it, done8, K, P, itf = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), z8, K0, P0, z8)
    )
    itf = pick(done8, itf, itf * 0.0 + float(max_iters))

    Quu_inv, AmBKt, coeff = _cache_terms(A, Bm, Ra, K, P, zx, nx, nu)
    _emit_out(k_out, K, nun)
    _emit_out(p_out, P, nxx)
    _emit_out(quu_out, Quu_inv, nuu)
    _emit_out(ambkt_out, AmBKt, nxx)
    _emit_out(coeff_out, coeff, nxu)
    iters_out[:] = itf


def _kernel_newton(
    a_ref, b_ref, qa_ref, ra_ref, k0_ref,
    k_out, p_out, quu_out, ambkt_out, coeff_out, iters_out,
    *,
    nx: int, nu: int, max_outer: int, inner_iters: int, tol: float,
    interpret: bool,
):
    """Newton-Kleinman DARE solve, one plant per lane (the adaptive-rho
    refresh fast path). Each outer step solves the Stein equation
    ``P = M'PM + Q1 + K'R1K`` (M = A - BK) exactly by squaring/doubling
    (``S += Mj' S Mj; Mj = Mj^2`` — ``inner_iters`` doublings cover an
    effective horizon of 2^inner_iters), then refreshes the gain
    ``K = (R1+B'PB)^-1 B'PA``. Quadratic convergence in the outer loop:
    a warm K (the previous rho's converged gain — A-BK is rho-independent,
    so it is always stabilizing) reaches max|dK| < tol in ~2-4 outers vs
    hundreds of reference fixed-point iterations (codegen.cpp:273-285).
    The converged P/K solve the *same* DARE; iterates differ from the
    reference's truncated fixed-point path at ~tol scale (documented in
    riccati_cache_newton).
    """
    f32 = jnp.float32
    nxx, nun, nuu, nxu = nx * nx, nu * nx, nu * nu, nx * nu
    A = a_ref[:][:nxx]
    Bm = b_ref[:][:nxu]
    Qa = qa_ref[:][:nx]
    Ra = ra_ref[:][:nu]
    K0 = k0_ref[:][:nun]
    Bt = _transpose_rows(Bm, nx, nu)
    zx = A[:1] * 0.0
    z8 = jnp.concatenate([zx] * 8, axis=0)

    def pick(m, a, b):
        return a * m + b * (1.0 - m)

    def newton_step(K):
        # W = Q1 + K' R1 K (costs are already rho-augmented diagonals)
        RK = jnp.concatenate(
            [_row(Ra, i) * K[i * nx:(i + 1) * nx] for i in range(nu)], axis=0
        )
        W = _sym_add_diag(_mtm(K, RK, nx, nu, nx), Qa, nx)
        Mcl = A - _mm(Bm, K, nx, nu, nx)

        def dbl(_, c):
            S, Mj = c
            SM = _mm(S, Mj, nx, nx, nx)
            return (S + _mtm(Mj, SM, nx, nx, nx),
                    _mm(Mj, Mj, nx, nx, nx))

        S, _ = jax.lax.fori_loop(0, inner_iters, dbl, (W, Mcl))
        P = 0.5 * (S + _transpose_rows(S, nx, nx))
        Knew, _ = _kgain(A, Bm, Bt, Ra, P, nx, nu)
        return Knew, P

    # P for frozen lanes must exist from iteration 0: seed with the warm K's
    # own Stein solve (first outer), then iterate.
    def cond(st):
        it, done8 = st[0], st[1]
        return jnp.logical_and(
            it < max_outer, jnp.logical_not(jnp.all(done8 > 0.5))
        )

    def body(st):
        it, done8, K, P, itf = st
        Knew, Pnew = newton_step(K)
        delta = jnp.max(jnp.abs(Knew - K), axis=0, keepdims=True)
        conv = (delta < tol).astype(f32)
        conv8 = jnp.concatenate([conv] * 8, axis=0)
        newly = (1.0 - done8) * conv8
        adv = 1.0 - done8
        mK = jnp.concatenate([adv[:1]] * nun, axis=0)
        mP = jnp.concatenate([adv[:1]] * nxx, axis=0)
        K = pick(mK, Knew, K)
        P = pick(mP, Pnew, P)
        itf = pick(newly, itf * 0.0 + (it + 1).astype(f32), itf)
        done8 = jnp.maximum(done8, newly)
        return it + 1, done8, K, P, itf

    P0 = jnp.concatenate([zx] * nxx, axis=0)
    it, done8, K, P, itf = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), z8, K0, P0, z8)
    )
    itf = pick(done8, itf, itf * 0.0 + float(max_outer))

    Quu_inv, AmBKt, coeff = _cache_terms(A, Bm, Ra, K, P, zx, nx, nu)
    _emit_out(k_out, K, nun)
    _emit_out(p_out, P, nxx)
    _emit_out(quu_out, Quu_inv, nuu)
    _emit_out(ambkt_out, AmBKt, nxx)
    _emit_out(coeff_out, coeff, nxu)
    iters_out[:] = itf


def _lane_pack(a: jax.Array, rows: int, nt: int, fill: float = 0.0
               ) -> jax.Array:
    """(B, k) flat entries -> (NT*rows, L), zero-padded rows; lanes beyond
    the batch take ``fill`` in their first k entries (``fill=1.0`` for R's
    diagonal keeps padded lanes' Cholesky finite, so a partial last tile
    converges immediately instead of running to the iteration cap)."""
    Bn, k = a.shape
    out = jnp.zeros((nt * LANES, rows), a.dtype)
    if fill and Bn < nt * LANES:
        out = out.at[Bn:, :k].set(fill)
    out = out.at[:Bn, :k].set(a)
    return out.reshape(nt, LANES, rows).transpose(0, 2, 1).reshape(
        nt * rows, LANES
    )


def _lane_unpack(p: jax.Array, nt: int, Bn: int, k: int) -> jax.Array:
    rows = p.shape[0] // nt
    return p.reshape(nt, rows, LANES).transpose(0, 2, 1).reshape(
        nt * LANES, rows
    )[:Bn, :k]


@functools.partial(
    jax.jit, static_argnames=("max_iters", "tol", "interpret")
)
def riccati_cache_kernel(
    A: jax.Array,
    B: jax.Array,
    Q: jax.Array,
    R: jax.Array,
    rho: jax.Array,
    *,
    max_iters: int = 1000,
    tol: float = 1e-5,
    interpret: bool = False,
    P0: jax.Array | None = None,
    K0: jax.Array | None = None,
) -> Cache:
    """Batched on-device Riccati precompute, one distinct plant per lane.

    ``A (B, nx, nx)``, ``B (B, nx, nu)``, ``Q (B, nx)`` / ``R (B, nu)`` raw
    cost diagonals, ``rho (B,)``. Returns a batch-leading :class:`..types.Cache`
    matching :func:`..precompute.riccati_cache_jax` per instance (same
    initialization, stopping rule and per-lane freeze-at-convergence).
    """
    Bn, nx, _ = A.shape
    nu = B.shape[-1]
    dtype = jnp.float32
    nt = -(-Bn // LANES)
    Rx2, Rxu = _pad8(nx * nx), _pad8(nx * nu)
    Ru2, Rux = _pad8(nu * nu), _pad8(nu * nx)
    Rx, Ru = _pad8(nx), _pad8(nu)

    rho_b = jnp.asarray(rho, dtype).reshape(Bn)
    Qa = jnp.asarray(Q, dtype) + rho_b[:, None]
    Ra = jnp.asarray(R, dtype) + rho_b[:, None]
    has_warm = P0 is not None
    args = (
        _lane_pack(jnp.asarray(A, dtype).reshape(Bn, -1), Rx2, nt),
        _lane_pack(jnp.asarray(B, dtype).reshape(Bn, -1), Rxu, nt),
        _lane_pack(Qa, Rx, nt),
        _lane_pack(Ra, Ru, nt, fill=1.0),
        _lane_pack(rho_b[:, None], 8, nt),
    )
    warm_args: tuple = ()
    warm_specs: list = []
    if has_warm:
        warm_args = (
            _lane_pack(jnp.asarray(P0, dtype).reshape(Bn, -1), Rx2, nt),
            _lane_pack(jnp.asarray(K0, dtype).reshape(Bn, -1), Rux, nt),
        )

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda t: (t, 0))

    if has_warm:
        warm_specs = [spec(Rx2), spec(Rux)]
    kernel = functools.partial(
        _kernel, nx=nx, nu=nu, max_iters=max_iters, tol=tol,
        interpret=interpret, has_warm=has_warm,
    )
    sds = jax.ShapeDtypeStruct
    outs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[spec(Rx2), spec(Rxu), spec(Rx), spec(Ru), spec(8)]
        + warm_specs,
        out_specs=[
            spec(Rux), spec(Rx2), spec(Ru2), spec(Rx2), spec(Rxu), spec(8),
        ],
        out_shape=[
            sds((nt * Rux, LANES), dtype), sds((nt * Rx2, LANES), dtype),
            sds((nt * Ru2, LANES), dtype), sds((nt * Rx2, LANES), dtype),
            sds((nt * Rxu, LANES), dtype), sds((nt * 8, LANES), dtype),
        ],
        interpret=interpret,
    )(*args, *warm_args)
    Kp, Pp, Quup, AmBKtp, coeffp, _itp = outs
    up = lambda p, k: _lane_unpack(p, nt, Bn, k)
    return Cache(
        rho=rho_b,
        Kinf=up(Kp, nu * nx).reshape(Bn, nu, nx),
        Pinf=up(Pp, nx * nx).reshape(Bn, nx, nx),
        Quu_inv=up(Quup, nu * nu).reshape(Bn, nu, nu),
        AmBKt=up(AmBKtp, nx * nx).reshape(Bn, nx, nx),
        coeff_d2p=up(coeffp, nx * nu).reshape(Bn, nx, nu),
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_outer", "inner_iters", "tol", "interpret"),
)
def riccati_cache_newton(
    A: jax.Array,
    B: jax.Array,
    Q: jax.Array,
    R: jax.Array,
    rho: jax.Array,
    K0: jax.Array,
    *,
    max_outer: int = 12,
    inner_iters: int = 13,
    tol: float = 1e-5,
    interpret: bool = False,
) -> Cache:
    """Batched Newton-Kleinman DARE solve — the warm-refresh fast path.

    Same arguments/layout as :func:`riccati_cache_kernel` plus a **required**
    stabilizing warm gain ``K0 (B, nu, nx)`` (any previously converged Kinf
    works at *any* rho: the closed loop A - B K0 does not depend on rho —
    so rho-only refreshes are unconditionally safe). If ``K0`` does NOT
    stabilize the given plant (possible when the *plant* changed, e.g.
    online model drift past the old gain's stability margin), the Stein sum
    diverges and that instance's outputs come back non-finite — detectable
    per instance; callers that accept arbitrary plant updates must fall
    back to the fixed-point kernel for those lanes (see
    ``TinyMPCFleet.set_plants``).
    Quadratic outer convergence makes a rho refresh ~2-4 outer steps instead
    of the fixed-point kernel's hundreds (measured decomposition in
    BASELINE.md) — each outer solves the Stein equation exactly by
    ``inner_iters`` squarings (effective horizon 2^inner_iters ~ 8k knots).

    Semantics note: converges to the *true* DARE fixed point (to ``tol`` on
    max|dK|), not the reference's truncated fixed-point iterate
    (codegen.cpp:273-285) — the two agree to ~tol. Use the fixed-point
    kernel where bit-parity with the reference's cache path matters; use
    this for adaptive-rho refreshes (`solve_adaptive_rho_hetero(
    riccati="newton")`), where rho-refreshed caches have no reference
    counterpart at all.
    """
    Bn, nx, _ = A.shape
    nu = B.shape[-1]
    dtype = jnp.float32
    nt = -(-Bn // LANES)
    Rx2, Rxu = _pad8(nx * nx), _pad8(nx * nu)
    Ru2, Rux = _pad8(nu * nu), _pad8(nu * nx)
    Rx, Ru = _pad8(nx), _pad8(nu)

    rho_b = jnp.asarray(rho, dtype).reshape(Bn)
    Qa = jnp.asarray(Q, dtype) + rho_b[:, None]
    Ra = jnp.asarray(R, dtype) + rho_b[:, None]
    args = (
        _lane_pack(jnp.asarray(A, dtype).reshape(Bn, -1), Rx2, nt),
        _lane_pack(jnp.asarray(B, dtype).reshape(Bn, -1), Rxu, nt),
        _lane_pack(Qa, Rx, nt),
        _lane_pack(Ra, Ru, nt, fill=1.0),
        _lane_pack(jnp.asarray(K0, dtype).reshape(Bn, -1), Rux, nt),
    )

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda t: (t, 0))

    kernel = functools.partial(
        _kernel_newton, nx=nx, nu=nu, max_outer=max_outer,
        inner_iters=inner_iters, tol=tol, interpret=interpret,
    )
    sds = jax.ShapeDtypeStruct
    outs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[spec(Rx2), spec(Rxu), spec(Rx), spec(Ru), spec(Rux)],
        out_specs=[
            spec(Rux), spec(Rx2), spec(Ru2), spec(Rx2), spec(Rxu), spec(8),
        ],
        out_shape=[
            sds((nt * Rux, LANES), dtype), sds((nt * Rx2, LANES), dtype),
            sds((nt * Ru2, LANES), dtype), sds((nt * Rx2, LANES), dtype),
            sds((nt * Rxu, LANES), dtype), sds((nt * 8, LANES), dtype),
        ],
        interpret=interpret,
    )(*args)
    Kp, Pp, Quup, AmBKtp, coeffp, _itp = outs
    up = lambda p, k: _lane_unpack(p, nt, Bn, k)
    return Cache(
        rho=rho_b,
        Kinf=up(Kp, nu * nx).reshape(Bn, nu, nx),
        Pinf=up(Pp, nx * nx).reshape(Bn, nx, nx),
        Quu_inv=up(Quup, nu * nu).reshape(Bn, nu, nu),
        AmBKt=up(AmBKtp, nx * nx).reshape(Bn, nx, nx),
        coeff_d2p=up(coeffp, nx * nu).reshape(Bn, nx, nu),
    )
