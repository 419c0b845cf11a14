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

    # Final cache terms from the frozen fixed point
    # (reference codegen.cpp:287-292).
    BtP = _mm(Bt, P, nu, nx, nx)
    Mc = _mm(BtP, Bm, nu, nx, nu)
    m_rows = []
    for i in range(nu):
        for j in range(nu):
            half = 0.5 * (_row(Mc, i * nu + j) + _row(Mc, j * nu + i))
            m_rows.append(half + _row(Ra, i) if i == j else half)
    M = jnp.concatenate(m_rows, axis=0)
    Lf = _chol(M, nu)
    # Quu_inv via solves against I (one-hot RHS rows derived from real data).
    one = 1.0 + zx * 0.0
    eye_rows = []
    for i in range(nu):
        for j in range(nu):
            eye_rows.append(one if i == j else zx + zx)
    Quu_inv = _chol_solve(Lf, jnp.concatenate(eye_rows, axis=0), nu, nu)
    BK = _mm(Bm, K, nx, nu, nx)
    AmBK = A - BK
    AmBKt = _transpose_rows(AmBK, nx, nx)
    # coeff_d2p = Kinf^T R1 - AmBKt @ (Pinf @ B)   (nx, nu)
    PB = _mm(P, Bm, nx, nx, nu)                   # (nx*nu, L)
    T = _mm(AmBKt, PB, nx, nx, nu)
    Kt = _transpose_rows(K, nu, nx)               # (nx*nu, L)
    c_rows = []
    for i in range(nx):
        for j in range(nu):
            c_rows.append(
                _row(Kt, i * nu + j) * _row(Ra, j) - _row(T, i * nu + j)
            )
    coeff = jnp.concatenate(c_rows, axis=0)

    def emit(ref, val, rows):
        pad = ref.shape[0] - rows
        if pad:
            val = jnp.concatenate([val] + [val[:1] * 0.0] * pad, axis=0)
        ref[:] = val

    emit(k_out, K, nun)
    emit(p_out, P, nxx)
    emit(quu_out, Quu_inv, nuu)
    emit(ambkt_out, AmBKt, nxx)
    emit(coeff_out, coeff, nxu)
    iters_out[:] = itf


def _lane_pack(a: jax.Array, rows: int, nt: int) -> jax.Array:
    """(B, k) flat entries -> (NT*rows, L), zero-padded."""
    Bn, k = a.shape
    out = jnp.zeros((nt * LANES, rows), a.dtype)
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
        _lane_pack(Ra, Ru, nt),
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
