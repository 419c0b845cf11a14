"""Pallas batched Riccati precompute (ops/riccati_kernel.py) vs the vmapped
XLA builder and the float64 host ground truth (reference math:
src/tinympc/codegen.cpp:268-292). Both f32 on-device paths approximate the
f64 fixed point to ~1e-3 relative (K-delta stopping at 1e-5 leaves Pinf
there); the kernel must sit in the same envelope and feed the solver to
sub-1e-4 control parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import random_lti_problem
from accelerated_tinympc_tpu.ops.riccati_kernel import (
    riccati_cache_kernel, riccati_cache_newton,
)
from accelerated_tinympc_tpu.precompute import riccati_cache, riccati_cache_jax

B, NX, NU, N = 12, 8, 3, 10


@pytest.fixture(scope="module", autouse=True)
def _fresh_jax_caches():
    """This module compiles the suite's largest interpret-mode graphs (the
    unrolled per-lane Newton/fixed-point kernels); by this point in a full
    run the process carries hundreds of earlier compiled executables and
    the combination segfaulted XLA CPU reproducibly. Dropping the caches
    first keeps peak memory bounded (later modules simply recompile)."""
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def plants():
    As, Bs, Qs, Rs, rhos = [], [], [], [], []
    for s in range(B):
        p, rho = random_lti_problem(seed=s, nx=NX, nu=NU, horizon=N)
        As.append(np.asarray(p.A)); Bs.append(np.asarray(p.B))
        Qs.append(np.asarray(p.Q)); Rs.append(np.asarray(p.R))
        rhos.append(rho)
    return (jnp.asarray(np.stack(As)), jnp.asarray(np.stack(Bs)),
            jnp.asarray(np.stack(Qs)), jnp.asarray(np.stack(Rs)),
            jnp.asarray(rhos, jnp.float32),
            [np.stack(x) for x in (As, Bs, Qs, Rs)], rhos)


def test_matches_f64_truth(plants):
    A, Bm, Q, R, rho, (An, Bn, Qn, Rn), rhos = plants
    got = riccati_cache_kernel(A, Bm, Q, R, rho, interpret=True)
    jaxp = jax.jit(jax.vmap(riccati_cache_jax))(A, Bm, Q, R, rho)
    host = [riccati_cache(An[b], Bn[b], Qn[b], Rn[b], float(rhos[b]),
                          dtype=np.float64) for b in range(B)]
    for f in ("Kinf", "Pinf", "Quu_inv", "AmBKt", "coeff_d2p"):
        g = np.asarray(getattr(got, f))
        w64 = np.stack([np.asarray(getattr(h, f)) for h in host])
        wj = np.asarray(getattr(jaxp, f))
        scale = np.abs(w64).max() + 1.0
        err_k = np.max(np.abs(g - w64)) / scale
        err_j = np.max(np.abs(wj - w64)) / scale
        # The kernel must be in the same accuracy envelope as the vmapped
        # XLA f32 path (both ~1e-3 relative on Pinf, far tighter elsewhere).
        assert err_k < max(2e-3, 3 * err_j), (f, err_k, err_j)


def test_cache_feeds_solver_to_parity(plants):
    """Caches from the kernel drive the per-instance solver to the same
    controls as caches from the vmapped XLA builder (the end-to-end bar
    that matters: <1e-4 controls)."""
    from accelerated_tinympc_tpu.solver.batched_ops import (
        OpsState, build_instance_ops, solve_instance_ops,
    )
    from accelerated_tinympc_tpu.types import Problem

    A, Bm, Q, R, rho, _, _ = plants
    m = N - 1
    problem = Problem(
        A=A, B=Bm, Q=Q, R=R,
        u_min=jnp.full((B, m, NU), -2.0, jnp.float32),
        u_max=jnp.full((B, m, NU), 2.0, jnp.float32),
        x_min=jnp.full((B, N, NX), -9.0, jnp.float32),
        x_max=jnp.full((B, N, NX), 9.0, jnp.float32),
        Xref=jnp.zeros((B, N, NX), jnp.float32),
        Uref=jnp.zeros((B, m, NU), jnp.float32),
    )
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.standard_normal((B, NX)) * 0.4, jnp.float32)
    settings = atm.Settings(max_iter=30, check_termination=0)

    def solve_with(cache):
        ops = build_instance_ops(problem, cache)
        st = solve_instance_ops(
            x0s, OpsState.zeros(B, N * NX, m * NU), ops, settings
        )
        return np.asarray(st.U)

    u_k = solve_with(riccati_cache_kernel(A, Bm, Q, R, rho, interpret=True))
    u_j = solve_with(jax.jit(jax.vmap(riccati_cache_jax))(A, Bm, Q, R, rho))
    np.testing.assert_allclose(u_k, u_j, rtol=0, atol=1e-4)


def test_newton_matches_fixed_point(plants):
    """Newton-Kleinman warm solve (riccati_cache_newton — the adaptive-rho
    refresh fast path, ~102x the fixed-point kernel's refresh cost on chip,
    BASELINE.md) converges to the same DARE fixed point: warm gain from a
    different rho, caches vs the tightly-converged fixed point at the
    target rho within the f32 envelope."""
    A, Bm, Q, R, rho, _, _ = plants
    rng = np.random.default_rng(7)
    jump = jnp.asarray(10.0 ** rng.uniform(-0.7, 0.7, B), jnp.float32)
    rho_new = jnp.clip(rho * jump, 1e-2, 1e3)
    warm = riccati_cache_kernel(A, Bm, Q, R, rho, interpret=True)
    got = riccati_cache_newton(
        A, Bm, Q, R, rho_new, warm.Kinf, interpret=True
    )
    truth = jax.jit(jax.vmap(
        lambda a, b, q, r, p: riccati_cache_jax(
            a, b, q, r, p, tol=1e-8, max_iters=5000)
    ))(A, Bm, Q, R, rho_new)
    # coeff_d2p is the reference's identically-zero quantity (admm.cpp:20
    # drops it) — no meaningful scale of its own; skip it here.
    for f in ("Kinf", "Pinf", "Quu_inv", "AmBKt"):
        g = np.asarray(getattr(got, f))
        w = np.asarray(getattr(truth, f))
        rel = np.max(np.abs(g - w)) / (np.abs(w).max() + 1.0)
        assert rel < 2e-3, (f, rel)
    assert np.all(np.isfinite(np.asarray(got.Pinf)))


@pytest.mark.parametrize("nx,nu", [(4, 1), (9, 2), (12, 4)])
def test_newton_shape_fuzz(nx, nu):
    """Newton kernel across packing shapes (incl. odd, non-8-aligned dims —
    the slab-slicing risk): caches must agree with the warm fixed point at
    the same rho within the f32 envelope. (An nx=16 case was dropped: its
    unrolled interpret graph was the largest in the suite and tipped a
    full run into an XLA CPU segfault; nx=12 is the flagship boundary the
    chip actually runs.)"""
    Bn = 8
    As, Bs, Qs, Rs, rhos = [], [], [], [], []
    for s in range(Bn):
        p, rho = random_lti_problem(seed=200 + s, nx=nx, nu=nu, horizon=8)
        As.append(np.asarray(p.A)); Bs.append(np.asarray(p.B))
        Qs.append(np.asarray(p.Q)); Rs.append(np.asarray(p.R))
        rhos.append(rho)
    A = jnp.asarray(np.stack(As)); Bm = jnp.asarray(np.stack(Bs))
    Q = jnp.asarray(np.stack(Qs)); R = jnp.asarray(np.stack(Rs))
    rho = jnp.asarray(rhos, jnp.float32)
    warm = riccati_cache_kernel(A, Bm, Q, R, rho, interpret=True)
    got = riccati_cache_newton(
        A, Bm, Q, R, rho * 2.0, warm.Kinf, interpret=True
    )
    truth = jax.jit(jax.vmap(
        lambda a, b, q, r, p_: riccati_cache_jax(
            a, b, q, r, p_, tol=1e-8, max_iters=5000)
    ))(A, Bm, Q, R, rho * 2.0)
    for f in ("Kinf", "Pinf", "Quu_inv", "AmBKt"):
        g = np.asarray(getattr(got, f))
        w = np.asarray(getattr(truth, f))
        rel = np.max(np.abs(g - w)) / (np.abs(w).max() + 1.0)
        assert rel < 2e-3, (f, rel)


def test_newton_partial_tile_converges():
    """A batch that is not a lane multiple leaves padded lanes: they must
    converge immediately (R padded with ones keeps the per-lane Cholesky
    finite) rather than dragging the tile to the outer-iteration cap, and
    real lanes must be unaffected."""
    Bn = 5
    As, Bs, Qs, Rs, rhos = [], [], [], [], []
    for s in range(Bn):
        p, rho = random_lti_problem(seed=100 + s, nx=NX, nu=NU, horizon=N)
        As.append(np.asarray(p.A)); Bs.append(np.asarray(p.B))
        Qs.append(np.asarray(p.Q)); Rs.append(np.asarray(p.R))
        rhos.append(rho)
    A = jnp.asarray(np.stack(As)); Bm = jnp.asarray(np.stack(Bs))
    Q = jnp.asarray(np.stack(Qs)); R = jnp.asarray(np.stack(Rs))
    rho = jnp.asarray(rhos, jnp.float32)
    warm = riccati_cache_kernel(A, Bm, Q, R, rho, interpret=True)
    got = riccati_cache_newton(
        A, Bm, Q, R, rho * 3.0, warm.Kinf, interpret=True
    )
    full_warm = riccati_cache_kernel(
        jnp.tile(A, (26, 1, 1))[:128], jnp.tile(Bm, (26, 1, 1))[:128],
        jnp.tile(Q, (26, 1))[:128], jnp.tile(R, (26, 1))[:128],
        jnp.tile(rho, 26)[:128], interpret=True,
    )
    full = riccati_cache_newton(
        jnp.tile(A, (26, 1, 1))[:128], jnp.tile(Bm, (26, 1, 1))[:128],
        jnp.tile(Q, (26, 1))[:128], jnp.tile(R, (26, 1))[:128],
        jnp.tile(rho, 26)[:128] * 3.0, full_warm.Kinf, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got.Kinf), np.asarray(full.Kinf)[:Bn], rtol=0, atol=1e-6
    )
