"""Precompute (DARE cache) parity tests.

Goldens:
- tests/golden/cartpole_cache.npz: 16-decimal literals emitted by the *reference*
  tiny_codegen run on the cartpole problem (reference: src/tinympc/codegen.cpp:
  268-292, examples/codegen_cartpole.cpp:17-34) — exact algorithm parity.
- shipped quadrotor caches (reference: examples/problem_data/*.hpp) — parity up
  to the fixed point's own stopping tolerance (Kinf delta < 1e-5).
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from accelerated_tinympc_tpu.models import cartpole
from accelerated_tinympc_tpu.models.quadrotor import _load as load_quadrotor_raw
from accelerated_tinympc_tpu.precompute import riccati_cache, riccati_cache_jax

GOLDEN = pathlib.Path(__file__).parent / "golden"


def test_cartpole_cache_matches_reference_codegen_exactly():
    g = dict(np.load(GOLDEN / "cartpole_cache.npz"))
    c = riccati_cache(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG, cartpole.RHO,
        dtype=np.float64,
    )
    assert float(c.rho) == pytest.approx(float(g["rho"]))
    np.testing.assert_allclose(c.Kinf, g["Kinf"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(c.Pinf, g["Pinf"], rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(c.Quu_inv, g["Quu_inv"], rtol=0, atol=1e-14)
    np.testing.assert_allclose(c.AmBKt, g["AmBKt"], rtol=0, atol=1e-13)
    np.testing.assert_allclose(c.coeff_d2p, g["coeff_d2p"], rtol=0, atol=1e-12)


@pytest.mark.parametrize("hz", [20, 50, 100])
def test_quadrotor_cache_matches_shipped_data(hz):
    d = load_quadrotor_raw(hz)
    c = riccati_cache(
        d["Adyn"], d["Bdyn"], d["Q"], d["R"], float(d["rho"]), dtype=np.float64
    )
    # Agreement is bounded by the fixed point's own stopping rule (|dK| < 1e-5),
    # not fp error: the shipped values froze at a slightly different iterate.
    np.testing.assert_allclose(c.Kinf, d["Kinf"], rtol=0, atol=2e-4)
    np.testing.assert_allclose(c.Quu_inv, d["Quu_inv"], rtol=0, atol=1e-6)
    np.testing.assert_allclose(c.AmBKt, d["AmBKt"], rtol=0, atol=5e-3)
    np.testing.assert_allclose(c.Pinf, d["Pinf"], rtol=2e-3, atol=2.0)


def test_jax_riccati_matches_host_riccati():
    c64 = riccati_cache(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG, cartpole.RHO,
        dtype=np.float64,
    )
    cj = riccati_cache_jax(
        jnp.asarray(cartpole.A, jnp.float32),
        jnp.asarray(cartpole.B, jnp.float32),
        jnp.asarray(cartpole.Q_DIAG, jnp.float32),
        jnp.asarray(cartpole.R_DIAG, jnp.float32),
        jnp.asarray(cartpole.RHO, jnp.float32),
    )
    np.testing.assert_allclose(cj.Kinf, c64.Kinf, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(cj.Quu_inv, c64.Quu_inv, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(cj.AmBKt, c64.AmBKt, rtol=1e-3, atol=1e-4)


def test_riccati_cache_jax_vmapped():
    """On-device cache construction over a batch of random plants (the
    use-case riccati_cache_jax exists for)."""
    import jax
    import jax.numpy as jnp
    from accelerated_tinympc_tpu.models import random_lti_problem

    As, Bs, Qs, Rs = [], [], [], []
    for seed in (10, 11, 12, 13):
        prob, rho = random_lti_problem(seed=seed, nx=5, nu=2, horizon=6)
        As.append(np.asarray(prob.A)); Bs.append(np.asarray(prob.B))
        Qs.append(np.asarray(prob.Q)); Rs.append(np.asarray(prob.R))
    batch = lambda ls: jnp.asarray(np.stack(ls), jnp.float32)
    caches = jax.jit(jax.vmap(
        lambda A, B, Q, R: riccati_cache_jax(A, B, Q, R, jnp.asarray(1.0))
    ))(batch(As), batch(Bs), batch(Qs), batch(Rs))
    for i in range(4):
        want = riccati_cache(As[i], Bs[i], Qs[i], Rs[i], 1.0, dtype=np.float64)
        np.testing.assert_allclose(
            np.asarray(caches.Kinf[i]), want.Kinf, rtol=1e-3, atol=2e-4
        )


def test_jax_riccati_quadrotor_f32():
    """Regression: the quadrotor plant drives the Riccati recursion through
    measurably asymmetric P iterates (sym error ~35 by iteration 30); the
    unrolled-Cholesky solve NaN'd on it before the symmetrization in
    riccati_cache_jax. Random-LTI tests never caught this — keep a real
    ill-conditioned plant in the loop."""
    import jax.numpy as jnp
    from accelerated_tinympc_tpu.models import quadrotor_hovering_setup

    problem, cache, _x0 = quadrotor_hovering_setup()
    cj = riccati_cache_jax(
        jnp.asarray(problem.A), jnp.asarray(problem.B),
        jnp.asarray(problem.Q), jnp.asarray(problem.R),
        jnp.asarray(float(np.asarray(cache.rho)), jnp.float32),
    )
    assert bool(jnp.all(jnp.isfinite(cj.Kinf)))
    np.testing.assert_allclose(
        np.asarray(cj.Kinf), np.asarray(cache.Kinf), rtol=0, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(cj.Quu_inv), np.asarray(cache.Quu_inv), rtol=0, atol=1e-5
    )
