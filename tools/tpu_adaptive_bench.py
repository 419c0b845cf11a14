"""On-chip measurement: batched adaptive-rho refresh strategies.

Workload: a fleet of distinct random plants whose initial rho is mis-scaled
by up to 3 orders of magnitude in both directions — the population the
adaptation exists for.  Compares the exact per-round vmapped
Riccati+operator rebuild against first-order adaptive caching (axpy refresh
with trust-region re-anchoring; PAPERS.md "First-Order Adaptive Caching").

Usage: python tools/tpu_adaptive_bench.py [batch] [chunk]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import accelerated_tinympc_tpu as atm
    from accelerated_tinympc_tpu.models import random_lti_problem
    from accelerated_tinympc_tpu.solver.batched_ops import (
        solve_adaptive_rho_batched,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    nx, nu, N = 8, 3, 10
    # Build the plant fleet on host (float64 -> f32), then one stacked
    # transfer (CLAUDE.md: per-problem transfers pay relay chatter).
    # Hard shape (tests/test_adaptive_rho.py): tight input boxes + skewed
    # Q:R scale — mis-scaled rho genuinely stalls here, so the adaptation
    # (and its cache-refresh cost) actually exercises.
    seeds = 16
    probs = []
    for s in range(seeds):
        p, _ = random_lti_problem(
            seed=s, nx=nx, nu=nu, horizon=N,
            bound=5.0, q_scale=100.0, r_scale=0.1,
        )
        import jax.numpy as _jnp
        p = p.replace(
            u_min=_jnp.full_like(p.u_min, -0.3),
            u_max=_jnp.full_like(p.u_max, 0.3),
        )
        probs.append(p)
    reps = -(-B // seeds)
    stack = lambda f: jnp.asarray(
        np.tile(np.stack([np.asarray(f(p)) for p in probs]), (reps, 1, 1))[:B]
    )
    A = stack(lambda p: p.A)
    Bm = stack(lambda p: p.B)
    Q = jnp.asarray(np.tile(
        np.stack([np.asarray(p.Q) for p in probs]), (reps, 1))[:B])
    R = jnp.asarray(np.tile(
        np.stack([np.asarray(p.R) for p in probs]), (reps, 1))[:B])
    prob_b = jax.tree.map(lambda *xs: jnp.stack(xs), *(probs * reps)[:B])

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.standard_normal((B, nx)), jnp.float32)
    rho0 = jnp.asarray(10.0 ** rng.uniform(-2, 2, B), jnp.float32)
    settings = atm.Settings(abs_pri_tol=2e-3, abs_dua_tol=2e-3,
                            check_termination=1)

    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    def make(refresh, ric="vmap"):
        if B > 4096:
            # Above the einsum tier's one-dispatch ceiling: chunked dispatch
            # (solver/batched_ops.solve_adaptive_rho_chunked).
            from accelerated_tinympc_tpu.solver import (
                solve_adaptive_rho_chunked,
            )

            return lambda x, r: solve_adaptive_rho_chunked(
                x, prob_b, A, Bm, Q, R, r, settings, batch_chunk=4096,
                chunk=chunk, max_rounds=40, refresh=refresh, riccati=ric,
            )
        return jax.jit(
            lambda x, r: solve_adaptive_rho_batched(
                x, prob_b, A, Bm, Q, R, r, settings,
                chunk=chunk, max_rounds=40, refresh=refresh, riccati=ric,
            )
        )

    def best_of(fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {}
    variants = [("cold", "vmap"), ("exact", "vmap"),
                ("exact", "kernel"), ("first_order", "vmap")]
    if B > 4096:
        # vmap-refresh variants are impractically slow at this scale; keep
        # the production einsum variant (chunk-dispatched) as the baseline.
        variants = [("exact", "kernel")]
    for refresh, ric in variants:
        f = make(refresh, ric)
        res = jax.block_until_ready(f(x0s, rho0))  # compile + warm
        t = best_of(lambda: f(x0s, rho0))
        solved = float(np.asarray(res.state.solved).mean())
        rounds = int(res.rounds)
        results[(refresh, ric)] = (t, res)
        n_adapted = int((np.abs(np.log10(
            np.asarray(res.rho) / np.asarray(rho0))) > 1e-6).sum())
        print(f"{refresh:12s}/{ric:6s}: {t * 1e3:8.2f} ms  ({B / t:,.0f} adaptive "
              f"solves/s)  solved {solved:.1%}  rounds {rounds}  "
              f"adapted {n_adapted}/{B}  "
              f"iters p50={np.median(np.asarray(res.total_iter)):.0f}")
    if ("exact", "vmap") in results:
        du = float(np.max(np.abs(
            np.asarray(results[("exact", "vmap")][1].state.U)
            - np.asarray(results[("exact", "kernel")][1].state.U)
        )))
        sp = results[("exact", "vmap")][0] / results[("exact", "kernel")][0]
        print(f"kernel-riccati vs vmap exact: speedup {sp:.2f}x  "
              f"max|dU| {du:.2e}")

    # --- adaptive rho at hetero-kernel speed (round 3) -----------------------
    from accelerated_tinympc_tpu.solver.adaptive_hetero import (
        solve_adaptive_rho_hetero,
    )

    hetero_res = {}
    for ric in ("kernel", "newton"):
        res = solve_adaptive_rho_hetero(
            x0s, prob_b, A, Bm, Q, R, rho0, settings,
            chunk=chunk, max_rounds=40, riccati=ric,
        )  # compile + warm
        t = best_of(lambda: solve_adaptive_rho_hetero(
            x0s, prob_b, A, Bm, Q, R, rho0, settings,
            chunk=chunk, max_rounds=40, riccati=ric,
        ))
        hetero_res[ric] = (t, res)
        solved = float(np.asarray(res.solved).mean())
        n_adapted = int((np.abs(np.log10(
            np.asarray(res.rho) / np.asarray(rho0))) > 1e-6).sum())
        print(f"{'hetero':12s}/{ric:6s}: {t * 1e3:8.2f} ms  "
              f"({B / t:,.0f} adaptive solves/s)  solved {solved:.1%}  "
              f"rounds {res.rounds}  adapted {n_adapted}/{B}  "
              f"iters p50={np.median(np.asarray(res.total_iter)):.0f}")
    ew = results[("exact", "kernel")][1]
    for ric in ("kernel", "newton"):
        t, res = hetero_res[ric]
        du = float(np.max(np.abs(
            np.asarray(res.U).reshape(B, -1) - np.asarray(ew.state.U))))
        same_rounds = float(np.mean(
            np.ceil(np.asarray(res.total_iter) / chunk)
            == np.ceil(np.asarray(ew.total_iter) / chunk)))
        sp = results[("exact", "kernel")][0] / t
        print(f"hetero/{ric} vs einsum exact/kernel: speedup {sp:.2f}x  "
              f"max|dU| {du:.2e}  same-round fraction {same_rounds:.1%}")


if __name__ == "__main__":
    main()
