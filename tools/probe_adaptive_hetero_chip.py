"""On-chip stage decomposition of the fused adaptive-rho hetero loop
(solver/adaptive_hetero.py) — where does a round's ~14 ms actually go?

BASELINE.md round 3 recorded the loop as refresh-bound (chunk iteration
work ~87 ms of 562 ms at B=4096) from a two-variant subtraction. This
probe times each stage directly with the single-executable runtime-repeat
slope (CLAUDE.md sticky-dispatch protocol):

  chunk    — hetero_solve, 25 iters, check every 1 (the round's solve)
  riccati  — warm-started riccati_cache_kernel refresh, rho alternating
             x5 between rounds (the adaptation's typical jump)
  repack   — repack_hetero_caches (cache-dependent operand re-pack)

Workload matches tools/tpu_adaptive_bench.py (nx=8, nu=3, N=10, hard
shape, B=4096 default).

Run on the TPU:  python tools/probe_adaptive_hetero_chip.py [B]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import random_lti_problem
from accelerated_tinympc_tpu.ops.hetero_admm import (
    HeteroCarry, hetero_solve, pad_hetero_problem, repack_hetero_caches,
)
from accelerated_tinympc_tpu.ops.riccati_kernel import (
    riccati_cache_kernel, riccati_cache_newton,
)
from accelerated_tinympc_tpu.solver.adaptive_hetero import (
    solve_adaptive_rho_hetero,
)


def timed(fn, *a, reps=7):
    jax.block_until_ready(fn(*a))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(run, *args):
    t1 = timed(run, *args, jnp.int32(1))
    t5 = timed(run, *args, jnp.int32(5))
    return (t5 - t1) / 4


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    chunk = 25
    nx, nu, N = 8, 3, 10
    print("devices:", jax.devices())
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    seeds = 16
    probs = []
    for s in range(seeds):
        p, _ = random_lti_problem(
            seed=s, nx=nx, nu=nu, horizon=N,
            bound=5.0, q_scale=100.0, r_scale=0.1,
        )
        p = p.replace(
            u_min=jnp.full_like(p.u_min, -0.3),
            u_max=jnp.full_like(p.u_max, 0.3),
        )
        probs.append(p)
    reps_t = -(-B // seeds)
    stack = lambda f: jnp.asarray(
        np.tile(np.stack([np.asarray(f(p)) for p in probs]),
                (reps_t, 1, 1))[:B])
    A = stack(lambda p: p.A)
    Bm = stack(lambda p: p.B)
    Q = jnp.asarray(np.tile(
        np.stack([np.asarray(p.Q) for p in probs]), (reps_t, 1))[:B])
    R = jnp.asarray(np.tile(
        np.stack([np.asarray(p.R) for p in probs]), (reps_t, 1))[:B])
    prob_b = jax.tree.map(lambda *xs: jnp.stack(xs), *(probs * reps_t)[:B])

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.standard_normal((B, nx)), jnp.float32)
    rho0 = jnp.asarray(10.0 ** rng.uniform(-2, 2, B), jnp.float32)
    settings = atm.Settings(abs_pri_tol=2e-3, abs_dua_tol=2e-3,
                            check_termination=1)
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    caches0 = riccati_cache_kernel(A, Bm, Q, R, rho0)
    hp0 = pad_hetero_problem(prob_b.replace(A=A, B=Bm, Q=Q, R=R), caches0)
    carry0 = HeteroCarry.zeros(hp0)

    # --- stage: chunk (hetero adaptive solve, 25 iters) ---------------------
    @jax.jit
    def chain_chunk(x, c, n):
        def body(_, cc):
            res = hetero_solve(
                x, cc, hp0, max_iter=chunk, check_termination=1,
                abs_pri_tol=2e-3, abs_dua_tol=2e-3)
            return res.carry
        return jax.lax.fori_loop(0, n, body, c)
    s_chunk = slope(chain_chunk, x0s, carry0)
    print(f"chunk (25 adaptive iters): {s_chunk*1e3:8.3f} ms/round")

    # --- stage: warm riccati refresh (rho alternates x5) --------------------
    @jax.jit
    def chain_ric(P0, K0, n):
        def body(i, c):
            P, K = c
            r = jnp.where(i % 2 == 0, rho0 * 5.0, rho0)
            cc = riccati_cache_kernel(A, Bm, Q, R, r, P0=P, K0=K)
            return (cc.Pinf, cc.Kinf)
        return jax.lax.fori_loop(0, n, body, (caches0.Pinf, caches0.Kinf))
    s_ric = slope(chain_ric, caches0.Pinf, caches0.Kinf)
    print(f"warm riccati refresh (x5 rho jump): {s_ric*1e3:8.3f} ms/round")

    # --- stage: newton refresh (same x5 alternation) ------------------------
    @jax.jit
    def chain_newt(K0, n):
        def body(i, K):
            r = jnp.where(i % 2 == 0, rho0 * 5.0, rho0)
            cc = riccati_cache_newton(A, Bm, Q, R, r, K)
            return cc.Kinf
        return jax.lax.fori_loop(0, n, body, K0)
    s_newt = slope(chain_newt, caches0.Kinf)
    print(f"newton refresh (x5 rho jump):       {s_newt*1e3:8.3f} ms/round")

    # --- stage: repack ------------------------------------------------------
    Xref = prob_b.Xref

    @jax.jit
    def chain_repack(hp, n):
        def body(_, h):
            # thread a data-dependent ~1.0 scalar through the cache so the
            # repack can't be hoisted out of the loop
            s = 1.0 + h.pterm[0, 0] * 1e-30
            c = jax.tree.map(lambda x: x * s, caches0)
            return repack_hetero_caches(h, c, Xref)
        return jax.lax.fori_loop(0, n, body, hp)
    s_rep = slope(chain_repack, hp0)
    print(f"repack_hetero_caches:      {s_rep*1e3:8.3f} ms/round")

    # --- full loop ----------------------------------------------------------
    f = lambda: solve_adaptive_rho_hetero(
        x0s, prob_b, A, Bm, Q, R, rho0, settings,
        chunk=chunk, max_rounds=40, riccati="kernel")
    res = jax.block_until_ready(f())
    t = timed(f)
    rounds = int(res.rounds)
    print(f"full adaptive loop: {t*1e3:8.2f} ms  ({B/t:,.0f} solves/s)  "
          f"rounds {rounds}")
    per_round = t / max(rounds, 1)
    acc = s_chunk + s_ric + s_rep
    print(f"per round: {per_round*1e3:.3f} ms  | stage sum {acc*1e3:.3f} ms "
          f"(chunk {100*s_chunk/per_round:.0f}%  ric {100*s_ric/per_round:.0f}%  "
          f"repack {100*s_rep/per_round:.0f}%  "
          f"other {100*(per_round-acc)/per_round:.0f}%)")

    # --- full loop, newton refresh ------------------------------------------
    fn = lambda: solve_adaptive_rho_hetero(
        x0s, prob_b, A, Bm, Q, R, rho0, settings,
        chunk=chunk, max_rounds=40, riccati="newton")
    resn = jax.block_until_ready(fn())
    tn = timed(fn)
    print(f"full adaptive loop (newton): {tn*1e3:8.2f} ms  "
          f"({B/tn:,.0f} solves/s)  rounds {int(resn.rounds)}  "
          f"speedup {t/tn:.2f}x")
    same = float(np.mean(np.asarray(res.total_iter)
                         == np.asarray(resn.total_iter)))
    solved_fp = float(np.mean(np.asarray(res.solved)))
    solved_nt = float(np.mean(np.asarray(resn.solved)))
    print(f"schedule agreement (exact-iter): {same:.3f}  "
          f"solved fp {solved_fp:.3f} vs newton {solved_nt:.3f}")


if __name__ == "__main__":
    main()
