"""On-chip per-iteration cost probe for the batched Riccati kernel
(ops/riccati_kernel.py) — the refresh stage that bounds adaptive-rho fleet
throughput (BASELINE.md: the fused adaptive loop is refresh-bound).

Protocol (CLAUDE.md sticky-dispatch rule): each fixed-iteration config is
timed with the single-executable runtime-repeat slope — one jit chains n
dependent kernel calls (the output P/K warm-start the next call) via
lax.fori_loop with n an int32 operand, slope = (t(5) - t(1)) / 4. The
per-Riccati-iteration cost is then the *difference of two slopes* at two
static max_iters values (each slope is already dispatch-free, so the
difference is pure iteration work).

Run on the TPU:  python tools/probe_riccati_kernel_chip.py [B]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from accelerated_tinympc_tpu.models.random_lti import random_lti_problem
from accelerated_tinympc_tpu.ops.riccati_kernel import riccati_cache_kernel


def timed(fn, *a, reps=7):
    jax.block_until_ready(fn(*a))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    nx, nu = 12, 4
    print("devices:", jax.devices())
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    rng = np.random.default_rng(0)
    n_plants = 32
    As, Bs = [], []
    for i in range(n_plants):
        p, _ = random_lti_problem(i, nx, nu, 10)
        As.append(np.asarray(p.A))
        Bs.append(np.asarray(p.B))
    reps_t = -(-B // n_plants)
    A = jnp.asarray(np.tile(np.stack(As), (reps_t, 1, 1))[:B], jnp.float32)
    Bm = jnp.asarray(np.tile(np.stack(Bs), (reps_t, 1, 1))[:B], jnp.float32)
    Q = jnp.ones((B, nx), jnp.float32) * 10.0
    R = jnp.ones((B, nu), jnp.float32)
    rho = jnp.full((B,), 5.0, jnp.float32)
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    # Cold caches for the warm-start threading (also warms the lowering).
    cold = riccati_cache_kernel(A, Bm, Q, R, rho, max_iters=1)
    P00, K00 = cold.Pinf, cold.Kinf

    def chain(iters):
        @jax.jit
        def run(P0, K0, n):
            def body(_, c):
                P, K = c
                cc = riccati_cache_kernel(
                    A, Bm, Q, R, rho, max_iters=iters, tol=0.0,
                    P0=P, K0=K,
                )
                return (cc.Pinf, cc.Kinf)
            return jax.lax.fori_loop(0, n, body, (P0, K0))
        return run

    def slope(iters):
        run = chain(iters)
        t1 = timed(run, P00, K00, jnp.int32(1))
        t5 = timed(run, P00, K00, jnp.int32(5))
        return (t5 - t1) / 4

    s10 = slope(10)
    s40 = slope(40)
    per_iter = (s40 - s10) / 30
    fixed = s10 - 10 * per_iter
    # FLOPs per Riccati iteration per lane (MACs x2):
    # BtP nu*nx*nx, Mc nu*nx*nu, BtPA nu*nx*nx, BK nx*nu*nx,
    # T2 nx^3, Pn nx^3, chol+solves ~ nu^2*(nu/3 + nx) small.
    macs = (3 * nu * nx * nx + nu * nx * nu + nx * nu * nx
            + 2 * nx ** 3 + nu * nu * (nu // 3 + nx))
    flops = 2.0 * macs * B
    print(f"B={B}  slope(10 iters)={s10*1e3:.3f} ms  "
          f"slope(40 iters)={s40*1e3:.3f} ms")
    print(f"per-Riccati-iteration: {per_iter*1e6:.1f} us  "
          f"fixed overhead/call: {fixed*1e3:.3f} ms")
    print(f"useful FLOP/iter = {flops:.3e}  ->  "
          f"{flops / per_iter / 1e9:.1f} GFLOP/s "
          f"({100 * flops / per_iter / 7.7e12:.2f}% of 4-ALU VPU peak)")
    # Full-build rate at reference stopping rule for context.
    full = jax.jit(lambda: riccati_cache_kernel(
        A, Bm, Q, R, rho, max_iters=500, tol=1e-5))
    t = timed(full)
    it_used = None
    print(f"full build (tol 1e-5) wall: {t*1e3:.2f} ms "
          f"({B / t:.0f} caches/s, wall incl. dispatch)")


if __name__ == "__main__":
    main()
