"""Matched per-instance-plant long-horizon head-to-head (round 5).

The round-3 measurement showed the vmapped scan tier (problem_axes=0)
beating the hstream kernel 15x at N=256/B=4096; round 5 adds the
per-instance block-condensed tier (solver/block_condensed.solve_block_batched
— device-built dense block operators per instance, MXU contractions).
Matched (N, B, iterations), min-of-reps wall (calls >> 50 ms).

Run on the TPU:  python tools/bench_fleet_long_horizon_chip.py [iters]
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
from accelerated_tinympc_tpu.precompute import riccati_cache
from accelerated_tinympc_tpu.solver.batched import init_state_batched, solve_batched
from accelerated_tinympc_tpu.solver.block_condensed import (
    block_ops_batched, solve_block_batched,
)


def timed(fn, reps=2):
    jax.block_until_ready(fn())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print("devices:", jax.devices())
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    nx, nu = 8, 3
    for N, B in ((256, 1024),):
        seeds = 16
        probs, caches = [], []
        for s in range(seeds):
            p, rho = random_lti_problem(seed=s, nx=nx, nu=nu, horizon=N)
            probs.append(p)
            caches.append(riccati_cache(
                np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q),
                np.asarray(p.R), rho))
        reps_t = -(-B // seeds)
        prob_b = jax.tree.map(
            lambda *xs: jnp.asarray(np.tile(
                np.stack([np.asarray(x) for x in xs]),
                (reps_t,) + (1,) * np.asarray(xs[0]).ndim)[:B]),
            *probs)
        cache_b = jax.tree.map(
            lambda *xs: jnp.asarray(np.tile(
                np.stack([np.asarray(x) for x in xs]),
                (reps_t,) + (1,) * np.asarray(xs[0]).ndim)[:B]),
            *caches)
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(rng.standard_normal((B, nx)) * 0.3, jnp.float32)
        jax.jit(lambda a: (a @ a.T).sum())(
            jnp.ones((8, 128))).block_until_ready()

        settings = atm.Settings(max_iter=iters, check_termination=0)
        st0 = init_state_batched(B, nx, nu, N)
        st0 = st0.replace(x=st0.x.at[:, 0, :].set(x0s))
        scan_fn = jax.jit(lambda s: solve_batched(
            s, prob_b, cache_b, settings, problem_axes=0, cache_axes=0))
        t_scan = timed(lambda: scan_fn(st0))

        best = (np.inf, None, None)
        for kb in (4, 16):  # both ends: op-traffic-light vs step-count-light
            t_build0 = time.perf_counter()
            ops = jax.block_until_ready(block_ops_batched(
                cache_b, prob_b.A, prob_b.B, N, kb))
            t_build = time.perf_counter() - t_build0
            # Pass the big per-instance operators as traced ARGUMENTS —
            # closure capture bakes them into the HLO as constants and
            # blows the relay compile-payload ceiling (HTTP 413).
            bfn = jax.jit(lambda s, om, ot, kb=kb: solve_block_batched(
                s, prob_b, cache_b, settings, block=kb,
                ops=(om, ot, kb)))
            t = timed(lambda: bfn(st0, ops[0], ops[1]))
            if t < best[0]:
                best = (t, kb, t_build)
        t_blk, kbb, t_build = best

        su = np.asarray(jax.block_until_ready(scan_fn(st0)).u)
        opsb = block_ops_batched(cache_b, prob_b.A, prob_b.B, N, kbb)
        bu = np.asarray(jax.block_until_ready(jax.jit(
            lambda s, om, ot: solve_block_batched(
                s, prob_b, cache_b, settings, block=kbb,
                ops=(om, ot, kbb)))(st0, opsb[0], opsb[1])).u)
        du = float(np.abs(bu - su).max())

        print(f"fleet N={N} B={B} iters={iters}: "
              f"scan(problem_axes=0) {t_scan * 1e3:8.1f} ms "
              f"({B / t_scan:8.0f} solves/s)   "
              f"block(kb={kbb}) {t_blk * 1e3:8.1f} ms "
              f"({B / t_blk:8.0f} solves/s, {t_scan / t_blk:.2f}x scan; "
              f"one-time op build {t_build:.2f}s)   parity {du:.1e}")


if __name__ == "__main__":
    main()
