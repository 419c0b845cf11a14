"""Matched long-horizon head-to-head (round 5, VERDICT item 1).

Every prior BASELINE long-horizon number compared across different batch
sizes, iteration counts, or single-instance denominators. This measures the
two shared-plant long-horizon paths at MATCHED (N, B, iterations) on chip:

* vmapped scan tier (`solve_batched`, fixed-iteration mode) — XLA lax.scan
  sweeps, batched einsum contractions on the MXU, iterates round-tripping
  HBM between iterations under XLA's fusion choices;
* streaming kernel (`stream_solve`, fixed mode) — in-kernel sequential
  sweeps over knot blocks, double-buffered HBM<->VMEM DMA, every
  elementwise stage fused into its producing sweep.

Calls at these shapes cost >= 100 ms, so wall timing (warm-up + min of
reps) is measurement-grade per the round-4 protocol (slope only needed
under ~50 ms).

Run on the TPU:  python tools/bench_long_horizon_chip.py [iters]
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
from accelerated_tinympc_tpu.ops.stream_admm import (
    StreamCarry, pad_stream_problem, stream_solve,
)
from accelerated_tinympc_tpu.precompute import riccati_cache
from accelerated_tinympc_tpu.solver.batched import init_state_batched, solve_batched


def timed(fn, reps=2):
    jax.block_until_ready(fn())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def make_problem(N, nx=8, nu=3):
    p, rho = random_lti_problem(seed=5, nx=nx, nu=nu, horizon=N)
    cache = riccati_cache(
        np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q), np.asarray(p.R),
        rho,
    )
    return p, cache


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print("devices:", jax.devices())
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    import ast
    shapes = (ast.literal_eval(sys.argv[2]) if len(sys.argv) > 2
              else [(256, 2048), (1024, 512)])
    for N, B in shapes:
        p, cache = make_problem(N)
        nx, nu = 8, 3
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(rng.standard_normal((B, nx)) * 0.3, jnp.float32)
        jax.jit(lambda a: (a @ a.T).sum())(
            jnp.ones((8, 128))).block_until_ready()

        settings = atm.Settings(max_iter=iters, check_termination=0)
        st0 = init_state_batched(B, nx, nu, N)
        st0 = st0.replace(x=st0.x.at[:, 0, :].set(x0s))
        scan_fn = jax.jit(lambda s: solve_batched(s, p, cache, settings))
        t_scan = timed(lambda: scan_fn(st0))

        # Block-condensed tier (round 5): MXU-sized block contractions.
        from accelerated_tinympc_tpu.solver.block_condensed import solve_block

        best_block = (np.inf, None)
        for kb in (16, 32, 64):
            bfn = jax.jit(jax.vmap(
                lambda s, kb=kb: solve_block(s, p, cache, settings, block=kb),
            ))
            t = timed(lambda: bfn(st0))
            if t < best_block[0]:
                best_block = (t, kb)
        t_blk, kbb = best_block

        sp = pad_stream_problem(p, cache)
        carry0 = StreamCarry.zeros(B, sp)
        best_stream = (np.inf, None)
        for kb in (16, 32, 64):
            sfn = jax.jit(lambda x, c, kb=kb: stream_solve(
                x, c, sp, max_iter=iters, knot_block=kb))
            t = timed(lambda: sfn(x0s, carry0))
            if t < best_stream[0]:
                best_stream = (t, kb)
        t_stream, kb = best_stream

        # Parity sanity at matched iterations.
        su = np.asarray(jax.block_until_ready(scan_fn(st0)).u)
        rv = jax.block_until_ready(
            jax.jit(lambda x, c: stream_solve(
                x, c, sp, max_iter=iters, knot_block=kb))(x0s, carry0))
        du = float(np.abs(np.asarray(rv.U)[:, :, :nu] - su).max())

        # Block-tier parity at matched iterations.
        bu = np.asarray(jax.block_until_ready(jax.jit(jax.vmap(
            lambda s: solve_block(s, p, cache, settings, block=kbb)
        ))(st0)).u)
        du_b = float(np.abs(bu - su).max())

        its = B * iters
        print(f"N={N} B={B} iters={iters}: "
              f"scan {t_scan * 1e3:8.1f} ms ({its / t_scan / 1e6:6.2f} M iters/s, "
              f"{B / t_scan:8.0f} solves/s)   "
              f"block(kb={kbb}) {t_blk * 1e3:8.1f} ms "
              f"({B / t_blk:8.0f} solves/s, {t_scan / t_blk:.2f}x scan, "
              f"parity {du_b:.1e})   "
              f"stream(kb={kb}) {t_stream * 1e3:8.1f} ms "
              f"({its / t_stream / 1e6:6.2f} M iters/s, {B / t_stream:8.0f} solves/s)   "
              f"stream/scan {t_scan / t_stream:.2f}x   parity {du:.1e}")


if __name__ == "__main__":
    main()
