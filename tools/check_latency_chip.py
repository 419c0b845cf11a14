"""Slope-graded latency metrics standalone (same protocol as the
bench_suite latency section — run this to re-measure just latency without
the full suite). VERDICT r4 item 3: per-solve latency at B=1/8/128 and
adaptive-mission per-tick latency (cold/warm + derived p50/p99) vs the
reference's 10 ms @ 100 Hz budget
(reference: examples/problem_data/quadrotor_100hz_params.hpp:5).

Run on the TPU:  python tools/check_latency_chip.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.ops import (
    FusedCarry, fused_solve, pad_problem, unpad_controls,
)
from accelerated_tinympc_tpu.ops.fused_rollout import fused_rollout, rollout_ops
from accelerated_tinympc_tpu.precompute import condensed_operators


def best_time(fn, *args, reps=7):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("devices:", jax.devices())
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()
    problem, cache, x0 = atm.models.quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rng = np.random.default_rng(0)

    def perturbed(batch):
        return jnp.asarray(
            np.asarray(x0)[None] + 0.05 * rng.standard_normal((batch, 12)),
            jnp.float32,
        )

    CHAIN = 100
    for B in (1, 8, 128):
        x0s = perturbed(B)

        def chain_step(x, B=B):
            res = fused_solve(
                x, FusedCarry.zeros(B, pp), pp, max_iter=100,
                check_termination=0, batch_tile=min(128, B),
            )
            u0 = unpad_controls(res, pp)
            return (jnp.matmul(x, problem.A.T)
                    + jnp.matmul(u0, problem.B.T))

        @jax.jit
        def chains(x0_, n):
            def body(_, x):
                x, _ = jax.lax.scan(
                    lambda xx, _: (chain_step(xx), None), x, None,
                    length=CHAIN,
                )
                return x
            return jax.lax.fori_loop(0, n, body, x0_)

        t1 = best_time(chains, x0s, jnp.int32(1))
        t5 = best_time(chains, x0s, jnp.int32(5))
        s = (t5 - t1) / 4
        print(f"fused fixed-100 per-solve latency B={B}: "
              f"{s / CHAIN * 1e3:.4f} ms (slope)")

    B = 128
    x0s = perturbed(B)
    rops_l = rollout_ops(problem, pp)
    czl = FusedCarry.zeros(B, pp)

    def tick1(x, c, check, mi=100):
        res = fused_rollout(x, c, pp, rops_l, 1, max_iter=mi,
                            check_termination=check,
                            abs_pri_tol=1e-3, abs_dua_tol=1e-3,
                            batch_tile=128)
        return res.x_final, res.final.carry

    def slope1(x, c, cold, check, mi=100):
        @jax.jit
        def f(x0_, c0_, n):
            def body(_, carry):
                xx, cc = carry
                xf, cf = tick1(xx, cc, check, mi)
                if cold:
                    xf = x0_ + xf.sum() * 1e-30
                    cf = c0_
                return (xf, cf)
            return jax.lax.fori_loop(0, n, body, (x0_, c0_))[0]
        t1 = best_time(f, x, c, jnp.int32(1))
        t41 = best_time(f, x, c, jnp.int32(41))
        return max((t41 - t1) / 40, 0.0)

    t_cold = slope1(x0s, czl, True, 1)
    warm = jax.block_until_ready(fused_rollout(
        x0s, czl, pp, rops_l, 30, max_iter=100, check_termination=1,
        batch_tile=128))
    t_warm = slope1(warm.x_final, warm.final.carry, False, 1)
    print(f"mission tick latency cold: {t_cold * 1e3:.4f} ms  "
          f"warm: {t_warm * 1e3:.4f} ms  (B=128, check=1)")
    t10 = slope1(x0s, czl, True, 0, mi=10)
    t200 = slope1(x0s, czl, True, 0, mi=200)
    t_iter = max((t200 - t10) / 190, 0.0)
    t_over = max(t10 - 10 * t_iter, 0.0)
    mission = jax.block_until_ready(fused_rollout(
        x0s, czl, pp, rops_l, 70, max_iter=100, check_termination=1,
        batch_tile=128))
    it_t = np.asarray(mission.iters).max(axis=1)
    lat_t = (t_over + it_t * t_iter) * 1e3
    print(f"calib: t_iter={t_iter * 1e6:.2f} us t_overhead="
          f"{t_over * 1e6:.2f} us; adaptive-mission tick latency "
          f"p50={np.percentile(lat_t, 50):.4f} ms "
          f"p99={np.percentile(lat_t, 99):.4f} ms (derived; budget 10 ms)")


if __name__ == "__main__":
    main()
