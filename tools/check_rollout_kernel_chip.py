"""On-chip perf + parity for the in-kernel rollout (ops/fused_rollout.py):
the whole K-tick MPC mission in one Pallas launch vs the scan-of-kernels
rollout (api/mpc.fused_mpc_rollout).

Timing uses the in-jit repeat SLOPE method (see CLAUDE.md): dispatch
latency through this deployment's relay is sticky per executable
(0.1-25 ms for identical work), so single-dispatch walls are unusable for
sub-50 ms workloads. Each config is timed as a lax.scan of n dependent
missions inside ONE jit; slope = (t[5] - t[1]) / 4 is pure on-device time.

Run on the TPU:  python tools/check_rollout_kernel_chip.py [B] [ticks]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.api import fused_mpc_rollout
from accelerated_tinympc_tpu.ops import pad_problem
from accelerated_tinympc_tpu.ops.fused_admm import FusedCarry
from accelerated_tinympc_tpu.ops.fused_rollout import (
    fused_rollout, rollout_ops,
)
from accelerated_tinympc_tpu.precompute import condensed_operators

TOL = 1e-3


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
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 70
    print("devices:", jax.devices())
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    problem, cache, x0 = atm.models.quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rops = rollout_ops(problem, pp)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, 12)),
        jnp.float32,
    )
    S = B * ticks

    def k_mission(x, c, max_iter, check):
        res = fused_rollout(x, c, pp, rops, ticks, max_iter=max_iter,
                            check_termination=check,
                            abs_pri_tol=TOL, abs_dua_tol=TOL)
        return res.x_final, res.final.carry

    def w_mission(x, c, max_iter, check):
        xf, _us, cf = fused_mpc_rollout(
            pp, x, ticks, problem=problem, max_iter=max_iter,
            check_termination=check, carry=c,
            abs_pri_tol=TOL, abs_dua_tol=TOL)
        return xf, cf

    def slope(mission, x, c, cold, max_iter, check):
        """On-device ms per mission. ``cold=True`` re-enters each mission
        from the original (x, c) — threading only a tiny data dependence —
        so every repeat is a cold-start mission; ``cold=False`` threads
        (x, carry) so repeats are warm steady-state continuations. ONE
        executable with a runtime repeat count: sticky dispatch latency is
        per-executable, so a two-executable slope could carry two
        different dispatches and bias the difference."""
        @jax.jit
        def f(x0_, c0_, n):
            def body(_, carry):
                xx, cc = carry
                xf, cf = mission(xx, cc, max_iter, check)
                if cold:
                    # fresh mission, dependence kept (don't let XLA DCE)
                    xf = x0_ + xf.sum() * 1e-30
                    cf = c0_
                return (xf, cf)
            return jax.lax.fori_loop(0, n, body, (x0_, c0_))[0]
        return (timed(f, x, c, jnp.int32(5))
                - timed(f, x, c, jnp.int32(1))) / 4

    cz = FusedCarry.zeros(B, pp)
    print(f"--- cold 70-tick missions (B={B}) ------------- on-device slope")
    base = slope(k_mission, x0s, cz, True, 100, 0)
    for label, mission in (("in-kernel", k_mission), ("wrapper", w_mission)):
        for mi, ck in ((100, 0), (100, 1), (100, 10)):
            s = slope(mission, x0s, cz, True, mi, ck)
            tag = "fixed/100" if ck == 0 else f"adaptive/{ck}"
            print(f"{label:10s} {tag:11s}: {s*1e3:7.1f} ms  "
                  f"{S/s:13,.0f} solves/s  ({base/s:.2f}x fixed in-kernel)",
                  flush=True)

    # warm steady-state: converge 30 ticks, then thread (x, carry)
    kw = jax.jit(lambda x: fused_rollout(
        x, FusedCarry.zeros(B, pp), pp, rops, 30, max_iter=100,
        check_termination=1))
    r = jax.block_until_ready(kw(x0s))
    xw, cw = r.x_final, r.final.carry
    print(f"--- warm steady-state missions (hover-hold) -------------------")
    for label, mission in (("in-kernel", k_mission), ("wrapper", w_mission)):
        for ck in (1, 5):
            s = slope(mission, xw, cw, False, 100, ck)
            print(f"{label:10s} adaptive/{ck:2d}: {s*1e3:7.2f} ms  "
                  f"{S/s:13,.0f} solves/s", flush=True)

    # parity + schedule agreement vs the wrapper (adaptive, check 1)
    k1 = jax.jit(lambda x: fused_rollout(
        x, FusedCarry.zeros(B, pp), pp, rops, ticks, max_iter=100,
        check_termination=1, abs_pri_tol=TOL, abs_dua_tol=TOL))
    r = jax.block_until_ready(k1(x0s))
    w1 = jax.jit(lambda x: fused_mpc_rollout(
        pp, x, ticks, problem=problem, max_iter=100, check_termination=1,
        abs_pri_tol=TOL, abs_dua_tol=TOL))
    xf_w, us_w, _ = jax.block_until_ready(w1(x0s))
    du = float(jnp.abs(r.us - us_w).max())
    dx = float(jnp.abs(r.x_final - xf_w).max())
    it = np.asarray(r.iters)
    print(f"parity vs wrapper (check 1): max|dU|={du:.2e} max|dXf|={dx:.2e}")
    print(f"mean iters/tick: first={it[0].mean():.1f} "
          f"warm(last 10)={it[-10:].mean():.2f} overall={it.mean():.2f}")
    print("(knife-edge schedule flips at check=1 can push max|dU| to ~1e-4"
          " scale on a few instances — same phenomenon as the cascade slot"
          " realignment, BASELINE.md)")


if __name__ == "__main__":
    main()
