"""On-chip measurement: adaptive (in-kernel early-exit) receding-horizon
rollouts vs fixed-iteration rollouts.

``fused_mpc_rollout`` / ``fleet_mpc_rollout`` with ``check_termination > 0``
run every tick's solve in the corresponding kernel's freezing mode
(the reference's per-tick early exit, examples/quadrotor_hovering.cpp:73-78
+ admm.cpp:135-144). Warm-started ticks converge in a handful of iterations,
so the sustained receding-horizon rate should far exceed the fixed-100 mode.
This script measures both on the real chip and checks adaptive-rollout
controls against the scan tier at matched settings.

Run on the TPU:  python tools/check_rollout_adaptive_chip.py [B] [ticks]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.api import (
    fleet_mpc_rollout, fused_mpc_rollout, mpc_rollout,
)
from accelerated_tinympc_tpu.ops import FusedCarry, fused_solve, pad_problem
from accelerated_tinympc_tpu.ops.fused_admm import unpad_controls
from accelerated_tinympc_tpu.precompute import condensed_operators

TOL = 1e-3


def timed(fn, reps=5):
    jax.block_until_ready(fn())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
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
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, 12)),
        jnp.float32,
    )
    tile = min(512, B)

    def roll(check, algo="f32"):
        return jax.jit(lambda x: fused_mpc_rollout(
            pp, x, ticks, problem=problem, max_iter=100, batch_tile=tile,
            check_termination=check, abs_pri_tol=TOL, abs_dua_tol=TOL,
            algo=algo,
        ))

    # warm the compile pipeline right before the first big jit (CLAUDE.md)
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    f_fixed = roll(0)
    t_fixed = timed(lambda: f_fixed(x0s)[0])
    print(f"fixed 100-iter rollout: {t_fixed*1e3:8.1f} ms  "
          f"{B*ticks/t_fixed:12,.0f} solves/s", flush=True)

    for check in (1, 5, 10):
        f_ad = roll(check)
        t_ad = timed(lambda: f_ad(x0s)[0])
        print(f"adaptive (check {check:2d}, tol {TOL}): {t_ad*1e3:8.1f} ms  "
              f"{B*ticks/t_ad:12,.0f} solves/s   {t_fixed/t_ad:.2f}x fixed",
              flush=True)

    f_ad3 = roll(5, "bf16x3")
    t_ad3 = timed(lambda: f_ad3(x0s)[0])
    print(f"adaptive bf16x3 (check 5): {t_ad3*1e3:8.1f} ms  "
          f"{B*ticks/t_ad3:12,.0f} solves/s   {t_fixed/t_ad3:.2f}x fixed",
          flush=True)

    # per-tick iteration counts (instrumented scan, f32 adaptive)
    @jax.jit
    def iters_per_tick(x):
        def tick(c, _):
            xx, cy = c
            res = fused_solve(
                xx, cy.reset_duals(), pp, max_iter=100, check_termination=1,
                abs_pri_tol=TOL, abs_dua_tol=TOL, batch_tile=tile,
            )
            u0 = unpad_controls(res, pp)
            hi = jax.lax.Precision.HIGHEST
            xn = (jnp.matmul(xx, problem.A.T, precision=hi)
                  + jnp.matmul(u0, problem.B.T, precision=hi))
            return (xn, res.carry), res.stats[:, 0].mean()
        _, it = jax.lax.scan(tick, (x, FusedCarry.zeros(B, pp)), None,
                             length=ticks)
        return it

    it = np.asarray(iters_per_tick(x0s))
    print(f"mean iters/tick: first={it[0]:.1f} warm(last 10)="
          f"{it[-10:].mean():.2f} overall={it.mean():.2f}")

    # parity: adaptive fused rollout vs scan tier at matched settings
    Bs = 8
    xf_f, us_f, _ = jax.jit(lambda x: fused_mpc_rollout(
        pp, x, ticks, problem=problem, max_iter=100, batch_tile=Bs,
        check_termination=1, abs_pri_tol=TOL, abs_dua_tol=TOL,
    ))(x0s[:Bs])
    settings = atm.Settings(max_iter=100, check_termination=1,
                            abs_pri_tol=TOL, abs_dua_tol=TOL)
    _, xf_s, trace = jax.jit(lambda x: mpc_rollout(
        problem, cache, settings, x, ticks, batched=True))(x0s[:Bs])
    du = float(np.abs(np.asarray(us_f) - np.asarray(trace.u)).max())
    dx = float(np.abs(np.asarray(xf_f) - np.asarray(xf_s)).max())
    print(f"parity vs scan tier (B={Bs}): max|dU|={du:.2e} max|dXf|={dx:.2e} "
          f"({'OK' if du < 1e-4 and dx < 1e-4 else 'FAIL'})")

    # --- fleet (heterogeneous plants) variant --------------------------------
    from accelerated_tinympc_tpu.models import random_lti_problem
    from accelerated_tinympc_tpu.ops.hetero_admm import (
        HeteroCarry, hetero_solve, pad_hetero_problem,
    )
    from accelerated_tinympc_tpu.precompute import riccati_cache

    Bh = min(16384, B * 4)
    n_plants = 32
    probs = [random_lti_problem(seed=s, nx=12, nu=4, horizon=10)[0]
             for s in range(n_plants)]
    caches = [riccati_cache(np.asarray(p.A), np.asarray(p.B),
                            np.asarray(p.Q), np.asarray(p.R), 5.0)
              for p in probs]
    reps_ = Bh // n_plants
    stk = lambda ts: jax.tree.map(
        lambda *xs: jnp.tile(
            jnp.stack([jnp.asarray(x) for x in xs]),
            (reps_,) + (1,) * jnp.asarray(xs[0]).ndim,
        ), *ts,
    )
    prob_h, cache_h = stk(probs), stk(caches)
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()
    hp = jax.jit(pad_hetero_problem)(prob_h, cache_h)
    hx0 = jnp.asarray(0.1 * rng.standard_normal((Bh, 12)), jnp.float32)

    fleet_ticks = 20
    froll = lambda check: jax.jit(lambda x: fleet_mpc_rollout(
        hp, prob_h, x, fleet_ticks, max_iter=100, check_termination=check,
        abs_pri_tol=TOL, abs_dua_tol=TOL,
    ))
    ff0 = froll(0)
    t_ff = timed(lambda: ff0(hx0)[0], reps=3)
    print(f"fleet fixed 100-iter (B={Bh}, {fleet_ticks} ticks): "
          f"{t_ff*1e3:8.1f} ms  {Bh*fleet_ticks/t_ff:12,.0f} solves/s",
          flush=True)
    ff1 = froll(1)
    t_fa = timed(lambda: ff1(hx0)[0], reps=3)
    print(f"fleet adaptive (check 1):  {t_fa*1e3:8.1f} ms  "
          f"{Bh*fleet_ticks/t_fa:12,.0f} solves/s   {t_ff/t_fa:.2f}x fixed",
          flush=True)

    @jax.jit
    def fleet_iters(x):
        def tick(c, _):
            xx, cy = c
            res = hetero_solve(xx, cy.reset_duals(), hp, max_iter=100,
                               check_termination=1,
                               abs_pri_tol=TOL, abs_dua_tol=TOL)
            u0 = res.U[:, 0, :]
            hi = jax.lax.Precision.HIGHEST
            xn = (jnp.einsum("bij,bj->bi", prob_h.A, xx, precision=hi)
                  + jnp.einsum("bij,bj->bi", prob_h.B, u0, precision=hi))
            return (xn, res.carry), res.stats[:, 0].mean()
        _, it = jax.lax.scan(tick, (x, HeteroCarry.zeros(hp)), None,
                             length=fleet_ticks)
        return it

    fit = np.asarray(fleet_iters(hx0))
    print(f"fleet mean iters/tick: first={fit[0]:.1f} "
          f"warm(last 5)={fit[-5:].mean():.2f}")


if __name__ == "__main__":
    main()
