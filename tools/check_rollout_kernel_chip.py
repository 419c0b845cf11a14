"""On-chip perf + parity for the in-kernel rollout (ops/fused_rollout.py):
the whole K-tick MPC mission in one Pallas launch vs the scan-of-kernels
rollout (api/mpc.fused_mpc_rollout).

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
    rops = rollout_ops(problem, pp)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, 12)),
        jnp.float32,
    )
    S = B * ticks

    # scan-of-kernels baselines (measured in check_rollout_adaptive_chip.py;
    # re-timed here for a same-session comparison)
    w_fix = jax.jit(lambda x: fused_mpc_rollout(
        pp, x, ticks, problem=problem, max_iter=100)[0])
    t = timed(lambda: w_fix(x0s))
    t_wfix = t
    print(f"scan-of-kernels fixed 100:   {t*1e3:8.1f} ms  "
          f"{S/t:12,.0f} solves/s", flush=True)
    w_ad = jax.jit(lambda x: fused_mpc_rollout(
        pp, x, ticks, problem=problem, max_iter=100, check_termination=10,
        abs_pri_tol=TOL, abs_dua_tol=TOL)[0])
    t = timed(lambda: w_ad(x0s))
    print(f"scan-of-kernels adaptive/10: {t*1e3:8.1f} ms  "
          f"{S/t:12,.0f} solves/s", flush=True)

    # in-kernel rollout
    k_fix = jax.jit(lambda x: fused_rollout(
        x, FusedCarry.zeros(B, pp), pp, rops, ticks, max_iter=100).x_final)
    t = timed(lambda: k_fix(x0s))
    print(f"in-kernel fixed 100:         {t*1e3:8.1f} ms  "
          f"{S/t:12,.0f} solves/s   {t_wfix/t:.2f}x scan-of-kernels fixed",
          flush=True)
    for check in (1, 5, 10):
        k_ad = jax.jit(lambda x, c=check: fused_rollout(
            x, FusedCarry.zeros(B, pp), pp, rops, ticks, max_iter=100,
            check_termination=c, abs_pri_tol=TOL,
            abs_dua_tol=TOL).x_final)
        t = timed(lambda: k_ad(x0s))
        print(f"in-kernel adaptive/{check:2d}:       {t*1e3:8.1f} ms  "
              f"{S/t:12,.0f} solves/s   {t_wfix/t:.2f}x "
              "scan-of-kernels fixed", flush=True)

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
    print(f"parity vs scan-of-kernels (check 1): max|dU|={du:.2e} "
          f"max|dXf|={dx:.2e}  ({'OK' if du < 1e-4 else 'FAIL'})")
    print(f"mean iters/tick: first={it[0].mean():.1f} "
          f"warm(last 10)={it[-10:].mean():.2f} overall={it.mean():.2f}")


if __name__ == "__main__":
    main()
