"""On-chip check: SOC cones inside the in-kernel mission kernel (round 5).

The Pallas interpreter accepts Mosaic-illegal patterns silently, so any new
in-kernel code path must be compile-checked on the real chip (CLAUDE.md).
This runs the powered-descent fleet mission (ops/fused_rollout.py with
cone_ops) on chip, checks parity against the scan-of-kernels coned rollout
(api/mpc.fused_mpc_rollout, whose coned solve kernel is already chip-proven),
and slope-times both (in-jit fori repeat — sticky-dispatch-proof).

Run on the TPU:  python tools/check_coned_mission_chip.py [B] [ticks]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from accelerated_tinympc_tpu.api import fused_mpc_rollout
from accelerated_tinympc_tpu.ops.fused_admm import (
    FusedCarry, pad_cones, pad_problem,
)
from accelerated_tinympc_tpu.ops.fused_rollout import fused_rollout, rollout_ops
from accelerated_tinympc_tpu.precompute import condensed_operators
from accelerated_tinympc_tpu.solver.cones import Cone, ConeSet, cone_violation

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "examples"))
from soc_landing import landing_problem  # noqa: E402


def slope_time(make_fn, ns=(1, 5)):
    """Seconds per unit-n from a jitted fn(n) with a runtime repeat count."""
    f = jax.jit(make_fn)
    for n in ns:
        jax.block_until_ready(f(jnp.int32(n)))  # compile+warm both points
    ts = []
    for n in ns:
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (ns[1] - ns[0])


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    print("devices:", jax.devices())
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    problem, cache = landing_problem(15)
    tilt = Cone(ball=(0, 1), axis=2, mu=1.0, shift=3.0)
    glide = Cone(ball=(0, 1), axis=2, mu=2.0, shift=0.1)
    cones = ConeSet(input_cones=(tilt,), state_cones=(glide,))
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    cone_ops = pad_cones(pp, cones)
    rops = rollout_ops(problem, pp)
    rng = np.random.default_rng(0)
    base = np.asarray([3.0, -2.0, 6.0, 1.0, 0.5, -1.0])
    x0s = jnp.asarray(base[None] + rng.standard_normal((B, 6)) * 0.3,
                      jnp.float32)
    carry0 = FusedCarry.zeros(B, pp)
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    kw = dict(max_iter=100, check_termination=2,
              abs_pri_tol=1e-3, abs_dua_tol=1e-3)

    # 1. Compile + run the coned in-kernel mission on chip.
    res = jax.block_until_ready(fused_rollout(
        x0s, carry0, pp, rops, ticks, cone_ops=cone_ops, **kw))
    m = problem.horizon - 1
    Z = np.asarray(res.final.carry.Z[:, : m * 3]).reshape(B, m, 3)
    slack_v = float(cone_violation(jnp.asarray(Z), tilt))
    pos = np.linalg.norm(np.asarray(res.x_final)[:, :3], axis=1)
    print(f"in-kernel coned mission COMPILED+RAN: final |pos| "
          f"p50={np.median(pos):.4f} max={pos.max():.4f} "
          f"slack tilt violation {slack_v:.2e}")

    # 2. Parity vs the scan-of-kernels coned rollout. Fixed mode first
    #    (no freezing knife edges — this is the tight numerical bar), then
    #    adaptive (schedule shifts near check thresholds are expected to
    #    show up at the solve-tolerance scale, not the 1e-4 bar).
    fkw = dict(max_iter=30, check_termination=0)
    rf = jax.block_until_ready(fused_rollout(
        x0s, carry0, pp, rops, ticks, cone_ops=cone_ops, **fkw))
    xf_f, us_f, _ = jax.block_until_ready(fused_mpc_rollout(
        pp, x0s, ticks, problem=problem, cone_ops=cone_ops, **fkw))
    du_f = float(np.abs(np.asarray(rf.us) - np.asarray(us_f)).max())
    print(f"fixed-mode parity vs scan-of-kernels: max|du0|={du_f:.2e} "
          f"{'OK' if du_f < 1e-4 else 'FAIL'}")

    xf, us, _ = jax.block_until_ready(fused_mpc_rollout(
        pp, x0s, ticks, problem=problem, cone_ops=cone_ops, **kw))
    du = float(np.abs(np.asarray(res.us) - np.asarray(us)).max())
    dx = float(np.abs(np.asarray(res.x_final) - np.asarray(xf)).max())
    print(f"adaptive parity vs scan-of-kernels: max|du0|={du:.2e} "
          f"max|dxf|={dx:.2e} "
          f"{'OK' if du < 1e-4 and dx < 1e-4 else 'tol-scale (expected)'}")

    # 3. Slope-timed sustained warm ticking (the mission-kernel regime:
    #    the fleet has landed, each tick's solve converges in ~2 iters;
    #    chain missions through (x_final, carry) so state stays warm).
    warm = (res.x_final, res.final.carry)
    wkw = dict(max_iter=100, check_termination=1,
               abs_pri_tol=1e-3, abs_dua_tol=1e-3)

    def mission_kernel(n):
        def body(_, c):
            x, cy = c
            r = fused_rollout(x, cy, pp, rops, ticks,
                              cone_ops=cone_ops, **wkw)
            return (r.x_final, r.final.carry)
        x, cy = jax.lax.fori_loop(0, n, body, warm)
        return cy.Z.sum() + x.sum()

    def mission_scan(n):
        def body(_, c):
            x, cy = c
            xf, _us, cy2 = fused_mpc_rollout(
                pp, x, ticks, problem=problem, cone_ops=cone_ops,
                carry=cy, **wkw)
            return (xf, cy2)
        x, cy = jax.lax.fori_loop(0, n, body, warm)
        return cy.Z.sum() + x.sum()

    tk = slope_time(mission_kernel)
    ts = slope_time(mission_scan)
    rate_k = B * ticks / tk
    rate_s = B * ticks / ts
    print(f"warm sustained coned ticks: in-kernel {rate_k:,.0f} solves/s "
          f"({tk * 1e3:.1f} ms/{ticks} ticks)  scan-of-kernels "
          f"{rate_s:,.0f} ({ts * 1e3:.1f} ms)  ratio {rate_k / rate_s:.2f}x")


if __name__ == "__main__":
    main()
