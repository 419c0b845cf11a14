"""On-chip check + measurement: OSQP-style over-relaxation (Settings.alpha)
in the fused kernel (round 5, VERDICT item 7).

Compile-checks the alpha != 1 fused kernel on real Mosaic (the interpreter
accepts layouts the chip rejects — CLAUDE.md), then measures per-instance
iteration histograms at B=4096 on the two regimes the CPU probe identified:

* cold constraint-bound hovering (x0 perturbation 0.05, tol 0.01) — the
  regime where plain ADMM stalls and relaxation should help;
* the easy random-LTI population (tol 0.02) — the measured negative
  (inactive constraints -> slack settle becomes a |1-alpha| filter).

Run on the TPU:  python tools/check_relaxation_chip.py [B]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import (
    quadrotor_hovering_setup, random_lti_problem,
)
from accelerated_tinympc_tpu.ops.fused_admm import (
    FusedCarry, fused_solve, pad_problem,
)
from accelerated_tinympc_tpu.precompute import condensed_operators, riccati_cache


def hist(tag, stats):
    it = np.asarray(stats[:, 0])
    solved = np.asarray(stats[:, 1]) > 0.5
    print(f"{tag}: solved {solved.mean():.1%}  iters mean={it.mean():.1f} "
          f"p50={np.median(it):.0f} p90={np.percentile(it, 90):.0f} "
          f"max={it.max():.0f}")
    return it


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print("devices:", jax.devices())
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    problem, cache, x0 = quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, 12)),
        jnp.float32,
    )
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    its = {}
    for a in (1.0, 1.6):
        res = jax.block_until_ready(fused_solve(
            x0s, FusedCarry.zeros(B, pp), pp, max_iter=500,
            check_termination=1, abs_pri_tol=0.01, abs_dua_tol=0.01,
            alpha=a,
        ))
        its[a] = hist(f"hovering cold tol=0.01 alpha={a}", res.stats)
    print(f"hovering iteration ratio (1.6/1.0): "
          f"{its[1.6].mean() / its[1.0].mean():.3f}")

    # Easy regime: one shared random-LTI plant, loose tol.
    p, rho = random_lti_problem(seed=0, nx=8, nu=3, horizon=10)
    c = riccati_cache(np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q),
                      np.asarray(p.R), rho)
    ops2 = condensed_operators(c, np.asarray(p.A), np.asarray(p.B), 10)
    pp2 = pad_problem(p, c, ops2)
    x0r = jnp.asarray(rng.standard_normal((B, 8)) * 0.4, jnp.float32)
    for a in (1.0, 1.6):
        res = jax.block_until_ready(fused_solve(
            x0r, FusedCarry.zeros(B, pp2), pp2, max_iter=100,
            check_termination=1, abs_pri_tol=0.02, abs_dua_tol=0.02,
            alpha=a,
        ))
        hist(f"easy LTI tol=0.02 alpha={a}", res.stats)


if __name__ == "__main__":
    main()
