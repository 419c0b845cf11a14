"""Receding-horizon missions at kernel speed: the ENTIRE K-tick MPC loop —
dual reset, warm-started adaptive solve, pre-projection u0 applied to the
plant — runs inside ONE Pallas kernel launch (ops/fused_rollout.py).

The reference runs this loop on the host, one tiny_solve per tick
(reference: examples/quadrotor_hovering.cpp:90-114). The scan-of-kernels
form (api/mpc.fused_mpc_rollout) already fuses the loop into one XLA
program; this tier goes further — the tick loop itself is in-kernel, so
the warm-start carry never leaves VMEM between ticks. Measured on one v5e
chip (BASELINE.md round 4): 7.1M solves/s on cold 70-tick missions, 45M
solves/s sustained once warm.

Run: python examples/mission_kernel.py [--batch 4096] [--ticks 70]
     [--check 10] [--track]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.ops import (
    FusedCarry, fused_rollout, pad_problem, rollout_const_seq, rollout_ops,
)
from accelerated_tinympc_tpu.precompute import condensed_operators


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=70)
    ap.add_argument("--check", type=int, default=10,
                    help="termination-check cadence (0 = fixed 100 iters; "
                         "10 suits cold missions, 1 warm steady-state)")
    ap.add_argument("--track", action="store_true",
                    help="track the 20 Hz y-axis-line trajectory instead of "
                         "hovering (per-tick reference window streamed "
                         "in-kernel)")
    args = ap.parse_args()
    interpret = jax.devices()[0].platform != "tpu"

    if args.track:
        problem, cache, x0, Xref_total = atm.models.quadrotor_tracking_setup()
        Xref_total = jnp.asarray(Xref_total)
        ticks = min(args.ticks, Xref_total.shape[0] - problem.horizon - 1)
    else:
        problem, cache, x0 = atm.models.quadrotor_hovering_setup()
        Xref_total, ticks = None, args.ticks

    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rops = rollout_ops(problem, pp)
    const_seq = None
    if Xref_total is not None:
        const_seq = rollout_const_seq(
            pp, problem.Q, cache.Pinf, Xref_total, ticks
        )

    rng = np.random.default_rng(0)
    B = args.batch if not interpret else min(args.batch, 8)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, 12)),
        jnp.float32,
    )

    mission = jax.jit(lambda x, c: fused_rollout(
        x, c, pp, rops, ticks, max_iter=100,
        check_termination=args.check, abs_pri_tol=1e-3, abs_dua_tol=1e-3,
        const_seq=const_seq, interpret=interpret,
    ))
    res = jax.block_until_ready(mission(x0s, FusedCarry.zeros(B, pp)))

    it = np.asarray(res.iters)
    ref = (np.asarray(Xref_total[ticks]) if Xref_total is not None
           else np.asarray(problem.Xref[0]))
    err = np.linalg.norm(np.asarray(res.x_final) - ref[None], axis=-1)
    print(f"{ticks}-tick mission, batch {B}, one kernel launch "
          f"({'tracking' if args.track else 'hovering'}):")
    print(f"  iterations/tick: first {it[0].mean():.1f}, "
          f"last {it[-1].mean():.2f}, total mean {it.mean():.2f}")
    print(f"  final tracking error: mean {err.mean():.4f}, "
          f"max {err.max():.4f}")
    print(f"  u0 trace shape {tuple(res.us.shape)}; warm carry returned "
          "for mission continuation")

    # continue the mission 10 more ticks from the returned warm state
    cont = jax.jit(lambda x, c: fused_rollout(
        x, c, pp, rops, 10, max_iter=100, check_termination=max(args.check, 1),
        abs_pri_tol=1e-3, abs_dua_tol=1e-3, interpret=interpret,
    )) if Xref_total is None else None
    if cont is not None:
        res2 = jax.block_until_ready(cont(res.x_final, res.final.carry))
        print(f"  +10 warm ticks: iterations/tick "
              f"{np.asarray(res2.iters).mean(axis=-1).round(2).tolist()}")


if __name__ == "__main__":
    main()
