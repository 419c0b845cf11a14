"""Heterogeneous-fleet scenario MPC with the TinyMPCFleet API.

The reference binds one problem per process (reference:
src/tinympc/tiny_wrapper.hpp:6); this example solves a fleet of *distinct*
random LTI plants — a plant-uncertainty / design-space sweep — in single
kernel dispatches: on-device Riccati precompute for every plant, adaptive
per-instance early termination, optional SOC thrust cones, optional
early-termination compaction, warm-started re-solves across a short
receding-horizon loop.

Run: python examples/fleet_sweep.py [--fleet 512] [--ticks 5]
     [--compaction 25] [--interpret]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import random_lti_problem


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fleet", type=int, default=512)
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--compaction", type=int, default=0,
                    help="cascade segment length (0 = one adaptive call)")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    B, N = args.fleet, args.horizon
    nx, nu = 8, 3
    n_distinct = min(B, 64)
    plants = [random_lti_problem(seed=s, nx=nx, nu=nu, horizon=N)[0]
              for s in range(n_distinct)]
    reps = -(-B // n_distinct)
    stack = lambda f: np.tile(
        np.stack([np.asarray(f(p)) for p in plants]),
        (reps,) + (1,) * f(plants[0]).ndim,
    )[:B]
    A = stack(lambda p: p.A)
    Bm = stack(lambda p: p.B)
    Q = stack(lambda p: p.Q)
    R = stack(lambda p: p.R)

    fleet = atm.TinyMPCFleet.setup(
        A, Bm, Q, R, rho=1.0, horizon=N,
        u_min=-2.0, u_max=2.0,
        settings=atm.Settings(max_iter=300, check_termination=1,
                              abs_pri_tol=5e-3, abs_dua_tol=5e-3),
        compaction_segment=args.compaction,
        interpret=args.interpret,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, nx)).astype(np.float32) * 0.5
    norm0 = np.linalg.norm(x, axis=1).mean()

    for t in range(args.ticks):
        fleet.set_x0(x)
        t0 = time.perf_counter()
        info = fleet.solve()
        dt = time.perf_counter() - t0
        u0 = np.asarray(fleet.get_u())[:, 0, :]
        # per-instance nominal plant step
        x = np.einsum("bij,bj->bi", A, x) + np.einsum("bij,bj->bi", Bm, u0)
        print(f"tick {t}: solved {info['converged_fraction']:.1%}  "
              f"iters mean {info['iterations_mean']:.1f}  "
              f"|x| mean {np.linalg.norm(x, axis=1).mean():.3f}  "
              f"({dt * 1e3:.1f} ms, {B / dt:,.0f} solves/s)")
        fleet.reset_duals()  # reference re-solve protocol

    # Random near-marginally-stable plants under tight input boxes decay
    # a few percent per tick — check sustained regulation, not touchdown.
    ok = np.linalg.norm(x, axis=1).mean() < 0.8 * norm0
    print("FLEET REGULATED" if ok else "CHECK FAILED")


if __name__ == "__main__":
    main()
