"""Robust MPC under model uncertainty — one *distinct plant* per instance.

The reference binds exactly one plant per build (reference:
src/tinympc/tiny_wrapper.hpp:6, codegen.cpp:254-292 bake a single A/B); this
example inverts that with the heterogeneous-plant tier: sample hundreds of
perturbed quadrotor models (parameter uncertainty), build every Riccati cache
*on device* (vmapped fixed point), solve all scenarios' MPC problems in one
fused kernel launch, and take the consensus control. The closed loop then
runs on a "true" plant the controller never saw exactly.

Uses ops/hetero_admm.py on TPU (Pallas interpreter elsewhere — correctness
only).

Run: python examples/robust_plant_sweep.py [--scenarios 256] [--ticks 80]
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
from accelerated_tinympc_tpu.ops import (
    HeteroCarry,
    hetero_solve,
    pad_hetero_from_plants,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=80)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--spread", type=float, default=0.03,
                    help="multiplicative plant perturbation scale")
    args = ap.parse_args()

    problem, cache, x0 = atm.models.quadrotor_hovering_setup()
    nx, nu, N = problem.nx, problem.nu, problem.horizon
    S = args.scenarios
    rng = np.random.default_rng(0)
    on_tpu = jax.devices()[0].platform != "cpu"

    # Perturbed plant family: element-wise multiplicative noise on the
    # nominal dynamics (scenario 0 is the nominal plant itself).
    A0 = np.asarray(problem.A, np.float64)
    B0 = np.asarray(problem.B, np.float64)
    mulA = 1.0 + args.spread * rng.standard_normal((S, nx, nx))
    mulB = 1.0 + args.spread * rng.standard_normal((S, nx, nu))
    mulA[0] = 1.0
    mulB[0] = 1.0
    As = jnp.asarray(A0[None] * mulA, jnp.float32)
    Bs = jnp.asarray(B0[None] * mulB, jnp.float32)
    Qs = jnp.broadcast_to(problem.Q, (S, nx))
    Rs = jnp.broadcast_to(problem.R, (S, nu))
    rhos = jnp.broadcast_to(cache.rho.reshape(()), (S,)).astype(jnp.float32)
    prob_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (S,) + a.shape),
                          problem)

    # On-device build: S Riccati fixed points + lane packing, one jit.
    t0 = time.time()
    hp, _caches = jax.jit(pad_hetero_from_plants)(
        As, Bs, Qs, Rs, rhos, prob_b
    )
    jax.block_until_ready(hp.A3)
    print(f"{S} on-device cache builds: {time.time() - t0:.2f}s")

    carry = HeteroCarry.zeros(hp)

    @jax.jit
    def tick(carry, x):
        # All scenarios share the measured state; duals reset per tick as in
        # the reference hover loop (quadrotor_hovering.cpp:88-90).
        x0s = jnp.broadcast_to(x, (S, nx))
        res = hetero_solve(
            x0s, carry.reset_duals(), hp, max_iter=args.iters,
            interpret=not on_tpu,
        )
        u = jnp.mean(res.U[:, 0, :], axis=0)      # consensus control
        spread = jnp.max(jnp.abs(res.U[:, 0, :] - u))
        return res.carry, u, spread

    # "True" plant: a fresh perturbation outside the sampled family.
    true_mulA = 1.0 + args.spread * rng.standard_normal((nx, nx))
    true_mulB = 1.0 + args.spread * rng.standard_normal((nx, nu))
    At = jnp.asarray(A0 * true_mulA, jnp.float32)
    Bt = jnp.asarray(B0 * true_mulB, jnp.float32)

    x = jnp.asarray(x0, jnp.float32)
    t0 = time.time()
    for k in range(args.ticks):
        carry, u, spread = tick(carry, x)
        x = At @ x + Bt @ u
        if k % 5 == 0 or k == args.ticks - 1:
            err = float(jnp.linalg.norm(x - problem.Xref[1]))
            print(f"tick {k:3d}  |x - xref| = {err:.4f}   "
                  f"u0 scenario spread = {float(spread):.4f}")
    wall = time.time() - t0
    err = float(jnp.linalg.norm(x - problem.Xref[1]))
    print(f"\nfinal tracking error on the unseen true plant: {err:.4f}")
    print(f"{args.ticks} ticks x {S} scenarios in {wall:.2f}s "
          f"({args.ticks * S / wall:.0f} scenario-solves/s)")
    assert err < 0.1, "robust loop failed to stabilize the unseen plant"
    print("OK")


if __name__ == "__main__":
    main()
