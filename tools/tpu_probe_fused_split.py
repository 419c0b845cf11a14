"""On-chip attribution probe for the fused kernel: matmul vs elementwise.

Monkeypatches ``ops.fused_admm._iteration`` with two degenerate variants —
matmul-only (clips/adds stripped) and elementwise-only (dots replaced by
zero-cost broadcasts) — and times each against the real iteration at the
headline workload. The variants are numerically meaningless (timing only);
they bound how much of the kernel's wall time is MXU passes vs VPU
elementwise work, i.e. how much headroom any further pass-reduction idea
could possibly have. (Round-4 evidence for DESIGN.md's pass-floor claim.)

Usage: python tools/tpu_probe_fused_split.py [--batch 262144]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import accelerated_tinympc_tpu as atm
    import accelerated_tinympc_tpu.ops.fused_admm as fa
    from accelerated_tinympc_tpu.precompute import condensed_operators

    # Relay warm-up (CLAUDE.md): a tiny jit right after init.
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    problem, cache, x0 = atm.models.quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = fa.pad_problem(problem, cache, ops)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((opts.batch, 12)),
        jnp.float32,
    )
    carry = fa.FusedCarry.zeros(opts.batch, pp)

    real_iteration = fa._iteration

    def mm_only(D, Y, G, W, consts, cone_u=None, cone_x=None):
        (Xb, Ub, const_d, *_bounds) = consts
        X = Xb + fa._dot_op(D, W.W_fd)
        U = Ub + fa._dot_op(D, W.W_gd)
        Dn = fa._dot_op(X, W.W_q) + fa._dot_op(U, W.W_r) + const_d
        return Dn, Y, G, U, X, U, X

    def ew_only(D, Y, G, W, consts, cone_u=None, cone_x=None):
        (Xb, Ub, const_d, u_min, u_max, x_min, x_max) = consts
        X = Xb + 0.0 * G
        U = Ub + 0.0 * D
        S = U + Y
        Znew = jnp.clip(S, u_min, u_max)
        Yn = S - Znew
        T = X + G
        Vnew = jnp.clip(T, x_min, x_max)
        Gn = T - Vnew
        Dn = (Znew - Yn) + 0.0 * D + const_d
        return Dn, Yn, Gn, Znew, Vnew, U, X

    def run(tag, impl):
        fa._iteration = impl
        try:
            fn = jax.jit(
                lambda x, c: fa.fused_solve(
                    x, c, pp, max_iter=opts.iters, check_termination=0,
                    batch_tile=1024, algo="bf16x3", polish=6,
                )
            )
            out = jax.block_until_ready(fn(x0s, carry))
            best = float("inf")
            for _ in range(opts.reps):
                t0 = time.time()
                jax.block_until_ready(fn(x0s, carry))
                best = min(best, time.time() - t0)
        finally:
            fa._iteration = real_iteration
        print(f"{tag:10s}: {best * 1e3:8.1f} ms  "
              f"({opts.batch / best / 1e6:.2f} M solves/s)")
        return best

    t_real = run("real", real_iteration)
    t_mm = run("mm_only", mm_only)
    t_ew = run("ew_only", ew_only)
    print(f"matmul share ~{t_mm / t_real:5.1%}, "
          f"elementwise share ~{t_ew / t_real:5.1%}, "
          f"sum {100 * (t_mm + t_ew) / t_real:.0f}% of real")


if __name__ == "__main__":
    main()
