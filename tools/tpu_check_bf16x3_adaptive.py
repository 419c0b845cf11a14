"""On-chip check + bench: adaptive fused solve with algo='bf16x3'.

Validates that the bf16x3 between-check iterations compile under Mosaic in
the adaptive (while_loop + freeze-mask) kernel, that converged instances'
recorded residuals genuinely satisfy the tolerances (checks stay f32), and
measures the throughput delta vs algo='f32' at the headline adaptive
workload (quadrotor hovering, check_every=25).

Usage: python tools/tpu_check_bf16x3_adaptive.py [batch] [check_every]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from accelerated_tinympc_tpu.models import quadrotor_hovering_setup
    from accelerated_tinympc_tpu.ops.fused_admm import (
        FusedCarry, fused_solve, pad_problem,
    )
    from accelerated_tinympc_tpu.precompute import condensed_operators

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    check_every = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    problem, cache, x0 = quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, 12)),
        jnp.float32,
    )

    def make(algo):
        def fn(x):
            return fused_solve(
                x, FusedCarry.zeros(B, pp), pp, max_iter=500,
                check_termination=check_every, abs_pri_tol=1e-3,
                abs_dua_tol=1e-3, batch_tile=512, algo=algo,
            )
        return jax.jit(fn)

    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    results = {}
    for algo in ("f32", "bf16x3"):
        fn = make(algo)
        t0 = time.perf_counter()
        res = fn(x0s)
        jax.block_until_ready(res)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x0s))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        stats = np.asarray(res.stats)
        results[algo] = (res, dt)
        print(
            f"{algo:7s}: compile {compile_s:6.1f}s  steady {dt*1e3:8.2f} ms  "
            f"{B/dt:10.0f} solves/s  converged {int(stats[:,1].sum())}/{B}  "
            f"iters mean {stats[:,0].mean():6.1f}  "
            f"max residual {stats[:,2:6].max():.2e}"
        )

    rf, r3 = results["f32"][0], results["bf16x3"][0]
    sf, s3 = np.asarray(rf.stats), np.asarray(r3.stats)
    du = np.abs(np.asarray(rf.U[:, :36]) - np.asarray(r3.U[:, :36])).max()
    same_iters = float((sf[:, 0] == s3[:, 0]).mean())
    assert s3[:, 1].all(), "bf16x3 adaptive: some instances unconverged"
    assert (s3[:, 2:6] < 1e-3 + 1e-6).all(), "recorded residuals violate tol"
    print(
        f"control delta vs f32: {du:.2e}   iteration-count match: "
        f"{same_iters*100:.1f}%   speedup: "
        f"{results['f32'][1]/results['bf16x3'][1]:.2f}x"
    )


if __name__ == "__main__":
    main()
