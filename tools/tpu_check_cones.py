"""On-chip check: SOC cone projection inside the fused kernel.

Compiles and runs the coned fused kernel (fixed + adaptive modes, packed
g=3 landing plant, input + state cones) on the real TPU and compares
against the scan tier on CPU-free device math — the Mosaic compiler is the
thing under test (the Pallas interpreter accepts layouts Mosaic rejects;
see CLAUDE.md).  Also times the coned vs un-coned fixed-mode kernel at a
real batch to price the two extra per-cone matmuls.

Usage: python tools/tpu_check_cones.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import accelerated_tinympc_tpu as atm
    from accelerated_tinympc_tpu.ops.fused_admm import (
        FusedCarry, fused_solve, pad_cones, pad_problem,
    )
    from accelerated_tinympc_tpu.precompute import (
        condensed_operators, riccati_cache,
    )
    from accelerated_tinympc_tpu.solver.batched import (
        init_state_batched, solve_batched,
    )
    from accelerated_tinympc_tpu.solver.cones import (
        Cone, ConeSet, cone_slack_update, cone_violation,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384

    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    # Landing plant (same as tests/test_cones.py _landing_setup).
    horizon, dt = 15, 0.1
    I3 = np.eye(3)
    A = np.block([[I3, dt * I3], [0 * I3, I3]])
    Bm = np.vstack([0.5 * dt * dt * I3, dt * I3])
    Q = np.concatenate([np.full(3, 10.0), np.full(3, 1.0)])
    R = np.full(3, 1.0)
    problem = atm.Problem(
        A=jnp.asarray(A, jnp.float32), B=jnp.asarray(Bm, jnp.float32),
        Q=jnp.asarray(Q, jnp.float32), R=jnp.asarray(R, jnp.float32),
        u_min=jnp.full((horizon - 1, 3), -10.0, jnp.float32),
        u_max=jnp.full((horizon - 1, 3), 10.0, jnp.float32),
        x_min=jnp.full((horizon, 6), -100.0, jnp.float32),
        x_max=jnp.full((horizon, 6), 100.0, jnp.float32),
        Xref=jnp.zeros((horizon, 6), jnp.float32),
        Uref=jnp.zeros((horizon - 1, 3), jnp.float32),
    )
    cache = riccati_cache(A, Bm, Q, R, 1.0)
    ops = condensed_operators(cache, A, Bm, horizon)
    pp = pad_problem(problem, cache, ops)
    cones = ConeSet(
        input_cones=(Cone(ball=(0, 1), axis=2, mu=1.0),),
        state_cones=(Cone(ball=(0, 1), axis=2, mu=2.5),),
    )
    cone_ops = pad_cones(pp, cones)
    print(f"pack g={pp.g}  B={B}")

    rng = np.random.default_rng(7)
    base = np.asarray([1.5, -1.0, 3.0, -0.5, 0.5, -0.75])
    x0s = jnp.asarray(
        base[None] + rng.standard_normal((B, 6)) * 0.2, jnp.float32
    )
    carry = FusedCarry.zeros(B, pp)

    # --- correctness: small slice vs scan tier ------------------------------
    n = 8
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()
    got = fused_solve(
        x0s[:n], FusedCarry.zeros(n, pp), pp, max_iter=300,
        check_termination=2, cone_ops=cone_ops,
    )
    st = init_state_batched(n, 6, 3, horizon)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s[:n]))
    settings = atm.Settings(max_iter=300, check_termination=2)
    want = jax.jit(
        lambda s: solve_batched(
            s, problem, cache, settings, project=cone_slack_update(cones)
        )
    )(st)
    it_ok = np.array_equal(
        np.asarray(got.stats[:, 0], np.int32), np.asarray(want.iter)
    )
    du = float(np.max(np.abs(
        np.asarray(got.U[:, :42]) - np.asarray(want.u.reshape(n, -1))
    )))
    viol = float(cone_violation(
        np.asarray(got.carry.Z[:, :42]).reshape(n, 14, 3),
        cones.input_cones[0],
    ))
    print(f"adaptive parity vs scan: schedules equal={it_ok}  "
          f"max|dU|={du:.2e}  slack cone violation={viol:.2e}")
    assert it_ok and du < 5e-5 and viol <= 1e-5

    # --- throughput: coned vs plain fixed-mode kernel -----------------------
    kw = dict(max_iter=100, check_termination=0)
    plain_f = jax.jit(lambda x, c: fused_solve(x, c, pp, **kw))
    coned_f = jax.jit(
        lambda x, c: fused_solve(x, c, pp, cone_ops=cone_ops, **kw)
    )
    jax.block_until_ready(plain_f(x0s, carry))
    jax.block_until_ready(coned_f(x0s, carry))

    def best_of(fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tp = best_of(lambda: plain_f(x0s, carry))
    tc = best_of(lambda: coned_f(x0s, carry))
    print(f"fixed 100-iter  plain: {tp * 1e3:7.2f} ms ({B / tp:,.0f} "
          f"solves/s)   coned: {tc * 1e3:7.2f} ms ({B / tc:,.0f} solves/s)  "
          f"overhead {tc / tp:.2f}x")


if __name__ == "__main__":
    main()
