"""Real-chip compile + parity + quick-throughput check for the v2 packed
fused kernel. Run on the TPU (no JAX_PLATFORMS override)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.models import quadrotor_hovering_setup
from accelerated_tinympc_tpu.ops.fused_admm import (
    FusedCarry, fused_solve, pad_problem,
)
from accelerated_tinympc_tpu.precompute import condensed_operators
from accelerated_tinympc_tpu.solver.batched import (
    init_state_batched, solve_batched,
)


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    problem, cache, x0 = quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    print("pack g =", pp.g, "Dug =", pp.u_min.shape[1],
          "gDxp =", pp.x_min.shape[1], flush=True)

    B = 96
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.1 * rng.standard_normal((B, 12)), jnp.float32
    )

    # --- fixed mode parity vs scan tier (CPU golden via same-device scan) ---
    t0 = time.time()
    got = jax.block_until_ready(fused_solve(
        x0s, FusedCarry.zeros(B, pp), pp, max_iter=25, check_termination=0,
        batch_tile=96,
    ))
    print(f"fixed kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)

    st = init_state_batched(B, 12, 4, 10)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, problem, cache, atm.Settings(max_iter=25, check_termination=0)
    ))(st)
    u = np.asarray(got.U[:, :36]).reshape(B, 9, 4)
    err = np.max(np.abs(u - np.asarray(want.u)))
    print("fixed-mode control err vs scan:", err, flush=True)
    assert err < 1e-4, err

    # --- adaptive mode parity (iterations + controls) ------------------------
    t0 = time.time()
    gota = jax.block_until_ready(fused_solve(
        x0s, FusedCarry.zeros(B, pp), pp, max_iter=400, check_termination=1,
        abs_pri_tol=0.05, abs_dua_tol=0.05, batch_tile=96,
    ))
    print(f"adaptive kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)
    wanta = jax.jit(lambda s: solve_batched(
        s, problem, cache,
        atm.Settings(abs_pri_tol=0.05, abs_dua_tol=0.05, max_iter=400,
                     check_termination=1),
    ))(st)
    it_got = np.asarray(gota.stats[:, 0]).astype(int)
    it_want = np.asarray(wanta.iter)
    mism = int((it_got != it_want).sum())
    print("adaptive iter mismatches:", mism, "of", B,
          "| got head:", it_got[:6], "want head:", it_want[:6], flush=True)
    ua = np.asarray(gota.U[:, :4])
    erra = np.max(np.abs(ua - np.asarray(wanta.u[:, 0, :])))
    print("adaptive control err:", erra, flush=True)
    assert mism == 0 and erra < 1e-4

    # --- check_every=10 block mode ------------------------------------------
    gotb = jax.block_until_ready(fused_solve(
        x0s, FusedCarry.zeros(B, pp), pp, max_iter=400, check_termination=10,
        abs_pri_tol=0.05, abs_dua_tol=0.05, batch_tile=96,
    ))
    wantb = jax.jit(lambda s: solve_batched(
        s, problem, cache,
        atm.Settings(abs_pri_tol=0.05, abs_dua_tol=0.05, max_iter=400,
                     check_termination=10),
    ))(st)
    itb = np.asarray(gotb.stats[:, 0]).astype(int)
    mismb = int((itb != np.asarray(wantb.iter)).sum())
    print("check_every=10 iter mismatches:", mismb, flush=True)
    assert mismb == 0

    # --- quick throughput probe (fixed 100 iters) ----------------------------
    for B2 in (65536,):
        x0b = jnp.asarray(
            np.asarray(x0)[None] + 0.05 * rng.standard_normal((B2, 12)),
            jnp.float32,
        )
        cb = FusedCarry.zeros(B2, pp)
        f = jax.jit(lambda x, c: fused_solve(
            x, c, pp, max_iter=100, check_termination=0, batch_tile=512))
        out = jax.block_until_ready(f(x0b, cb))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(x0b, cb))
            best = min(best, time.time() - t0)
        print(f"fixed throughput B={B2}: {B2/best/1e6:.3f} M solves/s "
              f"({best*1e3:.1f} ms)", flush=True)

    print("ALL OK")


if __name__ == "__main__":
    sys.exit(main())
