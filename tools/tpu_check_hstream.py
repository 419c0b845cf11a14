"""Real-chip compile + parity + throughput check for the heterogeneous
streaming kernel (ops/hstream_admm.py). Run on the TPU (no JAX_PLATFORMS
override).

Checks:
1. Fixed-iteration parity vs the vmapped scan tier (problem_axes=0) on a
   fleet of distinct plants at N=256 (the VERDICT r3 item-1 bar).
2. Knot-block invariance on chip, including blocks above the interpret-mode
   256-sublane cap (pass --big-kb to lift the cap and probe whether the
   interpreter anomaly documented in hstream_solve exists on Mosaic).
3. Steady-state throughput at a production shape (batch 4096, N=256,
   50 iterations) vs the assoc/scan long-horizon tiers' published numbers.
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
from accelerated_tinympc_tpu.ops.hstream_admm import (
    hstream_carry_zeros,
    hstream_solve,
    pad_hstream_problem,
)
from accelerated_tinympc_tpu.ops.stream_admm import StreamCarry
from accelerated_tinympc_tpu.precompute import riccati_cache
from accelerated_tinympc_tpu.solver.batched import (
    init_state_batched,
    solve_batched,
)


def warmup():
    jax.block_until_ready(jax.jit(lambda a: (a @ a.T).sum())(
        jnp.ones((8, 128))
    ))


def make_fleet(n, batch, nx=12, nu=4, n_distinct=16):
    probs, caches = [], []
    for s in range(n_distinct):
        p, rho = random_lti_problem(seed=s, nx=nx, nu=nu, horizon=n)
        probs.append(p)
        caches.append(riccati_cache(
            np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q),
            np.asarray(p.R), rho,
        ))
    reps = batch // n_distinct
    stk = lambda ts: jax.tree.map(
        lambda *xs: jnp.tile(
            jnp.stack([jnp.asarray(x) for x in xs]),
            (reps,) + (1,) * jnp.asarray(xs[0]).ndim,
        ), *ts,
    )
    return stk(probs), stk(caches)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big-kb", action="store_true",
                    help="probe knot blocks above the 256-sublane cap")
    ap.add_argument("--batch", type=int, default=4096)
    opts = ap.parse_args()

    print("device:", jax.devices()[0], flush=True)
    warmup()

    # --- 1. N=256 fleet parity vs vmapped scan -----------------------------
    n, Bp = 256, 128
    prob_b, cache_b = make_fleet(n, Bp)
    hsp = jax.jit(pad_hstream_problem)(prob_b, cache_b)
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(rng.standard_normal((Bp, 12)) * 0.3, jnp.float32)
    warmup()
    t0 = time.time()
    res = jax.block_until_ready(hstream_solve(
        x0s, hstream_carry_zeros(Bp, hsp), hsp, max_iter=30, knot_block=16,
    ))
    print(f"hstream kernel compiled+ran in {time.time() - t0:.1f}s",
          flush=True)
    st = init_state_batched(Bp, 12, 4, n)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s))
    want = jax.jit(lambda s: solve_batched(
        s, prob_b, cache_b, atm.Settings(max_iter=30, check_termination=0),
        problem_axes=0, cache_axes=0,
    ))(st)
    du = float(jnp.max(jnp.abs(res.U - want.u)))
    dx = float(jnp.max(jnp.abs(res.X - want.x)))
    print(f"N=256 fleet parity vs scan: max|dU|={du:.2e} max|dX|={dx:.2e}",
          flush=True)
    assert du < 1e-4 and dx < 1e-4, "parity bar exceeded"

    # --- 2. knot-block invariance on chip -----------------------------------
    kbs = [8, 16] + ([32, 64] if opts.big_kb else [])
    if opts.big_kb:
        import accelerated_tinympc_tpu.ops.hstream_admm as hsmod

        hsmod.KB_SUBLANE_CAP = 64 * 16  # lift the interpret-mode cap
    outs = []
    for kb in kbs:
        r = jax.block_until_ready(hstream_solve(
            x0s, hstream_carry_zeros(Bp, hsp), hsp, max_iter=10,
            knot_block=kb,
        ))
        outs.append(np.asarray(r.U))
    for kb, u in zip(kbs[1:], outs[1:]):
        d = float(np.max(np.abs(u - outs[0])))
        print(f"knot_block={kb} vs {kbs[0]}: max|dU|={d:.2e}", flush=True)

    # --- 3. throughput -------------------------------------------------------
    B = opts.batch
    prob_b, cache_b = make_fleet(n, B)
    hsp = jax.jit(pad_hstream_problem)(prob_b, cache_b)
    x0b = jnp.asarray(rng.standard_normal((B, 12)) * 0.3, jnp.float32)
    carry = hstream_carry_zeros(B, hsp)
    run = lambda: hstream_solve(x0b, carry, hsp, max_iter=50, knot_block=16)
    jax.block_until_ready(run().U)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run().U)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"hstream N={n} B={B} 50 iters: {best * 1e3:.1f} ms "
          f"= {B / best:,.0f} solves/s = {B * 50 / best:,.0f} iters/s",
          flush=True)


if __name__ == "__main__":
    main()
