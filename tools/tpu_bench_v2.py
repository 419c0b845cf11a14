"""Throughput probes for the v2 packed kernel on the real chip."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from accelerated_tinympc_tpu.models import quadrotor_hovering_setup
from accelerated_tinympc_tpu.ops.fused_admm import (
    FusedCarry, fused_solve, pad_problem,
)
from accelerated_tinympc_tpu.precompute import condensed_operators


def bench(fn, args, reps=4):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best, out


def main():
    print("device:", jax.devices()[0], flush=True)
    problem, cache, x0 = quadrotor_hovering_setup()
    ops = condensed_operators(
        cache, np.asarray(problem.A), np.asarray(problem.B), problem.horizon
    )
    pp = pad_problem(problem, cache, ops)
    rng = np.random.default_rng(0)

    for B, tiles in ((262144, (512, 768, 1536)), (1048576, (768,))):
        x0s = jnp.asarray(
            np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, 12)),
            jnp.float32,
        )
        carry = FusedCarry.zeros(B, pp)
        for bt in tiles:
            print(f"compiling B={B} tile={bt} ...", flush=True)
            f = jax.jit(lambda x, c, _bt=bt: fused_solve(
                x, c, pp, max_iter=100, check_termination=0, batch_tile=_bt))
            try:
                best, _ = bench(f, (x0s, carry))
            except Exception as e:  # noqa: BLE001
                print(f"B={B} tile={bt}: FAIL {type(e).__name__}: {e}",
                      flush=True)
                continue
            print(f"B={B} tile={bt}: {B/best/1e6:.3f} M solves/s "
                  f"({best*1e3:.1f} ms)", flush=True)
        del x0s, carry

    # Adaptive-mode overhead at check_every=10 (VERDICT item 4: >=95% of
    # fixed-mode rate). Same iteration count via huge tolerances never met.
    B = 65536
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, 12)),
        jnp.float32,
    )
    carry = FusedCarry.zeros(B, pp)
    ff = jax.jit(lambda x, c: fused_solve(
        x, c, pp, max_iter=100, check_termination=0, batch_tile=512))
    fa = jax.jit(lambda x, c: fused_solve(
        x, c, pp, max_iter=100, check_termination=10,
        abs_pri_tol=1e-12, abs_dua_tol=1e-12, batch_tile=512))
    bf, _ = bench(ff, (x0s, carry))
    ba, out = bench(fa, (x0s, carry))
    it = float(jnp.mean(out.stats[:, 0]))
    print(f"fixed 100it: {B/bf/1e6:.3f} M/s | adaptive ce=10 (mean {it:.0f} "
          f"it): {B/ba/1e6:.3f} M/s | ratio {bf/ba:.3f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())
