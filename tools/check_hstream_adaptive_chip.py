"""On-chip compile/parity/perf check for the heterogeneous streaming
kernel's adaptive mode (in-kernel per-instance freeze at per-instance-plant
long horizons). Run on the real TPU:

    python tools/check_hstream_adaptive_chip.py [batch] [horizon]

Mirrors tools/check_stream_adaptive_chip.py for the hstream family:
compile on Mosaic, per-count bit-exactness vs the fixed kernel, schedule
agreement vs the scan tier's freeze, and wall-time vs fixed on a
tile-coherent (difficulty-sorted) batch.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.ops.hstream_admm import (
    hstream_carry_zeros,
    hstream_solve,
    pad_hstream_problem,
)
from accelerated_tinympc_tpu.solver.batched import (
    init_state_batched,
    solve_batched,
)

from tpu_check_hstream import make_fleet, warmup  # noqa: E402

MAX_ITER = 100
CHECK = 5
TOL = 5e-3


def timed(fn, reps=4):
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print("device:", jax.devices()[0], flush=True)
    warmup()
    prob_b, cache_b = make_fleet(N, B)
    hsp = jax.jit(pad_hstream_problem)(prob_b, cache_b)
    rng = np.random.default_rng(0)
    scale = np.repeat([0.02, 0.1, 0.5], -(-B // 3))[:B, None]  # sorted
    x0s = jnp.asarray(scale * rng.standard_normal((B, 12)), jnp.float32)
    carry0 = hstream_carry_zeros(B, hsp)
    warmup()

    adapt = jax.jit(lambda x, c: hstream_solve(
        x, c, hsp, max_iter=MAX_ITER, check_termination=CHECK,
        abs_pri_tol=TOL, abs_dua_tol=TOL, knot_block=16,
    ))
    print("compiling hstream adaptive kernel...", flush=True)
    res = jax.block_until_ready(adapt(x0s, carry0))
    iters = np.asarray(res.stats[:, 0]).astype(int)
    uniq, cnt = np.unique(iters, return_counts=True)
    print("iteration histogram:", dict(zip(uniq.tolist(), cnt.tolist())),
          flush=True)
    print(f"solved fraction: {np.asarray(res.stats[:, 1]).mean():.3f}",
          flush=True)

    ok = True
    for k in uniq[:3]:
        want = jax.block_until_ready(jax.jit(lambda x, c: hstream_solve(
            x, c, hsp, max_iter=int(k), knot_block=16))(x0s, carry0))
        sel = iters == k
        dU = np.max(np.abs(np.asarray(res.U)[sel] - np.asarray(want.U)[sel]))
        dX = np.max(np.abs(np.asarray(res.X)[sel] - np.asarray(want.X)[sel]))
        print(f"k={k}: |dU|={dU:.3g} |dX|={dX:.3g} (n={sel.sum()})",
              flush=True)
        ok &= (dU == 0.0) and (dX == 0.0)
    print("per-count bit-exact on chip:", ok, flush=True)

    Bs = 128
    st = init_state_batched(Bs, 12, 4, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s[:Bs]))
    sl = lambda a: a[:Bs]
    want = jax.block_until_ready(jax.jit(lambda s: solve_batched(
        s, jax.tree.map(sl, prob_b), jax.tree.map(sl, cache_b),
        atm.Settings(max_iter=MAX_ITER, check_termination=CHECK,
                     abs_pri_tol=TOL, abs_dua_tol=TOL),
        problem_axes=0, cache_axes=0,
    ))(st))
    agree = np.mean(iters[:Bs] == np.asarray(want.iter))
    print(f"scan-tier schedule agreement (B={Bs}): {agree:.4f}", flush=True)

    fixed = jax.jit(lambda x, c: hstream_solve(
        x, c, hsp, max_iter=MAX_ITER, knot_block=16))
    t_fixed = timed(lambda: jax.block_until_ready(fixed(x0s, carry0)))
    t_adapt = timed(lambda: jax.block_until_ready(adapt(x0s, carry0)))
    print(f"fixed {MAX_ITER} iters: {t_fixed*1e3:9.2f} ms "
          f"({B/t_fixed:,.0f} solves/s)", flush=True)
    print(f"adaptive sorted (mean iter {iters.mean():.1f}): "
          f"{t_adapt*1e3:9.2f} ms ({B/t_adapt:,.0f} solves/s)  "
          f"{t_fixed/t_adapt:.2f}x fixed", flush=True)


if __name__ == "__main__":
    main()
