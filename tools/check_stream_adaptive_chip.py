"""On-chip compile/parity/perf check for the streaming kernel's adaptive
mode (in-kernel per-instance freeze + per-tile early exit). Run on the real
TPU:

    python tools/check_stream_adaptive_chip.py [batch] [horizon]

Checks:
  1. the adaptive kernel compiles on the real Mosaic backend (the
     interpreter accepts patterns the chip rejects — CLAUDE.md),
  2. iteration counts match the scan tier's freeze at matched settings,
  3. per-count bit-exactness vs the fixed kernel (Mosaic is bit-stable
     across graph shapes, unlike interpret-mode XLA CPU),
  4. steady-state wall time vs the fixed kernel at max_iter and vs the
     segment-granular cascade.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from accelerated_tinympc_tpu.models.quadrotor import (
    load_quadrotor_cache,
    load_quadrotor_problem,
)
from accelerated_tinympc_tpu.ops.stream_admm import (
    StreamCarry,
    pad_stream_problem,
    stream_solve,
)
from accelerated_tinympc_tpu.solver.cascade import stream_cascade_solve

MAX_ITER = 100
CHECK = 5
TOL = 5e-3


def timed(fn, reps=5):
    fn()  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print("devices:", jax.devices())
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    prob = load_quadrotor_problem(hz=100)
    cache = load_quadrotor_cache(hz=100)
    nx = prob.A.shape[0]
    prob = prob.replace(
        Xref=jnp.zeros((N, nx), jnp.float32),
        Uref=jnp.zeros((N - 1, prob.B.shape[1]), jnp.float32),
        x_min=jnp.broadcast_to(prob.x_min[0], (N, nx)),
        x_max=jnp.broadcast_to(prob.x_max[0], (N, nx)),
        u_min=jnp.broadcast_to(prob.u_min[0], (N - 1, prob.B.shape[1])),
        u_max=jnp.broadcast_to(prob.u_max[0], (N - 1, prob.B.shape[1])),
    )
    sp = pad_stream_problem(prob, cache)
    rng = np.random.default_rng(0)
    # Mixed difficulty -> convergence spread (easy lanes freeze early).
    scale = np.tile(np.repeat([0.02, 0.1, 0.5], 43)[: 128], B // 128 + 1)[
        :B, None
    ]
    x0s = jnp.asarray(scale * rng.standard_normal((B, nx)), jnp.float32)
    carry0 = StreamCarry.zeros(B, sp)

    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    adapt = jax.jit(lambda x, c: stream_solve(
        x, c, sp, max_iter=MAX_ITER, check_termination=CHECK,
        abs_pri_tol=TOL, abs_dua_tol=TOL,
    ))
    print("compiling adaptive kernel...")
    res = jax.block_until_ready(adapt(x0s, carry0))
    iters = np.asarray(res.stats[:, 0]).astype(int)
    solved = np.asarray(res.stats[:, 1])
    uniq, cnt = np.unique(iters, return_counts=True)
    print("iteration histogram:", dict(zip(uniq.tolist(), cnt.tolist())))
    print(f"solved fraction: {solved.mean():.3f}")

    # Per-count bit-exactness vs the fixed kernel (sample the counts).
    ok = True
    for k in uniq[:4]:
        want = jax.block_until_ready(jax.jit(lambda x, c: stream_solve(
            x, c, sp, max_iter=int(k)))(x0s, carry0))
        sel = iters == k
        dU = np.max(np.abs(np.asarray(res.U)[sel] - np.asarray(want.U)[sel]))
        dX = np.max(np.abs(np.asarray(res.X)[sel] - np.asarray(want.X)[sel]))
        print(f"k={k}: |dU|={dU:.3g} |dX|={dX:.3g} (n={sel.sum()})")
        ok &= (dU == 0.0) and (dX == 0.0)
    print("per-count bit-exact on chip:", ok)

    # Scan-tier freeze agreement on a small slice (host scan is slow).
    Bs = 256
    from accelerated_tinympc_tpu import Settings
    from accelerated_tinympc_tpu.solver.batched import (
        init_state_batched,
        solve_batched,
    )

    st = init_state_batched(Bs, prob.nx, prob.nu, N)
    st = st.replace(x=st.x.at[:, 0, :].set(x0s[:Bs]))
    want = jax.block_until_ready(jax.jit(lambda s: solve_batched(
        s, prob, cache,
        Settings(max_iter=MAX_ITER, check_termination=CHECK,
                 abs_pri_tol=TOL, abs_dua_tol=TOL),
    ))(st))
    agree = np.mean(iters[:Bs] == np.asarray(want.iter))
    print(f"scan-tier schedule agreement (B={Bs}): {agree:.4f}")

    # Perf: adaptive vs fixed max_iter vs cascade.
    fixed = jax.jit(lambda x, c: stream_solve(x, c, sp, max_iter=MAX_ITER))
    t_fixed = timed(lambda: jax.block_until_ready(fixed(x0s, carry0)))
    t_adapt = timed(lambda: jax.block_until_ready(adapt(x0s, carry0)))

    def run_cascade():
        U, X, stats, _ = stream_cascade_solve(
            x0s, carry0, sp, max_iter=MAX_ITER, segment_iters=10,
            abs_pri_tol=TOL, abs_dua_tol=TOL,
        )
        jax.block_until_ready(stats)

    run_cascade()
    t_casc = timed(run_cascade, reps=3)
    print(f"fixed   {MAX_ITER} iters: {t_fixed*1e3:9.2f} ms "
          f"({B/t_fixed:,.0f} solves/s)")
    print(f"adaptive (mean iter {iters.mean():.1f}): {t_adapt*1e3:9.2f} ms "
          f"({B/t_adapt:,.0f} solves/s)  {t_fixed/t_adapt:.2f}x fixed "
          f"[difficulty interleaved within tiles — worst case]")
    print(f"cascade  seg=10: {t_casc*1e3:9.2f} ms "
          f"({B/t_casc:,.0f} solves/s)  {t_fixed/t_casc:.2f}x fixed")

    # The composition: adaptive segments + cross-tile survivor compaction
    # (bit-exact vs one long adaptive call — tests/test_stream.py). This is
    # the early-termination configuration for scattered convergence.
    def run_comp():
        U, X, stats, _ = stream_cascade_solve(
            x0s, carry0, sp, max_iter=MAX_ITER, segment_iters=10,
            check_termination=CHECK, abs_pri_tol=TOL, abs_dua_tol=TOL,
        )
        jax.block_until_ready(stats)

    run_comp()
    t_comp = timed(run_comp, reps=3)
    print(f"cascade+inkernel seg=10 ce={CHECK}: {t_comp*1e3:9.2f} ms "
          f"({B/t_comp:,.0f} solves/s)  {t_fixed/t_comp:.2f}x fixed")

    # Tile-coherent layout: early exit is per 128-lane tile, so sort by
    # difficulty (what the cascade's compaction produces naturally) to let
    # easy tiles retire. This is the adaptive kernel's best case.
    order = np.argsort(iters)
    x0sort = x0s[np.asarray(order)]
    ressort = jax.block_until_ready(adapt(x0sort, carry0))
    it_s = np.asarray(ressort.stats[:, 0])
    t_sort = timed(lambda: jax.block_until_ready(adapt(x0sort, carry0)))
    print(f"adaptive sorted (mean iter {it_s.mean():.1f}): "
          f"{t_sort*1e3:9.2f} ms ({B/t_sort:,.0f} solves/s)  "
          f"{t_fixed/t_sort:.2f}x fixed [tile-coherent — best case]")


if __name__ == "__main__":
    main()
