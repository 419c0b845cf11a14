"""Tracing / profiling utilities (SURVEY.md §5: the reference has only dead
timing code — reference: src/tinympc/admm.cpp:10 — and its DSE profiling lived
in external tools; here profiling is first-class).

- :func:`trace` wraps ``jax.profiler`` for on-demand XLA traces viewable in
  TensorBoard/XProf.
- :func:`time_fn` measures steady-state wall time of a jitted callable with
  proper warm-up + blocking (the measurement protocol behind bench.py).
- :func:`solver_cost` gives the analytic per-solve FLOP/byte model of the
  condensed iteration (the roofline denominator for kernel work).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable[..., Any],
    *args: Any,
    reps: int = 5,
    warmup: int = 1,
) -> dict[str, float]:
    """Best/mean wall time of ``fn(*args)`` with device-blocking semantics."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "best_s": min(times),
        "mean_s": sum(times) / len(times),
        "reps": float(reps),
    }


def solver_cost(
    nx: int, nu: int, horizon: int, iters: int, *, lane_pad: int = 128
) -> dict[str, float]:
    """Analytic cost of one condensed-tier solve per instance.

    ``flops`` counts the unpadded math; ``flops_padded`` what the 128-lane
    fused kernel actually issues (5 matmuls/iter after hoisting, see
    ops/fused_admm.py). Useful for roofline sanity: measured time should
    approach flops_padded / peak_mxu.
    """
    def pad(n: int) -> int:
        return ((n + lane_pad - 1) // lane_pad) * lane_pad

    Dx, Du = horizon * nx, (horizon - 1) * nu
    Dxp, Dup = pad(Dx), pad(Du)
    flops = 2 * iters * (Du * Dx + Du * Du + Dx * Du + Du * Du + Dx * Du)
    flops_padded = 2 * iters * (
        Dup * Dxp + Dup * Dup + Dxp * Dup + Dup * Dup + Dxp * Dup
    )
    state_bytes = 4 * (5 * Du + 4 * Dx)  # carries + in/out per solve
    return {
        "flops": float(flops),
        "flops_padded": float(flops_padded),
        "hbm_bytes_per_solve": float(state_bytes),
    }


def hetero_cost(
    nx: int, nu: int, horizon: int, iters: int, *, sublane_pad: int = 8
) -> dict[str, float]:
    """Analytic cost of one heterogeneous-tier solve per instance
    (ops/hetero_admm.py: knots on sublanes, instances on lanes — every
    matvec is SX/SU full-width VPU multiply-adds per `_dotb`, no MXU).

    ``vpu_flops`` counts the padded per-lane FMAs the kernel actually
    issues per instance: per knot the forward sweep runs K (SX->SU),
    A (SX->SX), B (SU->SX) and the backward sweep Bt (SX->SU),
    Quu (SU->SU), M (SX->SX), Kt (SU->SX) matvecs. Roofline: measured
    time ~= vpu_flops * batch / peak_vpu — the kernel is VPU-bound by
    design (the MXU sits idle)."""
    def pad(n: int) -> int:
        return ((n + sublane_pad - 1) // sublane_pad) * sublane_pad

    SX, SU = pad(nx), pad(nu)
    m = horizon - 1
    per_knot = 2 * (2 * SX * SX + 4 * SX * SU + SU * SU)
    vpu_flops = iters * m * per_knot
    useful = iters * m * 2 * (2 * nx * nx + 4 * nx * nu + nu * nu)
    return {
        "vpu_flops": float(vpu_flops),
        "vpu_flops_useful": float(useful),
        "vmem_resident_bytes": float(
            4 * (3 * SX * SX + 4 * SX * SU + SU * SU) * 128
        ),
    }


def stream_cost(
    nx: int, nu: int, horizon: int, iters: int, *, sublane_pad: int = 8
) -> dict[str, float]:
    """Analytic HBM traffic of one streaming-tier solve per instance
    (ops/stream_admm.py — bandwidth-bound by design; the compute is the
    hetero tier's).

    Per iteration the streamed set (module docstring) is: forward reads
    ``d, y, g`` and writes ``y, g, z, v``; backward reads
    ``y, z, g, v, qc`` and writes ``d`` — 7 input-space and 6 state-space
    whole arrays. Roofline: measured time ~= hbm_bytes_per_solve * batch
    / peak_hbm_bandwidth."""
    def pad(n: int) -> int:
        return ((n + sublane_pad - 1) // sublane_pad) * sublane_pad

    SX, SU = pad(nx), pad(nu)
    m = horizon - 1
    per_iter = 4 * (7 * m * SU + 6 * horizon * SX)
    return {
        "hbm_bytes_per_iter": float(per_iter),
        "hbm_bytes_per_solve": float(per_iter * iters),
    }
