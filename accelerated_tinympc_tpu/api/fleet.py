"""Fleet API: one MPC problem per instance, at kernel speed.

The reference binds one problem per process (global workspace, reference:
src/tinympc/tiny_wrapper.hpp:6). :class:`TinyMPCFleet` is the TPU-native
inversion — thousands of *distinct* plants (and penalties) solved in one
dispatch — wrapping the heterogeneous tiers behind the same setter/getter
surface as :class:`.solver.TinyMPC`:

* tier ``"hetero"`` (default): the per-lane VPU fused kernel
  (:mod:`..ops.hetero_admm`) — fixed and adaptive modes, SOC cones,
  optional early-termination compaction (:func:`..solver.cascade.hetero_cascade_solve`).
* tier ``"instance_ops"``: the per-instance-operator einsum tier
  (:mod:`..solver.batched_ops`) — same semantics under plain XLA, plus the
  fully on-device batched adaptive-rho loop (:meth:`solve_adaptive_rho`).

Caches are built **on device** — by the batched Pallas Riccati kernel
(:func:`..ops.riccati_kernel.riccati_cache_kernel`, 16.6x the vmapped XLA
builder at the flagship shape) for ``nx <= 16``, the vmapped
:func:`..precompute.riccati_cache_jax` otherwise; pass
``host_precompute=True`` for the reference's float64 host path on
ill-conditioned plants (reference: examples/codegen_cartpole.cpp:9-11 —
both f32 device builders approximate the f64 cache to ~1e-3, which maps
to ~7e-4 on controls; see tests/test_riccati_kernel.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Problem, Settings

FLEET_TIERS = ("hetero", "instance_ops", "hstream", "block", "scan")


@dataclasses.dataclass
class TinyMPCFleet:
    """A batch of independent MPC problems, one plant per instance."""

    problem: Problem            # batch-leading leaves
    cache: Any                  # batch-leading Cache pytree
    settings: Settings
    tier: str = "hetero"
    interpret: bool = False
    cones: Any = None
    # Per-instance cone geometry (hetero tier): lane-packed mu/shift rows
    # from ops.hetero_admm.pad_hetero_cone_params.
    cone_params: Any = None
    # Per-instance cone *structure* (hetero tier): lane-packed ball/axis
    # masks from ops.hetero_admm.pad_hetero_cone_masks.
    cone_masks: Any = None
    # Per-instance cone overrides for the instance-ops tier (and the
    # adaptive-rho path): (input_args, state_args) pytree from
    # solver.cones.make_cone_args — built from the same user inputs.
    cone_args: Any = None
    # hetero adaptive mode only: > 0 runs the compaction cascade with this
    # segment length (multiple of check_termination).
    compaction_segment: int = 0
    # tier="block": knots per dense block (solver/block_condensed.py).
    block: int = 16
    # internals
    _hp: Any = None
    _ops: Any = None
    _carry: Any = None
    _x0: Any = None
    _last: Any = None

    # ------------------------------------------------------------- setup ----
    @classmethod
    def setup(
        cls,
        A: np.ndarray | jax.Array,
        B: np.ndarray | jax.Array,
        Q: np.ndarray | jax.Array,
        R: np.ndarray | jax.Array,
        rho: float | np.ndarray | jax.Array,
        horizon: int,
        *,
        x_min=None, x_max=None, u_min=None, u_max=None,
        settings: Settings | None = None,
        tier: str = "hetero",
        interpret: bool = False,
        cones: Any = None,
        cone_mu=None,
        cone_shift=None,
        cone_ball=None,
        cone_axis=None,
        compaction_segment: int = 0,
        host_precompute: bool = False,
        polish: bool = True,
        block: int = 16,
    ) -> "TinyMPCFleet":
        """Construct from per-instance plants: ``A (B, nx, nx)``,
        ``B (B, nx, nu)``, ``Q (B, nx)`` / ``R (B, nu)`` raw cost diagonals
        (broadcast a shared plant by stacking), ``rho`` scalar or ``(B,)``.
        Bounds are scalars or per-instance ``(B, k)`` arrays; enabled iff
        provided (the reference's nullptr-enable logic,
        codegen.cpp:227-243).

        ``polish=True`` (default) runs the f64 fixed-point refinement on
        the device-built caches (see precompute.riccati_polish_f64) so
        fleet controls match f64-cache-driven controls within the 1e-4
        parity bar; pass False to keep the raw f32 kernel caches (setup
        latency over precision).

        ``tier="scan"`` (round 5) selects the vmapped lax.scan sweeps
        with per-instance plants — the MEASURED per-instance long-horizon
        fast path (BASELINE.md round-5 matched table); ``tier="hstream"``
        the streaming kernel (knots streamed, plants resident; time-
        uniform bounds; minimal VMEM; adaptive mode = the segment-level
        cascade); ``tier="block"`` the per-instance block-condensed tier
        (measured negative at fleet scale — per-instance operators stream
        from HBM each iteration; see BASELINE.md; block condensation wins
        when the plant is shared: ``TinyMPC(tier="block")``).

        ``cones`` adds static SOC constraints; ``cone_mu``/``cone_shift``
        (``(n_input_cones, B)``) override the parameters per instance and
        ``cone_ball``/``cone_axis`` (lists of ``(B, nu)`` 0/1 membership /
        ``(B,)`` axis indices per input cone) override the *geometry* —
        both tiers: the hetero kernel runs its lane-packed masked
        projection, the instance-ops tier the jnp masked projection
        (:func:`..solver.cones.project_cone_masked`)."""
        if tier not in FLEET_TIERS:
            raise ValueError(f"tier must be one of {FLEET_TIERS}")
        A = jnp.asarray(A, jnp.float32)
        Bm = jnp.asarray(B, jnp.float32)
        Q = jnp.asarray(Q, jnp.float32)
        R = jnp.asarray(R, jnp.float32)
        Bn, nx, nu = Bm.shape
        N, m = horizon, horizon - 1
        rho_b = jnp.broadcast_to(
            jnp.asarray(rho, jnp.float32).reshape(-1), (Bn,)
        )

        def expand(v, default, knots, k):
            if v is None:
                return jnp.full((Bn, knots, k), default, jnp.float32)
            v = jnp.asarray(v, jnp.float32)
            if v.ndim <= 1:
                v = jnp.broadcast_to(v, (Bn, knots, k))
            elif v.ndim == 2:  # (B, k) per-instance, time-uniform
                v = jnp.broadcast_to(v[:, None, :], (Bn, knots, k))
            return v

        en_input = u_min is not None and u_max is not None
        en_state = x_min is not None and x_max is not None
        problem = Problem(
            A=A, B=Bm, Q=Q, R=R,
            u_min=expand(u_min, -jnp.inf, m, nu),
            u_max=expand(u_max, jnp.inf, m, nu),
            x_min=expand(x_min, -jnp.inf, N, nx),
            x_max=expand(x_max, jnp.inf, N, nx),
            Xref=jnp.zeros((Bn, N, nx), jnp.float32),
            Uref=jnp.zeros((Bn, m, nu), jnp.float32),
        )
        if host_precompute:
            from ..precompute import riccati_cache

            caches = [
                riccati_cache(
                    np.asarray(A[b]), np.asarray(Bm[b]),
                    np.asarray(Q[b]), np.asarray(R[b]), float(rho_b[b]),
                )
                for b in range(Bn)
            ]
            cache = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *caches
            )
        elif nx <= 16:
            from ..ops.riccati_kernel import riccati_cache_kernel

            cache = riccati_cache_kernel(
                A, Bm, Q, R, rho_b, interpret=interpret
            )
        else:
            from ..precompute import riccati_cache_jax

            cache = jax.jit(jax.vmap(riccati_cache_jax))(A, Bm, Q, R, rho_b)
        if polish and not host_precompute:
            # f64 refinement to the true fixed point (tol 1e-9): device
            # f32 builds land ~4e-5 off and drive controls ~7e-4 from the
            # f64 gold standard — above the 1e-4 parity bar. The polished
            # caches are the correctly-rounded f32 values of the true fixed
            # point (precompute.riccati_polish_f64; BASELINE.md fleet
            # precision note).
            from ..precompute import riccati_polish_f64

            cache = riccati_polish_f64(cache, A, Bm, Q, R, rho_b)
        settings = (settings or Settings()).replace(
            en_input_bound=en_input, en_state_bound=en_state
        )
        cone_params = cone_masks = cone_args = None
        has_ci = (
            cone_mu is not None or cone_shift is not None
            or cone_ball is not None or cone_axis is not None
        )
        if has_ci and cones is None:
            raise ValueError(
                "cone_mu/cone_shift/cone_ball/cone_axis override a base "
                "ConeSet — pass cones= as well"
            )
        if has_ci:
            from ..solver.cones import make_cone_args

            cone_args = make_cone_args(
                cones, Bn, nx, nu, mu_u=cone_mu, shift_u=cone_shift,
                ball_u=cone_ball, axis_u=cone_axis,
            )
        if has_ci and tier == "hetero":
            if cone_mu is not None or cone_shift is not None:
                from ..ops.hetero_admm import pad_hetero_cone_params

                cone_params = pad_hetero_cone_params(
                    cones, Bn, mu_u=cone_mu, shift_u=cone_shift,
                )
            if cone_ball is not None or cone_axis is not None:
                from ..ops.hetero_admm import pad_hetero_cone_masks

                cone_masks = pad_hetero_cone_masks(
                    cones, Bn, nx, nu, ball_u=cone_ball, axis_u=cone_axis,
                )
        self = cls(
            problem=problem, cache=cache, settings=settings, tier=tier,
            interpret=interpret, cones=cones, cone_params=cone_params,
            cone_masks=cone_masks, cone_args=cone_args,
            compaction_segment=compaction_segment, block=block,
        )
        self._build()
        return self

    def _build(self) -> None:
        if self.tier == "hetero":
            from ..ops.hetero_admm import HeteroCarry, pad_hetero_problem

            self._hp = jax.jit(pad_hetero_problem)(self.problem, self.cache)
            self._carry = HeteroCarry.zeros(self._hp)
        elif self.tier == "hstream":
            from ..ops.hstream_admm import (
                hstream_carry_zeros, pad_hstream_problem,
            )

            self._hp = jax.jit(pad_hstream_problem)(self.problem, self.cache)
            self._carry = hstream_carry_zeros(self.batch, self._hp)
        elif self.tier == "block":
            from ..solver.batched import init_state_batched
            from ..solver.block_condensed import block_ops_batched

            nx, nu = self.problem.A.shape[-1], self.problem.B.shape[-1]
            N = self.problem.Xref.shape[-2]
            self._ops = block_ops_batched(
                self.cache, self.problem.A, self.problem.B, N, self.block
            )
            self._carry = init_state_batched(self.batch, nx, nu, N)
        elif self.tier == "scan":
            from ..solver.batched import init_state_batched

            nx, nu = self.problem.A.shape[-1], self.problem.B.shape[-1]
            N = self.problem.Xref.shape[-2]
            self._carry = init_state_batched(self.batch, nx, nu, N)
        else:
            from ..solver.batched_ops import OpsState, build_instance_ops

            self._ops = jax.jit(build_instance_ops)(self.problem, self.cache)
            nx, nu = self.problem.A.shape[-1], self.problem.B.shape[-1]
            N = self.problem.Xref.shape[-2]
            self._carry = OpsState.zeros(
                self.batch, N * nx, (N - 1) * nu
            )

    # ----------------------------------------------------------- surface ----
    @property
    def batch(self) -> int:
        return self.problem.A.shape[0]

    @property
    def dims(self) -> tuple:
        return (
            self.problem.A.shape[-1], self.problem.B.shape[-1],
            self.problem.Xref.shape[-2],
        )

    def set_x0(self, x0s) -> None:
        """Per-instance measurements ``(B, nx)``."""
        x0s = jnp.asarray(x0s, jnp.float32)
        if x0s.shape != (self.batch, self.dims[0]):
            raise ValueError(
                f"x0s shape {x0s.shape} != ({self.batch}, {self.dims[0]})"
            )
        self._x0 = x0s

    def reset_duals(self) -> None:
        """Re-solve protocol: duals zeroed, slacks kept (reference:
        examples/quadrotor_hovering.cpp:99-104)."""
        if self.tier in ("block", "scan"):
            from ..types import reset_duals as _rd

            self._carry = _rd(self._carry)
        else:
            self._carry = self._carry.reset_duals()

    def set_bounds(self, u_min=None, u_max=None, x_min=None,
                   x_max=None) -> None:
        """Runtime bound updates (reference FFI set_umin/set_umax/...,
        tiny_wrapper.cpp:43-129): scalars, shared ``(knots, k)``, or
        per-instance ``(B, knots, k)`` arrays; providing a complete pair
        enables that constraint set. Carries survive the rebuild."""
        nx, nu, N = self.dims

        def expand(v, knots, k):
            v = jnp.asarray(v, jnp.float32)
            if v.ndim <= 1:
                return jnp.broadcast_to(v, (self.batch, knots, k))
            if v.ndim == 2:
                # (B, k) = per-instance time-uniform; (knots, k) = shared
                # schedule. Ambiguous only if B == knots AND k matches both
                # interpretations; per-instance wins there.
                if v.shape[0] == self.batch and v.shape[1] == k:
                    return jnp.broadcast_to(
                        v[:, None, :], (self.batch, knots, k)
                    )
                return jnp.broadcast_to(v[None], (self.batch, knots, k))
            return v

        upd = {}
        if u_min is not None and u_max is not None:
            upd["u_min"] = expand(u_min, N - 1, nu)
            upd["u_max"] = expand(u_max, N - 1, nu)
            self.settings = self.settings.replace(en_input_bound=True)
        if x_min is not None and x_max is not None:
            upd["x_min"] = expand(x_min, N, nx)
            upd["x_max"] = expand(x_max, N, nx)
            self.settings = self.settings.replace(en_state_bound=True)
        if not upd:
            return
        self.problem = self.problem.replace(**upd)
        carry = self._carry
        self._build()
        self._carry = carry

    def set_plants(self, A=None, B=None, Q=None, R=None, *,
                   refresh: str = "newton", polish: bool = False) -> None:
        """Online model update: replace per-instance dynamics and/or cost
        diagonals and refresh every Riccati cache on device — the
        system-identification / slowly-drifting-plant serving loop (no
        reference analogue: the reference bakes one plant at codegen time,
        codegen.cpp:245-292).

        ``refresh="newton"`` warm-starts Newton-Kleinman from the current
        gains (:func:`..ops.riccati_kernel.riccati_cache_newton` on the
        Pallas path for nx<=16, vmapped
        :func:`..precompute.riccati_newton_jax` above that; ~102x a
        fixed-point refresh on chip). Newton requires the updated plant to
        still be stabilized by the old gain; instances where the drift
        broke that (the Stein sum diverges to non-finite values — detected
        per instance over every cache field) fall back automatically to
        the warm fixed point, so any drift size is safe and only the speed
        degrades. ``"kernel"`` always uses the warm fixed point.
        ``polish=True`` adds the f64 refinement (setup-grade precision).
        Carries are reset: duals/slacks against the old model are not warm
        starts for the new one."""
        if refresh not in ("newton", "kernel"):
            raise ValueError(
                f"refresh must be 'newton' or 'kernel', got {refresh!r}"
            )
        upd = {}
        if A is not None:
            upd["A"] = jnp.asarray(A, jnp.float32)
        if B is not None:
            upd["B"] = jnp.asarray(B, jnp.float32)
        if Q is not None:
            upd["Q"] = jnp.asarray(Q, jnp.float32)
        if R is not None:
            upd["R"] = jnp.asarray(R, jnp.float32)
        if not upd:
            return
        self.problem = self.problem.replace(**upd)
        nx = self.problem.A.shape[-1]
        rho_b = jnp.asarray(self.cache.rho, jnp.float32).reshape(-1)
        def fixed_point_cache():
            if nx <= 16:
                from ..ops.riccati_kernel import riccati_cache_kernel

                return riccati_cache_kernel(
                    self.problem.A, self.problem.B, self.problem.Q,
                    self.problem.R, rho_b, P0=self.cache.Pinf,
                    K0=self.cache.Kinf, interpret=self.interpret,
                )
            from ..precompute import riccati_cache_jax

            return jax.jit(jax.vmap(
                lambda a, b, q, r, p, P0, K0: riccati_cache_jax(
                    a, b, q, r, p, P0=P0, K0=K0)
            ))(self.problem.A, self.problem.B, self.problem.Q,
               self.problem.R, rho_b, self.cache.Pinf, self.cache.Kinf)

        if refresh == "newton":
            if nx <= 16:
                from ..ops.riccati_kernel import riccati_cache_newton

                cache = riccati_cache_newton(
                    self.problem.A, self.problem.B, self.problem.Q,
                    self.problem.R, rho_b, self.cache.Kinf,
                    interpret=self.interpret,
                )
            else:
                from ..precompute import riccati_newton_jax

                cache = jax.jit(jax.vmap(
                    lambda a, b, q, r, p, K0: riccati_newton_jax(
                        a, b, q, r, p, K0, tol=1e-6)
                ))(self.problem.A, self.problem.B, self.problem.Q,
                   self.problem.R, rho_b, self.cache.Kinf)
            # Non-finite in ANY cache field means drift destabilized that
            # instance's old gain (Newton's Stein sum diverged) — or the
            # overflow was confined to a derived term like the Quu solve.
            # Either way, rebuild via the warm fixed point (value iteration
            # converges for any stabilizable plant) and keep Newton's
            # result only where every field is finite.
            bad = ~jnp.stack([
                jnp.isfinite(leaf.reshape(leaf.shape[0], -1)).all(axis=1)
                for leaf in jax.tree.leaves(cache)
            ]).all(axis=0)
            if bool(bad.any()):
                fb = fixed_point_cache()
                cache = jax.tree.map(
                    lambda n, o: jnp.where(
                        bad.reshape((-1,) + (1,) * (n.ndim - 1)), o, n
                    ),
                    cache, fb,
                )
        else:
            cache = fixed_point_cache()
        if polish:
            from ..precompute import riccati_polish_f64

            cache = riccati_polish_f64(
                cache, self.problem.A, self.problem.B, self.problem.Q,
                self.problem.R, rho_b,
            )
        self.cache = cache
        self._build()

    def set_xref(self, Xref) -> None:
        """Per-instance reference trajectories ``(B, N, nx)`` (or a shared
        ``(N, nx)`` broadcast) — the reference FFI's ``set_xref``
        (tiny_wrapper.cpp:21-41) per instance; rebuilds the
        reference-dependent operands, carries kept."""
        nx, _nu, N = self.dims
        Xref = jnp.asarray(Xref, jnp.float32)
        if Xref.ndim == 2:
            Xref = jnp.broadcast_to(Xref, (self.batch, N, nx))
        self.problem = self.problem.replace(Xref=Xref)
        carry = self._carry
        self._build()
        self._carry = carry  # warm starts survive a reference update

    def solve(self) -> dict[str, Any]:
        """One batched solve from the current x0 / warm-start carries.
        ``settings.check_termination == 0`` is the deterministic
        fixed-iteration mode; ``> 0`` per-instance early termination."""
        if self._x0 is None:
            raise RuntimeError("call set_x0 first")
        s = self.settings
        if getattr(s, "alpha", 1.0) != 1.0 and self.tier in (
                "hetero", "instance_ops", "hstream"):
            raise ValueError(
                "Settings.alpha (over-relaxation) is implemented on the "
                "scan/block/fused/condensed tiers; the hetero-family "
                "kernels run the reference (alpha=1) schedule — use "
                "tier='scan' or drop alpha"
            )
        if self.tier == "hstream":
            # Long-horizon fleet tier. Adaptive mode (check_termination > 0):
            # in-kernel per-instance freeze (ops/hstream_admm._kernel_adaptive)
            # by default — per-iteration-granular, composes with per-instance
            # cone operands; with compaction_segment set, the segment-level
            # compaction cascade instead (solver/cascade.hstream_cascade_solve,
            # re-packs survivors into dense tiles — the wall-clock win when
            # convergence is scattered across tiles).
            from ..ops.hstream_admm import hstream_solve

            if s.check_termination > 0 and self.compaction_segment:
                from ..solver.cascade import hstream_cascade_solve

                # Compose: adaptive segments (in-kernel freeze) + compaction
                # — bit-exact vs one long adaptive call; segment rounded up
                # to a check multiple (the cadence-composition requirement).
                ce = int(s.check_termination)
                seg = -(-self.compaction_segment // ce) * ce
                U, X, stats, carry = hstream_cascade_solve(
                    self._x0, self._carry, self._hp,
                    max_iter=s.max_iter,
                    segment_iters=seg,
                    check_termination=ce,
                    abs_pri_tol=float(s.abs_pri_tol),
                    abs_dua_tol=float(s.abs_dua_tol),
                    en_input_bound=s.en_input_bound,
                    en_state_bound=s.en_state_bound,
                    interpret=self.interpret, cones=self.cones,
                )
                self._carry = carry
                self._last = (U, X)
                stats = np.asarray(stats)
            else:
                res = hstream_solve(
                    self._x0, self._carry, self._hp, max_iter=s.max_iter,
                    check_termination=s.check_termination,
                    abs_pri_tol=s.abs_pri_tol, abs_dua_tol=s.abs_dua_tol,
                    en_input_bound=s.en_input_bound,
                    en_state_bound=s.en_state_bound,
                    interpret=self.interpret, cones=self.cones,
                    cone_params=self.cone_params,
                    cone_masks=self.cone_masks,
                )
                self._carry = res.carry
                self._last = (res.U, res.X)
                stats = np.asarray(res.stats)
            return {
                "iterations": stats[:, 0].astype(np.int64),
                "solved": stats[:, 1] > 0.5,
                "iterations_mean": float(stats[:, 0].mean()),
                "converged_fraction": float((stats[:, 1] > 0.5).mean()),
                "primal_residual_state_max": float(stats[:, 2].max()),
                "dual_residual_state_max": float(stats[:, 3].max()),
                "primal_residual_input_max": float(stats[:, 4].max()),
                "dual_residual_input_max": float(stats[:, 5].max()),
            }
        if self.tier in ("block", "scan"):
            # Batched-State fleet tiers. tier="scan" (vmapped lax.scan
            # sweeps, per-instance plants) is the MEASURED per-instance
            # long-horizon fast path (27k solves/s at N=256/B=1024 on chip
            # — BASELINE.md round 5). tier="block" (per-instance dense
            # block operators) is a measured NEGATIVE at fleet scale
            # (0.10-0.38x scan: every instance's block operators stream
            # from HBM each iteration; kept for completeness/parity —
            # block condensation wins only when the plant is SHARED and
            # the operators stay resident: TinyMPC(tier='block')).
            from ..solver.cones import cone_slack_update

            if self.cone_params is not None or self.cone_masks is not None:
                raise ValueError(
                    "per-instance cone params/masks are hetero-tier "
                    "operands; this tier supports a shared ConeSet"
                )
            nx, nu, N = self.dims
            st = self._carry.replace(
                x=self._carry.x.at[:, 0, :].set(self._x0)
            )
            project = (cone_slack_update(self.cones)
                       if self.cones is not None else None)
            if self.tier == "scan":
                from ..solver.batched import solve_batched

                st = jax.jit(
                    lambda ss: solve_batched(
                        ss, self.problem, self.cache, s,
                        problem_axes=0, cache_axes=0, project=project,
                    )
                )(st)
            else:
                from ..solver.block_condensed import solve_block_batched

                # ops pass as traced args (closure capture would bake the
                # per-instance operator tree into the HLO as constants —
                # the relay compile-payload ceiling, BASELINE.md).
                om, ot, kb = self._ops
                extra = tuple(o for o in (om, ot) if o is not None)

                def run(ss, *opsx):
                    i = 0
                    m2 = t2 = None
                    if om is not None:
                        m2 = opsx[i]
                        i += 1
                    if ot is not None:
                        t2 = opsx[i]
                    return solve_block_batched(
                        ss, self.problem, self.cache, s,
                        block=self.block, project=project, ops=(m2, t2, kb),
                    )

                st = jax.jit(run)(st, *extra)
            self._carry = st
            self._last = (st.u, st.x)
            return {
                "iterations": np.asarray(st.iter, np.int64),
                "solved": np.asarray(st.status) == 1,
                "iterations_mean": float(np.asarray(st.iter).mean()),
                "converged_fraction": float(
                    (np.asarray(st.status) == 1).mean()
                ),
            }
        if self.tier == "hetero":
            from ..ops.hetero_admm import hetero_solve

            ce = s.check_termination
            if self.compaction_segment and ce > 0:
                from ..solver.cascade import hetero_cascade_solve

                U, X, stats, carry = hetero_cascade_solve(
                    self._x0, self._carry, self._hp,
                    max_iter=s.max_iter, check_termination=ce,
                    segment_iters=self.compaction_segment,
                    abs_pri_tol=float(s.abs_pri_tol),
                    abs_dua_tol=float(s.abs_dua_tol),
                    en_input_bound=s.en_input_bound,
                    en_state_bound=s.en_state_bound,
                    interpret=self.interpret, cones=self.cones,
                    cone_params=self.cone_params,
                    cone_masks=self.cone_masks,
                )
                self._carry = carry
                self._last = (U, X)
            else:
                res = hetero_solve(
                    self._x0, self._carry, self._hp,
                    max_iter=s.max_iter, check_termination=ce,
                    abs_pri_tol=float(s.abs_pri_tol),
                    abs_dua_tol=float(s.abs_dua_tol),
                    en_input_bound=s.en_input_bound,
                    en_state_bound=s.en_state_bound,
                    interpret=self.interpret, cones=self.cones,
                    cone_params=self.cone_params,
                    cone_masks=self.cone_masks,
                )
                self._carry = res.carry
                self._last = (res.U, res.X)
                stats = res.stats
            stats = np.asarray(stats)
            return {
                "iterations": stats[:, 0].astype(np.int64),
                "solved": stats[:, 1] > 0.5,
                "iterations_mean": float(stats[:, 0].mean()),
                "converged_fraction": float((stats[:, 1] > 0.5).mean()),
                "primal_residual_state_max": float(stats[:, 2].max()),
                "dual_residual_state_max": float(stats[:, 3].max()),
                "primal_residual_input_max": float(stats[:, 4].max()),
                "dual_residual_input_max": float(stats[:, 5].max()),
            }
        from ..solver.batched_ops import solve_instance_ops

        nx, nu, N = self.dims
        st = jax.jit(
            solve_instance_ops,
            static_argnames=("cones", "dims"),
        )(
            self._x0, self._carry, self._ops, s,
            cones=self.cones, dims=(nx, nu), cone_args=self.cone_args,
        )
        self._carry = st
        self._last = (
            st.U.reshape(self.batch, N - 1, nu),
            st.X.reshape(self.batch, N, nx),
        )
        return {
            "iterations": np.asarray(st.iter, np.int64),
            "solved": np.asarray(st.solved),
            "iterations_mean": float(np.asarray(st.iter).mean()),
            "converged_fraction": float(np.asarray(st.solved).mean()),
        }

    def get_u(self) -> jax.Array:
        """Final (pre-projection) controls ``(B, N-1, nu)`` — the reference
        applies pre-projection u."""
        if self._last is None:
            raise RuntimeError("no solve yet")
        return self._last[0]

    def get_x(self) -> jax.Array:
        """State trajectories ``(B, N, nx)``."""
        if self._last is None:
            raise RuntimeError("no solve yet")
        return self._last[1]

    def solve_adaptive_rho(self, engine: str = "auto", mesh=None,
                           **kw) -> dict[str, Any]:
        """Per-instance on-device rho adaptation; adopts the adapted caches
        for subsequent solves.

        ``engine="einsum"`` runs the chunks on the per-instance-operator
        tier (:func:`..solver.batched_ops.solve_adaptive_rho_batched`);
        ``"hetero"`` on the fused single-dispatch hetero-kernel loop
        (:func:`..solver.adaptive_hetero.solve_adaptive_rho_hetero` —
        with its default
        Newton-Kleinman warm refreshes, 70x the einsum tier at B=16k on
        chip, BASELINE.md; same adaptation decisions at 99.5% same-round
        agreement, hetero-tier cone operands; pass ``riccati="kernel"``
        for the pure fixed-point refresh). ``"auto"`` picks hetero on TPU
        for the hetero tier (per-instance ``cone_args`` overrides are
        einsum-only), einsum otherwise.

        ``engine="scan"`` (round 5, the default for the scan/block
        tiers) runs the shape-unbound loop — any horizon, any nx
        (:func:`..solver.adaptive_scan.solve_adaptive_rho_scan`: scan-
        tier chunks + vmapped warm Newton-Kleinman refresh, no repack).

        ``mesh`` (a :func:`..parallel.make_batch_mesh` mesh) shards the
        fused hetero loop over devices
        (:func:`..parallel.sharded_adaptive_hetero`: shard-local rho and
        while_loop, communication-free adaptation; batch divisible by the
        mesh size — per-instance cone params/masks are single-device
        only)."""
        if self._x0 is None:
            raise RuntimeError("call set_x0 first")
        nx, nu, N = self.dims
        if engine == "scan" or (engine == "auto"
                                and self.tier in ("scan", "block")):
            # Shape-unbound adaptation (any horizon, any nx): scan-tier
            # chunks + vmapped warm Newton refresh, no repack stage
            # (solver/adaptive_scan.py, round 5).
            from ..solver.adaptive_scan import solve_adaptive_rho_scan

            res = solve_adaptive_rho_scan(
                self._x0, self.problem, self.problem.A, self.problem.B,
                self.problem.Q, self.problem.R,
                jnp.asarray(self.cache.rho, jnp.float32).reshape(-1),
                self.settings, **kw,
            )
            self.cache = res.cache
            self._build()
            self._carry = res.state
            self._last = (res.state.u, res.state.x)
            return {
                "rho": np.asarray(res.rho),
                "iterations": np.asarray(res.total_iter, np.int64),
                "solved": np.asarray(res.solved),
                "rounds": int(res.rounds),
            }
        use_hetero = mesh is not None or engine == "hetero" or (
            engine == "auto" and self.tier == "hetero"
            and self.cone_args is None
            and jax.default_backend() == "tpu"
        )
        if mesh is not None:
            if self.cone_params is not None or self.cone_masks is not None:
                raise ValueError(
                    "per-instance cone params/masks are single-device only "
                    "(lane packing is shard-local); drop mesh= or the "
                    "per-instance cone overrides"
                )
            from ..parallel.mesh import (
                shard_batch, sharded_adaptive_hetero,
            )

            solve = sharded_adaptive_hetero(
                mesh, self.settings, cones=self.cones,
                interpret=self.interpret, **kw,
            )
            rho0 = jnp.broadcast_to(
                jnp.asarray(self.cache.rho, jnp.float32).reshape(-1),
                (self.batch,),
            )
            res, stats = solve(
                shard_batch(self._x0, mesh),
                shard_batch(self.problem, mesh),
                shard_batch(self.problem.A, mesh),
                shard_batch(self.problem.B, mesh),
                shard_batch(self.problem.Q, mesh),
                shard_batch(self.problem.R, mesh),
                shard_batch(rho0, mesh),
            )
            # Adopt as unsharded arrays: the fleet's repack (_build) uses
            # scatter-style lane packing whose output sharding cannot be
            # inferred from batch-sharded operands.
            self.cache = jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a)), res["cache"]
            )
            self._build()
            self._last = (jnp.asarray(np.asarray(res["U"])),
                          jnp.asarray(np.asarray(res["X"])))
            return {
                "rho": np.asarray(res["rho"]),
                "iterations": np.asarray(res["total_iter"], np.int64),
                "solved": np.asarray(res["solved"]),
                "rounds": int(stats["rounds_max"]),
            }
        if use_hetero:
            from ..solver.adaptive_hetero import solve_adaptive_rho_hetero

            res = solve_adaptive_rho_hetero(
                self._x0, self.problem, self.problem.A, self.problem.B,
                self.problem.Q, self.problem.R,
                jnp.asarray(self.cache.rho, jnp.float32).reshape(-1),
                self.settings, cones=self.cones,
                cone_params=self.cone_params, cone_masks=self.cone_masks,
                interpret=self.interpret, **kw,
            )
            self.cache = res.cache
            self._build()
            self._last = (res.U, res.X)
            return {
                "rho": np.asarray(res.rho),
                "iterations": np.asarray(res.total_iter, np.int64),
                "solved": np.asarray(res.solved),
                "rounds": int(res.rounds),
            }
        from ..solver.batched_ops import solve_adaptive_rho_batched

        res = jax.jit(
            lambda x, r: solve_adaptive_rho_batched(
                x, self.problem, self.problem.A, self.problem.B,
                self.problem.Q, self.problem.R, r, self.settings,
                cones=self.cones, cone_args=self.cone_args, **kw,
            )
        )(self._x0, jnp.asarray(self.cache.rho, jnp.float32).reshape(-1))
        self.cache = res.cache
        self._build()  # re-pack operators at the adapted rho
        st = res.state
        self._last = (
            st.U.reshape(self.batch, N - 1, nu),
            st.X.reshape(self.batch, N, nx),
        )
        return {
            "rho": np.asarray(res.rho),
            "iterations": np.asarray(res.total_iter, np.int64),
            "solved": np.asarray(st.solved),
            "rounds": int(res.rounds),
        }
