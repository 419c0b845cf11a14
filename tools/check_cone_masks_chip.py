"""On-chip compile/parity check for the hetero kernel's per-instance cone
ball/axis masks (pad_hetero_cone_masks). Run on the real TPU:

    python tools/check_cone_masks_chip.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from accelerated_tinympc_tpu.models.quadrotor import (
    load_quadrotor_cache,
    load_quadrotor_problem,
)
from accelerated_tinympc_tpu.ops.hetero_admm import (
    HeteroCarry,
    hetero_solve,
    pad_hetero_cone_masks,
    pad_hetero_problem,
)
from accelerated_tinympc_tpu.solver.cones import Cone, ConeSet


def main():
    print("devices:", jax.devices())
    # Warm-up jit right after device init (relay-wedge workaround).
    jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))).block_until_ready()

    B = 256
    prob = load_quadrotor_problem(hz=100)
    cache = load_quadrotor_cache(hz=100)
    nx, nu = prob.A.shape[0], prob.B.shape[1]
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        0.3 * rng.standard_normal((B, nx)), jnp.float32
    )
    prob_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), prob)
    cache_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                           cache)
    hp = pad_hetero_problem(prob_b, cache_b)

    # Tight geometry (small mu/shift) so the projection actively clips and
    # the base-vs-alt sensitivity check below is meaningful.
    base = Cone(ball=(0, 1), axis=2, mu=0.25, shift=0.1)
    alt = Cone(ball=(1, 2), axis=0, mu=0.25, shift=0.1)
    cones = ConeSet(input_cones=(base,))
    h = B // 2
    ball = np.zeros((B, nu), np.float32)
    ball[:h, [0, 1]] = 1.0
    ball[h:, [1, 2]] = 1.0
    axis = np.full(B, 2, np.int64)
    axis[h:] = 0
    cm = pad_hetero_cone_masks(cones, B, nx, nu, ball_u=[ball],
                               axis_u=[axis])

    kw = dict(max_iter=50)
    # Fixed-mode masked solve on chip.
    got = hetero_solve(x0s, HeteroCarry.zeros(hp), hp, cones=cones,
                       cone_masks=cm, **kw)
    jax.block_until_ready(got.U)
    print("fixed masked solve compiled + ran")

    w_base = hetero_solve(x0s, HeteroCarry.zeros(hp), hp, cones=cones, **kw)
    w_alt = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp,
        cones=ConeSet(input_cones=(alt,)), **kw
    )
    e_base = float(np.max(np.abs(np.asarray(got.U[:h] - w_base.U[:h]))))
    e_alt = float(np.max(np.abs(np.asarray(got.U[h:] - w_alt.U[h:]))))
    diff = float(np.max(np.abs(np.asarray(got.U[h:] - w_base.U[h:]))))
    print(f"base-half err vs static: {e_base:.3e}")
    print(f"alt-half  err vs static@alt: {e_alt:.3e}")
    print(f"alt-half  delta vs base geometry: {diff:.3e} (want > 1e-4)")
    assert e_base < 2e-5 and e_alt < 2e-5 and diff > 1e-4

    # Adaptive mode with masks compiles + runs too.
    ga = hetero_solve(
        x0s, HeteroCarry.zeros(hp), hp, cones=cones, cone_masks=cm,
        max_iter=100, check_termination=25,
        abs_pri_tol=1e-3, abs_dua_tol=1e-3,
    )
    jax.block_until_ready(ga.U)
    it = np.asarray(ga.stats)[:, 0] if ga.stats is not None else None
    print("adaptive masked solve compiled + ran",
          ("iters mean %.1f" % it.mean()) if it is not None else "")
    print("OK")


if __name__ == "__main__":
    main()
