"""Codegen pipeline end-to-end (capability parity with reference
codegen.cpp + its generated-project workflow, SURVEY.md §3.3): generate the
standalone C++ project, build it with the native toolchain, run the emitted
MPC main, and check the trajectory against the JAX engine. Also exercises the
generated shared library through the classic ctypes FFI surface
(reference: src/tinympc/tiny_wrapper.hpp:14-23)."""

import ctypes
import pathlib
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import accelerated_tinympc_tpu as atm
from accelerated_tinympc_tpu.api import build_project, mpc_rollout, tiny_codegen
from accelerated_tinympc_tpu.models import cartpole
from accelerated_tinympc_tpu.precompute import riccati_cache

X0 = np.array([0.3, 0.0, 0.1, 0.0])
TICKS = 60


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    out = tmp_path_factory.mktemp("cg") / "cartpole_project"
    tiny_codegen(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG,
        rho=cartpole.RHO, horizon=10, output_dir=out,
        x_min=-5.0, x_max=5.0, u_min=-5.0, u_max=5.0,
        settings=atm.Settings(max_iter=25, check_termination=0),
        augment_Q=False,  # compare against the engine's examples convention
    )
    binary = build_project(out)
    return out, binary


def _jax_rollout():
    problem = cartpole.cartpole_problem(10)
    cache = riccati_cache(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG, cartpole.RHO
    )
    settings = atm.Settings(max_iter=25, check_termination=0)
    _, _, trace = jax.jit(
        lambda x: mpc_rollout(problem, cache, settings, x, TICKS)
    )(jnp.asarray(X0, jnp.float32))
    return np.asarray(trace.x), np.asarray(trace.u)


def test_generated_binary_matches_engine(project):
    _, binary = project
    res = subprocess.run(
        [str(binary), *[str(v) for v in X0], str(TICKS)],
        capture_output=True, text=True, check=True,
    )
    rows = np.array(
        [[float(v) for v in line.split(",")]
         for line in res.stdout.strip().splitlines()]
    )
    assert rows.shape[0] == TICKS
    x_cpp = rows[:, 1:5]
    u_cpp = rows[:, 5:6]
    x_jax, u_jax = _jax_rollout()
    np.testing.assert_allclose(u_cpp, u_jax, rtol=0, atol=1e-4)
    np.testing.assert_allclose(x_cpp, x_jax, rtol=0, atol=1e-4)


def test_generated_project_layout(project):
    out, _ = project
    for f in ("CMakeLists.txt", "Makefile", "README.md",
              "include/tiny_dims.h", "include/tiny_api.h",
              "src/tiny_solver.cpp", "src/tiny_data.cpp",
              "src/tiny_api.cpp", "src/tiny_main.cpp"):
        assert (out / f).exists(), f


def test_ffi_shared_library(project):
    out, _ = project
    lib = ctypes.CDLL(str(out / "libtinympc_deploy.so"))
    for sym in ("set_x0", "set_xref", "set_umin", "set_umax", "set_xmin",
                "set_xmax", "reset_dual_variables", "call_tiny_solve",
                "get_x", "get_u"):
        assert hasattr(lib, sym), sym

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.set_x0.argtypes = [f32p, ctypes.c_int]
    lib.call_tiny_solve.argtypes = [ctypes.c_int]
    lib.call_tiny_solve.restype = ctypes.c_int
    lib.get_u.argtypes = [f32p, ctypes.c_int]
    lib.reset_dual_variables.argtypes = [ctypes.c_int]

    lib.reset_dual_variables(0)
    lib.set_x0(np.asarray(X0, np.float32).copy(), 0)
    lib.call_tiny_solve(0)
    u = np.zeros(9 * 1, np.float32)
    lib.get_u(u, 0)

    x_jax, u_jax = _jax_rollout()
    np.testing.assert_allclose(u[0], u_jax[0, 0], rtol=0, atol=1e-4)


def test_precompute_matches_engine_cache(project):
    """The baked Kinf in the generated data must equal the engine's own
    precompute (both mirror reference codegen.cpp:268-292)."""
    out, _ = project
    data = (out / "src" / "tiny_data.cpp").read_text()
    cache = riccati_cache(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG, cartpole.RHO,
        dtype=np.float64,
    )
    first_kinf = float(np.asarray(cache.Kinf).reshape(-1)[0])
    assert f"{first_kinf:.16g}"[:12] in data


class TestQuadrotorDeploymentVsReference:
    """The emitted standalone C++ solver vs the *reference's own* compiled
    solver: generate the quadrotor hovering deployment project, run its MPC
    main, and compare controls against the golden trajectory dumped from the
    unmodified reference binary (tests/golden/hovering_fixed50_traj.csv,
    produced by tools/golden/golden_quadrotor.cpp)."""

    def test_quadrotor_project_matches_reference_golden(self, tmp_path):
        import accelerated_tinympc_tpu.models.quadrotor as qm
        from golden_utils import load_traj_csv

        d = dict(np.load(qm.DATA_DIR / "quadrotor_20hz_params.npz"))
        Xref = np.tile(qm.HOVER_SETPOINT, (10, 1))
        out = tiny_codegen(
            d["Adyn"], d["Bdyn"], d["Q"], d["R"], rho=float(d["rho"]),
            horizon=10, output_dir=tmp_path / "quad_project",
            u_min=-0.5, u_max=0.5, x_min=-5.0, x_max=5.0, Xref=Xref,
            settings=atm.Settings(max_iter=50, check_termination=0),
            gen_wrapper=False,
            # the golden harness follows the reference *examples* convention
            # (raw workspace Q); default augment_Q=True mirrors
            # reference-codegen-generated workspaces instead
            augment_Q=False,
        )
        binary = build_project(out)
        res = subprocess.run(
            [str(binary), *[str(v) for v in qm.HOVER_X0], "70"],
            capture_output=True, text=True, check=True,
        )
        rows = np.array(
            [[float(v) for v in line.split(",")]
             for line in res.stdout.strip().splitlines()]
        )
        u_cpp = rows[:, 13:17]
        x_cpp = rows[:, 1:13]
        want = load_traj_csv("hovering_fixed50", 12, 4)
        np.testing.assert_allclose(u_cpp, want["u0"], rtol=0, atol=1e-4)
        np.testing.assert_allclose(x_cpp, want["x0"], rtol=0, atol=1e-3)


def test_augmented_q_convention(tmp_path):
    """Default codegen bakes the rho-augmented cost diagonal like the
    reference's generated workspaces (reference: codegen.cpp:254-258); the
    examples convention is opt-out. The two emitted solvers must match the
    engine when the engine's workspace Q is set correspondingly."""
    import accelerated_tinympc_tpu.models.quadrotor as qm
    import jax
    import jax.numpy as jnp

    d = np.load(qm.DATA_DIR / "quadrotor_20hz_params.npz")
    Xref = np.tile(qm.HOVER_SETPOINT, (10, 1))
    outs = {}
    for name, aug in (("aug", True), ("raw", False)):
        out = tiny_codegen(
            d["Adyn"], d["Bdyn"], d["Q"], d["R"], rho=float(d["rho"]),
            horizon=10, output_dir=tmp_path / name,
            u_min=-0.5, u_max=0.5, x_min=-5.0, x_max=5.0, Xref=Xref,
            settings=atm.Settings(max_iter=30, check_termination=0),
            gen_wrapper=False, augment_Q=aug,
        )
        binary = build_project(out)
        res = subprocess.run(
            [str(binary), *[str(v) for v in qm.HOVER_X0], "1"],
            capture_output=True, text=True, check=True,
        )
        outs[name] = np.array(
            [float(v) for v in res.stdout.strip().split(",")[13:17]]
        )
    # conventions genuinely differ with a nonzero reference
    assert np.max(np.abs(outs["aug"] - outs["raw"])) > 1e-4

    # the augmented-convention binary matches the engine with augmented
    # workspace Q (the cache is identical; only update_linear_cost changes)
    from accelerated_tinympc_tpu.models import quadrotor_hovering_setup

    problem, cache, x0 = quadrotor_hovering_setup()
    problem_aug = problem.replace(Q=problem.Q + cache.rho)
    st = atm.set_x0(atm.init_state(12, 4, 10), jnp.asarray(x0, jnp.float32))
    got = jax.jit(
        lambda s: atm.solve(
            s, problem_aug, cache,
            atm.Settings(max_iter=30, check_termination=0),
        )
    )(st)
    np.testing.assert_allclose(
        outs["aug"], np.asarray(got.u[0], np.float64), rtol=0, atol=1e-4
    )


def test_ffi_runtime_bound_update(project):
    """Bound setters genuinely change the solve (parity with the reference
    wrapper's mutable workspace bounds, tiny_wrapper.cpp:43-129): tightening
    u bounds must saturate the returned first control at the new bound."""
    out, _ = project
    lib = ctypes.CDLL(str(out / "libtinympc_deploy.so"))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    for name in ("set_x0", "set_umin", "set_umax", "get_u"):
        getattr(lib, name).argtypes = [f32p, ctypes.c_int]
    lib.reset_dual_variables.argtypes = [ctypes.c_int]
    lib.call_tiny_solve.argtypes = [ctypes.c_int]
    lib.call_tiny_solve.restype = ctypes.c_int

    def solve_u0(umax):
        lib.set_umin(np.full(9, -umax, np.float32), 0)
        lib.set_umax(np.full(9, umax, np.float32), 0)
        lib.reset_dual_variables(0)
        lib.set_x0(np.asarray(X0, np.float32).copy(), 0)
        lib.call_tiny_solve(0)
        u = np.zeros(9, np.float32)
        lib.get_u(u, 0)
        return u

    u_wide = solve_u0(5.0)
    u_tight = solve_u0(0.5)
    assert np.abs(u_wide[0]) > 0.5  # wide bounds leave u unconstrained
    # tightened bounds pull the (pre-projection, 25-iteration) control toward
    # the new box; restoring the bounds reproduces the original solve exactly
    assert abs(u_tight[0]) < abs(u_wide[0])
    u_restored = solve_u0(5.0)
    np.testing.assert_array_equal(u_restored, u_wide)


def test_generated_project_with_cones(tmp_path):
    """SOC cones carried to the embedded path: a generated project with a
    thrust-tilt input cone builds, runs, keeps its slack inside the cone,
    and matches the engine's coned scan solve tick-for-tick."""
    from accelerated_tinympc_tpu.solver import admm
    from accelerated_tinympc_tpu.solver.cones import (
        Cone, ConeSet, cone_slack_update, cone_violation,
    )

    # Landing plant (tests/test_cones.py _landing_setup, horizon 15).
    dt, horizon = 0.1, 15
    I3 = np.eye(3)
    A = np.block([[I3, dt * I3], [0 * I3, I3]])
    B = np.vstack([0.5 * dt * dt * I3, dt * I3])
    Q = np.concatenate([np.full(3, 10.0), np.full(3, 1.0)])
    R = np.full(3, 1.0)
    cone = Cone(ball=(0, 1), axis=2, mu=1.0)
    cones = ConeSet(input_cones=(cone,))
    settings = atm.Settings(max_iter=150, check_termination=0)
    ticks = 20

    out = tmp_path / "landing_project"
    tiny_codegen(
        A, B, Q, R, rho=1.0, horizon=horizon, output_dir=out,
        settings=settings, augment_Q=False, cones=cones,
    )
    binary = build_project(out)
    x0 = np.asarray([3.0, -2.0, 4.0, -1.0, 1.0, -1.5])
    res = subprocess.run(
        [str(binary), *[str(v) for v in x0], str(ticks)],
        capture_output=True, text=True, check=True,
    )
    rows = np.array(
        [[float(v) for v in line.split(",")]
         for line in res.stdout.strip().splitlines()]
    )
    u_cpp = rows[:, 7:10]

    # Engine rollout: same tick protocol (dual reset, pre-projection u).
    problem = atm.Problem(
        A=jnp.asarray(A, jnp.float32), B=jnp.asarray(B, jnp.float32),
        Q=jnp.asarray(Q, jnp.float32), R=jnp.asarray(R, jnp.float32),
        u_min=jnp.full((horizon - 1, 3), -1e17, jnp.float32),
        u_max=jnp.full((horizon - 1, 3), 1e17, jnp.float32),
        x_min=jnp.full((horizon, 6), -1e17, jnp.float32),
        x_max=jnp.full((horizon, 6), 1e17, jnp.float32),
        Xref=jnp.zeros((horizon, 6), jnp.float32),
        Uref=jnp.zeros((horizon - 1, 3), jnp.float32),
    )
    cache = riccati_cache(A, B, Q, R, 1.0)
    sets = settings.replace(en_input_bound=False, en_state_bound=False)
    project = cone_slack_update(cones)
    solve = jax.jit(
        lambda s: admm.solve(s, problem, cache, sets, project=project)
    )
    st = atm.init_state(6, 3, horizon)
    x = jnp.asarray(x0, jnp.float32)
    u_jax = []
    for _ in range(ticks):
        st = atm.set_x0(atm.reset_duals(st), x)
        st = solve(st)
        u_jax.append(np.asarray(st.u[0]))
        x = problem.A @ x + problem.B @ st.u[0]
    np.testing.assert_allclose(
        u_cpp, np.asarray(u_jax), rtol=0, atol=1e-4
    )
    # The binary's slack trajectory obeys the cone (checked via consensus
    # controls staying near-feasible at 150 iterations).
    assert float(cone_violation(jnp.asarray(u_cpp), cone)) < 5e-2


def test_generated_adaptive_rho(tmp_path):
    """Generated projects carry the adaptive-rho entry: a 4-orders
    mis-scaled penalty the fixed solve cannot handle converges through
    `call_tiny_solve_adaptive` (double-precision in-binary Riccati
    refresh)."""
    from accelerated_tinympc_tpu.models import random_lti_problem

    problem, _ = random_lti_problem(
        seed=3, nx=8, nu=3, horizon=15, bound=5.0, q_scale=100.0,
        r_scale=0.1,
    )
    out = tmp_path / "adaptive_project"
    tiny_codegen(
        np.asarray(problem.A), np.asarray(problem.B),
        np.asarray(problem.Q), np.asarray(problem.R),
        rho=1e-2, horizon=15, output_dir=out,
        u_min=np.full((14, 3), -0.3), u_max=np.full((14, 3), 0.3),
        settings=atm.Settings(max_iter=1500, check_termination=1,
                              abs_pri_tol=2e-3, abs_dua_tol=2e-3),
        scalar_type="double",
    )
    build_project(out)
    lib = ctypes.CDLL(str(out / "libtinympc_deploy.so"))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.set_x0.argtypes = [f32p, ctypes.c_int]
    lib.call_tiny_solve.argtypes = [ctypes.c_int]
    lib.call_tiny_solve.restype = ctypes.c_int
    lib.call_tiny_solve_adaptive.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
    ]
    lib.call_tiny_solve_adaptive.restype = ctypes.c_int
    lib.reset_dual_variables.argtypes = [ctypes.c_int]

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(8).astype(np.float32)
    lib.set_x0(x0.copy(), 0)
    assert lib.call_tiny_solve(0) == 1, "premise: fixed bad rho fails"

    lib.reset_dual_variables(0)
    lib.set_x0(x0.copy(), 0)
    flag = lib.call_tiny_solve_adaptive(25, 1500, 5.0, 1.5, 1e-2, 1e3, 0)
    assert flag == 0, "adaptive rescue failed in the generated binary"


def test_c_callable_codegen(tmp_path):
    """The C-ABI tiny_codegen shim (native/src/tiny_codegen_c.cpp; reference
    signature codegen.hpp:10-15): a C++ main mirroring the reference's
    codegen_cartpole.cpp drives generation end-to-end, and the emitted
    project is identical to one generated by the Python entry with the same
    arguments (the shim is a faithful marshalling layer, not a fork)."""
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    exe = tmp_path / "codegen_cartpole_host"
    subprocess.run(
        ["g++", "-O2", "-std=c++17",
         str(repo / "native/examples/codegen_cartpole_host.cpp"),
         str(repo / "native/src/tiny_codegen_c.cpp"), "-o", str(exe)],
        check=True, capture_output=True,
    )
    out_c = tmp_path / "from_c"
    res = subprocess.run(
        [str(exe), str(repo), str(out_c)],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "TINYMPC_PYTHON": sys.executable},
    )
    assert res.returncode == 0, res.stderr + res.stdout
    assert "HOORAY" in res.stdout

    # Same generation driven from Python (reference data/settings of
    # codegen_cartpole.cpp:17-38,50-60; col-major A transposed to row-major).
    A = np.array([
        [1.0, 0.0, 0.0, 0.0],
        [0.01, 1.0, 0.0, 0.0],
        [2.2330083403300767e-5, 0.004466210576510177,
         1.0002605176397052, 0.05210579005928538],
        [7.443037974683548e-8, 2.2330083403300767e-5,
         0.01000086835443038, 1.0002605176397052],
        # .copy(): C-order like the CLI path — BLAS picks layout-dependent
        # dgemm paths, and an F-order view drifts the Riccati at 1e-13.
    ]).T.copy()
    B = np.array([7.468368562730335e-5, 0.014936765390161838,
                  3.79763323185387e-5, 0.007595596218554721]).reshape(4, 1)
    out_py = tmp_path / "from_py"
    tiny_codegen(
        A, B, np.array([10.0, 1.0, 10.0, 1.0]), np.array([1.0]),
        rho=0.1, horizon=10, output_dir=out_py,
        x_min=-5.0, x_max=5.0, u_min=-5.0, u_max=5.0,
        settings=atm.Settings(abs_pri_tol=1e-3, abs_dua_tol=1e-3,
                              max_iter=100, check_termination=1),
        gen_wrapper=True, augment_Q=True, scalar_type="float",
    )
    files_c = sorted(p.relative_to(out_c) for p in out_c.rglob("*")
                     if p.is_file())
    files_py = sorted(p.relative_to(out_py) for p in out_py.rglob("*")
                      if p.is_file())
    assert files_c == files_py and files_c
    for rel in files_c:
        assert (out_c / rel).read_bytes() == (out_py / rel).read_bytes(), rel

    # And the C-generated project actually builds and runs.
    binary = build_project(out_c)
    run = subprocess.run(
        [str(binary), "0", "0", "0.1", "0", "30"],
        capture_output=True, text=True, check=True,
    )
    assert len(run.stdout.strip().splitlines()) == 30


def test_editable_solver_preserved_across_regen(tmp_path):
    """tiny_codegen(editable=True): the reference's modify-the-solver-on-
    target workflow (codegen.cpp:615-654 copies its solver sources into
    the output) — user edits to src/tiny_solver.cpp survive re-generation
    while data/dims refresh, and the edited project still builds + runs."""
    out = tmp_path / "editable_project"
    kw = dict(
        x_min=-5.0, x_max=5.0, u_min=-5.0, u_max=5.0,
        settings=atm.Settings(max_iter=10, check_termination=0),
        augment_Q=False, editable=True,
    )
    tiny_codegen(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG,
        rho=cartpole.RHO, horizon=10, output_dir=out, **kw,
    )
    solver = out / "src" / "tiny_solver.cpp"
    txt = solver.read_text()
    assert "User-editable" in txt
    # User edit: a marker + a functional tweak surviving regeneration.
    solver.write_text("// MY LOCAL EDIT\n" + txt)
    data_before = (out / "src" / "tiny_data.cpp").read_text()
    # Regenerate with a different rho: data refreshes, solver preserved.
    tiny_codegen(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG,
        rho=cartpole.RHO * 2.0, horizon=10, output_dir=out, **kw,
    )
    assert solver.read_text().startswith("// MY LOCAL EDIT")
    data_after = (out / "src" / "tiny_data.cpp").read_text()
    assert data_after != data_before  # rho change landed
    binary = build_project(out)
    res = subprocess.run(
        [str(binary)] + [str(v) for v in X0],
        capture_output=True, text=True, check=True,
    )
    assert len(res.stdout.strip().splitlines()) > 1


def test_generated_project_with_alpha(tmp_path):
    """tiny_codegen(settings=Settings(alpha=1.6)): the emitted solver's
    relaxed slack/dual stages (TINY_ALPHA) match the engine's scan tier at
    the same alpha (round-5 deployment parity for over-relaxation)."""
    out = tmp_path / "alpha_project"
    sets = atm.Settings(max_iter=25, check_termination=0, alpha=1.6)
    tiny_codegen(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG,
        rho=cartpole.RHO, horizon=10, output_dir=out,
        x_min=-5.0, x_max=5.0, u_min=-5.0, u_max=5.0,
        settings=sets, augment_Q=False,
    )
    assert "TINY_ALPHA ((tinytype)1.6" in (
        out / "include" / "tiny_dims.h").read_text()
    binary = build_project(out)
    res = subprocess.run(
        [str(binary), *[str(v) for v in X0], str(TICKS)],
        capture_output=True, text=True, check=True,
    )
    rows = np.array(
        [[float(v) for v in line.split(",")]
         for line in res.stdout.strip().splitlines()]
    )
    u_cpp = rows[:, 5:6]

    problem = cartpole.cartpole_problem(10)
    cache = riccati_cache(
        cartpole.A, cartpole.B, cartpole.Q_DIAG, cartpole.R_DIAG,
        cartpole.RHO,
    )
    _, _, trace = jax.jit(
        lambda x: mpc_rollout(problem, cache, sets, x, TICKS)
    )(jnp.asarray(X0, jnp.float32))
    u_jax = np.asarray(trace.u)
    np.testing.assert_allclose(u_cpp, u_jax, rtol=0, atol=1e-4)
    # (On this workload 25 fixed iterations fully converge, so alpha=1.6
    # and alpha=1 end at the same fixed point — the contract here is that
    # the emitted relaxed stages track the ENGINE at the same alpha.)
