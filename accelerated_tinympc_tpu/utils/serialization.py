"""Problem/cache/state serialization: the runtime analogue of the reference
freezing its whole solver into generated source files
(reference: src/tinympc/codegen.cpp:322-479 emits every struct as literals).

Here the solver state is already a pytree, so persistence is one ``.npz`` per
pytree with a tiny manifest — loadable from Python or (flat arrays, row-major)
from the generated C++ deployment projects.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any

import jax
import numpy as np

from ..types import Cache, Problem, Settings


def save_pytree(path: str | pathlib.Path, tree: Any) -> None:
    """Save a dataclass/NamedTuple pytree of arrays as npz + field manifest."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_leaves(path: str | pathlib.Path) -> list[np.ndarray]:
    d = np.load(path)
    n = sum(1 for k in d.files if k.startswith("leaf_"))
    return [d[f"leaf_{i}"] for i in range(n)]


def save_like(path: str | pathlib.Path, tree: Any) -> None:
    save_pytree(path, tree)


def load_like(path: str | pathlib.Path, template: Any) -> Any:
    """Load into the same pytree structure as ``template``."""
    leaves = load_leaves(path)
    treedef = jax.tree.structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"{path}: expected {treedef.num_leaves} leaves, found {len(leaves)}"
        )
    return jax.tree.unflatten(treedef, leaves)


def save_problem_cache(
    path: str | pathlib.Path, problem: Problem, cache: Cache,
    settings: Settings | None = None,
) -> None:
    """One-file bundle of a ready-to-solve problem (the runtime counterpart of
    the reference's generated workspace, codegen.cpp:322-479)."""
    arrays = {}
    for name in ("A", "B", "Q", "R", "u_min", "u_max", "x_min", "x_max",
                 "Xref", "Uref"):
        arrays[f"problem_{name}"] = np.asarray(getattr(problem, name))
    for name in ("rho", "Kinf", "Pinf", "Quu_inv", "AmBKt", "coeff_d2p"):
        arrays[f"cache_{name}"] = np.asarray(getattr(cache, name))
    if settings is not None:
        arrays["settings"] = np.asarray([
            float(settings.abs_pri_tol), float(settings.abs_dua_tol),
            float(settings.max_iter), float(settings.check_termination),
            float(settings.en_state_bound), float(settings.en_input_bound),
        ])
    np.savez(path, **arrays)


def load_problem_cache(
    path: str | pathlib.Path,
) -> tuple[Problem, Cache, Settings | None]:
    d = np.load(path)
    import jax.numpy as jnp

    p = {k[len("problem_"):]: jnp.asarray(d[k], jnp.float32)
         for k in d.files if k.startswith("problem_")}
    c = {k[len("cache_"):]: jnp.asarray(d[k], jnp.float32)
         for k in d.files if k.startswith("cache_")}
    settings = None
    if "settings" in d.files:
        s = d["settings"]
        settings = Settings(
            abs_pri_tol=float(s[0]), abs_dua_tol=float(s[1]),
            max_iter=int(s[2]), check_termination=int(s[3]),
            en_state_bound=bool(s[4]), en_input_bound=bool(s[5]),
        )
    return Problem(**p), Cache(**c), settings
