"""Extract the 16-decimal Riccati cache literals from a reference-codegen-emitted
tiny_data_workspace.cpp into tests/golden/<name>_cache.npz.

The emitter writes matrices row-major at 16 decimals (reference:
src/tinympc/codegen.cpp:118-129,322-479), so these are exact float64 goldens for
the precompute math.

Usage: python tools/golden/extract_codegen_cache.py <tiny_data_workspace.cpp> <out.npz> <nx> <nu>
"""

import re
import sys

import numpy as np


def main() -> None:
    path, out, nx, nu = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    text = open(path).read()
    shapes = {
        "Kinf": (nu, nx), "Pinf": (nx, nx), "Quu_inv": (nu, nu),
        "AmBKt": (nx, nx), "coeff_d2p": (nx, nu),
    }
    arrs = {}
    for name, shape in shapes.items():
        # Each matrix is emitted on a single line: "(...<< ...).finished(), // Name"
        line = next(
            ln for ln in text.splitlines()
            if f"// {name}" in ln and ".finished()" in ln
        )
        vals = [float(v) for v in re.findall(r"\(tinytype\)([-0-9.eE+]+)", line)]
        arrs[name] = np.asarray(vals, np.float64).reshape(shape)
    m = re.search(r"\(tinytype\)([-0-9.eE+]+),?\s*//\s*rho", text)
    arrs["rho"] = np.float64(m.group(1)) if m else np.float64("nan")
    np.savez(out, **arrs)
    print(f"{out}: {sorted(arrs)}")


if __name__ == "__main__":
    main()
