"""Generate docs/api.md — a markdown API reference for the public
``lettuce_tpu`` namespace — from live introspection (no sphinx needed in
the image; a sphinx tree for HTML builds lives in docs/sphinx/).

Usage: python docs/gen_api.py
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import lettuce_tpu as lt  # noqa: E402

GROUPS = [
    ("Core runtime", ["Context", "Simulation", "Flow", "UnitConversion"]),
    ("Stencils", ["Stencil", "D1Q3", "D2Q9", "D3Q15", "D3Q19", "D3Q27"]),
    ("Equilibria", ["Equilibrium", "QuadraticEquilibrium",
                    "QuadraticEquilibriumLessMemory",
                    "IncompressibleQuadraticEquilibrium"]),
    ("Collision operators", ["Collision", "BGKCollision", "NoCollision",
                             "TRTCollision", "MRTCollision",
                             "RegularizedCollision", "KBCCollision",
                             "SmagorinskyCollision", "CumulantCollision"]),
    ("Boundaries", ["Boundary", "BounceBackBoundary",
                    "EquilibriumBoundaryPU", "AntiBounceBackOutlet",
                    "EquilibriumOutletP", "SpongeOutlet",
                    "PeriodicPressureBC"]),
    ("Forcing schemes", ["Force", "Guo", "ShanChen"]),
    ("Flow cases", ["ExtFlow", "TaylorGreenVortex", "CouetteFlow2D",
                    "PoiseuilleFlow2D", "DoublyPeriodicShear2D",
                    "DecayingTurbulence", "Obstacle", "Cavity2D",
                    "MixingLayer"]),
    ("Reporters / observables", [
        "Reporter", "Observable", "ObservableReporter", "ErrorReporter",
        "VTKReporter", "HDF5Reporter", "LettuceDataset",
        "MaximumVelocity", "IncompressibleKineticEnergy", "Enstrophy",
        "EnergySpectrum", "Mass", "DragCoefficient", "FlowStatistics",
        "NaNGuard", "write_image"]),
    ("Moment transforms", ["Transform", "D1Q3Transform", "D2Q9Lallemand",
                           "D2Q9Dellar", "D3Q27Hermite", "D3Q19DHumieres",
                           "D3Q27CumulantTransform", "moment_tensor",
                           "get_default_moment_transform"]),
    ("Parallel / sharding", ["Decomposition"]),
    ("Utilities", ["jax_gradient", "jax_jacobi", "grid_fine_to_coarse",
                   "append_axes", "get_subclasses", "LettuceException",
                   "LettuceWarning", "InefficientCodeWarning",
                   "ExperimentalWarning"]),
]


def describe(name):
    obj = getattr(lt, name, None)
    if obj is None:
        return None
    lines = [f"### `{name}`", ""]
    try:
        if inspect.isclass(obj):
            sig = str(inspect.signature(obj.__init__))
            sig = sig.replace("(self, ", "(").replace("(self)", "()")
            lines.append(f"```python\n{name}{sig}\n```")
        elif callable(obj):
            lines.append(f"```python\n{name}{inspect.signature(obj)}\n```")
    except (ValueError, TypeError):
        pass
    doc = inspect.getdoc(obj)
    if doc:
        lines.append("")
        lines.append(doc)
    if inspect.isclass(obj):
        methods = []
        for mname, m in sorted(vars(obj).items()):
            if mname.startswith("_") or not callable(m):
                continue
            mdoc = inspect.getdoc(m)
            first = mdoc.splitlines()[0] if mdoc else ""
            try:
                msig = str(inspect.signature(m)).replace("(self, ", "(") \
                    .replace("(self)", "()")
            except (ValueError, TypeError):
                msig = "(...)"
            methods.append(f"- `{mname}{msig}` — {first}")
        if methods:
            lines.append("")
            lines.append("**Methods**")
            lines.append("")
            lines.extend(methods)
    lines.append("")
    return "\n".join(lines)


def main():
    out = ["# API reference",
           "",
           "Generated from the live package by `python docs/gen_api.py` "
           "— regenerate after changing public signatures or docstrings.",
           ""]
    missing = []
    for title, names in GROUPS:
        out.append(f"## {title}")
        out.append("")
        for name in names:
            section = describe(name)
            if section is None:
                missing.append(name)
                continue
            out.append(section)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "api.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path} ({len(open(path).read().splitlines())} lines)")
    if missing:
        print(f"WARNING: names not found in lettuce_tpu: {missing}")


if __name__ == "__main__":
    main()
