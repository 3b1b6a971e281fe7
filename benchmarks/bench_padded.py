"""Padded-grid throughput check on the real TPU.

Times the Simulation driver (which owns the ghost-image pad codec) on
non-128-multiple grids and their aligned controls, D2Q9 and D3Q19 BGK.
Used to quantify the arbitrary-resolution kernel path (VERDICT r2 item 1)
and the in-VMEM minor-image fix vs the jnp refresh.

Usage: python benchmarks/bench_padded.py [--steps 200]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def run_case(label, res, steps):
    import lettuce_tpu as lt
    ctx = lt.Context(dtype=jnp.float32, use_native=True)
    stencil = lt.D3Q19() if len(res) == 3 else lt.D2Q9()
    flow = lt.TaylorGreenVortex(ctx, list(res), 1600, 0.05,
                                stencil=stencil, initialize_fneq=False)
    sim = lt.Simulation(flow, lt.BGKCollision(flow.units.relaxation_parameter_lu), [])
    sim(steps // 10)  # warm up / compile
    mlups = sim(steps)
    print(f"{label:34s} {str(res):18s} path={sim.step_path:10s} {mlups:9.1f} MLUPS")
    return mlups


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--cases", type=str, default="all")
    args = parser.parse_args()

    cases = [
        ("3D aligned control", (256, 256, 256)),
        ("3D padded minor z=250", (256, 256, 250)),
        ("3D padded minor z=200", (256, 256, 200)),
        ("3D odd everything", (250, 250, 250)),
        ("2D aligned control", (2048, 1024)),
        ("2D padded minor", (2048, 1000)),
        ("2D reference obstacle shape", (404, 204)),
    ]
    if args.cases != "all":
        keep = args.cases.split(",")
        cases = [c for c in cases if any(k in c[0] for k in keep)]
    for label, res in cases:
        run_case(label, res, args.steps)


if __name__ == "__main__":
    main()
