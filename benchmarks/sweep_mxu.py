"""A/B the MXU moment formulation (LETTUCE_MXU) for the moment-heavy
fragments at 256^3 on the real chip: KBC D3Q27, Regularized D3Q27, MRT
d'Humieres D3Q19, each at off / plane / slab.

Usage: python benchmarks/sweep_mxu.py [--steps 400] [--only kbc]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--only", default="")
    parser.add_argument("--res", type=int, default=256)
    args = parser.parse_args()

    import lettuce_tpu as lt

    def kbc(fl):
        return lt.KBCCollision()

    def reg(fl):
        return lt.RegularizedCollision(tau=fl.units.relaxation_parameter_lu)

    def mrt(fl):
        return lt.MRTCollision(
            lt.D3Q19DHumieres(fl.stencil, fl.context),
            [fl.units.relaxation_parameter_lu] * 19, fl.context)

    CONFIGS = [("kbc_q27", lt.D3Q27, kbc),
               ("reg_q27", lt.D3Q27, reg),
               ("mrt_q19", lt.D3Q19, mrt)]

    for name, stencil_cls, col_of in CONFIGS:
        if args.only and args.only not in name:
            continue
        for mode in ("off", "plane", "slab"):
            os.environ["LETTUCE_MXU"] = mode
            try:
                ctx = lt.Context(dtype=jnp.float32, use_native=True)
                flow = lt.TaylorGreenVortex(ctx, args.res, 1600, 0.05,
                                            stencil=stencil_cls(),
                                            initialize_fneq=False)
                sim = lt.Simulation(flow, col_of(flow), [])
                warm = max(40, args.steps // 10)
                sim(warm)
                mlups = sim(args.steps)
                print(f"{name:8s} mxu={mode:5s} path={sim.step_path:12s} "
                      f"{mlups:8.1f} MLUPS", flush=True)
            except Exception as exc:
                print(f"{name:8s} mxu={mode:5s} FAILED "
                      f"{type(exc).__name__}: {str(exc)[:120]}", flush=True)
    os.environ.pop("LETTUCE_MXU", None)


if __name__ == "__main__":
    main()
