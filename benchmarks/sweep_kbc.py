"""KBC D3Q27 kernel parameter sweep on the real TPU.

The KBC fragment is compute-bound, so the blocking/block-size optimum
differs from BGK's. Times the fused kernel at 256^3 across n_sub and
block targets; used to pick the KBC defaults in stream_collide.py.

Usage: python benchmarks/sweep_kbc.py [--steps 96] [--res 256]
"""

from __future__ import annotations

import argparse
import os
import sys
from timeit import default_timer as timer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=96)
    parser.add_argument("--res", type=int, default=256)
    args = parser.parse_args()

    import lettuce_tpu as lt
    from lettuce_tpu.ops.pallas.stream_collide import fused_stream_collide

    ctx = lt.Context(dtype=jnp.float32, use_native=True)
    flow = lt.TaylorGreenVortex(ctx, args.res, 1600, 0.05,
                                stencil=lt.D3Q27(), initialize_fneq=False)
    st = flow.stencil
    e = np.asarray(st.e)
    w = np.asarray(st.w)
    opp = np.asarray(st.opposite)
    cs = float(st.cs)
    tau = float(flow.units.relaxation_parameter_lu)
    n_cells = float(np.prod(flow.resolution))
    spec = ("kbc", tau)
    UNROLL = 16

    def measure(block_target, vmem_mb, n_sub):
        def multi(x):
            return fused_stream_collide(
                x, e, w, opp, cs, None, collision_spec=spec,
                block_target=block_target, vmem_limit_mb=vmem_mb,
                n_sub=n_sub)

        unroll = max(1, UNROLL // n_sub)

        @jax.jit
        def run(x):
            for _ in range(unroll):
                x = multi(x)
            return x

        steps_per_iter = unroll * n_sub
        try:
            x = flow.f
            x = run(x)
            x.block_until_ready()
            iters = max(1, args.steps // steps_per_iter)
            t0 = timer()
            for _ in range(iters):
                x = run(x)
            x.block_until_ready()
            dt = timer() - t0
            mlups = iters * steps_per_iter * n_cells / 1e6 / dt
            return f"{mlups:8.1f} MLUPS"
        except Exception as exc:  # noqa: BLE001 - sweep reports and moves on
            return f"FAILED: {type(exc).__name__}: {str(exc)[:80]}"

    CONFIGS = [
        ((16, 32), 96, 2),
        ((16, 32), 96, 4),
        ((32, 32), 100, 2),
        ((16, 64), 100, 2),
        ((32, 64), 110, 2),
        ((32, 32), 100, 4),
        ((16, 32), 110, 2),
        ((64, 32), 110, 2),
    ]
    for bt, vmem, n_sub in CONFIGS:
        print(f"n_sub={n_sub} bt={bt!s:9s} vmem={vmem} "
              f"{measure(bt, vmem, n_sub)}", flush=True)


if __name__ == "__main__":
    main()
