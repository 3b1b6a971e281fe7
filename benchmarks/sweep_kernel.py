"""Kernel parameter sweep on the real TPU.

Times the fused stream-collide kernel at D3Q19 256^3 across temporal
blocking depths (n_sub), block targets and VMEM budgets, for f32 and
bf16-deviation storage. Prints one line per configuration; used to pick
the defaults in stream_collide.py.

Usage: python benchmarks/sweep_kernel.py [--steps 128]
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
    parser.add_argument("--steps", type=int, default=128)
    parser.add_argument("--res", type=int, default=0)
    parser.add_argument("--stencil", default="D3Q19",
                        help="D3Q19 (res 256, 3D sweep) or D2Q9 "
                             "(res 2048, deep-blocking 2D sweep)")
    parser.add_argument(
        "--configs", default="",
        help="semicolon-separated dev,n_sub,btx,bty,vmem,yhalo[,wide] "
             "rows overriding the built-in table, e.g. "
             "'1,2,32,32,128,8;0,4,32,64,128,-'")
    args = parser.parse_args()

    import lettuce_tpu as lt
    from lettuce_tpu.ops.pallas.stream_collide import fused_stream_collide

    stencil = getattr(lt, args.stencil)()
    if not args.res:
        args.res = 256 if stencil.d == 3 else 2048
    ctx = lt.Context(dtype=jnp.float32, use_native=True)
    flow = lt.TaylorGreenVortex(ctx, args.res, 1600, 0.05,
                                stencil=stencil, initialize_fneq=False)
    st = flow.stencil
    e = np.asarray(st.e)
    w = np.asarray(st.w)
    opp = np.asarray(st.opposite)
    cs = float(st.cs)
    tau_inv = float(1.0 / flow.units.relaxation_parameter_lu)
    n_cells = float(np.prod(flow.resolution))
    w_b = jnp.asarray(w.reshape((-1,) + (1,) * stencil.d), jnp.float32)

    UNROLL = 32

    def build(block_target, vmem_mb, dev, n_sub, yhalo=None, wide=None):
        def multi(x):
            return fused_stream_collide(
                x, e, w, opp, cs, tau_inv,
                collision_spec=("bgk", tau_inv),
                block_target=block_target, vmem_limit_mb=vmem_mb,
                dev_storage=dev, n_sub=n_sub, yhalo_rows=yhalo,
                wide_slab=wide)

        u = max(1, UNROLL // n_sub)

        @jax.jit
        def run(x, iters):
            def body(_, xi):
                for _ in range(u):
                    xi = multi(xi)
                return xi
            return jax.lax.fori_loop(0, iters, body, x)
        return run, u * n_sub

    def measure(block_target, vmem_mb, dev, n_sub, yhalo=None, wide=None):
        x = flow.f
        if dev:
            x = (x - w_b).astype(jnp.bfloat16)
        try:
            run, steps_per_iter = build(block_target, vmem_mb, dev, n_sub,
                                        yhalo, wide)
            y = run(x, 1)  # compile + warm
            _ = float(y.ravel()[0])
            iters = max(1, args.steps // steps_per_iter)
            beg = timer()
            y = run(y, iters)
            jax.block_until_ready(y)
            _ = float(y.ravel()[0])  # honest fetch (axon: ready != done)
            dt = timer() - beg
        except Exception as exc:
            return f"FAIL {type(exc).__name__}: {str(exc)[:80]}"
        return f"{iters * steps_per_iter * n_cells / 1e6 / dt:8.1f} MLUPS"

    if stencil.d == 3:
        CONFIGS = [
            # (dev, n_sub, block_target, vmem, yhalo_rows[, wide_slab])
            (False, 4, (16, 32), 100, None),   # round-2 default (baseline)
            (True, 2, (16, 32), 100, 8, False),  # r4 bf16 default (narrow)
            (True, 2, (16, 32), 100, 8),         # + wide (f32) slabs
            (True, 4, (16, 32), 100, 8, False),  # deep, narrow slabs
            (True, 4, (16, 32), 100, 8),         # deep + wide slabs
            (True, 4, (16, 64), 100, 8),
            (True, 4, (8, 32), 100, 8),
            (True, 6, (24, 32), 100, 12),
            (True, 8, (16, 32), 100, 16),
            (True, 8, (32, 32), 128, 16),
        ]
    else:
        # 2D: the minor axis is merged (S, LANES) with EXACT rolls — no
        # y-halo constraint, so blocking depth is bounded only by
        # bx % n_sub == 0 and the x-halo growth (2*n_sub planes per
        # block). Sweep deep n_sub: halo traffic grows linearly while
        # HBM traffic per step keeps dropping ~n_sub-fold.
        CONFIGS = [
            # (dev, n_sub, block_target, vmem, yhalo_rows)
            (False, 4, (16, 32), 100, None),   # round-3 default
            (False, 8, (16, 32), 100, None),
            (False, 8, (32, 32), 100, None),
            (False, 12, (24, 32), 100, None),
            (False, 16, (32, 32), 100, None),
            (False, 16, (32, 32), 128, None),
            (False, 16, (16, 32), 100, None),
            (False, 24, (24, 32), 128, None),
            (False, 32, (32, 32), 128, None),
            (True, 2, (16, 32), 100, None),    # bf16-dev default
            (True, 4, (16, 32), 100, None),
            (True, 8, (16, 32), 100, None),
            (True, 16, (32, 32), 128, None),
        ]
    if args.configs:
        def parse_row(row):
            parts = row.split(",")
            dev = bool(int(parts[0]))
            n_sub = int(parts[1])
            bt = (int(parts[2]), int(parts[3]))
            vmem = int(parts[4])
            yh = None if parts[5] in ("-", "") else int(parts[5])
            wide = None
            if len(parts) > 6 and parts[6] not in ("-", ""):
                wide = bool(int(parts[6]))
            return (dev, n_sub, bt, vmem, yh, wide)
        CONFIGS = [parse_row(r) for r in args.configs.split(";") if r]

    for cfg in CONFIGS:
        dev, n_sub, bt, vmem, yh = cfg[:5]
        wide = cfg[5] if len(cfg) > 5 else None
        tag = "bf16-dev" if dev else "f32"
        wtag = {None: "auto", True: "wide", False: "narrow"}[wide]
        print(f"{tag:9s} n_sub={n_sub} bt={bt!s:9s} vmem={vmem:3d} "
              f"yhalo={yh} slab={wtag:6s} "
              f"{measure(bt, vmem, dev, n_sub, yh, wide)}",
              flush=True)


if __name__ == "__main__":
    main()
