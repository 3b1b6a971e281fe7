"""Backward-pass (adjoint) throughput: fwd+bwd MLUPS per configuration.

Measures a grad-through-rollout round trip — the training-loop metric —
for the adjoint-kernel configurations (full and SPLIT modes) and,
optionally, the jnp-vjp fallback for comparison (``--jnp-vjp``; the
fallback OOMs first on large D3Q27 grids, so it is off by default).

Usage:
    python benchmarks/bench_adjoint.py [--size 256] [--steps 8] [--jnp-vjp]

MLUPS here counts each step once (a fwd+bwd round trip per step), so a
number X means the whole training step sustains X site-updates/s.
The reference has no native backward at all: its autograd replays
eager-torch ops (README.rst:27 advertises differentiability).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_grad(name, make_flow, collision_factory, steps, expect_mode):
    import lettuce_tpu as lt

    context = lt.Context(dtype=jnp.float32, use_native=True)
    flow = make_flow(context)
    sim = lt.Simulation(flow, collision_factory(flow), [])
    assert sim._step_kind == "pallas", sim._step_kind
    mode = getattr(sim._step, "adjoint_mode", None)
    if expect_mode is not None:
        assert mode == expect_mode, (mode, expect_mode)
    seg = (sim.make_segment_fn(steps) if hasattr(sim, "make_segment_fn")
           else None)
    if seg is None:
        step = sim.make_step_fn()

        def rollout(f):
            for _ in range(steps):
                f = step(f)
            return f
    else:
        rollout = seg

    @jax.jit
    def grad_fn(f):
        return jax.grad(lambda x: jnp.sum(rollout(x) ** 2))(f)

    f0 = flow.f
    g = grad_fn(f0)
    jax.block_until_ready(g)
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        g = grad_fn(f0)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / n_rep
    sites = float(np.prod(flow.resolution)) * steps
    mlups = sites / dt / 1e6
    row = {
        "name": name,
        "resolution": list(flow.resolution),
        "stencil": type(flow.stencil).__name__,
        "adjoint_mode": mode,
        "steps": steps,
        "mlups_fwd_bwd": round(mlups, 1),
    }
    print(json.dumps(row))
    return row


def main():
    import lettuce_tpu as lt

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--jnp-vjp", action="store_true",
                    help="also measure the LETTUCE_ADJOINT=0 fallback "
                         "(OOMs first on large D3Q27 grids)")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of config names")
    args = ap.parse_args()
    n = args.size

    def tgv3d(stencil, size=None):
        m = size or n
        return lambda ctx: lt.TaylorGreenVortex(
            ctx, [m, m, m], 1600, 0.05, stencil=stencil,
            initialize_fneq=False)

    tau_of = lambda flow: flow.units.relaxation_parameter_lu
    configs = [
        ("bgk_d3q19", tgv3d(lt.D3Q19()),
         lambda fl: lt.BGKCollision(tau_of(fl)), "full"),
        ("smagorinsky_d3q19", tgv3d(lt.D3Q19()),
         lambda fl: lt.SmagorinskyCollision(tau_of(fl)), "full"),
        # split-adjoint residuals are full states (no closed-form
        # jacobian fragment), so 8 steps of D3Q27 residuals at 256^3
        # need ~41 GB — benched at 128^3 (the KBC comparison size)
        ("kbc_d3q27", tgv3d(lt.D3Q27(), size=min(n, 128)),
         lambda fl: lt.KBCCollision(tau_of(fl)), "split"),
        ("mrt_lallemand_d2q9",
         lambda ctx: lt.TaylorGreenVortex(
             ctx, [2048, 2048], 1600, 0.05, stencil=lt.D2Q9(),
             initialize_fneq=False),
         lambda fl: lt.MRTCollision(
             lt.D2Q9Lallemand(fl.stencil, fl.context), [1.1] * 9,
             fl.context), "split"),
        ("bgk_guo_d2q9",
         lambda ctx: lt.TaylorGreenVortex(
             ctx, [2048, 2048], 1600, 0.05, stencil=lt.D2Q9(),
             initialize_fneq=False),
         lambda fl: lt.BGKCollision(
             0.8, force=lt.Guo(fl, tau=0.8, acceleration=[1e-5, 0.0])),
         "split"),
    ]
    only = set(args.only.split(",")) if args.only else None
    rows = []
    for name, mk, coll, mode in configs:
        if only is not None and name not in only:
            continue
        rows.append(bench_grad(name, mk, coll, args.steps, mode))
        print(json.dumps(rows[-1]), flush=True)
        if args.jnp_vjp:
            os.environ["LETTUCE_ADJOINT"] = "0"
            try:
                rows.append(bench_grad(name + "_jnpvjp", mk, coll,
                                       args.steps, None))
            finally:
                del os.environ["LETTUCE_ADJOINT"]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "adjoint_results.json")
    with open(out, "w") as fh:
        json.dump({"device": str(jax.devices()[0]), "rows": rows}, fh,
                  indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
