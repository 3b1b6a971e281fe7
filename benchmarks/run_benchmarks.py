"""Benchmark suite: MLUPS across flow configs, stencils, precisions and
step paths, written to benchmarks/results.json.

Usage:
    python benchmarks/run_benchmarks.py [--quick]

The reference framework has no benchmarks directory; its only recorded
numbers are MLUPS outputs in example notebooks (see BASELINE.md). This
suite records hardware-labelled results per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import platform as host_platform
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


MEASURED_BW_GBPS = 604.0  # practical HBM bandwidth, fori-loop saxpy (v5e)


def bench_config(name, make_flow, collision_factory, steps, use_native,
                 half_storage=False):
    import lettuce_tpu as lt

    context = lt.Context(dtype=jnp.float32, use_native=use_native)
    flow = make_flow(context)
    simulation = lt.Simulation(flow, collision_factory(flow), [],
                               half_storage=half_storage)
    # warm past one unrolled carry body (32 steps) so compilation stays
    # out of the timed run
    warm = max(40, steps // 10)
    simulation(warm)
    mlups = simulation(steps)
    row = {
        "name": name,
        "resolution": list(flow.resolution),
        "stencil": type(flow.stencil).__name__,
        "path": simulation.step_path,
        "steps": steps,
        "mlups": round(mlups, 1),
    }
    # roofline accounting (VERDICT r4 #9): minimum HBM traffic per
    # cell-step is one read + one write of all q populations, divided by
    # the temporal-blocking span; achieved GB/s = that traffic x MLUPS.
    # Percent is vs the measured practical bandwidth, so it is directly
    # the remaining tuning headroom (halo re-reads are NOT charged, so
    # 100% is unreachable; the column orders configs by how
    # bandwidth-efficient each one already is).
    path = simulation.step_path
    span = 1
    if " x" in path:
        try:
            span = int(path.rsplit("x", 1)[1])
        except ValueError:
            pass
    itemsize = 2 if half_storage else 4
    q = flow.stencil.q
    bytes_per_cell_step = 2.0 * q * itemsize / span
    gbps = mlups * 1e6 * bytes_per_cell_step / 1e9
    row["bytes_per_cell_step"] = round(bytes_per_cell_step, 2)
    row["achieved_gbps"] = round(gbps, 1)
    row["roofline_pct"] = round(100.0 * gbps / MEASURED_BW_GBPS, 1)
    return row


def _make_obstacle_config(ctx, nx=2048, ny=1024):
    """Cylinder in a channel with inlet + anti-bounce-back outlet — the
    open-boundary flagship; runs fused via the hybrid outlet fix-up."""
    import lettuce_tpu as lt

    flow = lt.Obstacle(ctx, [nx, ny], reynolds_number=100,
                       mach_number=0.1, domain_length_x=float(nx))
    x, y = flow.grid
    r = 0.05 * float(ny)
    flow.mask = np.asarray((x - 0.25 * nx) ** 2
                           + (y - 0.5 * ny) ** 2 < r ** 2)
    flow.initialize()
    return flow


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--only", default="",
                        help="substring filter on config names")
    args = parser.parse_args()

    import lettuce_tpu as lt

    device = jax.devices()[0]
    on_accel = device.platform in ("tpu", "gpu")
    scale = 1 if on_accel else 8  # shrink grids on CPU
    if args.quick:
        base_steps = 20 if on_accel else 2
    else:
        base_steps = 100 if on_accel else 5

    def bgk(flow):
        return lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)

    configs = [
        ("tgv2d_1024_d2q9", lambda ctx: lt.TaylorGreenVortex(
            ctx, 1024 // scale, 1600, 0.05, stencil=lt.D2Q9(),
            initialize_fneq=False), bgk),
        ("tgv2d_2048_d2q9", lambda ctx: lt.TaylorGreenVortex(
            ctx, 2048 // scale, 1600, 0.05, stencil=lt.D2Q9(),
            initialize_fneq=False), bgk),
        ("tgv3d_256_d3q19", lambda ctx: lt.TaylorGreenVortex(
            ctx, 256 // scale, 1600, 0.05, stencil=lt.D3Q19(),
            initialize_fneq=False), bgk),
        ("tgv3d_128_d3q27", lambda ctx: lt.TaylorGreenVortex(
            ctx, 128 // max(1, scale // 2), 1600, 0.05,
            stencil=lt.D3Q27(), initialize_fneq=False), bgk),
        ("decay2d_1024", lambda ctx: lt.DecayingTurbulence(
            ctx, [1024 // scale] * 2, 2000, 0.05, randseed=0,
            initialize_pressure=False, initialize_fneq=False), bgk),
        ("couette2d_2048", lambda ctx: lt.CouetteFlow2D(
            ctx, 2048 // scale, 10, 0.05), bgk),
        ("poiseuille2d_2048_guo", lambda ctx: lt.PoiseuilleFlow2D(
            ctx, 2048 // scale, 100, 0.05),
         lambda flow: lt.BGKCollision(
             tau=flow.units.relaxation_parameter_lu,
             force=lt.Guo(flow, tau=flow.units.relaxation_parameter_lu,
                          acceleration=flow.units.convert_acceleration_to_lu(
                              flow.acceleration)))),
        ("obstacle2d_2048", _make_obstacle_config, bgk),
        ("mixing2d_2048", lambda ctx: lt.MixingLayer(
            ctx, 2048 // scale, 30000, 0.05, stencil=lt.D2Q9(),
            randseed=0, initialize_fneq=False), bgk),
        ("cavity2d_2048", lambda ctx: lt.Cavity2D(
            ctx, 2048 // scale, 1000, 0.05), bgk),
        ("kbc3d_128_d3q27", lambda ctx: lt.TaylorGreenVortex(
            ctx, 128 // max(1, scale // 2), 1600, 0.05,
            stencil=lt.D3Q27(), initialize_fneq=False),
         lambda flow: lt.KBCCollision()),
        ("kbc3d_256_d3q27", lambda ctx: lt.TaylorGreenVortex(
            ctx, 256 // scale, 1600, 0.05, stencil=lt.D3Q27(),
            initialize_fneq=False),
         lambda flow: lt.KBCCollision()),
        ("reg3d_256_d3q27", lambda ctx: lt.TaylorGreenVortex(
            ctx, 256 // scale, 1600, 0.05, stencil=lt.D3Q27(),
            initialize_fneq=False),
         lambda flow: lt.RegularizedCollision(
             tau=flow.units.relaxation_parameter_lu)),
        ("mrt3d_256_d3q19", lambda ctx: lt.TaylorGreenVortex(
            ctx, 256 // scale, 1600, 0.05, stencil=lt.D3Q19(),
            initialize_fneq=False),
         lambda flow: lt.MRTCollision(
             lt.D3Q19DHumieres(flow.torch_stencil, flow.context),
             [flow.units.relaxation_parameter_lu] * 19,
             flow.context)),
        ("trt3d_256_d3q19", lambda ctx: lt.TaylorGreenVortex(
            ctx, 256 // scale, 1600, 0.05, stencil=lt.D3Q19(),
            initialize_fneq=False),
         lambda flow: lt.TRTCollision(
             tau=flow.units.relaxation_parameter_lu)),
        ("smag3d_256_d3q19", lambda ctx: lt.TaylorGreenVortex(
            ctx, 256 // scale, 1600, 0.05, stencil=lt.D3Q19(),
            initialize_fneq=False),
         lambda flow: lt.SmagorinskyCollision(
             tau=flow.units.relaxation_parameter_lu)),
    ]
    half_configs = [
        ("tgv3d_256_d3q19_half", lambda ctx: lt.TaylorGreenVortex(
            ctx, 256 // scale, 1600, 0.05, stencil=lt.D3Q19(),
            initialize_fneq=False), bgk),
    ]

    results = {
        "device": str(device),
        "platform": device.platform,
        "host": host_platform.platform(),
        "jax": jax.__version__,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "runs": [],
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results.json")
    if os.path.exists(out_path):  # accumulate across chunked runs
        try:
            with open(out_path) as fh:
                prev = json.load(fh)
            results["runs"] = [r for r in prev.get("runs", [])]
        except Exception:
            pass

    for name, make_flow, coll in configs:
        if args.only and args.only not in name:
            continue
        for use_native in ((True, False) if on_accel else (True,)):
            if (name == "kbc3d_256_d3q27" and not use_native
                    and on_accel):
                # the un-fused jnp KBC step at D3Q27 256^3 needs ~32 GB
                # HBM; on the axon tunnel the OOM FAULTS the device
                # (UNAVAILABLE for ~15 min) instead of raising — skip.
                # Kernel-vs-jnp equivalence at this size is covered by
                # the chunked oracle (tests/test_native.py).
                print(f"{name} native=False: SKIPPED (32 GB jnp step "
                      "faults the 16 GB device)", flush=True)
                continue
            try:
                # aim for >= ~8e9 site updates per timed run: the axon
                # tunnel's dispatch + one-element-fetch overhead is
                # ~0.1 s, so sub-second timed runs under-report by 20%+
                probe_flow = make_flow(lt.Context(dtype=jnp.float32,
                                                  use_native=False))
                cells = int(np.prod(probe_flow.resolution))
                del probe_flow
                steps = max(base_steps, min(4000, int(8e9 / cells))) \
                    if on_accel else base_steps
                row = bench_config(name, make_flow, coll, steps, use_native)
                # dedupe on (name, step kind): an n_sub change must
                # supersede the stale "pallas xN" row, not sit beside it
                kind = row["path"].split()[0]
                results["runs"] = [r for r in results["runs"]
                                   if not (r["name"] == row["name"]
                                           and r["path"].split()[0] == kind)]
                results["runs"].append(row)
                print(json.dumps(row), flush=True)
            except Exception as ex:  # keep the suite running
                print(f"{name} native={use_native}: FAILED {ex}",
                      flush=True)

    for name, make_flow, coll in half_configs:
        if args.only and args.only not in name:
            continue
        if not on_accel:
            continue
        try:
            probe_flow = make_flow(lt.Context(dtype=jnp.float32,
                                              use_native=False))
            cells = int(np.prod(probe_flow.resolution))
            del probe_flow
            steps = max(base_steps, min(4000, int(8e9 / cells)))
            row = bench_config(name, make_flow, coll, steps,
                               use_native=True, half_storage=True)
            kind = row["path"].split()[0]
            results["runs"] = [r for r in results["runs"]
                               if not (r["name"] == row["name"]
                                       and r["path"].split()[0] == kind)]
            results["runs"].append(row)
            print(json.dumps(row), flush=True)
        except Exception as ex:
            print(f"{name} half: FAILED {ex}", flush=True)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"written {out_path}")


if __name__ == "__main__":
    main()
