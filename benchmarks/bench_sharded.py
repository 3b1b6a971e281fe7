"""Sharded-kernel benchmark: per-shard MLUPS and halo overhead for any
device mesh (VERDICT r3 item 1 — so a real multi-chip measurement is one
command away when hardware shows up).

For the requested mesh it runs the sharded fused-kernel step on a grid
whose LOCAL shard matches ``--local`` (weak scaling), then runs the
unsharded kernel on one shard-sized grid as the perfect-scaling
baseline. Halo overhead = 1 - per_shard_mlups / local_mlups.

On the current single-chip hardware run it with ``--mesh 1`` /
``--mesh 1,1``: that compiles and executes the IDENTICAL
shard_map(pallas_call) + ppermute(ring of 1) code on real silicon.

Usage:
  python benchmarks/bench_sharded.py --mesh 1        # 1D ring of 1
  python benchmarks/bench_sharded.py --mesh 1,1      # 2D mesh of 1
  python benchmarks/bench_sharded.py --mesh 8 --local 128,128,256
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(mesh_shape, local, steps, stencil_name, half):
    import lettuce_tpu as lt

    stencil = getattr(lt, stencil_name)()
    d = stencil.d
    local = list(local)[:d]
    while len(local) < d:
        local.append(local[-1])
    grid = list(local)
    for idx, n in enumerate(mesh_shape):
        grid[idx] *= n
    n_shards = int(np.prod(mesh_shape))

    def make(resolution):
        ctx = lt.Context(dtype=jnp.float32, use_native=True)
        return lt.TaylorGreenVortex(ctx, resolution, 1600, 0.05,
                                    stencil=stencil,
                                    initialize_fneq=False)

    # sharded run (weak scaling: global grid = local * mesh)
    flow = make(grid)
    decomp = lt.DomainDecomposition(mesh_shape=mesh_shape)
    sim = lt.Simulation(flow, lt.BGKCollision(
        flow.units.relaxation_parameter_lu), [], decomposition=decomp,
        half_storage=half)
    sim(max(20, steps // 10))  # compile + warm
    mlups = sim(steps)

    # perfect-scaling baseline: the unsharded kernel on one shard's grid
    flow_1 = make(local)
    sim_1 = lt.Simulation(flow_1, lt.BGKCollision(
        flow_1.units.relaxation_parameter_lu), [], half_storage=half)
    sim_1(max(20, steps // 10))
    mlups_1 = sim_1(steps)

    per_shard = mlups / n_shards
    return {
        "mesh": list(mesh_shape),
        "grid": grid,
        "local": local,
        "stencil": stencil_name,
        "path": sim.step_path,
        "steps": steps,
        "mlups_total": round(mlups, 1),
        "mlups_per_shard": round(per_shard, 1),
        "mlups_local_baseline": round(mlups_1, 1),
        "halo_overhead": round(1.0 - per_shard / mlups_1, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="1",
                    help="devices per sharded axis, e.g. 8 or 2,4")
    ap.add_argument("--local", default="256,256,256",
                    help="local shard resolution (weak scaling)")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--stencil", default="D3Q19")
    ap.add_argument("--half", action="store_true",
                    help="bf16 deviation storage")
    args = ap.parse_args()
    mesh = tuple(int(v) for v in args.mesh.split(","))
    local = [int(v) for v in args.local.split(",")]

    row = run(mesh, local, args.steps, args.stencil, args.half)
    print(json.dumps(row))

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_sharded.json")
    rows = []
    if os.path.exists(out_path):
        with open(out_path) as fh:
            rows = json.load(fh)
    rows = [r for r in rows if not (r["mesh"] == row["mesh"]
                                    and r["local"] == row["local"]
                                    and r["stencil"] == row["stencil"]
                                    and r["path"] == row["path"])]
    rows.append(row)
    with open(out_path, "w") as fh:
        json.dump(rows, fh, indent=2)


if __name__ == "__main__":
    main()
