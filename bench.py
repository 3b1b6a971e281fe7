"""Headline benchmark: MLUPS for D3Q19 BGK Taylor-Green at 256^3
(BASELINE.json north star: >= 5000 MLUPS on TPU v5e; vs_baseline is
MLUPS / 5000).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "MLUPS", "vs_baseline": N}
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")  # let jax pick TPU if present


def main():
    import jax
    import jax.numpy as jnp

    import lettuce_tpu as lt

    platform = jax.devices()[0].platform
    on_accel = platform in ("tpu", "gpu")
    resolution = 256 if on_accel else 32
    steps = 200 if on_accel else 10
    warmup = 20 if on_accel else 2

    def run(half):
        context = lt.Context(dtype=jnp.float32, use_native=True)
        flow = lt.TaylorGreenVortex(context, resolution,
                                    reynolds_number=1600,
                                    mach_number=0.05, stencil=lt.D3Q19(),
                                    initialize_fneq=False)
        collision = lt.BGKCollision(
            tau=flow.units.relaxation_parameter_lu)
        simulation = lt.Simulation(flow, collision, [],
                                   half_storage=half)
        simulation(warmup)  # compile + warm caches
        return simulation(steps), simulation._step_kind

    # headline config: fused kernel + bf16 deviation storage (the framework's
    # production throughput mode); falls back to f32 when unavailable
    storage = "bf16-dev storage, f32 compute"
    try:
        assert on_accel
        mlups, kind = run(half=True)
    except Exception:
        storage = "f32"
        mlups, kind = run(half=False)

    baseline = 5000.0  # north-star target MLUPS (BASELINE.json)
    print(json.dumps({
        "metric": f"MLUPS D3Q19 BGK TGV {resolution}^3 "
                  f"({platform}, {kind} path, {storage})",
        "value": round(mlups, 2),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / baseline, 4),
    }))


if __name__ == "__main__":
    main()
